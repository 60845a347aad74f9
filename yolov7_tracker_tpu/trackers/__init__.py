"""Tracker layer: fixed-size track-slab state machine + 8 association schedules.

Reference surface (tracker/): basetrack.py (SORT), bytetrack.py,
deepsort.py, botsort.py, uavmot.py, deepmot.py, strongsort.py,
c_biou_tracker.py — rebuilt as pure jitted step functions over a padded
slab pytree so whole sequences run under lax.scan on device.
"""

from .slab import TrackSlab, TrackerConfig, init_slab  # noqa: F401
from .registry import TRACKER_REGISTRY, build_tracker  # noqa: F401
