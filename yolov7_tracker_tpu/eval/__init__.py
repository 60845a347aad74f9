"""MOT evaluation subsystem: HOTA / CLEAR / Identity metrics, MOT-challenge
and VisDrone dataset readers, sequence-parallel evaluation driver.

Functionally equivalent to the reference's vendored TrackEval
(tracker/trackeval/) for the benchmarks this framework targets, plus the
py-motmetrics-style fallback (tracker/evaluate.py).
"""

from .metrics import hota, clear, identity, combine_sequences  # noqa: F401
from .evaluator import evaluate_benchmark  # noqa: F401
