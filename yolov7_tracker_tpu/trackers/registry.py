"""Tracker registry: name -> (step_fn, config defaults).

Mirrors TRACKER_DICT (tracker/track.py:56-65) and the imperative
kalman_format coupling (track.py:67-71: botsort/strongsort force their
own KF variant).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Tuple

import jax

from . import slab as S

# populated lazily to avoid import cycles
_STEPS: Dict[str, Callable] = {}


def register(name: str, **cfg_overrides):
    def deco(fn):
        _STEPS[name] = (fn, cfg_overrides)
        return fn

    return deco


def _ensure_loaded():
    import importlib

    for m in (
        "sort",
        "bytetrack",
        "c_biou",
        "deepsort",
        "botsort",
        "uavmot",
        "strongsort",
        "deepmot",
    ):
        importlib.import_module(f".{m}", __package__)


TRACKER_REGISTRY = _STEPS


def build_tracker(cfg: S.TrackerConfig) -> Tuple[Callable, S.TrackerConfig]:
    """Return (jitted step fn, resolved config) for cfg.tracker.

    The step fn signature is ``(slab, det_slab) -> (slab, FrameOutput)``.
    """
    _ensure_loaded()
    if cfg.tracker not in _STEPS:
        raise KeyError(
            f"unknown tracker {cfg.tracker!r}; have {sorted(_STEPS)}"
        )
    fn, overrides = _STEPS[cfg.tracker]
    # kalman_format coupling (track.py:67-71)
    forced = {"botsort": "botsort", "strongsort": "strongsort"}.get(cfg.tracker)
    if forced and cfg.kalman_format != forced:
        cfg = dataclasses.replace(cfg, kalman_format=forced)
    for k, v in overrides.items():
        if getattr(cfg, k) == getattr(S.TrackerConfig(), k):
            cfg = dataclasses.replace(cfg, **{k: v})
    kw = {}
    if cfg.tracker == "deepmot" and cfg.dhn_weights:
        # load trained DHN variables once at build time; the step closes
        # over them (tracker/deepmot.py:221-233 runs DHN per frame)
        from ..utils.checkpoint import load_variables

        kw["dhn_variables"] = load_variables(cfg.dhn_weights)
    step = functools.partial(fn, cfg=cfg, **kw)
    return jax.jit(step), cfg


def build_predict_only(cfg: S.TrackerConfig):
    """update_without_detection (basetrack.py:489-537): bump frame, KF-
    predict the pool, dedup, emit — for --detect_per_frame skipping.
    C-BIoU has no Kalman, so its predict-only step is frame+emit."""
    import jax.numpy as jnp

    fmt = cfg.kalman_format

    def step(slab):
        slab = slab._replace(frame=slab.frame + 1)
        if fmt != "none":
            slab = S.predict_pool(slab, fmt)
        slab = S.remove_duplicates(slab, fmt)
        return slab, S.frame_output(slab, fmt, cfg)

    return jax.jit(step)
