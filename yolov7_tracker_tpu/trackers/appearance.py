"""Appearance / motion cost utilities shared by the ReID trackers.

Vectorized masked forms of tracker/matching.py: embedding_distance
(:84-103), nearest_embedding_distance (:105-127), the DeepSORT KF gate
(deepsort.py:42-66), the age-layered matching cascade (:216-277), GMC
warp application (botsort.py:250-269) and UAVMOT's structure similarity
(:284-386).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import kalman
from ..ops.assignment import solve_assignment as masked_assignment
from . import slab as S

CHI2INV95_4 = 9.4877  # kalman_filter.py:11-20, 4 dof
GATED_COST = 1e5


def _l2norm(x, eps=1e-12):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def cosine_distance(track_feats, det_feats):
    """1 - cosine similarity; both sides row-normalized
    (matching.py:165-178)."""
    return 1.0 - _l2norm(track_feats) @ _l2norm(det_feats).T


def euclidean_distance(track_feats, det_feats):
    """Plain pairwise euclidean cdist, clipped at 0 (matching.py:97-98)."""
    d2 = (
        jnp.sum(track_feats**2, axis=1)[:, None]
        - 2.0 * track_feats @ det_feats.T
        + jnp.sum(det_feats**2, axis=1)[None, :]
    )
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def nearest_embedding_distance(feat_hist, feat_count, det_feats):
    """Min cosine distance over each track's stored feature history
    (matching.py:105-127). feat_hist (T, H, F), det_feats (D, F)."""
    t, h, f = feat_hist.shape
    sims = _l2norm(feat_hist.reshape(t * h, f)) @ _l2norm(det_feats).T
    sims = sims.reshape(t, h, -1)
    slot_valid = (
        jnp.arange(h)[None, :] < jnp.minimum(feat_count, h)[:, None]
    )
    sims = jnp.where(slot_valid[:, :, None], sims, -jnp.inf)
    return 1.0 - jnp.max(sims, axis=1)


def gate_cost_matrix(cost, slab: S.TrackSlab, dets: S.DetSlab, fmt: str,
                     max_appearance_thresh: float = 0.15):
    """DeepSORT gate (deepsort.py:42-66): clip appearance cost > 0.15 to
    1e5 and chi2-gate by Mahalanobis distance to the xyah measurement."""
    meas = kalman.measurement_from_tlwh("default", dets.tlwh)
    gd = kalman.gating_distance(fmt, slab.mean, slab.cov, meas)
    cost = jnp.where(cost > max_appearance_thresh, GATED_COST, cost)
    return jnp.where(gd > CHI2INV95_4, GATED_COST, cost)


def matching_cascade(cost, slab: S.TrackSlab, row_mask, col_mask,
                     thresh: float, depth: int):
    """Age-layered assignment (matching.py:216-277): level l matches
    tracks with time_since_update == 1 + l against the still-unmatched
    detections. Returns (row_to_col, col_to_row)."""
    t = cost.shape[0]
    d = cost.shape[1]

    def level(carry, l):
        r2c, det_avail = carry
        rows_l = row_mask & (slab.time_since_update == 1 + l)
        r2c_l, c2r_l = masked_assignment(cost, rows_l, det_avail, thresh)
        r2c = jnp.where(rows_l & (r2c_l >= 0), r2c_l, r2c)
        det_avail = det_avail & (c2r_l < 0)
        return (r2c, det_avail), None

    r2c0 = jnp.full((t,), -1, jnp.int32)
    (r2c, det_avail), _ = jax.lax.scan(
        level, (r2c0, col_mask), jnp.arange(depth)
    )
    c2r = jnp.full((d,), -1, jnp.int32).at[
        jnp.where(r2c >= 0, r2c, d)
    ].set(
        jnp.where(r2c >= 0, jnp.arange(t, dtype=jnp.int32), -1), mode="drop"
    )
    return r2c, c2r


def apply_gmc(slab: S.TrackSlab, warp: jnp.ndarray, mask) -> S.TrackSlab:
    """Apply a 2x3 affine camera-motion warp to KF means/covs
    (botsort.py multi_gmc:250-269): R8x8 = kron(I4, R2x2),
    mean' = R8 mean + [t, 0...], cov' = R8 cov R8'."""
    r2 = warp[:2, :2]
    t2 = warp[:2, 2]
    r8 = jnp.kron(jnp.eye(4, dtype=jnp.float32), r2)
    mean = slab.mean @ r8.T
    mean = mean.at[:, :2].add(t2)
    cov = jnp.einsum("ij,tjk,lk->til", r8, slab.cov, r8)
    m = mask[:, None]
    return slab._replace(
        mean=jnp.where(m, mean, slab.mean),
        cov=jnp.where(mask[:, None, None], cov, slab.cov),
    )


def structure_similarity(xy, valid, local_r: float = 400.0):
    """UAVMOT local-topology vector per target (matching.py:344-386):
    v = [max neighbor dist, min neighbor dist, included angle in integer
    degrees] over neighbors within radius 400, with the reference's
    degenerate-case fallbacks. xy (N, 2), valid (N,). Returns (N, 3)."""
    n = xy.shape[0]
    d = jnp.linalg.norm(xy[:, None, :] - xy[None, :, :], axis=-1)
    ok = valid[None, :] & valid[:, None] & (d > 0) & (d < local_r)
    neg = jnp.where(ok, d, -jnp.inf)
    pos = jnp.where(ok, d, jnp.inf)
    max_len = jnp.max(neg, axis=1)
    min_len = jnp.min(pos, axis=1)
    max_idx = jnp.argmax(neg, axis=1)
    min_idx = jnp.argmin(pos, axis=1)
    has = jnp.isfinite(max_len)

    v1 = xy[max_idx] - xy
    v2 = xy[min_idx] - xy

    def int_deg(v):
        ang = jnp.arctan2(v[:, 1], v[:, 0]) * (180.0 / jnp.pi)
        return jnp.trunc(ang)

    a1 = int_deg(v1)
    a2 = int_deg(v2)
    same_sign = a1 * a2 >= 0
    inc = jnp.where(
        same_sign,
        jnp.abs(a1 - a2),
        jnp.abs(a1) + jnp.abs(a2),
    )
    inc = jnp.where(~same_sign & (inc > 180.0), 360.0 - inc, inc)

    eq = has & (max_len == min_len)
    angle = jnp.where(eq, 1e-4, inc)
    out = jnp.stack(
        [
            jnp.where(has, max_len, 1e-4),
            jnp.where(has, min_len, 1e-4),
            jnp.where(has, angle, 1e-4),
        ],
        axis=1,
    )
    return out


def structure_distance(track_xy, track_valid, det_xy, det_valid):
    """Cosine cdist between structure vectors, clipped at 0
    (matching.py:311-320)."""
    a = structure_similarity(track_xy, track_valid)
    b = structure_similarity(det_xy, det_valid)
    sim = _l2norm(a) @ _l2norm(b).T
    return jnp.maximum(0.0, 1.0 - sim)
