"""Batched constant-velocity Kalman filters for the track slab.

The reference ships four per-object KF variants keyed by ``kalman_format``
(tracker/kalman_filter.py, tracker/basetrack.py:64-69):

  'default'    8-state (x, y, a, h, v...)   DeepSORT-style, xyah measurement
  'naive'      7-state (x, y, area, r, vx, vy, varea)  SORT, xyar measurement
  'botsort'    8-state (x, y, w, h, v...)   xywh measurement
  'strongsort' NSA: 'default' with measurement noise scaled by (1 - conf)
               (kalman_filter.py:607-646)

The reference runs scipy Cholesky per track per frame on the host
(kalman_filter.py:146-150,353-357). Here every op is batched over the whole
(T,)-slab in one fused XLA call: predict is a (T,8)x(8,8) matmul pair, the
update solves all T 4x4 systems with one batched Cholesky, and gating
distance is a batched triangular solve. float32 throughout (KF chains over
~1000 frames amplify bf16 drift).

The 7-state 'naive' filter is embedded in the same (T,8)/(T,8,8) slab: state
index 7 is inert (identity motion row, zero process noise, unit variance) so
a single slab dtype/shape serves every tracker.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# 0.95 chi-square quantiles, N=1..9 d.o.f. — Mahalanobis gate table
# (reference kalman_filter.py:11-20).
CHI2INV95 = (3.8415, 5.9915, 7.8147, 9.4877, 11.070, 12.592, 14.067, 15.507, 16.919)

STD_W_POS = 1.0 / 20
STD_W_VEL = 1.0 / 160


class KalmanSpec(NamedTuple):
    """Static description of one KF variant (shapes are always 8-padded)."""

    name: str
    ndim: int  # true state dim (7 or 8)
    nsa: bool  # NSA measurement-noise scaling by (1 - confidence)


SPECS = {
    "default": KalmanSpec("default", 8, False),
    "naive": KalmanSpec("naive", 7, False),
    "botsort": KalmanSpec("botsort", 8, False),
    "strongsort": KalmanSpec("strongsort", 8, True),
}


def motion_matrix(fmt: str) -> jnp.ndarray:
    """8x8 constant-velocity transition, padded with identity for 'naive'."""
    f = jnp.eye(8, dtype=jnp.float32)
    if fmt == "naive":
        # state (x, y, area, r, vx, vy, varea, <pad>): r has no velocity
        # (kalman_filter.py:32-34).
        f = f.at[0, 4].set(1.0).at[1, 5].set(1.0).at[2, 6].set(1.0)
    else:
        f = f + jnp.eye(8, k=4, dtype=jnp.float32)
    return f


def update_matrix() -> jnp.ndarray:
    """4x8 observation matrix: measurement = first 4 state dims."""
    return jnp.eye(4, 8, dtype=jnp.float32)


def _std_profile(fmt: str, mean: jnp.ndarray, *, initiate: bool) -> jnp.ndarray:
    """Per-track process/init std vector (..., 8), format-specific.

    Mirrors the reference std recipes (kalman_filter.py:54-62,76-84 naive;
    :211-219,242-252 default; :456-464,487-497 botsort).
    """
    pw = 2.0 * STD_W_POS if initiate else STD_W_POS
    vw = 10.0 * STD_W_VEL if initiate else STD_W_VEL
    z = jnp.zeros_like(mean[..., 0])
    one = jnp.ones_like(z)
    if fmt == "naive":
        # height proxy = sqrt(area * r); area = w*h, r = h/w -> sqrt = h
        h = jnp.sqrt(jnp.abs(mean[..., 2] * mean[..., 3]))
        # naive uses 10*std_weight_velocity in BOTH initiate and predict
        # (kalman_filter.py:59-61,81-83)
        vel_w = 10.0 * STD_W_VEL
        return jnp.stack(
            [pw * h, pw * h, pw * h, 1e-5 * one, vel_w * h, vel_w * h, vel_w * h, z],
            axis=-1,
        )
    if fmt == "botsort":
        w, h = mean[..., 2], mean[..., 3]
        return jnp.stack(
            [pw * w, pw * h, pw * w, pw * h, vw * w, vw * h, vw * w, vw * h],
            axis=-1,
        )
    # default / strongsort: xyah; position stds use h, a-dim fixed
    h = mean[..., 3]
    a_pos = 1e-2 * one
    a_vel = 1e-5 * one
    return jnp.stack(
        [pw * h, pw * h, a_pos, pw * h, vw * h, vw * h, a_vel, vw * h], axis=-1
    )


def _meas_std(fmt: str, mean: jnp.ndarray, confidence=None) -> jnp.ndarray:
    """Measurement noise std (..., 4) — the `project` R matrices
    (kalman_filter.py:131-136,277-282,522-527,617-626)."""
    one = jnp.ones_like(mean[..., 0])
    if fmt == "naive":
        h = jnp.sqrt(jnp.abs(mean[..., 2] * mean[..., 3]))
        std = jnp.stack(
            [STD_W_POS * h, STD_W_POS * h, 1e-1 * one, STD_W_POS * h], axis=-1
        )
    elif fmt == "botsort":
        w, h = mean[..., 2], mean[..., 3]
        std = jnp.stack(
            [STD_W_POS * w, STD_W_POS * h, STD_W_POS * w, STD_W_POS * h], axis=-1
        )
    else:
        h = mean[..., 3]
        std = jnp.stack(
            [STD_W_POS * h, STD_W_POS * h, 1e-1 * one, STD_W_POS * h], axis=-1
        )
    if confidence is not None:
        # NSA: larger confidence -> smaller measurement noise
        # (kalman_filter.py:624).
        std = std * (1.0 - confidence)[..., None]
    return std


def initiate(fmt: str, measurement: jnp.ndarray):
    """New-track state from a 4-d measurement. Returns (mean (...,8),
    cov (...,8,8)). Velocities start at 0 (kalman_filter.py:45-65,190-221)."""
    pad = jnp.zeros(measurement.shape[:-1] + (4,), measurement.dtype)
    mean = jnp.concatenate([measurement, pad], axis=-1)
    std = _std_profile(fmt, mean, initiate=True)
    if fmt == "naive":
        # keep the inert 8th dim at unit variance so full-cov ops stay SPD
        std = std.at[..., 7].set(1.0)
    cov = _diag_embed(jnp.square(std))
    return mean, cov


def predict(fmt: str, mean: jnp.ndarray, cov: jnp.ndarray):
    """Batched predict over a (T,8)/(T,8,8) slab (multi_predict,
    kalman_filter.py:92-121,289-329). One matmul pair, no per-track loop."""
    f = motion_matrix(fmt)
    q_std = _std_profile(fmt, mean, initiate=False)
    new_mean = mean @ f.T
    new_cov = jnp.einsum("ij,...jk,lk->...il", f, cov, f) + _diag_embed(
        jnp.square(q_std)
    )
    return new_mean, new_cov


def project(fmt: str, mean: jnp.ndarray, cov: jnp.ndarray, confidence=None):
    """State -> measurement space: (Hx, HPH' + R)."""
    h = update_matrix()
    r = _diag_embed(jnp.square(_meas_std(fmt, mean, confidence)))
    proj_mean = mean @ h.T
    proj_cov = jnp.einsum("ij,...jk,lk->...il", h, cov, h) + r
    return proj_mean, proj_cov


def _inv_sym2(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched symmetric PD 2x2 matrices."""
    a, b, d = m[..., 0, 0], m[..., 0, 1], m[..., 1, 1]
    det = a * d - b * b
    inv = jnp.stack(
        [jnp.stack([d, -b], -1), jnp.stack([-b, a], -1)], -2
    )
    return inv / det[..., None, None]


def _inv_sym4(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched symmetric PD 4x4 matrices via
    2x2 block Schur complement — pure VPU elementwise/matmul work.

    The batched Cholesky + cho_solve this replaces lowers to LAPACK-
    style custom calls that cost ~160 us/frame on the (128, 4, 4)
    innovation covariances inside the tracker scan (TPU v5e trace,
    tools/tpu_tracker_trace.py) — ~100x their arithmetic. KF innovation
    covariances are well-conditioned (R adds measurement variance to
    the diagonal), so the explicit form is numerically safe in f32;
    parity with the scipy-golden KF tests pins it.
    """
    A = m[..., :2, :2]
    B = m[..., :2, 2:]
    D = m[..., 2:, 2:]
    Ai = _inv_sym2(A)
    AiB = Ai @ B
    schur = D - jnp.swapaxes(B, -1, -2) @ AiB
    Si = _inv_sym2(schur)
    AiBSi = AiB @ Si
    top_left = Ai + AiBSi @ jnp.swapaxes(AiB, -1, -2)
    bottom_left = -jnp.swapaxes(AiBSi, -1, -2)
    return jnp.concatenate(
        [
            jnp.concatenate([top_left, -AiBSi], -1),
            jnp.concatenate([bottom_left, Si], -1),
        ],
        -2,
    )


def update(fmt: str, mean: jnp.ndarray, cov: jnp.ndarray,
           measurement: jnp.ndarray, confidence=None):
    """Batched correction step (kalman_filter.py:331-363).

    Solves all 4x4 innovation systems in closed form (block-Schur
    inverse, _inv_sym4); non-4d measurement formats fall back to one
    batched Cholesky. `confidence` feeds the NSA variant only.
    """
    conf = confidence if SPECS[fmt].nsa else None
    proj_mean, proj_cov = project(fmt, mean, cov, conf)
    hm = update_matrix()
    pht = cov @ hm.T  # (..., 8, 4)
    if proj_cov.shape[-1] == 4:
        gain = pht @ _inv_sym4(proj_cov)  # K = P H' S^-1
    else:
        chol = jnp.linalg.cholesky(proj_cov)
        # K = P H' S^-1  via S K' = (P H')'
        gain_t = jax.scipy.linalg.cho_solve(
            (chol, True), jnp.swapaxes(pht, -1, -2))
        gain = jnp.swapaxes(gain_t, -1, -2)  # (..., 8, 4)
    innovation = measurement - proj_mean
    new_mean = mean + jnp.einsum("...ij,...j->...i", gain, innovation)
    new_cov = cov - gain @ proj_cov @ jnp.swapaxes(gain, -1, -2)
    return new_mean, new_cov


def gating_distance(fmt: str, mean: jnp.ndarray, cov: jnp.ndarray,
                    measurements: jnp.ndarray, only_position: bool = False):
    """Squared Mahalanobis distance track->measurements
    (kalman_filter.py:365-411), batched: mean (T,8), cov (T,8,8),
    measurements (D,4) -> (T,D)."""
    proj_mean, proj_cov = project(fmt, mean, cov)
    if only_position:
        proj_mean = proj_mean[..., :2]
        proj_cov = proj_cov[..., :2, :2]
        measurements = measurements[..., :2]
    d = measurements[None, :, :] - proj_mean[:, None, :]  # (T,D,k)
    chol = jnp.linalg.cholesky(proj_cov)  # (T,k,k)
    z = jax.lax.linalg.triangular_solve(
        chol, jnp.swapaxes(d, -1, -2), left_side=True, lower=True
    )  # (T,k,D)
    return jnp.sum(z * z, axis=-2)


def zero_stale_velocity(fmt: str, mean: jnp.ndarray, tracked: jnp.ndarray):
    """Reference quirk: before multi_predict, tracks not in Tracked state get
    the *last* element of their true state vector zeroed
    (basetrack.py:263-265) — vh (index 7) for the 8-state formats, varea
    (index 6) for the 7-state 'naive' format."""
    idx = 6 if fmt == "naive" else 7
    return mean.at[..., idx].set(jnp.where(tracked, mean[..., idx], 0.0))


def _diag_embed(d: jnp.ndarray) -> jnp.ndarray:
    """(..., k) -> (..., k, k) diagonal matrices."""
    k = d.shape[-1]
    return d[..., :, None] * jnp.eye(k, dtype=d.dtype)


def measurement_from_tlwh(fmt: str, tlwh: jnp.ndarray) -> jnp.ndarray:
    """Format-specific measurement conversion (basetrack.py:227-234)."""
    from . import boxes

    if fmt in ("default", "strongsort"):
        return boxes.tlwh_to_xyah(tlwh)
    if fmt == "naive":
        return boxes.tlwh_to_xyar(tlwh)
    if fmt == "botsort":
        return boxes.tlwh_to_xywh(tlwh)
    raise ValueError(fmt)


def tlwh_from_mean(fmt: str, mean: jnp.ndarray) -> jnp.ndarray:
    """Current box estimate from the KF mean (STrack.tlwh,
    basetrack.py:183-211) — including the reference's center-anchored
    'naive' output (see boxes.xyar_to_cxcywh docstring)."""
    from . import boxes

    if fmt in ("default", "strongsort"):
        return boxes.xyah_to_tlwh(mean[..., :4])
    if fmt == "naive":
        return boxes.xyar_to_cxcywh(mean[..., :4])  # parity: NOT shifted
    if fmt == "botsort":
        xywh = mean[..., :4]
        xy = xywh[..., :2] - xywh[..., 2:] / 2.0  # true halves here (:205-209)
        return jnp.concatenate([xy, xywh[..., 2:]], axis=-1)
    raise ValueError(fmt)
