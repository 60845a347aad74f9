"""Global (camera) motion compensation — BoT-SORT/StrongSORT GMC
(reference tracker/botsort.py:13-269).

Three estimators produce a 2x3 affine warp per frame:

- 'orb'  : host OpenCV FAST+ORB keypoints, BFMatcher with the reference's
           spatial+ratio filtering, RANSAC estimateAffinePartial2D
           (botsort.py:111-235);
- 'ecc'  : device Gauss-Newton maximization of the ECC objective on
           downscaled grayscale pairs — a jitted lax.fori_loop replacing
           cv2.findTransformECC (botsort.py:78-109); falls back to
           identity on failure like the reference (:104-107);
- 'none' : identity.

The warp is applied to Kalman states by trackers.appearance.apply_gmc
(multi_gmc, botsort.py:250-269).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

IDENTITY = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)


class GMC:
    def __init__(self, method: str = "orb", downscale: int = 2):
        self.method = method
        self.downscale = max(1, int(downscale))
        self.prev_gray = None
        self.prev_kp = None
        self.prev_desc = None

    def get_state(self) -> dict:
        """Previous-frame state as plain numpy arrays — serializable
        alongside the track slab so a checkpointed stream resumes with
        the same prev->curr warp an uninterrupted run would compute."""
        st = {}
        if self.prev_gray is not None:
            st["gray"] = np.asarray(self.prev_gray)
        if self.prev_kp is not None and len(self.prev_kp):
            st["kp"] = np.asarray(self.prev_kp, np.float32)
        if self.prev_desc is not None:
            st["desc"] = np.asarray(self.prev_desc)
        return st

    def set_state(self, st: dict) -> None:
        self.prev_gray = st.get("gray")
        self.prev_kp = st.get("kp")
        self.prev_desc = st.get("desc")

    def apply(self, frame: np.ndarray) -> np.ndarray:
        """frame: HWC uint8 BGR -> 2x3 affine warp prev->curr."""
        if self.method == "none":
            return IDENTITY.copy()
        import cv2

        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            gray = cv2.resize(
                gray, (gray.shape[1] // self.downscale,
                       gray.shape[0] // self.downscale)
            )
        if self.method == "ecc":
            warp = self._ecc_device(gray)
        else:
            warp = self._orb(gray)
        return warp

    # -- ORB (host) ----------------------------------------------------

    def _orb(self, gray) -> np.ndarray:
        import cv2

        detector = cv2.FastFeatureDetector_create(threshold=20)
        extractor = cv2.ORB_create()
        kp = detector.detect(gray, None)
        kp, desc = extractor.compute(gray, kp)
        warp = IDENTITY.copy()
        if self.prev_desc is not None and desc is not None and len(kp) >= 4:
            matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
            knn = matcher.knnMatch(self.prev_desc, desc, 2)
            good_prev, good_curr = [], []
            # spatial + ratio filtering (botsort.py:150-210 flavor)
            w = gray.shape[1]
            for pair in knn:
                if len(pair) != 2:
                    continue
                m, n = pair
                if m.distance < 0.9 * n.distance:
                    p = tuple(self.prev_kp[m.queryIdx])
                    c = kp[m.trainIdx].pt
                    if abs(p[0] - c[0]) < 0.25 * w:
                        good_prev.append(p)
                        good_curr.append(c)
            if len(good_prev) >= 4:
                h, _ = cv2.estimateAffinePartial2D(
                    np.asarray(good_prev), np.asarray(good_curr),
                    method=cv2.RANSAC,
                )
                if h is not None:
                    warp = h.astype(np.float32)
                    warp[:, 2] *= self.downscale
        # keypoints kept as a plain (N,2) array (only .pt is ever used on
        # the prev side) so get_state() round-trips through npz
        self.prev_kp = np.float32([k.pt for k in kp]) if kp else None
        self.prev_desc = desc
        self.prev_gray = gray
        return warp

    # -- ECC (device) ---------------------------------------------------

    def _ecc_device(self, gray) -> np.ndarray:
        if self.prev_gray is None or self.prev_gray.shape != gray.shape:
            self.prev_gray = gray
            return IDENTITY.copy()
        h, w = gray.shape
        # pad to a static bucket so one compiled solver serves a sequence
        params = ecc_affine(
            jnp.asarray(self.prev_gray, jnp.float32),
            jnp.asarray(gray, jnp.float32),
        )
        self.prev_gray = gray
        # np.array (copy): asarray on a jax buffer is a read-only view
        warp = np.array(params, np.float32).reshape(2, 3)
        warp[:, 2] *= self.downscale
        if not np.isfinite(warp).all():
            return IDENTITY.copy()
        return warp


@functools.partial(jax.jit, static_argnames=("iters",))
def ecc_affine(ref: jnp.ndarray, cur: jnp.ndarray, iters: int = 50):
    """ECC alignment ref->cur fully on device — replaces
    cv2.findTransformECC (botsort.py:98-103, MOTION_EUCLIDEAN).

    Forward-additive ECC iteration (Evangelidis & Psarakis, PAMI 2008)
    over a 4-parameter similarity warp [1+a, -b, tx; b, 1+a, ty]: per
    step, bilinear-resample the current image and its gradients at the
    warped grid, build the N x 4 steepest-descent matrix G, and apply
    the ECC update dp = H^-1 G^T (lambda * t - w) with the paper's
    correlation-optimal lambda — golden-tested against cv2's
    implementation on rotation+scale+translation warps (tests/test_gmc).
    """
    hgt, wid = ref.shape
    ys = jnp.arange(hgt, dtype=jnp.float32)
    xs = jnp.arange(wid, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)

    # gradient images of cur (central differences)
    cx = (jnp.roll(cur, -1, 1) - jnp.roll(cur, 1, 1)) * 0.5
    cy = (jnp.roll(cur, -1, 0) - jnp.roll(cur, 1, 0)) * 0.5

    def sample(img, x, y):
        x = jnp.clip(x, 0.0, wid - 1.001)
        y = jnp.clip(y, 0.0, hgt - 1.001)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - x0
        fy = y - y0
        v00 = img[y0, x0]
        v01 = img[y0, x0 + 1]
        v10 = img[y0 + 1, x0]
        v11 = img[y0 + 1, x0 + 1]
        return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
                + (v10 * (1 - fx) + v11 * fx) * fy)

    eye4 = jnp.eye(4)

    def body(i, p):
        a, b, tx, ty = p
        x = (1 + a) * gx - b * gy + tx
        y = b * gx + (1 + a) * gy + ty
        w = sample(cur, x, y)
        ix = sample(cx, x, y)
        iy = sample(cy, x, y)
        inb = ((x >= 1.0) & (x <= wid - 2.0)
               & (y >= 1.0) & (y <= hgt - 2.0))
        m = inb.astype(jnp.float32)
        n = m.sum() + 1e-6
        wz = (w - (w * m).sum() / n) * m
        tz = (ref - (ref * m).sum() / n) * m
        # steepest-descent images for p = (a, b, tx, ty)
        g1 = (ix * gx + iy * gy) * m
        g2 = (-ix * gy + iy * gx) * m
        g3 = ix * m
        g4 = iy * m
        G = jnp.stack(
            [g1.ravel(), g2.ravel(), g3.ravel(), g4.ravel()], axis=-1
        )
        wf, tf = wz.ravel(), tz.ravel()
        H = G.T @ G + 1e-6 * eye4
        Gw = G.T @ wf
        Gt = G.T @ tf
        HiGw = jnp.linalg.solve(H, Gw)
        num = wf @ wf - Gw @ HiGw
        den = tf @ wf - Gt @ HiGw
        lam = num / jnp.where(jnp.abs(den) < 1e-6, 1e-6, den)
        err = lam * tf - wf
        dp = jnp.linalg.solve(H, G.T @ err)
        # guard: a diverging step (e.g. textureless frame) is clamped
        dp = jnp.clip(dp, -10.0, 10.0)
        return p + dp

    p = jax.lax.fori_loop(0, iters, body, jnp.zeros(4))
    a, b, tx, ty = p
    return jnp.array([1 + a, -b, tx, b, 1 + a, ty])
