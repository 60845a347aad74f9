"""Box format conversions and pairwise IoU families, batched for TPU.

Formats (all float32, last axis = 4):
  tlwh : top-left x, top-left y, width, height
  tlbr : top-left x, top-left y, bottom-right x, bottom-right y
  xyah : center x, center y, aspect a = w/h, height          (DeepSORT KF)
  xyar : center x, center y, area = w*h, ratio r = h/w       (SORT naive KF)
  xywh : center x, center y, width, height                   (BoT-SORT KF)

Semantics mirror the reference converters (tracker/basetrack.py:110-181),
including its floor-division quirk in tlwh<->xywh (``result[:2] +=
result[2:] // 2``) and the max(0, .) clamp in xywh2tlbr — these feed the
association costs, so parity matters. Everything is shape-polymorphic over
leading axes and jit-friendly (no data-dependent control flow).

Pairwise IoU replaces cython_bbox.bbox_overlaps (tracker/matching.py:44-61):
one fused vectorized op over (N,4)x(M,4) -> (N,M) slabs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------

def tlbr_to_tlwh(tlbr):
    xy = tlbr[..., :2]
    wh = tlbr[..., 2:] - tlbr[..., :2]
    return jnp.concatenate([xy, wh], axis=-1)


def tlwh_to_tlbr(tlwh):
    xy = tlwh[..., :2]
    br = tlwh[..., :2] + tlwh[..., 2:]
    return jnp.concatenate([xy, br], axis=-1)


def tlwh_to_xyah(tlwh):
    """tlwh -> (xc, yc, w/h, h). Reference: basetrack.py:121-129."""
    cxy = tlwh[..., :2] + tlwh[..., 2:] / 2.0
    a = tlwh[..., 2:3] / tlwh[..., 3:4]
    h = tlwh[..., 3:4]
    return jnp.concatenate([cxy, a, h], axis=-1)


def xyah_to_tlwh(xyah):
    """(xc, yc, a, h) -> tlwh. Inverse used by STrack.tlwh (basetrack.py:192-197)."""
    h = xyah[..., 3:4]
    w = xyah[..., 2:3] * h
    xy = xyah[..., :2] - jnp.concatenate([w, h], axis=-1) / 2.0
    return jnp.concatenate([xy, w, h], axis=-1)


def tlwh_to_xyar(tlwh):
    """tlwh -> (xc, yc, area, h/w) for the naive SORT KF (basetrack.py:131-141)."""
    cxy = tlwh[..., :2] + tlwh[..., 2:] / 2.0
    area = tlwh[..., 2:3] * tlwh[..., 3:4]
    r = tlwh[..., 3:4] / tlwh[..., 2:3]
    return jnp.concatenate([cxy, area, r], axis=-1)


def xyar_to_cxcywh(xyar):
    """(xc, yc, area, r=h/w) -> (xc, yc, w, h).

    NOTE reference parity: STrack.tlwh for kalman_format='naive'
    (basetrack.py:199-204) recovers (w, h) from (area, r) but *does not*
    shift the center to top-left — SORT track boxes in the reference are
    center-anchored while detections are corner-anchored. We expose the
    honest center form here; the tracker layer reproduces the reference
    behavior explicitly where parity requires it.
    """
    h = jnp.sqrt(xyar[..., 2:3] * xyar[..., 3:4])
    w = xyar[..., 2:3] / h
    return jnp.concatenate([xyar[..., :2], w, h], axis=-1)


def tlwh_to_xywh(tlwh):
    """tlwh -> (xc, yc, w, h) with the reference's floor-div quirk
    (basetrack.py:143-150: ``result[:2] += result[2:] // 2``)."""
    cxy = tlwh[..., :2] + jnp.floor(tlwh[..., 2:] / 2.0)
    return jnp.concatenate([cxy, tlwh[..., 2:]], axis=-1)


def xywh_to_tlwh(xywh):
    """(xc, yc, w, h) -> tlwh, floor-div parity (basetrack.py:169-181)."""
    xy = xywh[..., :2] - jnp.floor(xywh[..., 2:] / 2.0)
    return jnp.concatenate([xy, xywh[..., 2:]], axis=-1)


def xywh_to_tlbr(xywh):
    """(xc, yc, w, h) -> tlbr, clamped at 0 (basetrack.py:152-167)."""
    tl = xywh[..., :2] - jnp.floor(xywh[..., 2:] / 2.0)
    br = tl + xywh[..., 2:]
    return jnp.maximum(jnp.concatenate([tl, br], axis=-1), 0.0)


def xywh_to_xyxy(xywh):
    """Plain center-size -> corner (no floor, no clamp); detector NMS path
    (utils/general.py:301-309 xywh2xyxy)."""
    tl = xywh[..., :2] - xywh[..., 2:] / 2.0
    br = xywh[..., :2] + xywh[..., 2:] / 2.0
    return jnp.concatenate([tl, br], axis=-1)


# ---------------------------------------------------------------------------
# pairwise IoU
# ---------------------------------------------------------------------------

def iou_matrix(a_tlbr, b_tlbr):
    """Pairwise IoU of (N,4) x (M,4) tlbr boxes -> (N,M) float32.

    Matches cython_bbox.bbox_overlaps semantics (the +1 pixel convention):
    overlap uses ``min(br) - max(tl) + 1`` and areas ``(br - tl + 1)^2``-style
    terms, as the reference association costs do (tracker/matching.py:44-61).
    """
    a = a_tlbr[..., :, None, :]
    b = b_tlbr[..., None, :, :]
    iw = jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]) + 1.0
    ih = jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]) + 1.0
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    area_a = (a[..., 2] - a[..., 0] + 1.0) * (a[..., 3] - a[..., 1] + 1.0)
    area_b = (b[..., 2] - b[..., 0] + 1.0) * (b[..., 3] - b[..., 1] + 1.0)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def iou_matrix_xyxy(a, b, eps: float = 1e-7):
    """Pairwise IoU without the +1 convention (detector-side box_iou,
    utils/general.py:343-360)."""
    a_ = a[..., :, None, :]
    b_ = b[..., None, :, :]
    iw = jnp.maximum(
        jnp.minimum(a_[..., 2], b_[..., 2]) - jnp.maximum(a_[..., 0], b_[..., 0]), 0.0
    )
    ih = jnp.maximum(
        jnp.minimum(a_[..., 3], b_[..., 3]) - jnp.maximum(a_[..., 1], b_[..., 1]), 0.0
    )
    inter = iw * ih
    area_a = (a_[..., 2] - a_[..., 0]) * (a_[..., 3] - a_[..., 1])
    area_b = (b_[..., 2] - b_[..., 0]) * (b_[..., 3] - b_[..., 1])
    return inter / (area_a + area_b - inter + eps)


def iou_distance(a_tlbr, b_tlbr):
    """1 - IoU cost matrix (tracker/matching.py:64-82)."""
    return 1.0 - iou_matrix(a_tlbr, b_tlbr)


def buffered_tlwh(tlwh, scale: float):
    """Expand a tlwh box by ``scale`` on each side, keeping the center —
    C-BIoU buffered boxes (tracker/c_biou_tracker.py:48-62):
    [x - b*w, y - b*h, (1+2b)*w, (1+2b)*h]."""
    xy = tlwh[..., :2] - scale * tlwh[..., 2:]
    wh = (1.0 + 2.0 * scale) * tlwh[..., 2:]
    return jnp.concatenate([xy, wh], axis=-1)


# ---------------------------------------------------------------------------
# generalized IoU family (training losses; utils/general.py:343-605 bbox_iou)
# ---------------------------------------------------------------------------

def bbox_iou(box1, box2, *, xywh: bool = True, giou: bool = False,
             diou: bool = False, ciou: bool = False, eps: float = 1e-7):
    """Elementwise IoU/GIoU/DIoU/CIoU between broadcast-compatible boxes.

    Mirrors utils/general.py ``bbox_iou`` math (used by the CIoU box loss,
    utils/loss.py:598) but vectorized over arbitrary batch shapes.
    """
    if xywh:
        b1 = xywh_to_xyxy(box1)
        b2 = xywh_to_xyxy(box2)
    else:
        b1, b2 = box1, box2
    iw = jnp.maximum(
        jnp.minimum(b1[..., 2], b2[..., 2]) - jnp.maximum(b1[..., 0], b2[..., 0]), 0.0
    )
    ih = jnp.maximum(
        jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1]), 0.0
    )
    inter = iw * ih
    w1, h1 = b1[..., 2] - b1[..., 0], b1[..., 3] - b1[..., 1]
    w2, h2 = b2[..., 2] - b2[..., 0], b2[..., 3] - b2[..., 1]
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (giou or diou or ciou):
        return iou
    cw = jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0])
    ch = jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1])
    if giou:
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = (
        (b2[..., 0] + b2[..., 2] - b1[..., 0] - b1[..., 2]) ** 2
        + (b2[..., 1] + b2[..., 3] - b1[..., 1] - b1[..., 3]) ** 2
    ) / 4.0
    if diou:
        return iou - rho2 / c2
    # CIoU
    v = (4.0 / jnp.pi ** 2) * (
        jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))
    ) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1.0 + eps)))
    return iou - (rho2 / c2 + v * alpha)
