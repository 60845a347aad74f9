"""SimOTA detection loss (ComputeLossOTA, utils/loss.py:556-846) in
fully-batched masked form.

The reference loops per image, builds dynamic candidate lists
(find_3_positive, :795-846), and runs per-GT topk python loops. Here the
candidate set is a *static* (T, nl, na, 5-offsets) grid per image with a
validity mask, so the whole assignment compiles:

  1. candidate grid + anchor-ratio filter (max(r, 1/r) < anchor_t) and
     neighbor-offset conditions (:817-833);
  2. pairwise GT x candidate IoU and the OTA cost
     ``cls_bce(sqrt(sig_cls * sig_obj)) + 3 * (-log iou)`` (:710-742);
  3. dynamic-k from the sum of the top-10 IoUs (:717-718), per-GT
     lowest-cost selection via rank-vs-k masking (:747-751), conflict
     resolution keeping the min-cost GT per candidate (:753-757);
  4. per-layer losses: CIoU box loss, IoU-weighted obj BCE with
     per-layer balance [4.0, 1.0, 0.4] ([.., 0.25, 0.06] for 4 levels),
     label-smoothed cls BCE, hyp-weighted sum scaled by batch (:583-636).

Deviation noted: when two matched candidates land on the same obj cell
the reference's last-write-wins scatter is replaced by a max-scatter
(order under jit is unspecified); the value difference is sub-1e-3 on
real data.

Everything vmaps over the batch; no data-dependent shapes anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.spec import ModelSpec
from ..ops.boxes import bbox_iou, iou_matrix_xyxy, xywh_to_xyxy


@dataclasses.dataclass(frozen=True)
class Hyp:
    """Loss hyperparameters (data/hyp.scratch.* defaults)."""

    box: float = 0.05
    cls: float = 0.3
    obj: float = 0.7
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    label_smoothing: float = 0.0
    aux_weight: float = 0.25  # ComputeLossAuxOTA aux-head scale
    loss_ota: int = 1         # 1 = SimOTA assignment, 0 = plain ComputeLoss
                              # (train.py:295 reads hyp['loss_ota'])


OFFSETS = jnp.array(
    [[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], jnp.float32
) * 0.5


def _bce(logits, targets, pos_weight=1.0):
    """BCE-with-logits, elementwise."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def smooth_bce(eps: float):
    return 1.0 - 0.5 * eps, 0.5 * eps


def focal_bce(logits, targets, gamma: float, alpha: float = 0.25,
              pos_weight: float = 1.0):
    """FocalLoss wrapper around BCE-with-logits (utils/loss.py:121-146):
    loss *= alpha_factor * (1 - p_t)^gamma with mean reduction."""
    loss = _bce(logits, targets, pos_weight)
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_f * (1.0 - p_t) ** gamma


def bce_blur(logits, targets, alpha: float = 0.05):
    """BCEBlurWithLogitsLoss (utils/loss.py:16-30): down-weights
    confident predictions on zero targets (missing-label noise); mean
    reduction."""
    loss = _bce(logits, targets)
    dx = jax.nn.sigmoid(logits) - targets
    alpha_factor = 1.0 - jnp.exp((dx - 1.0) / (alpha + 1e-4))
    return (loss * alpha_factor).mean()


def qfocal_bce(logits, targets, gamma: float, alpha: float = 0.25,
               pos_weight: float = 1.0):
    """Quality focal loss (utils/loss.py:149-173): modulates by
    |targets - sigmoid|^gamma."""
    loss = _bce(logits, targets, pos_weight)
    p = jax.nn.sigmoid(logits)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_f * jnp.abs(targets - p) ** gamma


def _balance(nl: int) -> Tuple[float, ...]:
    return (4.0, 1.0, 0.4) if nl == 3 else (4.0, 1.0, 0.25, 0.06, 0.02)[:nl]


def _candidate_grid(layer_meta, strides, anchors_px, txywh, tmask, hyp,
                    g: float = 0.5):
    """Static (T, nl, na, n_off) candidate grid: anchor-ratio filter
    (max(r, 1/r) < anchor_t) + neighbor-offset conditions — the
    build_targets/find_3_positive machinery (utils/loss.py:504-556,
    :795-846) as one masked tensor. Returns (gi, gj, valid, flat_idx)."""
    t_cap = txywh.shape[0]
    nl = len(layer_meta)
    na = anchors_px.shape[1]
    n_off = OFFSETS.shape[0]
    gj = jnp.zeros((t_cap, nl, na, n_off), jnp.int32)
    gi = jnp.zeros((t_cap, nl, na, n_off), jnp.int32)
    valid = jnp.zeros((t_cap, nl, na, n_off), bool)
    flat_idx = jnp.zeros((t_cap, nl, na, n_off), jnp.int32)
    for li, (ny, nx, base) in enumerate(layer_meta):
        s = float(strides[li])
        gxy = txywh[:, :2] / s                        # (T, 2) grid coords
        gwh = txywh[:, 2:] / s
        anchors_grid = anchors_px[li] / s             # (na, 2)
        r = gwh[:, None, :] / anchors_grid[None, :, :]
        anchor_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < hyp.anchor_t
        gxi = jnp.array([nx, ny], jnp.float32) - gxy  # inverse coords
        j = (gxy[:, 0] % 1.0 < g) & (gxy[:, 0] > 1.0)
        k = (gxy[:, 1] % 1.0 < g) & (gxy[:, 1] > 1.0)
        l = (gxi[:, 0] % 1.0 < g) & (gxi[:, 0] > 1.0)
        m = (gxi[:, 1] % 1.0 < g) & (gxi[:, 1] > 1.0)
        off_ok = jnp.stack([jnp.ones_like(j), j, k, l, m], axis=-1)  # (T,5)
        offsets = OFFSETS * (g / 0.5)
        gij = jnp.floor(gxy[:, None, :] - offsets[None, :, :]).astype(jnp.int32)
        gi_l = jnp.clip(gij[:, :, 0], 0, nx - 1)      # (T, n_off)
        gj_l = jnp.clip(gij[:, :, 1], 0, ny - 1)
        v = tmask[:, None, None] & anchor_ok[:, :, None] & off_ok[:, None, :]
        gj = gj.at[:, li].set(jnp.broadcast_to(gj_l[:, None, :], (t_cap, na, n_off)))
        gi = gi.at[:, li].set(jnp.broadcast_to(gi_l[:, None, :], (t_cap, na, n_off)))
        valid = valid.at[:, li].set(v)
        a_ids = jnp.arange(na, dtype=jnp.int32)[None, :, None]
        fl = base + (gj_l[:, None, :] * nx + gi_l[:, None, :]) * na + a_ids
        flat_idx = flat_idx.at[:, li].set(fl)
    return gi, gj, valid, flat_idx


def simota_assign(
    preds_flat: jnp.ndarray,      # (C_total, no) all-layer flattened preds
    layer_meta,                   # static: list of (ny, nx, base) per layer
    strides: Sequence[int],
    anchors_px: jnp.ndarray,      # (nl, na, 2) pixels (anchor * stride)
    targets: jnp.ndarray,         # (T, 5) [cls, x, y, w, h] normalized
    tmask: jnp.ndarray,           # (T,) bool
    img_size: int,
    nc: int,
    hyp: Hyp,
    topk: int = 10,
    g: float = 0.5,
    bin_wh: bool = False,
):
    """Per-image SimOTA. Returns per-candidate-slot assignment arrays of
    shape (T, nl, na, 5): matched mask, flat pred index, plus per-slot
    layer/grid metadata for the loss.

    bin_wh=True decodes candidate w/h through the SigmoidBin head layout
    (ComputeLossBinOTA build_targets, utils/loss.py:1017-1024) with
    obj/cls at the shifted indices."""
    t_cap = targets.shape[0]
    nl = len(layer_meta)
    na = anchors_px.shape[1]
    n_off = OFFSETS.shape[0]

    txywh = targets[:, 1:5] * img_size  # pixels
    tcls = targets[:, 0].astype(jnp.int32)

    gi, gj, valid, flat_idx = _candidate_grid(
        layer_meta, strides, anchors_px, txywh, tmask, hyp, g
    )

    c = t_cap * nl * na * n_off
    valid_f = valid.reshape(c)
    flat_f = flat_idx.reshape(c)
    fg = preds_flat[flat_f]                           # (C, no)

    # decoded candidate boxes in pixels
    stride_per_slot = jnp.broadcast_to(
        jnp.asarray(strides, jnp.float32)[None, :, None, None],
        (t_cap, nl, na, n_off),
    ).reshape(c)
    anch_per_slot = jnp.broadcast_to(
        anchors_px[None, :, :, None, :], (t_cap, nl, na, n_off, 2)
    ).reshape(c, 2)
    grid_per_slot = jnp.stack([gi.reshape(c), gj.reshape(c)], axis=-1)
    pxy = (jax.nn.sigmoid(fg[:, :2]) * 2.0 - 0.5 + grid_per_slot) * stride_per_slot[:, None]
    if bin_wh:
        from ..models.ibin import BIN_MAX, BIN_MIN, sigmoid_bin_decode
        from ..models.spec import BIN_COUNT

        L = BIN_COUNT + 1
        pw = jnp.clip(
            sigmoid_bin_decode(jax.nn.sigmoid(fg[:, 2:2 + L])),
            BIN_MIN, BIN_MAX,
        )
        ph = jnp.clip(
            sigmoid_bin_decode(jax.nn.sigmoid(fg[:, 2 + L:2 + 2 * L])),
            BIN_MIN, BIN_MAX,
        )
        pwh = jnp.stack([pw, ph], axis=-1) * anch_per_slot
        obj_idx = 2 + 2 * L
    else:
        pwh = (jax.nn.sigmoid(fg[:, 2:4]) * 2.0) ** 2 * anch_per_slot
        obj_idx = 4
    pxyxy = xywh_to_xyxy(jnp.concatenate([pxy, pwh], axis=-1))

    txyxy = xywh_to_xyxy(txywh)                       # (T, 4)
    pair_iou = iou_matrix_xyxy(txyxy, pxyxy)          # (T, C)
    pair_iou = jnp.where(valid_f[None, :] & tmask[:, None], pair_iou, 0.0)
    iou_loss = -jnp.log(pair_iou + 1e-8)

    topv = jax.lax.top_k(pair_iou, min(topk, c))[0]
    dynamic_k = jnp.maximum(jnp.sum(topv, axis=1).astype(jnp.int32), 1)

    obj_sig = jax.nn.sigmoid(fg[:, obj_idx])
    cls_sig = jax.nn.sigmoid(fg[:, obj_idx + 1:])
    y = jnp.sqrt(jnp.clip(cls_sig[None] * obj_sig[None, :, None], 1e-8, 1 - 1e-8))
    onehot = jax.nn.one_hot(tcls, nc)                 # (T, nc)
    cls_cost = -(
        onehot[:, None, :] * jnp.log(y)
        + (1.0 - onehot[:, None, :]) * jnp.log(1.0 - y)
    ).sum(-1)                                         # (T, C)

    big = 1e9
    cost = cls_cost + 3.0 * iou_loss
    cost = jnp.where(valid_f[None, :] & tmask[:, None], cost, big)

    # per-GT lowest-cost k selection via rank masks
    order = jnp.argsort(cost, axis=1)
    ranks = jnp.argsort(order, axis=1)                # rank of each cand
    selected = (ranks < dynamic_k[:, None]) & (cost < big / 2)

    # conflict resolution: candidate claimed by >1 GT -> min-cost GT wins
    claim = jnp.sum(selected, axis=0)
    best_gt = jnp.argmin(cost, axis=0)
    conflict = claim > 1
    sel = jnp.where(
        conflict[None, :],
        jax.nn.one_hot(best_gt, t_cap, axis=0, dtype=bool),
        selected,
    )
    matched = jnp.any(sel, axis=0)                    # (C,)
    matched_gt = jnp.argmax(sel, axis=0)              # (C,)

    return {
        "matched": matched.reshape(t_cap, nl, na, n_off),
        "matched_gt": matched_gt.reshape(t_cap, nl, na, n_off),
        "gi": gi,
        "gj": gj,
    }


def _flatten_preds(preds: List[jnp.ndarray]):
    """Per-layer (B, ny, nx, na, no) -> (B, C_total, no) + static meta."""
    metas = []
    base = 0
    flat = []
    for p in preds:
        b, ny, nx, na, no = p.shape
        metas.append((ny, nx, base))
        base += ny * nx * na
        flat.append(p.reshape(b, ny * nx * na, no))
    return jnp.concatenate(flat, axis=1), metas


def compute_loss_ota(
    preds: List[jnp.ndarray],    # nl x (B, ny, nx, na, no) raw heads
    targets: jnp.ndarray,        # (B, T, 5) [cls, x, y, w, h] normalized
    tmask: jnp.ndarray,          # (B, T)
    spec: ModelSpec,
    img_size: int,
    hyp: Hyp = Hyp(),
):
    """Total loss * batch_size and (box, obj, cls, total) components, as
    the reference returns (utils/loss.py:633-636)."""
    nl, na, nc, no = spec.nl, spec.na, spec.nc, spec.no
    anchors_px = jnp.asarray(spec.anchors_per_level())
    strides = spec.strides
    bsz = preds[0].shape[0]
    preds_flat, metas = _flatten_preds(preds)

    assign = jax.vmap(
        lambda pf, t, m: simota_assign(
            pf, metas, strides, anchors_px, t, m, img_size, nc, hyp
        )
    )(preds_flat, targets, tmask)

    cp, cn = smooth_bce(hyp.label_smoothing)
    lbox = 0.0
    lobj = 0.0
    lcls = 0.0
    balance = _balance(nl)
    for li, p in enumerate(preds):
        lbox_i, obj_i, lcls_i = _layer_loss_terms(
            p, li, assign, targets, spec, img_size, hyp, cp, cn
        )
        lbox = lbox + lbox_i
        lobj = lobj + obj_i * balance[li]
        lcls = lcls + lcls_i

    lbox = lbox * hyp.box
    lobj = lobj * hyp.obj
    lcls = lcls * hyp.cls
    total = lbox + lobj + lcls
    return total * bsz, {
        "box": lbox, "obj": lobj, "cls": lcls, "loss": total,
    }


def _layer_loss_terms(p, li, assign, targets, spec, img_size, hyp, cp, cn,
                      gr: float = 1.0):
    """Per-layer (box, obj-BCE-mean, cls) terms for one head tensor.
    gr blends the obj target: (1-gr) + gr*iou (model.gr, loss.py:476)."""
    nl, na, nc, no = spec.nl, spec.na, spec.nc, spec.no
    anchors_px = jnp.asarray(spec.anchors_per_level())
    strides = spec.strides
    if True:
        b, ny, nx, _, _ = p.shape
        m = assign["matched"][:, :, li]              # (B, T, na, n_off)
        mgt = assign["matched_gt"][:, :, li]
        gi = assign["gi"][:, :, li]
        gj = assign["gj"][:, :, li]
        anchors_grid = anchors_px[li] / float(strides[li])  # (na, 2)
        a_ids = jnp.arange(na, dtype=jnp.int32)[None, None, :, None]
        flat_cell = (gj * nx + gi) * na + a_ids      # (B, T, na, n_off)

        # gather matched predictions: (B, T, na, n_off, no)
        ps = jnp.take_along_axis(
            p.reshape(b, -1, no),
            flat_cell.reshape(b, -1)[..., None],
            axis=1,
        ).reshape(m.shape + (no,))

        # target boxes in this layer's grid units
        t_xywh = jnp.take_along_axis(
            targets[:, :, 1:5], mgt.reshape(b, -1)[..., None], axis=1
        ).reshape(m.shape + (4,))
        t_grid = t_xywh * img_size / float(strides[li])
        grid = jnp.stack([gi, gj], axis=-1).astype(jnp.float32)
        t_box = jnp.concatenate(
            [t_grid[..., :2] - grid, t_grid[..., 2:]], axis=-1
        )

        pxy = jax.nn.sigmoid(ps[..., :2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 * anchors_grid[
            None, None, :, None, :
        ]
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        iou = bbox_iou(pbox, t_box, xywh=True, ciou=True)
        n_m = jnp.maximum(jnp.sum(m), 1)
        lbox_i = jnp.sum(jnp.where(m, 1.0 - iou, 0.0)) / n_m

        # obj targets: max-scatter matched IoU into the layer grid
        tobj = jnp.zeros((b, ny * nx * na), jnp.float32)
        val = jnp.where(
            m,
            (1.0 - gr) + gr * jnp.clip(jax.lax.stop_gradient(iou), 0.0),
            0.0,
        )
        tobj = jax.vmap(
            lambda t0, idx, v: t0.at[idx.reshape(-1)].max(v.reshape(-1))
        )(tobj, flat_cell, val)
        obj_bce = _bce(
            p[..., 4].reshape(b, -1), tobj, pos_weight=hyp.obj_pw
        )
        obj_i = obj_bce.mean()

        lcls_i = 0.0
        if nc > 1:
            tcls_sel = jnp.take_along_axis(
                targets[:, :, 0].astype(jnp.int32),
                mgt.reshape(b, -1), axis=1,
            ).reshape(m.shape)
            t_one = jnp.where(
                jax.nn.one_hot(tcls_sel, nc, dtype=bool), cp, cn
            )
            cls_bce = _bce(ps[..., 5:], t_one, pos_weight=hyp.cls_pw)
            lcls_i = jnp.sum(
                jnp.where(m[..., None], cls_bce, 0.0)
            ) / (n_m * nc)
    return lbox_i, obj_i, lcls_i


def compute_loss(
    preds: List[jnp.ndarray],    # nl x (B, ny, nx, na, no) raw heads
    targets: jnp.ndarray,        # (B, T, 5) [cls, x, y, w, h] normalized
    tmask: jnp.ndarray,          # (B, T)
    spec: ModelSpec,
    img_size: int,
    hyp: Hyp = Hyp(),
    gr: float = 1.0,
):
    """Plain (non-OTA) v7 loss — the reference's ComputeLoss
    (utils/loss.py:422-553), selected when hyp['loss_ota'] == 0
    (train.py:295). Every anchor-ratio/offset candidate is a positive
    for its own GT (no SimOTA selection): per-layer CIoU box loss over
    candidates, obj BCE against (1-gr) + gr*iou scattered into the grid,
    cp/cn-smoothed cls BCE. Same max-scatter deviation as the OTA path
    for duplicate obj cells."""
    nl, nc = spec.nl, spec.nc
    anchors_px = jnp.asarray(spec.anchors_per_level())
    strides = spec.strides
    bsz, t_cap = targets.shape[:2]
    _, metas = _flatten_preds(preds)
    na, n_off = spec.na, OFFSETS.shape[0]

    def per_image(t, m):
        txywh = t[:, 1:5] * img_size
        gi, gj, valid, _ = _candidate_grid(
            metas, strides, anchors_px, txywh, m, hyp
        )
        own_gt = jnp.broadcast_to(
            jnp.arange(t_cap, dtype=jnp.int32)[:, None, None, None],
            (t_cap, nl, na, n_off),
        )
        return {"matched": valid, "matched_gt": own_gt, "gi": gi, "gj": gj}

    assign = jax.vmap(per_image)(targets, tmask)

    cp, cn = smooth_bce(hyp.label_smoothing)
    balance = _balance(nl)
    lbox = lobj = lcls = 0.0
    for li, p in enumerate(preds):
        lb, ob, lc = _layer_loss_terms(
            p, li, assign, targets, spec, img_size, hyp, cp, cn, gr=gr
        )
        lbox = lbox + lb
        lobj = lobj + ob * balance[li]
        lcls = lcls + lc

    lbox = lbox * hyp.box
    lobj = lobj * hyp.obj
    lcls = lcls * hyp.cls
    total = lbox + lobj + lcls
    return total * bsz, {
        "box": lbox, "obj": lobj, "cls": lcls, "loss": total,
    }


def compute_loss_aux_ota(
    preds: List[jnp.ndarray],    # 2*nl head tensors: nl lead + nl aux
    targets: jnp.ndarray,
    tmask: jnp.ndarray,
    spec: ModelSpec,
    img_size: int,
    hyp: Hyp = Hyp(),
):
    """ComputeLossAuxOTA (utils/loss.py:1176-1290): lead heads assigned
    with find_3_positive + topk-20 SimOTA, aux heads with find_5_positive
    (g=1.0) + topk-20; aux box/cls/obj terms weighted 0.25. Candidate
    boxes for BOTH assignments come from the lead predictions
    (:1205-1206 pass p[:nl])."""
    nl, nc = spec.nl, spec.nc
    anchors_px = jnp.asarray(spec.anchors_per_level())
    strides = spec.strides
    lead = preds[:nl]
    aux = preds[nl:]
    bsz = lead[0].shape[0]
    preds_flat, metas = _flatten_preds(lead)

    assign_lead = jax.vmap(
        lambda pf, t, m: simota_assign(
            pf, metas, strides, anchors_px, t, m, img_size, nc, hyp,
            topk=20, g=0.5,
        )
    )(preds_flat, targets, tmask)
    assign_aux = jax.vmap(
        lambda pf, t, m: simota_assign(
            pf, metas, strides, anchors_px, t, m, img_size, nc, hyp,
            topk=20, g=1.0,
        )
    )(preds_flat, targets, tmask)

    cp, cn = smooth_bce(hyp.label_smoothing)
    balance = _balance(nl)
    lbox = lobj = lcls = 0.0
    w_aux = hyp.aux_weight
    for li in range(nl):
        lb, ob, lc = _layer_loss_terms(
            lead[li], li, assign_lead, targets, spec, img_size, hyp, cp, cn
        )
        lb_a, ob_a, lc_a = _layer_loss_terms(
            aux[li], li, assign_aux, targets, spec, img_size, hyp, cp, cn
        )
        lbox = lbox + lb + w_aux * lb_a
        lobj = lobj + (ob + w_aux * ob_a) * balance[li]
        lcls = lcls + lc + w_aux * lc_a

    lbox = lbox * hyp.box
    lobj = lobj * hyp.obj
    lcls = lcls * hyp.cls
    total = lbox + lobj + lcls
    return total * bsz, {
        "box": lbox, "obj": lobj, "cls": lcls, "loss": total,
    }


def _layer_loss_terms_bin(p, li, assign, targets, spec, img_size, hyp,
                          cp, cn, gr: float = 1.0):
    """Per-layer terms for the IBin head (ComputeLossBinOTA __call__,
    utils/loss.py:882-950): w/h are SigmoidBin training losses (nearest
    target bin BCE) with the CIoU box computed from target-bin-biased
    residual decode; obj/cls live at the shifted channel indices."""
    from ..models.ibin import (
        BIN_MAX, BIN_MIN, _REG_SCALE, _STEP, bin_centers,
    )
    from ..models.spec import BIN_COUNT

    nl, na, nc, no = spec.nl, spec.na, spec.nc, spec.no
    L = BIN_COUNT + 1
    obj_idx = 2 + 2 * L
    anchors_px = jnp.asarray(spec.anchors_per_level())
    strides = spec.strides
    b, ny, nx, _, _ = p.shape
    m = assign["matched"][:, :, li]              # (B, T, na, n_off)
    mgt = assign["matched_gt"][:, :, li]
    gi = assign["gi"][:, :, li]
    gj = assign["gj"][:, :, li]
    anchors_grid = anchors_px[li] / float(strides[li])  # (na, 2)
    a_ids = jnp.arange(na, dtype=jnp.int32)[None, None, :, None]
    flat_cell = (gj * nx + gi) * na + a_ids

    ps = jnp.take_along_axis(
        p.reshape(b, -1, no),
        flat_cell.reshape(b, -1)[..., None],
        axis=1,
    ).reshape(m.shape + (no,))

    t_xywh = jnp.take_along_axis(
        targets[:, :, 1:5], mgt.reshape(b, -1)[..., None], axis=1
    ).reshape(m.shape + (4,))
    t_grid = t_xywh * img_size / float(strides[li])
    grid = jnp.stack([gi, gj], axis=-1).astype(jnp.float32)
    t_box = jnp.concatenate(
        [t_grid[..., :2] - grid, t_grid[..., 2:]], axis=-1
    )

    n_m = jnp.maximum(jnp.sum(m), 1)
    bins = bin_centers()

    def bin_training(logits, target):
        """SigmoidBin.training_loss (loss.py:90-118): nearest-bin BCE
        sum (masked-mean outside) + target-bin-biased decode."""
        reg = (jax.nn.sigmoid(logits[..., 0]) * _REG_SCALE
               - _REG_SCALE / 2.0) * _STEP
        idx = jnp.argmin(
            jnp.abs(target[..., None] - bins), axis=-1
        )
        onehot = jax.nn.one_hot(idx, BIN_COUNT)
        bce = _bce(logits[..., 1:], onehot)
        loss_sum = jnp.sum(jnp.where(m[..., None], bce, 0.0))
        decoded = jnp.clip(
            reg + bins[idx], BIN_MIN, BIN_MAX
        )
        return loss_sum / (n_m * BIN_COUNT), decoded

    anc = anchors_grid[None, None, :, None, :]
    w_loss, pw = bin_training(
        ps[..., 2:2 + L], t_box[..., 2] / anc[..., 0]
    )
    h_loss, ph = bin_training(
        ps[..., 2 + L:obj_idx], t_box[..., 3] / anc[..., 1]
    )
    pxy = jax.nn.sigmoid(ps[..., :2]) * 2.0 - 0.5
    pbox = jnp.concatenate(
        [pxy, (pw * anc[..., 0])[..., None], (ph * anc[..., 1])[..., None]],
        axis=-1,
    )
    iou = bbox_iou(pbox, t_box, xywh=True, ciou=True)
    lbox_i = w_loss + h_loss + jnp.sum(
        jnp.where(m, 1.0 - iou, 0.0)
    ) / n_m

    tobj = jnp.zeros((b, ny * nx * na), jnp.float32)
    val = jnp.where(
        m,
        (1.0 - gr) + gr * jnp.clip(jax.lax.stop_gradient(iou), 0.0),
        0.0,
    )
    tobj = jax.vmap(
        lambda t0, idx, v: t0.at[idx.reshape(-1)].max(v.reshape(-1))
    )(tobj, flat_cell, val)
    obj_bce = _bce(
        p[..., obj_idx].reshape(b, -1), tobj, pos_weight=hyp.obj_pw
    )
    obj_i = obj_bce.mean()

    lcls_i = 0.0
    if nc > 1:
        tcls_sel = jnp.take_along_axis(
            targets[:, :, 0].astype(jnp.int32),
            mgt.reshape(b, -1), axis=1,
        ).reshape(m.shape)
        t_one = jnp.where(
            jax.nn.one_hot(tcls_sel, nc, dtype=bool), cp, cn
        )
        cls_bce = _bce(ps[..., obj_idx + 1:], t_one, pos_weight=hyp.cls_pw)
        lcls_i = jnp.sum(
            jnp.where(m[..., None], cls_bce, 0.0)
        ) / (n_m * nc)
    return lbox_i, obj_i, lcls_i


def compute_loss_bin_ota(
    preds: List[jnp.ndarray],    # nl x (B, ny, nx, na, no) IBin heads
    targets: jnp.ndarray,
    tmask: jnp.ndarray,
    spec: ModelSpec,
    img_size: int,
    hyp: Hyp = Hyp(),
):
    """ComputeLossBinOTA (utils/loss.py:849-1176): SimOTA assignment with
    bin-decoded candidate boxes, then per-layer SigmoidBin w/h losses +
    CIoU + shifted obj/cls. The reference never instantiates this class
    from any shipped cfg; provided for IBin-model training parity."""
    nl, nc = spec.nl, spec.nc
    anchors_px = jnp.asarray(spec.anchors_per_level())
    strides = spec.strides
    bsz = preds[0].shape[0]
    preds_flat, metas = _flatten_preds(preds)

    assign = jax.vmap(
        lambda pf, t, mm: simota_assign(
            pf, metas, strides, anchors_px, t, mm, img_size, nc, hyp,
            bin_wh=True,
        )
    )(preds_flat, targets, tmask)

    cp, cn = smooth_bce(hyp.label_smoothing)
    balance = _balance(nl)
    lbox = lobj = lcls = 0.0
    for li, p in enumerate(preds):
        lb, ob, lc = _layer_loss_terms_bin(
            p, li, assign, targets, spec, img_size, hyp, cp, cn
        )
        lbox = lbox + lb
        lobj = lobj + ob * balance[li]
        lcls = lcls + lc

    lbox = lbox * hyp.box
    lobj = lobj * hyp.obj
    lcls = lcls * hyp.cls
    total = lbox + lobj + lcls
    return total * bsz, {
        "box": lbox, "obj": lobj, "cls": lcls, "loss": total,
    }
