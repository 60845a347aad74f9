"""Ranking-based classification losses — RankSort, aLRP, AP
(reference utils/loss.py:176-420, torch.autograd.Function trio with
hand-written gradients; none is instantiated by a shipped config).

The reference loops over positives in score order; RankSort and aLRP
iterations are order-independent (each reads only the original logits),
so here they are single masked matrix passes. APLoss carries the
interpolated max-precision through the sorted order, which becomes a
``lax.scan``. All take fixed-shape (N,) arrays plus a validity mask
instead of boolean-filtered tensors, and reproduce the reference's
identity-update gradients via ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1e9


def _rel(logits, delta):
    """Piecewise-linear difference transform x_ij (loss.py:203-212):
    rel[i, j] = clamp((l_j - l_i)/(2*delta) + 0.5, 0, 1)."""
    diff = logits[None, :] - logits[:, None]
    if delta > 0:
        return jnp.clip(diff / (2.0 * delta) + 0.5, 0.0, 1.0)
    return (diff >= 0).astype(jnp.float32)


def _fg_bg_masks(logits, targets, valid, delta, fg_pred):
    fg = valid & fg_pred
    min_fg = jnp.min(jnp.where(fg, logits, BIG))
    thr = min_fg - delta
    bg = valid & (targets == 0) & (logits >= thr)
    return fg, bg


# ---------------------------------------------------------------------------
# RankSort (loss.py:176-273)
# ---------------------------------------------------------------------------

def _ranksort_fwd(logits, targets, valid, delta, eps):
    fgm, bgm = _fg_bg_masks(logits, targets, valid, delta,
                            targets > 0.0)
    fg_num = jnp.maximum(jnp.sum(fgm), 1)
    rel = _rel(logits, delta)                     # (N, N), row i = vs i
    R = jnp.where(fgm[None, :], rel, 0.0)         # fg columns
    BR = jnp.where(bgm[None, :], rel, 0.0)        # relevant-bg columns

    rank_pos = jnp.sum(R, axis=1)                 # includes self (0.5)
    fp = jnp.sum(BR, axis=1)
    rank = rank_pos + fp
    ranking_error = jnp.where(fgm, fp / jnp.maximum(rank, 1e-20), 0.0)

    one_minus_t = jnp.where(fgm, 1.0 - targets, 0.0)
    cur_sort = jnp.sum(R * one_minus_t[None, :], axis=1) / jnp.maximum(
        rank_pos, 1e-20
    )
    iou_rel = (targets[None, :] >= targets[:, None]) & fgm[None, :]
    tso = jnp.where(iou_rel, R, 0.0)
    rpt = jnp.maximum(jnp.sum(tso, axis=1), 1e-20)
    tse = jnp.sum(tso * one_minus_t[None, :], axis=1) / rpt
    sorting_error = jnp.where(fgm, cur_sort - tse, 0.0)

    # identity-update gradients (loss.py:241-262)
    fg_numf = fg_num.astype(jnp.float32)
    has_fp = fp > eps
    grad = -jnp.where(fgm & has_fp, ranking_error, 0.0)
    missorted = jnp.where(~iou_rel & fgm[None, :], R, 0.0)
    denom = jnp.sum(missorted, axis=1)
    has_ms = denom > eps
    grad = grad - jnp.where(fgm & has_ms, sorting_error, 0.0)
    w_sort = jnp.where(
        fgm & has_ms, sorting_error / jnp.maximum(denom, 1e-20), 0.0
    )
    grad = grad + jnp.sum(missorted * w_sort[:, None], axis=0)
    w_rank = jnp.where(
        fgm & has_fp, ranking_error / jnp.maximum(fp, 1e-20), 0.0
    )
    bg_grad = jnp.sum(BR * w_rank[:, None], axis=0)
    grad = jnp.where(fgm, grad, jnp.where(bgm, bg_grad, 0.0)) / fg_numf

    re = jnp.sum(ranking_error) / fg_numf
    se = jnp.sum(sorting_error) / fg_numf
    return (re, se), grad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def rank_sort_loss(logits, targets, valid, delta=0.5, eps=1e-10):
    """(mean ranking error, mean sorting error) over the valid
    positives; gradient flows to logits only (loss.py:270-273)."""
    return _ranksort_fwd(logits, targets, valid, delta, eps)[0]


def _rs_fwd(logits, targets, valid, delta, eps):
    out, grad = _ranksort_fwd(logits, targets, valid, delta, eps)
    return out, grad


def _rs_bwd(delta, eps, grad, cts):
    g1, _ = cts
    return grad * g1, None, None


rank_sort_loss.defvjp(_rs_fwd, _rs_bwd)


# ---------------------------------------------------------------------------
# aLRP (loss.py:275-343)
# ---------------------------------------------------------------------------

def _alrp_fwd(logits, targets, reg_losses, valid, delta, eps):
    fgm, bgm = _fg_bg_masks(logits, targets, valid, delta,
                            targets == 1.0)
    fg_num = jnp.maximum(jnp.sum(fgm), 1).astype(jnp.float32)
    rel = _rel(logits, delta)
    eye = jnp.eye(logits.shape[0], dtype=bool)
    R0 = jnp.where(fgm[None, :] & ~eye, rel, 0.0)   # self zeroed
    BR = jnp.where(bgm[None, :], rel, 0.0)

    rank_pos = 1.0 + jnp.sum(R0, axis=1)
    fp = jnp.sum(BR, axis=1)
    rank = rank_pos + fp
    prec = jnp.where(fgm, rank_pos / jnp.maximum(rank, 1e-20), 0.0)

    has_fp = fgm & (fp > eps)
    reg = jnp.where(fgm, reg_losses, 0.0)
    fg_grad = jnp.where(
        has_fp,
        -(jnp.sum(R0 * reg[None, :], axis=1) + fp)
        / jnp.maximum(rank, 1e-20),
        0.0,
    )
    w = jnp.where(has_fp, -fg_grad / jnp.maximum(fp, 1e-20), 0.0)
    bg_grad = jnp.sum(BR * w[:, None], axis=0)
    grad = jnp.where(fgm, fg_grad, jnp.where(bgm, bg_grad, 0.0)) / fg_num

    cls_loss = 1.0 - jnp.sum(prec) / fg_num
    return (cls_loss, jnp.where(fgm, rank, 0.0)), grad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def alrp_loss(logits, targets, reg_losses, valid, delta=1.0, eps=1e-5):
    """aLRP classification loss: (1 - mean LRP precision, per-anchor
    rank). reg_losses is the per-anchor regression loss aligned to the
    same (N,) layout (loss.py:277-339)."""
    return _alrp_fwd(logits, targets, reg_losses, valid, delta, eps)[0]


def _alrp_f(logits, targets, reg_losses, valid, delta, eps):
    out, grad = _alrp_fwd(logits, targets, reg_losses, valid, delta, eps)
    return out, grad


def _alrp_b(delta, eps, grad, cts):
    g1, _ = cts
    return grad * g1, None, None, None


alrp_loss.defvjp(_alrp_f, _alrp_b)


# ---------------------------------------------------------------------------
# APLoss (loss.py:345-420) — sequential interpolated-precision scan
# ---------------------------------------------------------------------------

def _ap_fwd(logits, targets, valid, delta):
    n = logits.shape[0]
    fgm, bgm = _fg_bg_masks(logits, targets, valid, delta,
                            targets == 1.0)
    fg_num = jnp.maximum(jnp.sum(fgm), 1).astype(jnp.float32)
    rel = _rel(logits, delta)
    eye = jnp.eye(n, dtype=bool)
    R0 = jnp.where(fgm[None, :] & ~eye, rel, 0.0)
    BR = jnp.where(bgm[None, :], rel, 0.0)
    rank_pos = 1.0 + jnp.sum(R0, axis=1)
    fp = jnp.sum(BR, axis=1)
    rank = rank_pos + fp
    cur_prec = jnp.where(fgm, rank_pos / jnp.maximum(rank, 1e-20), 0.0)

    # ascending fg-logit order; non-fg sorted to the end and skipped
    order = jnp.argsort(jnp.where(fgm, logits, BIG))

    def step(carry, i):
        max_prec, bg_grad = carry
        is_fg = fgm[i]
        cp = cur_prec[i]
        interp = max_prec <= cp
        w = jnp.where(
            interp, 1.0,
            (1.0 - max_prec) / jnp.maximum(1.0 - cp, 1e-20),
        )
        bg_add = BR[i] / jnp.maximum(rank[i], 1e-20) * w
        bg_grad = bg_grad + jnp.where(is_fg, bg_add, 0.0)
        new_max = jnp.where(is_fg, jnp.maximum(max_prec, cp), max_prec)
        prec_i = jnp.where(is_fg, new_max, 0.0)
        return (new_max, bg_grad), (prec_i, -(1.0 - new_max) * is_fg)

    (_, bg_grad), (prec_sorted, fg_grad_sorted) = jax.lax.scan(
        step, (jnp.float32(0.0), jnp.zeros(n)), order
    )
    prec = jnp.zeros(n).at[order].set(prec_sorted)
    fg_grad = jnp.zeros(n).at[order].set(fg_grad_sorted)
    grad = jnp.where(fgm, fg_grad, jnp.where(bgm, bg_grad, 0.0)) / fg_num
    cls_loss = 1.0 - jnp.sum(prec) / fg_num
    return cls_loss, grad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ap_loss(logits, targets, valid, delta=1.0):
    """Interpolated average-precision loss (loss.py:345-420)."""
    return _ap_fwd(logits, targets, valid, delta)[0]


def _ap_f(logits, targets, valid, delta):
    out, grad = _ap_fwd(logits, targets, valid, delta)
    return out, grad


def _ap_b(delta, grad, ct):
    return grad * ct, None, None


ap_loss.defvjp(_ap_f, _ap_b)
