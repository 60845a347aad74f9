"""Deep Hungarian Net (Munkrs) — differentiable assignment scorer used by
DeepMOT (reference tracker/deepmot.py:10-140).

Architecture parity: 2-layer bidirectional GRU (hidden 256, input 1) over
the row-major flattened cost matrix, a second 2-layer biGRU (input 512)
over the column-major permutation of the first's outputs, then
512 -> 256 -> 64 -> 1 dense layers + sigmoid.

TPU notes: the reference runs the GRU over a dynamically-sized h*w
sequence; fixed shapes require padding, so we compact valid rows/cols to
the top-left and pad with cost 1.0 (documented deviation — the
reference's DHN.pth is absent from its own release, so no weight-exact
baseline exists either). The recurrence uses lax.scan over the sequence.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

HIDDEN = 256


class BiGRU(nn.Module):
    """2-layer bidirectional GRU, torch nn.GRU(bidirectional=True,
    num_layers=2) semantics: layer 2 consumes the concatenated fwd/bwd
    outputs of layer 1."""

    hidden: int = HIDDEN

    @nn.compact
    def __call__(self, xs):  # xs: (L, F)
        def scan_gru(name, seq, reverse):
            cell = nn.GRUCell(features=self.hidden, name=name)
            if reverse:
                seq = seq[::-1]
            carry = cell.initialize_carry(
                jax.random.PRNGKey(0), seq.shape[1:]
            )
            scanner = nn.scan(
                lambda c, carry, x: c(carry, x),
                variable_broadcast="params",
                split_rngs={"params": False},
            )
            _, ys = scanner(cell, carry, seq)
            if reverse:
                ys = ys[::-1]
            return ys

        l1 = jnp.concatenate(
            [scan_gru("l0_fwd", xs, False), scan_gru("l0_bwd", xs, True)],
            axis=-1,
        )
        l2 = jnp.concatenate(
            [scan_gru("l1_fwd", l1, False), scan_gru("l1_bwd", l1, True)],
            axis=-1,
        )
        return l2  # (L, 2*hidden)


class DHN(nn.Module):
    """Cost matrix (H, W) -> soft assignment scores (H, W) in [0, 1].

    ``hidden`` defaults to the reference architecture's 256; smaller
    values give a cheap DHN for tests / latency-bound deployments."""

    hidden: int = HIDDEN

    @nn.compact
    def __call__(self, d):  # d: (H, W)
        h, w = d.shape
        row_seq = d.reshape(h * w, 1)
        row_out = BiGRU(self.hidden, name="lstm_row")(row_seq)  # (H*W, 2h)
        grid = row_out.reshape(h, w, -1)
        col_seq = jnp.transpose(grid, (1, 0, 2)).reshape(w * h, -1)
        col_out = BiGRU(self.hidden, name="lstm_col")(col_seq)  # (W*H, 2h)
        feats = jnp.transpose(
            col_out.reshape(w, h, -1), (1, 0, 2)
        ).reshape(h * w, -1)
        x = nn.Dense(256, name="hidden2tag_1")(feats)
        x = nn.Dense(64, name="hidden2tag_2")(x)
        x = nn.Dense(1, name="hidden2tag_3")(x)
        return jax.nn.sigmoid(x).reshape(h, w)


class SinkhornDHN(nn.Module):
    """Parallel Deep Hungarian Net: entropic-assignment potentials at
    learned temperatures + a per-cell MLP head.

    The reference's Munkrs (tracker/deepmot.py:10-140) learns the 2-D
    assignment structure by scanning the FLATTENED cost matrix with
    bidirectional GRUs — an inherently sequential recurrence whose TPU
    cost is ~5 us per scan step x 8 scans x H*W steps (≈200 ms at the
    128x300 serving slab; tools/tracker_fleet_bench.py round-4 capture).
    This head reaches the same soft-assignment targets with only
    matrix-parallel ops: for a handful of learned temperatures tau it
    runs ``iters`` log-domain Sinkhorn sweeps (row/col logsumexp — the
    entropic relaxation of the Hungarian problem, exact as tau -> 0),
    then scores each cell from [cost, the multi-scale transport plans,
    row-softmin gap, col-softmin gap]. Everything is a reduction or an
    elementwise op over the (H, W) matrix: O(iters) fused XLA kernels,
    no recurrence, microseconds where the GRU takes hundreds of ms.

    Trained by the same recipe (train/dhn_train.py --arch sinkhorn);
    size-agnostic by construction (only normalized reductions), so one
    checkpoint serves any padded slab geometry. Padding contract
    matches compact_cost: pad cells carry cost 1.0 and train to 0.
    """

    iters: int = 20
    taus: Tuple[float, ...] = (0.02, 0.05, 0.15)
    feat: int = 32

    @nn.compact
    def __call__(self, d):  # d: (H, W) costs, roughly [0, 1]
        log_tau = self.param(
            "log_tau",
            lambda _: jnp.log(jnp.asarray(self.taus, jnp.float32)),
        )
        planes = [d]
        for i in range(len(self.taus)):
            tau = jnp.exp(log_tau[i])
            f = jnp.zeros(d.shape[0], d.dtype)
            g = jnp.zeros(d.shape[1], d.dtype)

            def sweep(carry, _):
                f, g = carry
                f = -tau * jax.nn.logsumexp(
                    (-d + g[None, :]) / tau, axis=1)
                g = -tau * jax.nn.logsumexp(
                    (-d + f[:, None]) / tau, axis=0)
                return (f, g), None

            (f, g), _ = jax.lax.scan(sweep, (f, g), None,
                                     length=self.iters)
            planes.append(jnp.exp((-d + f[:, None] + g[None, :]) / tau))
        # softmin gaps: how far each cell sits above its row/col best
        planes.append(d - (-0.05) * jax.nn.logsumexp(
            d / -0.05, axis=1, keepdims=True))
        planes.append(d - (-0.05) * jax.nn.logsumexp(
            d / -0.05, axis=0, keepdims=True))
        x = jnp.stack([jnp.broadcast_to(p, d.shape) for p in planes], -1)
        x = nn.relu(nn.Dense(self.feat, name="cell_1")(x))
        x = nn.relu(nn.Dense(self.feat, name="cell_2")(x))
        x = nn.Dense(1, name="cell_out")(x)
        return jax.nn.sigmoid(x[..., 0])


def build_dhn(arch: str, hidden: int = HIDDEN):
    """DHN module by architecture name: 'gru' (reference Munkrs shape)
    or 'sinkhorn' (parallel, TPU serving default — see SinkhornDHN)."""
    if arch == "gru":
        return DHN(hidden=hidden)
    if arch == "sinkhorn":
        return SinkhornDHN()
    raise ValueError(f"unknown dhn arch {arch!r}; have gru|sinkhorn")


def compact_cost(cost: jnp.ndarray, row_mask, col_mask,
                 pad_value: float = 1.0,
                 row_key=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Permute valid rows/cols to the top-left (stable), pad the rest.
    Returns (compacted cost, row perm, col perm).

    row_key: optional (N,) sort key replacing slot order — the DHN is
    not permutation-equivariant, so DeepMOT passes the reference's
    strack_pool order (slab.pool_order_rank) to present rows to the GRU
    in the same sequence the reference does (deepmot.py:221-233)."""
    if row_key is not None:
        rperm = jnp.argsort(jnp.where(row_mask, row_key,
                                      row_key.max() + 1
                                      + jnp.arange(row_key.shape[0])))
    else:
        rperm = jnp.argsort(~row_mask, stable=True)
    cperm = jnp.argsort(~col_mask, stable=True)
    c = cost[rperm][:, cperm]
    rv = row_mask[rperm]
    cv = col_mask[cperm]
    c = jnp.where(rv[:, None] & cv[None, :], c, pad_value)
    return c, rperm, cperm


def uncompact(mat: jnp.ndarray, rperm, cperm) -> jnp.ndarray:
    """Inverse permutation of compact_cost."""
    rinv = jnp.argsort(rperm)
    cinv = jnp.argsort(cperm)
    return mat[rinv][:, cinv]
