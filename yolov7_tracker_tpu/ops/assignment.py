"""Linear assignment with ``cost_limit`` gating, on device.

The reference hot loop calls ``lap.lapjv(cost, extend_cost=True,
cost_limit=thresh)`` (C++ Jonker-Volgenant) up to 4x per frame
(tracker/matching.py:30-41). lapjv's cost-limit construction pads the
(n, m) problem to an (n+m, n+m) square matrix filled with ``cost_limit/2``
(0 in the dummy-dummy block): a pair (i, j) is matched in the optimum iff
keeping it beats routing both endpoints to dummies, i.e. C[i, j] < thresh.

We solve that *same* extended square problem on device with a fully
vectorized Jacobi **auction algorithm** (Bertsekas) under
``lax.while_loop``:

- every unassigned row bids for its best column simultaneously — one
  (S, S) masked max-reduction per iteration, pure VPU work;
- column conflicts resolve with a scatter-max of bids (deterministic
  lowest-row tie-break);
- epsilon scaling with persistent prices: each phase restores eps-CS, and
  the final phase's perfect matching is within S*eps_final of optimal —
  far below the cost gaps that decide a match.

All shapes are static (padded slabs + masks) so the solver composes with
jit / lax.scan: sequences run frame-after-frame on device with no host
sync, unlike the reference's per-frame lap.lapjv round trip.

A scipy-backed host implementation of the same extended problem provides
ground truth for tests and the CPU fallback path; the C++ JV solver in
``native/`` covers host-side evaluation tooling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_NEG = jnp.float32(-1e9)

# default epsilon-phase count for the association solvers. Measured on
# TPU (Pallas kernel, 128x64 slabs): association-shaped sparse IoU
# matrices solve EXACTLY at 5 phases (40/40 same matching, zero cost
# gap); adversarial dense U[0,1] matrices show only tie-level deviation
# (max total-cost gap 0.007 at 5 phases, 0.035 at 4). More phases only
# add price-war iterations.
DEFAULT_PHASES = 5


def solve_assignment(cost, row_mask, col_mask, thresh,
                     n_phases: int = DEFAULT_PHASES):
    """Backend-dispatching masked assignment: the Pallas VMEM-resident
    auction kernel on TPU (~4x faster), the XLA while_loop version
    elsewhere (CPU tests, interpret runs). Trace-time dispatch."""
    import jax

    if jax.default_backend() == "tpu":
        # the private-dummy rectangular auction in plain XLA: ~tens of
        # cheap fused sweeps per solve. Faster end-to-end than either
        # Pallas kernel on this stack, whose Mosaic builds cost minutes
        # per shape through the remote-compile path (see
        # pallas_auction.py for the measured numbers).
        #
        # STEEP schedule: the n-phase/factor-4 eps descent collapsed to
        # 2 phases at factor 4^(n/2) — the FINAL eps (scale/4^n) is
        # identical, so the optimality bound is unchanged; only the
        # descent path differs. Measured on v5e
        # (tools/tpu_tracker_probe.py, r4): each while sweep costs
        # ~20 us of dispatch regardless of matrix size, and the 5-phase
        # descent spends most sweeps re-settling mid-eps phases —
        # 2@32 runs the real ByteTrack step at 0.69 ms/frame vs 0.88
        # (bench load) and 0.90 vs 1.57 (mixed load) with bit-identical
        # outputs (ids+boxes, 128-frame sequences, both loads) and
        # scipy-exact stage-1 matchings.
        return masked_assignment_v2(
            cost, row_mask, col_mask, thresh, n_phases=2,
            phase_factor=4.0 ** (n_phases / 2.0),
        )
    return masked_assignment(
        cost, row_mask, col_mask, thresh, n_phases=n_phases
    )


# ---------------------------------------------------------------------------
# host reference (scipy) — mirrors lap.lapjv(extend_cost=True, cost_limit=t)
# ---------------------------------------------------------------------------

def linear_assignment_host(cost: np.ndarray, thresh: float):
    """Host solve of the lapjv-with-cost-limit problem.

    Returns (matches (K,2) int array, unmatched_rows, unmatched_cols) with
    the same semantics as tracker/matching.py:30-41.
    """
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost, dtype=np.float64)
    n, m = cost.shape
    if cost.size == 0:
        return (
            np.empty((0, 2), dtype=int),
            np.arange(n, dtype=int),
            np.arange(m, dtype=int),
        )
    ext = np.full((n + m, n + m), thresh / 2.0, dtype=np.float64)
    ext[n:, m:] = 0.0
    ext[:n, :m] = cost
    rows, cols = linear_sum_assignment(ext)
    matches = [(r, c) for r, c in zip(rows, cols) if r < n and c < m]
    matched_r = {r for r, _ in matches}
    matched_c = {c for _, c in matches}
    unmatched_rows = np.array([i for i in range(n) if i not in matched_r], dtype=int)
    unmatched_cols = np.array([j for j in range(m) if j not in matched_c], dtype=int)
    return np.asarray(matches, dtype=int).reshape(-1, 2), unmatched_rows, unmatched_cols


# ---------------------------------------------------------------------------
# device auction solver (symmetric extended matrix)
# ---------------------------------------------------------------------------

def _auction_square(w: jnp.ndarray, n: int, m: int, max_iters: int,
                    eps_final: float = 2e-4, n_phases: int = 8,
                    phase_factor: float = 4.0):
    """Max-weight perfect matching on a square weight matrix via Jacobi
    auction with eps-scaling. Returns (row_to_col (S,), col_to_row (S,)).

    eps_final trades exactness for iterations: the result is within
    S*eps_final of the optimal total weight (worst case; in practice it is
    exact once eps drops below the matrix's cost gaps). Association costs
    (IoU/cosine) have gaps orders of magnitude above 2e-4; pushing eps to
    1e-6 only buys eviction-chain price wars (~4k iterations vs ~1k).
    """
    s = w.shape[0]
    row_ids = jnp.arange(s, dtype=jnp.int32)
    scale = jnp.maximum(jnp.max(w) - jnp.min(jnp.where(w > _NEG / 2, w, jnp.max(w))), 1e-3)
    eps_final = jnp.float32(eps_final)

    def phase(carry, eps):
        prices, r2c, c2r = carry
        # Selective warm start: keep pairs that already satisfy eps-CS for
        # the new (smaller) eps, unassign the rest. Any eps-CS-consistent
        # partial assignment is a valid auction start, and this avoids
        # re-settling the (typically large) uncontested majority each phase.
        values0 = w - prices[None, :]
        v1_0 = jnp.max(values0, axis=1)
        cur = values0[row_ids, jnp.clip(r2c, 0, s - 1)]
        keep = (r2c >= 0) & (cur >= v1_0 - eps)
        r2c = jnp.where(keep, r2c, -1)
        c2r = jnp.full((s,), -1, jnp.int32).at[
            jnp.where(keep, r2c, s)
        ].set(jnp.where(keep, row_ids, -1), mode="drop")

        def cond(st):
            _, r2c, _, it = st
            return jnp.logical_and(jnp.any(r2c < 0), it < max_iters)

        def body(st):
            prices, r2c, c2r, it = st
            unassigned = r2c < 0
            values = w - prices[None, :]  # (S, S)
            best_j = jnp.argmax(values, axis=1).astype(jnp.int32)
            v1 = jnp.max(values, axis=1)
            v2 = jnp.max(
                values.at[row_ids, best_j].set(_NEG), axis=1
            )
            # cap the increment: -inf second-best (single-option rows)
            # must not produce unbounded prices
            bid = prices[best_j] + jnp.minimum(v1 - v2, 2.0 * scale) + eps
            bid_eff = jnp.where(unassigned, bid, _NEG)
            # per-column best bid and (lowest-index) winning row
            col_best = jnp.full((s,), _NEG).at[best_j].max(bid_eff, mode="drop")
            cand = unassigned & (bid_eff >= col_best[best_j])
            winner = jnp.full((s,), s, jnp.int32).at[best_j].min(
                jnp.where(cand, row_ids, s), mode="drop"
            )
            won = cand & (winner[best_j] == row_ids)
            contested = winner < s  # columns that received a winning bid
            # evict previous owners of contested columns
            prev_owner = jnp.where(contested, c2r, -1)
            evicted = jnp.zeros((s,), bool).at[
                jnp.where(prev_owner >= 0, prev_owner, s)
            ].set(True, mode="drop")
            r2c = jnp.where(evicted, -1, r2c)
            # commit winners
            r2c = jnp.where(won, best_j, r2c)
            c2r = jnp.where(contested, winner, c2r)
            prices = jnp.where(contested, col_best, prices)
            return prices, r2c, c2r, it + 1

        prices, r2c, c2r, _ = jax.lax.while_loop(
            cond, body, (prices, r2c, c2r, jnp.int32(0))
        )
        return (prices, r2c, c2r), None

    eps_schedule = jnp.maximum(
        scale / jnp.power(
            phase_factor, jnp.arange(1, n_phases + 1, dtype=jnp.float32)
        ),
        eps_final,
    )
    prices0 = jnp.zeros((s,), jnp.float32)
    # Initial perfect matching through the dummy blocks: real row i holds
    # its own dummy column (m+i), dummy row n+j holds real column j. The
    # phase-start CS filter then only releases rows with a genuinely
    # attractive real pairing — on sparse association matrices most rows
    # never bid at all.
    idx = jnp.arange(s, dtype=jnp.int32)
    r2c0 = jnp.where(idx < n, m + idx, idx - n)
    c2r0 = jnp.where(idx < m, n + idx, idx - m)
    (prices, r2c, c2r), _ = jax.lax.scan(
        phase, (prices0, r2c0, c2r0), eps_schedule
    )
    return r2c, c2r


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iters", "eps_final", "n_phases", "phase_factor", "tie_jitter",
    ),
)
def masked_assignment(
    cost: jnp.ndarray,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray,
    thresh,
    max_iters: int = 4096,
    eps_final: float = 2e-4,
    n_phases: int = 8,
    phase_factor: float = 4.0,
    tie_jitter: float = 0.0,
):
    """Masked assignment with cost-limit gating on device.

    Args:
      cost: (N, M) float cost matrix over padded slabs.
      row_mask: (N,) bool — valid rows (invalid rows never match).
      col_mask: (M,) bool — valid cols.
      thresh: scalar cost limit; pairs with cost > thresh never match.
      max_iters: safety bound on auction iterations per phase.

    Returns:
      row_to_col: (N,) int32, matched column per row, -1 if unmatched
        (invalid rows are -1).
      col_to_row: (M,) int32, matched row per column, -1 if unmatched.
    """
    n, m = cost.shape
    s = n + m
    thresh = jnp.asarray(thresh, jnp.float32)
    valid = row_mask[:, None] & col_mask[None, :]
    # clamp over-limit costs: anything > thresh behaves identically (never
    # matched), and clamping bounds the auction's price dynamics.
    c = jnp.minimum(cost.astype(jnp.float32), thresh + 1.0)
    c = jnp.where(valid, c, thresh + 1.0)
    c_gate = c  # un-jittered costs decide the <= thresh match gate
    # Extended max-weight matrix (negated extended costs). Dummies are
    # interchangeable in lapjv's construction, which creates massive
    # degeneracy (epsilon price wars); we break it losslessly by reserving
    # dummy column m+i for real row i and dummy row n+j for real column j
    # (-inf elsewhere), and jittering the dummy-dummy block far below any
    # meaningful cost gap. Any optimal matching of the original extended
    # matrix permutes into this restricted form at equal value.
    w = jnp.full((s, s), _NEG, jnp.float32)
    if tie_jitter > 0.0:
        # deterministic sub-resolution jitter: breaks exact/near ties that
        # otherwise cause epsilon price wars; shifts the objective by at
        # most S * tie_jitter, far below association cost gaps
        jit_real = (
            (jnp.arange(n, dtype=jnp.float32)[:, None] * 131.0
             + jnp.arange(m, dtype=jnp.float32)[None, :] * 7.0) % 17.0
        ) * (tie_jitter / 17.0)
        c = c + jit_real
    w = w.at[:n, :m].set(-c)
    diag_n = jnp.arange(n)
    diag_m = jnp.arange(m)
    w = w.at[diag_n, m + diag_n].set(-thresh / 2.0)
    w = w.at[n + diag_m, diag_m].set(-thresh / 2.0)
    jitter = (
        (jnp.arange(m, dtype=jnp.float32)[:, None] * 37.0
         + jnp.arange(n, dtype=jnp.float32)[None, :]) % 97.0
    ) * (1e-6 / 97.0)
    w = w.at[n:, m:].set(-jitter)
    r2c_ext, c2r_ext = _auction_square(
        w, n, m, max_iters, eps_final=eps_final, n_phases=n_phases,
        phase_factor=phase_factor,
    )
    row_to_col = jnp.where(
        (r2c_ext[:n] < m) & row_mask & (jnp.take(c_gate, jnp.clip(r2c_ext[:n], 0, m - 1) + jnp.arange(n) * m) <= thresh),
        r2c_ext[:n],
        -1,
    )
    # rebuild col_to_row from row_to_col for consistency
    col_to_row = jnp.full((m,), -1, jnp.int32).at[
        jnp.where(row_to_col >= 0, row_to_col, m)
    ].set(jnp.where(row_to_col >= 0, jnp.arange(n, dtype=jnp.int32), -1), mode="drop")
    return row_to_col, col_to_row


# ---------------------------------------------------------------------------
# XLA implementation of the private-dummy rectangular auction (the same
# algorithm as ops/pallas_auction.masked_assignment_pallas_v2 — see that
# module's header for the derivation). 1-D gather/scatter forms of the
# bid round keep every step a cheap fused XLA op; with the rectangle's
# ~tens of sweeps per solve, HBM traffic is negligible and there is no
# Mosaic kernel to compile.
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "eps_final", "n_phases", "phase_factor"),
)
def masked_assignment_v2(
    cost: jnp.ndarray,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray,
    thresh,
    max_iters: int = 512,
    eps_final: float = 2e-4,
    n_phases: int = 5,
    phase_factor: float = 4.0,
):
    """Same contract as masked_assignment; max-weight free-disposal
    matching with one private weight-0 dummy column per row."""
    n, m = cost.shape
    mt = m + n                      # real cols + private dummies
    thresh = jnp.asarray(thresh, jnp.float32)
    valid = row_mask[:, None] & col_mask[None, :]
    c = cost.astype(jnp.float32)
    w = jnp.where(valid, thresh - c, _NEG)
    jit_w = (
        (jnp.arange(n, dtype=jnp.float32)[:, None] * 131.0
         + jnp.arange(m, dtype=jnp.float32)[None, :] * 7.0) % 17.0
    ) * (1e-6 / 17.0)
    w = jnp.where(valid, w + jit_w, _NEG)
    w = jnp.concatenate(
        [w, jnp.where(jnp.eye(n, dtype=bool), 0.0, _NEG)], axis=1)

    row_ids = jnp.arange(n, dtype=jnp.int32)
    scale = thresh + 1.0
    cap = 2.0 * scale
    sched = jnp.maximum(
        scale / jnp.power(
            jnp.float32(phase_factor),
            jnp.arange(1, n_phases + 1, dtype=jnp.float32),
        ),
        eps_final,
    )

    def phase(carry, eps):
        prices, r2c, c2r = carry

        # --- clamp-and-release fixpoint (see pallas_auction.py header):
        # clamp unowned columns to price 0, release eps-CS violators,
        # repeat until stable. Kept SEPARATE from the bid loop: fusing
        # release into every bid iteration lets (release, re-bid) cycles
        # oscillate to the iteration cap (measured 49 ms/solve + lost
        # matches on dense matrices vs ~tens of sweeps for this form).
        def cr_body(st):
            prices, r2c, c2r, it, _ = st
            prices = jnp.where(c2r < 0, 0.0, prices)
            values = w - prices[None, :]
            v1 = jnp.max(values, axis=1)
            cur = values[row_ids, jnp.clip(r2c, 0, mt - 1)]
            keep = (r2c >= 0) & (cur >= v1 - eps)
            rel = (r2c >= 0) & ~keep
            rel_col = jnp.where(rel, jnp.clip(r2c, 0, mt - 1), mt)
            c2r = c2r.at[rel_col].set(-1, mode="drop")
            r2c = jnp.where(keep, r2c, -1)
            return (prices, r2c, c2r, it + 1,
                    jnp.sum(rel.astype(jnp.int32)))

        def cr_cond(st):
            _, _, _, it, n_rel = st
            return jnp.logical_and(it < n + 1, n_rel > 0)

        prices, r2c, c2r, _, _ = jax.lax.while_loop(
            cr_cond, cr_body,
            (prices, r2c, c2r, jnp.int32(0), jnp.int32(1)))
        prices = jnp.where(c2r < 0, 0.0, prices)

        # --- Jacobi bid rounds until every row is assigned
        def body(st):
            prices, r2c, c2r, it = st
            unassigned = r2c < 0
            values = w - prices[None, :]
            best_j = jnp.argmax(values, axis=1).astype(jnp.int32)
            v1 = jnp.max(values, axis=1)
            v2 = jnp.max(values.at[row_ids, best_j].set(_NEG), axis=1)
            bid = prices[best_j] + jnp.minimum(v1 - v2, cap) + eps
            bid_eff = jnp.where(unassigned, bid, _NEG)
            col_best = jnp.full((mt,), _NEG).at[best_j].max(
                bid_eff, mode="drop")
            cand = unassigned & (bid_eff >= col_best[best_j])
            winner = jnp.full((mt,), n, jnp.int32).at[best_j].min(
                jnp.where(cand, row_ids, n), mode="drop")
            won = cand & (winner[best_j] == row_ids)
            contested = winner < n
            prev_owner = jnp.where(contested, c2r, -1)
            evicted = jnp.zeros((n,), bool).at[
                jnp.where(prev_owner >= 0, prev_owner, n)
            ].set(True, mode="drop")
            r2c = jnp.where(evicted, -1, r2c)
            r2c = jnp.where(won, best_j, r2c)
            c2r = jnp.where(contested, winner, c2r)
            prices = jnp.where(contested, col_best, prices)
            return prices, r2c, c2r, it + 1

        def cond(st):
            _, r2c, _, it = st
            return jnp.logical_and(jnp.any(r2c < 0), it < max_iters)

        prices, r2c, c2r, _ = jax.lax.while_loop(
            cond, body, (prices, r2c, c2r, jnp.int32(0)))
        return (prices, r2c, c2r), None

    # masked-out rows are PRE-ASSIGNED to their private dummies: their
    # only non-NEG column is the dummy (weight 0, price 0, never bid on
    # by anyone else), so (i -> m+i) is where the auction must land
    # them anyway and it satisfies eps-CS from the start. Without this
    # they burn bid sweeps auctioning their way to the dummy — and the
    # tracker's stage-2/3 solves routinely run with a near-empty row
    # mask (measured ~0.15 ms/frame of pure dummy-settling on v5e,
    # tools/tpu_tracker_trace.py).
    r2c0 = jnp.where(row_mask, -1, m + row_ids)
    c2r0 = jnp.full((mt,), -1, jnp.int32).at[m + row_ids].set(
        jnp.where(row_mask, -1, row_ids))
    state0 = (jnp.zeros((mt,), jnp.float32), r2c0, c2r0)
    (prices, r2c, c2r), _ = jax.lax.scan(phase, state0, sched)

    gate = jnp.take(
        cost.astype(jnp.float32),
        jnp.clip(r2c, 0, m - 1) + jnp.arange(n) * m,
    )
    row_to_col = jnp.where(
        (r2c >= 0) & (r2c < m) & row_mask & (gate <= thresh), r2c, -1)
    col_to_row = jnp.full((m,), -1, jnp.int32).at[
        jnp.where(row_to_col >= 0, row_to_col, m)
    ].set(
        jnp.where(row_to_col >= 0, jnp.arange(n, dtype=jnp.int32), -1),
        mode="drop",
    )
    return row_to_col, col_to_row
