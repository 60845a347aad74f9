import numpy as np
import pytest

import jax.numpy as jnp

from yolov7_tracker_tpu.ops import assignment


def device_matches(cost, row_mask, col_mask, thresh):
    r2c, c2r = assignment.masked_assignment(
        jnp.asarray(cost, jnp.float32),
        jnp.asarray(row_mask),
        jnp.asarray(col_mask),
        thresh,
    )
    r2c = np.asarray(r2c)
    c2r = np.asarray(c2r)
    matches = {(i, int(r2c[i])) for i in range(len(r2c)) if r2c[i] >= 0}
    # consistency between the two return views
    for i, j in matches:
        assert c2r[j] == i
    assert len({j for _, j in matches}) == len(matches)
    return matches


def host_matches(cost, thresh):
    m, ur, uc = assignment.linear_assignment_host(cost, thresh)
    return {(int(r), int(c)) for r, c in m}


def total_cost(cost, matches, thresh, n_rows, n_cols):
    matched_r = {i for i, _ in matches}
    matched_c = {j for _, j in matches}
    c = sum(cost[i, j] for i, j in matches)
    c += (thresh / 2) * (n_rows - len(matched_r))
    c += (thresh / 2) * (n_cols - len(matched_c))
    return c


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("shape", [(8, 8), (12, 5), (5, 12), (1, 1), (20, 20)])
def test_device_matches_host_optimum(seed, shape):
    rng = np.random.default_rng(seed)
    n, m = shape
    cost = rng.uniform(0, 1, (n, m))
    thresh = 0.7
    got = device_matches(cost, np.ones(n, bool), np.ones(m, bool), thresh)
    want = host_matches(cost, thresh)
    # optimal matchings may differ on exact ties; compare objective values
    tg = total_cost(cost, got, thresh, n, m)
    tw = total_cost(cost, want, thresh, n, m)
    assert tg <= tw + 1e-3, (tg, tw, got, want)
    # and with random continuous costs the optimum is unique a.s.
    assert got == want


def test_cost_limit_gate():
    cost = np.array([[0.2, 0.95], [0.95, 0.3]])
    got = device_matches(cost, np.ones(2, bool), np.ones(2, bool), 0.7)
    assert got == {(0, 0), (1, 1)}
    # everything over the limit -> nothing matches
    got = device_matches(cost + 10.0, np.ones(2, bool), np.ones(2, bool), 0.7)
    assert got == set()


def test_limit_changes_structure():
    # classic lapjv-vs-greedy case: global optimum sacrifices one pair
    cost = np.array([[0.1, 0.5], [0.5, 10.0]])
    # with a loose limit, (0,1)+(1,0) total = 1.0 > (0,0)+(1 unmatched)
    got = device_matches(cost, np.ones(2, bool), np.ones(2, bool), 0.6)
    want = host_matches(cost, 0.6)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_masks_respected(seed):
    rng = np.random.default_rng(100 + seed)
    n, m = 16, 14
    cost = rng.uniform(0, 1, (n, m))
    row_mask = rng.uniform(size=n) > 0.3
    col_mask = rng.uniform(size=m) > 0.3
    got = device_matches(cost, row_mask, col_mask, 0.8)
    for i, j in got:
        assert row_mask[i] and col_mask[j]
    # equivalent host problem: restrict to valid rows/cols
    sub = cost[np.ix_(row_mask.nonzero()[0], col_mask.nonzero()[0])]
    want_sub = host_matches(sub, 0.8)
    rmap = row_mask.nonzero()[0]
    cmap = col_mask.nonzero()[0]
    want = {(int(rmap[i]), int(cmap[j])) for i, j in want_sub}
    assert got == want


def test_empty_masks():
    cost = np.zeros((4, 4))
    got = device_matches(cost, np.zeros(4, bool), np.ones(4, bool), 0.5)
    assert got == set()


@pytest.mark.parametrize("seed", range(3))
def test_large_slab(seed):
    rng = np.random.default_rng(200 + seed)
    n, m = 96, 80
    cost = rng.uniform(0, 1.2, (n, m))
    thresh = 0.9
    got = device_matches(cost, np.ones(n, bool), np.ones(m, bool), thresh)
    want = host_matches(cost, thresh)
    tg = total_cost(cost, got, thresh, n, m)
    tw = total_cost(cost, want, thresh, n, m)
    # dense-random 96x80 is a tie-heavy stress case: require objective
    # optimality (the semantic invariant); the exact pair set may tie-swap
    # just like lap-vs-scipy would.
    assert abs(tg - tw) < 1e-3, (tg, tw)


def test_pallas_auction_interpret_matches_host():
    """The Pallas kernel semantics via interpret mode (CPU-executable):
    same matching as the scipy host reference on association-shaped
    matrices."""
    import jax.numpy as jnp

    from yolov7_tracker_tpu.ops.assignment import linear_assignment_host
    from yolov7_tracker_tpu.ops.pallas_auction import (
        masked_assignment_pallas,
    )

    rng = np.random.default_rng(0)
    T, D = 24, 16
    for case in range(3):
        nt, nd = rng.integers(4, T), rng.integers(4, D)
        iou = rng.uniform(0, 0.3, (T, D)).astype(np.float32)
        for k in range(min(nt, nd) - 1):
            iou[k, k] = rng.uniform(0.5, 0.95)
        cost = 1.0 - iou
        rm = np.arange(T) < nt
        cm = np.arange(D) < nd
        r2c, c2r = masked_assignment_pallas(
            jnp.asarray(cost), jnp.asarray(rm), jnp.asarray(cm), 0.8,
            n_phases=5, interpret=True,
        )
        r2c = np.asarray(r2c)
        m0, _, _ = linear_assignment_host(cost[:nt, :nd], 0.8)
        got = {(i, int(r2c[i])) for i in range(T) if r2c[i] >= 0}
        want = {(int(a), int(b)) for a, b in m0}
        gc = sum(cost[i, j] for i, j in got)
        rc = sum(cost[i, j] for i, j in want)
        assert len(got) == len(want), (case, got, want)
        assert abs(gc - rc) < 1e-3, (case, gc, rc)
        # c2r consistent with r2c
        for i, j in got:
            assert int(np.asarray(c2r)[j]) == i


@pytest.mark.slow  # Pallas interpret run; the TPU default dispatches to the XLA v2 solver, covered fast
def test_pallas_auction_v2_interpret_matches_host():
    """The private-dummy rectangular kernel (the TPU default backend,
    ops/assignment.py solve_assignment): same matching as the scipy host
    reference on association-shaped AND adversarial dense matrices."""
    import jax.numpy as jnp

    from yolov7_tracker_tpu.ops.assignment import linear_assignment_host
    from yolov7_tracker_tpu.ops.pallas_auction import (
        masked_assignment_pallas_v2,
    )

    rng = np.random.default_rng(0)
    T, D = 24, 16
    for case in range(4):
        nt, nd = rng.integers(4, T), rng.integers(4, D)
        if case < 3:  # association-shaped: sparse high-IoU diagonal
            iou = rng.uniform(0, 0.3, (T, D)).astype(np.float32)
            for k in range(min(nt, nd) - 1):
                iou[k, k] = rng.uniform(0.5, 0.95)
            cost = 1.0 - iou
        else:  # adversarial dense
            cost = rng.uniform(0, 1, (T, D)).astype(np.float32)
        rm = np.arange(T) < nt
        cm = np.arange(D) < nd
        r2c, c2r = masked_assignment_pallas_v2(
            jnp.asarray(cost), jnp.asarray(rm), jnp.asarray(cm), 0.8,
            n_phases=5, interpret=True,
        )
        r2c = np.asarray(r2c)
        m0, _, _ = linear_assignment_host(cost[:nt, :nd], 0.8)
        got = {(i, int(r2c[i])) for i in range(T) if r2c[i] >= 0}
        want = {(int(a), int(b)) for a, b in m0}
        gc = sum(cost[i, j] for i, j in got)
        rc = sum(cost[i, j] for i, j in want)
        assert len(got) == len(want), (case, got, want)
        # objective optimality within the n*eps_final bound (ties may swap)
        assert abs(gc - rc) < 1e-2, (case, gc, rc)
        for i, j in got:
            assert int(np.asarray(c2r)[j]) == i


def test_pallas_auction_batched_interpret():
    """Batched lockstep kernel semantics (interpret mode): same matching
    as the scipy host reference on each problem in the batch."""
    import jax.numpy as jnp

    from yolov7_tracker_tpu.ops.assignment import linear_assignment_host
    from yolov7_tracker_tpu.ops.pallas_auction import (
        masked_assignment_pallas_batched,
    )

    rng = np.random.default_rng(0)
    T, D, B = 24, 16, 3
    costs, rms, cms = [], [], []
    for _ in range(B):
        nt, nd = rng.integers(4, T), rng.integers(4, D)
        iou = rng.uniform(0, 0.3, (T, D)).astype(np.float32)
        for k in range(min(nt, nd) - 1):
            iou[k, k] = rng.uniform(0.5, 0.95)
        costs.append(1.0 - iou)
        rms.append(np.arange(T) < nt)
        cms.append(np.arange(D) < nd)
    costs, rms, cms = map(np.stack, (costs, rms, cms))
    r2c, c2r = masked_assignment_pallas_batched(
        jnp.asarray(costs), jnp.asarray(rms), jnp.asarray(cms), 0.8,
        n_phases=5, interpret=True,
    )
    r2c = np.asarray(r2c)
    for b in range(B):
        nt, nd = rms[b].sum(), cms[b].sum()
        m0, _, _ = linear_assignment_host(costs[b][:nt, :nd], 0.8)
        got = {(i, int(r2c[b, i])) for i in range(T) if r2c[b, i] >= 0}
        want = {(int(a), int(bb)) for a, bb in m0}
        gc = sum(costs[b][i, j] for i, j in got)
        rc = sum(costs[b][i, j] for i, j in want)
        assert len(got) == len(want)
        assert abs(gc - rc) < 1e-3
        for i, j in got:
            assert int(np.asarray(c2r)[b, j]) == i


def test_masked_assignment_v2_matches_host():
    """The XLA private-dummy rectangular auction (the TPU-default
    backend) vs the scipy host oracle across shapes/masks/thresholds."""
    import jax.numpy as jnp

    from yolov7_tracker_tpu.ops.assignment import (
        linear_assignment_host, masked_assignment_v2,
    )

    rng = np.random.default_rng(3)
    for t in range(12):
        n, m = int(rng.integers(2, 60)), int(rng.integers(2, 60))
        cost = rng.random((n, m)).astype(np.float32)
        rm = rng.random(n) < 0.85
        cm = rng.random(m) < 0.85
        thresh = float(rng.choice([0.3, 0.5, 0.8]))
        big = np.where(rm[:, None] & cm[None, :], cost, 1e9)
        r2c, c2r = masked_assignment_v2(
            jnp.asarray(cost), jnp.asarray(rm), jnp.asarray(cm), thresh)
        r2c = np.asarray(r2c)
        m0, _, _ = linear_assignment_host(big, thresh)
        got = {(i, int(v)) for i, v in enumerate(r2c) if v >= 0}
        want = {(int(a), int(b)) for a, b in m0}
        gc = sum(cost[i, j] for i, j in got)
        wc = sum(cost[i, j] for i, j in want)
        assert len(got) == len(want), (t, len(got), len(want))
        assert abs(gc - wc) < 1e-2, (t, gc, wc)
        for i, j in got:
            assert int(np.asarray(c2r)[j]) == i
