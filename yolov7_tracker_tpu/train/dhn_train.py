"""DHN (Deep Hungarian Net) trainer.

The reference integrates DHN inference into DeepMOT
(tracker/deepmot.py) but ships neither weights nor a training script;
the DeepMOT paper (Xu et al., CVPR 2020 §4.1) trains it as a
soft-assignment regressor: random distance matrices labeled by the
exact Hungarian solution, weighted focal-BCE per cell. This module
reproduces that recipe so DHN weights are producible on-box.

    python -m yolov7_tracker_tpu.train.dhn_train --steps 2000 \
        --out dhn.msgpack
"""

from __future__ import annotations

import argparse

import numpy as np


def make_problem(rng: np.random.Generator, h: int, w: int,
                 pad_to=None):
    """A synthetic association problem: a noisy block-diagonal distance
    matrix (tracks near their own detections) + its Hungarian labels.

    pad_to=(H, W): embed the h x w problem top-left in an H x W matrix
    padded with cost 1.0 / label 0 — the exact geometry
    reid/dhn.compact_cost presents to the DHN at serving time."""
    from scipy.optimize import linear_sum_assignment

    d = rng.uniform(0.3, 1.0, (h, w)).astype(np.float32)
    k = min(h, w)
    perm = rng.permutation(w)[:k]
    d[np.arange(k), perm] = rng.uniform(0.0, 0.35, k)
    rows, cols = linear_sum_assignment(d)
    y = np.zeros((h, w), np.float32)
    # only confident matches count as positives (paper: thresholded GT)
    ok = d[rows, cols] < 0.5
    y[rows[ok], cols[ok]] = 1.0
    if pad_to is not None:
        dp = np.full(pad_to, 1.0, np.float32)
        yp = np.zeros(pad_to, np.float32)
        dp[:h, :w] = d
        yp[:h, :w] = y
        return dp, yp
    return d, y


def weighted_focal_bce(pred, target, gamma: float = 2.0):
    """Per-cell focal BCE with positive-class reweighting by inverse
    frequency (DeepMOT Eq. 9)."""
    import jax.numpy as jnp

    eps = 1e-7
    p = jnp.clip(pred, eps, 1.0 - eps)
    n_pos = jnp.maximum(jnp.sum(target), 1.0)
    n_neg = jnp.maximum(target.size - jnp.sum(target), 1.0)
    w = jnp.where(target > 0.5, target.size / n_pos, target.size / n_neg)
    focal = jnp.where(target > 0.5, (1 - p) ** gamma, p ** gamma)
    bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
    return jnp.mean(w * focal * bce)


def train_dhn(steps: int = 2000, h: int = 16, w: int = 16,
              lr: float = 3e-4, seed: int = 0, log_every: int = 100,
              hidden: int = 256, arch: str = "gru",
              pad_train: bool = False, batch: int = 1):
    """Train DHN on synthetic Hungarian problems; returns variables.

    pad_train: sample the VALID problem size uniformly in [1, h] x
    [1, w] and pad to (h, w) with cost 1.0 / label 0 — teaches the net
    the serving-time compact_cost geometry (random sizes also stop the
    size-agnostic sinkhorn arch from overfitting one shape)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..reid.dhn import build_dhn

    model = build_dhn(arch, hidden)
    rng = np.random.default_rng(seed)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((h, w)))
    tx = optax.adam(lr)
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state, d, y):
        def loss_fn(v):
            def one(di, yi):
                return weighted_focal_bce(model.apply(v, di), yi)
            return jnp.mean(jax.vmap(one)(d, y))

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    def sample():
        if pad_train:
            hv = int(rng.integers(1, h + 1))
            wv = int(rng.integers(1, w + 1))
            return make_problem(rng, hv, wv, pad_to=(h, w))
        return make_problem(rng, h, w)

    for i in range(steps):
        ds, ys = zip(*(sample() for _ in range(batch)))
        variables, opt_state, loss = step(
            variables, opt_state,
            jnp.asarray(np.stack(ds)), jnp.asarray(np.stack(ys))
        )
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i + 1}: loss {float(loss):.4f}")
    return variables


def eval_dhn(variables, arch: str = "gru", hidden: int = 256,
             n: int = 64, h: int = 32, w: int = 32, seed: int = 1,
             pad_to=None):
    """Held-out quality: mean per-cell accuracy at 0.5 and Hungarian
    match agreement (positives recovered with score > 0.1 — the serving
    threshold: deepmot matches on 1 - DHN(D) with cost limit 0.9)."""
    import jax
    import jax.numpy as jnp

    from ..reid.dhn import build_dhn

    model = build_dhn(arch, hidden)
    apply = jax.jit(lambda d: model.apply(variables, d))
    rng = np.random.default_rng(seed)
    accs, recalls = [], []
    for _ in range(n):
        hv = int(rng.integers(2, h + 1)) if pad_to else h
        wv = int(rng.integers(2, w + 1)) if pad_to else w
        d, y = make_problem(rng, hv, wv, pad_to=pad_to)
        p = np.asarray(apply(jnp.asarray(d)))
        accs.append(float(((p > 0.5) == (y > 0.5)).mean()))
        npos = y.sum()
        if npos:
            recalls.append(float(((p > 0.1) & (y > 0.5)).sum() / npos))
    return {"cell_acc": float(np.mean(accs)),
            "match_recall": float(np.mean(recalls))}


def main(argv=None):
    p = argparse.ArgumentParser("dhn trainer")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--size", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--hidden", type=int, default=256,
                   help="GRU width; reference arch is 256, small values "
                        "train fast for tests")
    p.add_argument("--arch", type=str, default="gru",
                   choices=["gru", "sinkhorn"])
    p.add_argument("--pad_train", action="store_true",
                   help="random valid sizes padded to --size "
                        "(serving-time compact_cost geometry)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--out", type=str, default="dhn.msgpack")
    opts = p.parse_args(argv)
    variables = train_dhn(opts.steps, opts.size, opts.size, opts.lr,
                          hidden=opts.hidden, arch=opts.arch,
                          pad_train=opts.pad_train, batch=opts.batch)
    metrics = eval_dhn(variables, arch=opts.arch, hidden=opts.hidden,
                       h=opts.size, w=opts.size,
                       pad_to=(opts.size, opts.size)
                       if opts.pad_train else None)
    print(f"eval: {metrics}")
    from ..utils import checkpoint

    checkpoint.save_variables(opts.out, variables)
    print(f"saved {opts.out}")
    return variables


if __name__ == "__main__":
    main()
