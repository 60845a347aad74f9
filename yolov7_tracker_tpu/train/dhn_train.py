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


def make_problem(rng: np.random.Generator, h: int, w: int):
    """A synthetic association problem: a noisy block-diagonal distance
    matrix (tracks near their own detections) + its Hungarian labels."""
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
              hidden: int = 256):
    """Train DHN on synthetic Hungarian problems; returns variables."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..reid.dhn import DHN

    model = DHN(hidden=hidden)
    rng = np.random.default_rng(seed)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((h, w)))
    tx = optax.adam(lr)
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state, d, y):
        def loss_fn(v):
            pred = model.apply(v, d)
            return weighted_focal_bce(pred, y)

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    for i in range(steps):
        d, y = make_problem(rng, h, w)
        variables, opt_state, loss = step(
            variables, opt_state, jnp.asarray(d), jnp.asarray(y)
        )
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i + 1}: loss {float(loss):.4f}")
    return variables


def main(argv=None):
    p = argparse.ArgumentParser("dhn trainer")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--size", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--hidden", type=int, default=256,
                   help="GRU width; reference arch is 256, small values "
                        "train fast for tests")
    p.add_argument("--out", type=str, default="dhn.msgpack")
    opts = p.parse_args(argv)
    variables = train_dhn(opts.steps, opts.size, opts.size, opts.lr,
                          hidden=opts.hidden)
    from ..utils import checkpoint

    checkpoint.save_variables(opts.out, variables)
    print(f"saved {opts.out}")
    return variables


if __name__ == "__main__":
    main()
