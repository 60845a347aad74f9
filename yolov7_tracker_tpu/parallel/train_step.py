"""Data-parallel training step (pjit over the mesh).

Replaces the reference train loop's device story (DDP wrap train.py:
277-280, AMP autocast/GradScaler :300,361-375, EMA :200, loss scaled by
world size :364-365): here the batch is sharded over the mesh's data
axis, parameters/EMA replicate, and the gradient all-reduce is the psum
XLA derives from the shardings. bf16 activations replace AMP (TPUs need
no loss scaling); the optimizer runs in f32.

Optimizer parity (train.py:115-196): SGD + Nesterov momentum, weight
decay applied ONLY to conv/dense kernels (pg1) — biases, BN params and
implicit embeddings are decay-free (pg0/pg2) — with the nominal-batch-64
decay scaling and one-cycle cosine LR.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import yolo
from ..models.spec import ModelSpec
from ..train.loss import (
    Hyp, compute_loss, compute_loss_aux_ota, compute_loss_ota,
)


@dataclasses.dataclass(frozen=True)
class OptConfig:
    lr0: float = 0.01
    lrf: float = 0.1            # final OneCycle fraction (hyp['lrf'])
    momentum: float = 0.937
    weight_decay: float = 0.0005
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    epochs: int = 300
    steps_per_epoch: int = 100
    nominal_batch: int = 64
    batch_size: int = 16
    ema_decay: float = 0.9999


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray            # integrated-batch counter ni
    grad_acc: Any = None         # pending gradient sum (None when
                                 # nominal/batch ratio <= 1: no accumulation)
    ema_count: Any = None        # optimizer/EMA update counter (int32)


def _warmup_steps(cfg: OptConfig) -> float:
    # nw = max(3 epochs' worth of batches, 1000) (train.py:298)
    return max(cfg.warmup_epochs * cfg.steps_per_epoch, 1000.0)


def one_cycle_lf(cfg: OptConfig, step):
    """lf(x) = (1+cos(x*pi/epochs))/2 * (1-lrf) + lrf (train.py:190-196),
    stepped per-epoch in the reference; we interpolate per step."""
    x = step / cfg.steps_per_epoch
    return (1 + jnp.cos(x * math.pi / cfg.epochs)) / 2 * (1 - cfg.lrf) + cfg.lrf


def one_cycle_lr(cfg: OptConfig, warmup_from: float = 0.0):
    """Per-group schedule with the reference's warmup interpolation
    (train.py:341-350): lr ramps linearly from `warmup_from` (0 for
    weights/BN, warmup_bias_lr for the bias group) to lr0*lf over nw
    steps, then follows one-cycle cosine."""

    def schedule(step):
        target = cfg.lr0 * one_cycle_lf(cfg, step)
        warm = jnp.clip(step / _warmup_steps(cfg), 0.0, 1.0)
        return warmup_from * (1.0 - warm) + target * warm

    return schedule


def momentum_schedule(cfg: OptConfig):
    """momentum interp warmup_momentum -> momentum over nw steps
    (train.py:349-350)."""

    def schedule(step):
        warm = jnp.clip(step / _warmup_steps(cfg), 0.0, 1.0)
        return cfg.warmup_momentum * (1.0 - warm) + cfg.momentum * warm

    return schedule


def _leaf_name(path) -> str:
    return getattr(path[-1], "key", getattr(path[-1], "name", ""))


def _decay_mask(params):
    """True for conv/dense kernels (pg1, train.py:115-160); biases, BN
    scales and implicit embeddings stay decay-free."""

    def mask_fn(path, leaf):
        return _leaf_name(path) == "kernel"

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def _group_labels(params):
    """'bias' for every .bias leaf (pg2, train.py:115-160), 'rest' for
    kernels/BN scales/implicits (pg0+pg1)."""

    def label_fn(path, leaf):
        return "bias" if _leaf_name(path) == "bias" else "rest"

    return jax.tree_util.tree_map_with_path(label_fn, params)


def accumulate_schedule(cfg: OptConfig):
    """The reference's integrated-batch count (train.py:110-111,341-345):
    accumulate = max(round(nbs/bs), 1) nominally, warmup-interpolated from
    1 over the first nw integrated batches ni. Returns k(ni) as f32."""
    ratio = max(cfg.nominal_batch / cfg.batch_size, 1.0)
    nw = _warmup_steps(cfg)

    def schedule(ni):
        interp = 1.0 + (ratio - 1.0) * jnp.clip(
            ni.astype(jnp.float32) / nw, 0.0, 1.0
        )
        return jnp.maximum(jnp.round(interp), 1.0)

    return schedule


def make_optimizer(cfg: OptConfig):
    """SGD + Nesterov momentum with the reference's parameter groups
    (train.py:115-196): weight decay only on conv/dense kernels (pg1),
    bias group (pg2) warms up from warmup_bias_lr, everything else from 0;
    momentum ramps warmup_momentum -> momentum.

    Returned as a GradientTransformationExtraArgs whose update takes
    ``step=ni`` (the integrated-batch counter): the reference evaluates
    every schedule at ni regardless of how many optimizer steps have
    happened, which matters once gradient accumulation makes optimizer
    steps sparser than batches.
    """
    # decay scaled like the reference: wd *= batch*accumulate/nbs
    wd = cfg.weight_decay * cfg.batch_size * max(
        round(cfg.nominal_batch / cfg.batch_size), 1
    ) / cfg.nominal_batch
    mom = momentum_schedule(cfg)
    lr_bias = one_cycle_lr(cfg, cfg.warmup_bias_lr)
    lr_rest = one_cycle_lr(cfg, 0.0)

    def init(params):
        return jax.tree.map(jnp.zeros_like, params)

    def update(grads, state, params=None, *, step=0, **extra):
        m = mom(step)
        lb, lr = lr_bias(step), lr_rest(step)

        def leaf(path, g, buf, p):
            name = _leaf_name(path)
            if name == "kernel":
                g = g + wd * p          # torch SGD couples wd pre-momentum
            new_buf = m * buf + g
            d = g + m * new_buf         # nesterov
            return -(lb if name == "bias" else lr) * d, new_buf

        pairs = jax.tree_util.tree_map_with_path(leaf, grads, state, params)
        updates = jax.tree.map(lambda t: t[0], pairs,
                               is_leaf=lambda t: isinstance(t, tuple))
        new_state = jax.tree.map(lambda t: t[1], pairs,
                                 is_leaf=lambda t: isinstance(t, tuple))
        return updates, new_state

    return optax.GradientTransformationExtraArgs(init, update)


def make_train_state(spec: ModelSpec, img_size: int = 640,
                     rng: Optional[jax.Array] = None,
                     opt_cfg: OptConfig = OptConfig(),
                     mesh: Optional[Mesh] = None) -> TrainState:
    """Pass the training `mesh` to commit the fresh state to the mesh's
    replicated sharding up front. Without it the eagerly-created leaves
    carry SingleDeviceSharding while the jitted step's outputs carry
    NamedSharding(mesh, P()) — jit keys its dispatch cache on input
    shardings, so the SECOND step silently retraces and recompiles the
    entire program (measured: a full duplicate compile, minutes for
    w6-class models; tests/test_train_smoke.py guards the trace count)."""
    model, variables = yolo.build_model(
        spec, rng=rng, img_size=img_size, init="random"
    )
    tx = make_optimizer(opt_cfg)
    accumulating = round(opt_cfg.nominal_batch / opt_cfg.batch_size) > 1
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        # materialize a distinct copy: ema aliasing params trips buffer
        # donation ("donate the same buffer twice") in the jitted step
        ema_params=jax.tree.map(lambda x: x + 0, variables["params"]),
        step=jnp.int32(0),
        grad_acc=(
            jax.tree.map(jnp.zeros_like, variables["params"])
            if accumulating else None
        ),
        ema_count=jnp.int32(0),
    )
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))
    return state


def make_train_step(spec: ModelSpec, mesh: Mesh, img_size: int = 640,
                    hyp: Hyp = Hyp(), opt_cfg: OptConfig = OptConfig(),
                    compute_dtype: str = "float32", remat: bool = False):
    """Return a jitted (state, imgs, targets, tmask) -> (state, metrics)
    with batch sharded over the mesh data axis and state replicated.

    remat=True rematerializes the forward during backprop
    (jax.checkpoint) — trades ~30% more FLOPs for activation memory,
    enabling larger per-chip batches at high resolution."""
    model = yolo.YoloV7(spec)
    tx = make_optimizer(opt_cfg)

    # IAuxDetect models train with the aux-head loss (the reference's
    # train_aux.py path for w6/e6/d6/e6e, README.md:99-101)
    use_aux = spec.head_kind == "IAuxDetect"

    def fwd(params, batch_stats, x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, training=True, mutable=["batch_stats"],
        )

    if remat:
        fwd = jax.checkpoint(fwd)

    def loss_fn(params, batch_stats, imgs, targets, tmask):
        if compute_dtype == "bfloat16":
            x = imgs.astype(jnp.bfloat16)
            # bf16 COMPUTE params (f32 masters stay in the state; the
            # cast's transpose returns f32 grads). Without this, flax
            # promotes f32 kernel x bf16 input back to f32 and every
            # conv + its backward runs at half the MXU rate — the
            # training step measured ~13% MFU vs serving's ~40% until
            # the forward actually ran bf16. BatchNorm still computes
            # batch statistics in f32 internally (flax _compute_stats
            # upcasts), so running stats keep f32 precision.
            cparams = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, params)
        else:
            x, cparams = imgs, params
        preds, updates = fwd(cparams, batch_stats, x)
        if use_aux:
            preds = [p.astype(jnp.float32) for p in preds]
            loss, metrics = compute_loss_aux_ota(
                preds, targets, tmask, spec, img_size, hyp
            )
        else:
            preds = [p.astype(jnp.float32) for p in preds[: spec.nl]]
            loss_impl = compute_loss_ota if hyp.loss_ota else compute_loss
            loss, metrics = loss_impl(
                preds, targets, tmask, spec, img_size, hyp
            )
        return loss, (metrics, updates["batch_stats"])

    accumulating = round(opt_cfg.nominal_batch / opt_cfg.batch_size) > 1
    acc_sched = accumulate_schedule(opt_cfg)

    def apply_update(state: TrainState, grads):
        """Optimizer step + EMA (the ni % accumulate == 0 branch,
        train.py:369-374). EMA ramp counts optimizer updates, not
        batches (ModelEMA.update, utils/torch_utils.py:269-303)."""
        ni = state.step
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params, step=ni
        )
        params = optax.apply_updates(state.params, updates)
        n_upd = (state.ema_count if state.ema_count is not None
                 else state.step) + 1
        d = opt_cfg.ema_decay * (
            1.0 - jnp.exp(-n_upd.astype(jnp.float32) / 2000.0)
        )
        ema = jax.tree.map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
            state.ema_params, params,
        )
        return state._replace(
            params=params, opt_state=opt_state, ema_params=ema,
            ema_count=n_upd,
        )

    def step_fn(state: TrainState, imgs, targets, tmask):
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, imgs, targets, tmask)
        if not accumulating:
            # nominal/batch ratio <= 1: every batch is an optimizer step
            state = apply_update(state, grads)
        else:
            # true gradient accumulation to the nominal batch (train.py:
            # 341-345,369-374): sum micro-batch grads (the loss is already
            # a per-batch SUM: compute_loss returns loss*bs, so summed
            # micro-grads == one big-batch backward), step the optimizer
            # when ni % accumulate == 0 with the warmup-interpolated
            # accumulate, and carry the pending sum otherwise.
            acc = jax.tree.map(jnp.add, state.grad_acc, grads)
            ni = state.step
            k = acc_sched(ni)
            apply_now = jnp.mod(ni.astype(jnp.float32), k) == 0.0

            def do_apply(st):
                st = apply_update(st, acc)
                return st._replace(
                    grad_acc=jax.tree.map(jnp.zeros_like, acc)
                )

            def no_apply(st):
                return st._replace(grad_acc=acc)

            state = jax.lax.cond(
                apply_now, do_apply, no_apply, state._replace(grad_acc=None)
            )
        new_state = state._replace(
            batch_stats=new_stats, step=state.step + 1
        )
        return new_state, metrics

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    compiler_options = None
    if mesh.devices.flat[0].platform == "cpu":
        # the host-platform backend serializes partitions on few cores and
        # its collective rendezvous hard-terminates after 40s; raise the
        # budget so virtual-device dry runs survive 1-core machines
        compiler_options = {
            "xla_cpu_collective_call_warn_stuck_seconds": 600,
            "xla_cpu_collective_call_terminate_timeout_seconds": 1200,
        }
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, data, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
        compiler_options=compiler_options,
    )
