"""OSNet in Flax (reference tracker/reid_models/OSNet.py:28-598).

Omni-scale ReID backbone: ConvLayer 7x7/2 -> maxpool -> 3 stages of
OSBlocks (multi-stream LightConv3x3 chains fused by a shared ChannelGate)
with 1x1+avgpool transitions -> Conv1x1 -> GAP -> fc(512). Inference
returns the 512-d embedding (torch module returns v when not training).

Factories mirror osnet_x1_0/x0_75/x0_5/x0_25 channel configs (:522-573);
weights convert from torchreid checkpoints via ``convert_osnet``.
NHWC layout; BN torch defaults.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN = lambda name=None: nn.BatchNorm(
    use_running_average=True, epsilon=1e-5, momentum=0.9, name=name
)


class ConvBNRelu(nn.Module):
    c: int
    k: int = 1
    s: int = 1
    p: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.c, (self.k, self.k), strides=self.s,
                    padding=self.p, feature_group_count=self.groups,
                    use_bias=False, name="conv")(x)
        x = BN("bn")(x)
        return jax.nn.relu(x)


class Conv1x1Linear(nn.Module):
    c: int
    s: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.c, (1, 1), strides=self.s, padding=0,
                    use_bias=False, name="conv")(x)
        return BN("bn")(x)


class LightConv3x3(nn.Module):
    c: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.c, (1, 1), padding=0, use_bias=False,
                    name="conv1")(x)
        x = nn.Conv(self.c, (3, 3), padding=1, use_bias=False,
                    feature_group_count=self.c, name="conv2")(x)
        x = BN("bn")(x)
        return jax.nn.relu(x)


class ChannelGate(nn.Module):
    c: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.c // self.reduction, (1, 1), use_bias=True,
                    name="fc1")(g)
        g = jax.nn.relu(g)
        g = nn.Conv(self.c, (1, 1), use_bias=True, name="fc2")(g)
        return x * jax.nn.sigmoid(g)


class OSBlock(nn.Module):
    c_out: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        mid = self.c_out // self.reduction
        ident = x
        x1 = ConvBNRelu(mid, 1, name="conv1")(x)
        streams = []
        for si, depth in enumerate([1, 2, 3, 4]):
            h = x1
            for d in range(depth):
                name = f"conv2{'abcd'[si]}" + (f"_{d}" if depth > 1 else "")
                h = LightConv3x3(mid, name=name)(h)
            streams.append(h)
        gate = ChannelGate(mid, name="gate")
        x2 = sum(gate(s) for s in streams)
        x3 = Conv1x1Linear(self.c_out, name="conv3")(x2)
        if ident.shape[-1] != self.c_out:
            ident = Conv1x1Linear(self.c_out, name="downsample")(ident)
        return jax.nn.relu(x3 + ident)


class OSNet(nn.Module):
    channels: Sequence[int] = (64, 256, 384, 512)
    layers: Sequence[int] = (2, 2, 2)
    feature_dim: int = 512

    @nn.compact
    def __call__(self, x):
        """x: (B, 256, 128, 3) normalized crops -> (B, feature_dim)."""
        ch = self.channels
        x = ConvBNRelu(ch[0], 7, 2, 3, name="conv1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage in range(3):
            for i in range(self.layers[stage]):
                x = OSBlock(ch[stage + 1], name=f"conv{stage+2}_{i}")(x)
            if stage < 2:  # reduce_spatial_size for conv2/conv3
                x = ConvBNRelu(ch[stage + 1], 1, name=f"conv{stage+2}_t")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBNRelu(ch[3], 1, name="conv5")(x)
        v = jnp.mean(x, axis=(1, 2))
        v = nn.Dense(self.feature_dim, name="fc_0")(v)
        v = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         momentum=0.9, name="fc_1")(v)
        return jax.nn.relu(v)


OSNET_CONFIGS = {
    "osnet_x1_0": (64, 256, 384, 512),
    "osnet_x0_75": (48, 192, 288, 384),
    "osnet_x0_5": (32, 128, 192, 256),
    "osnet_x0_25": (16, 64, 96, 128),
}


def build_osnet(name: str = "osnet_x0_25"):
    return OSNet(channels=OSNET_CONFIGS[name])


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _k(t):
    return np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0))


def convert_osnet(sd) -> dict:
    """torchreid OSNet state_dict -> flax variables.

    Handles the reference's load_pretrained_weights semantics
    (load_model_tools.py:200-273: partial intersect, 'module.' strip).
    """
    sd = {
        k[7:] if k.startswith("module.") else k:
        np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in sd.items()
    }
    params, stats = {}, {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(val, jnp.float32)

    def conv_bn(dst, src, conv_names=("conv", "bn")):
        cname, bname = conv_names
        put(params, dst + (cname, "kernel"), _k(sd[src + f".{cname}.weight"]))
        put(params, dst + (bname, "scale"), sd[src + f".{bname}.weight"])
        put(params, dst + (bname, "bias"), sd[src + f".{bname}.bias"])
        put(stats, dst + (bname, "mean"), sd[src + f".{bname}.running_mean"])
        put(stats, dst + (bname, "var"), sd[src + f".{bname}.running_var"])

    def light(dst, src):
        put(params, dst + ("conv1", "kernel"), _k(sd[src + ".conv1.weight"]))
        put(params, dst + ("conv2", "kernel"), _k(sd[src + ".conv2.weight"]))
        put(params, dst + ("bn", "scale"), sd[src + ".bn.weight"])
        put(params, dst + ("bn", "bias"), sd[src + ".bn.bias"])
        put(stats, dst + ("bn", "mean"), sd[src + ".bn.running_mean"])
        put(stats, dst + ("bn", "var"), sd[src + ".bn.running_var"])

    conv_bn(("conv1",), "conv1")
    # stages: torch conv{2,3,4} are Sequential[OSBlock x n (+ transition)]
    for stage in range(3):
        tname = f"conv{stage+2}"
        n_blocks = 2
        for i in range(n_blocks):
            dst = (f"{tname}_{i}",)
            src = f"{tname}.{i}"
            conv_bn(dst + ("conv1",), src + ".conv1")
            for si, depth in enumerate([1, 2, 3, 4]):
                letter = "abcd"[si]
                for d in range(depth):
                    sub = f".conv2{letter}" + (f".{d}" if depth > 1 else "")
                    name = f"conv2{letter}" + (f"_{d}" if depth > 1 else "")
                    light(dst + (name,), src + sub)
            for gfc in ("fc1", "fc2"):
                put(params, dst + ("gate", gfc, "kernel"),
                    _k(sd[src + f".gate.{gfc}.weight"]))
                put(params, dst + ("gate", gfc, "bias"),
                    sd[src + f".gate.{gfc}.bias"])
            conv_bn(dst + ("conv3",), src + ".conv3")
            if src + ".downsample.conv.weight" in sd:
                conv_bn(dst + ("downsample",), src + ".downsample")
        if stage < 2:
            # transition Sequential(Conv1x1, AvgPool) at index n_blocks
            conv_bn((f"{tname}_t",), f"{tname}.{n_blocks}.0")
    conv_bn(("conv5",), "conv5")
    put(params, ("fc_0", "kernel"),
        np.transpose(sd["fc.0.weight"], (1, 0)))
    put(params, ("fc_0", "bias"), sd["fc.0.bias"])
    put(params, ("fc_1", "scale"), sd["fc.1.weight"])
    put(params, ("fc_1", "bias"), sd["fc.1.bias"])
    put(stats, ("fc_1", "mean"), sd["fc.1.running_mean"])
    put(stats, ("fc_1", "var"), sd["fc.1.running_var"])
    return {"params": params, "batch_stats": stats}
