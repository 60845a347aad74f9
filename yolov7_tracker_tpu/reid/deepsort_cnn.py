"""DeepSORT ReID CNN in Flax
(reference tracker/reid_models/deepsort_reid.py:14-113).

Small ResNet: conv3x3(64)+BN+ReLU+maxpool3/2 -> 4 BasicBlock stages
(64, 128/2, 256/2, 512/2) -> avgpool (8, 4) -> L2-normalized 512-d
embedding (reid=True path). Crops are 128h x 64w, ImageNet-normalized
(Extractor._preprocess, :128-146).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN = lambda name=None: nn.BatchNorm(
    use_running_average=True, epsilon=1e-5, momentum=0.9, name=name
)


class BasicBlock(nn.Module):
    c_out: int
    down: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        s = 2 if self.down else 1
        y = nn.Conv(self.c_out, (3, 3), strides=s, padding=1,
                    use_bias=False, name="conv1")(x)
        y = BN("bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.c_out, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = BN("bn2")(y)
        if self.down or c_in != self.c_out:
            x = nn.Conv(self.c_out, (1, 1), strides=s, use_bias=False,
                        name="down_conv")(x)
            x = BN("down_bn")(x)
        return jax.nn.relu(x + y)


class DeepSortCNN(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B, 128, 64, 3) normalized -> (B, 512) L2-normalized."""
        x = nn.Conv(64, (3, 3), padding=1, use_bias=True, name="conv0")(x)
        x = BN("bn0")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (c, down) in enumerate(
            [(64, False), (64, False), (128, True), (128, False),
             (256, True), (256, False), (512, True), (512, False)]
        ):
            x = BasicBlock(c, down, name=f"block{i}")(x)
        x = jnp.mean(x, axis=(1, 2)) * 1.0  # avgpool(8,4) == GAP at 8x4
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


def convert_deepsort_cnn(sd) -> dict:
    """Convert the reference ckpt.t7 'net_dict' state dict."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    params, stats = {}, {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(val, jnp.float32)

    def k(t):
        return np.transpose(t, (2, 3, 1, 0))

    put(params, ("conv0", "kernel"), k(sd["conv.0.weight"]))
    put(params, ("conv0", "bias"), sd["conv.0.bias"])
    put(params, ("bn0", "scale"), sd["conv.1.weight"])
    put(params, ("bn0", "bias"), sd["conv.1.bias"])
    put(stats, ("bn0", "mean"), sd["conv.1.running_mean"])
    put(stats, ("bn0", "var"), sd["conv.1.running_var"])

    layer_map = []  # (torch prefix, my block index)
    idx = 0
    for stage in range(1, 5):
        for rep in range(2):
            layer_map.append((f"layer{stage}.{rep}", idx))
            idx += 1
    for src, i in layer_map:
        dst = (f"block{i}",)
        for cn, bn in (("conv1", "bn1"), ("conv2", "bn2")):
            put(params, dst + (cn, "kernel"), k(sd[f"{src}.{cn}.weight"]))
            put(params, dst + (bn, "scale"), sd[f"{src}.{bn}.weight"])
            put(params, dst + (bn, "bias"), sd[f"{src}.{bn}.bias"])
            put(stats, dst + (bn, "mean"), sd[f"{src}.{bn}.running_mean"])
            put(stats, dst + (bn, "var"), sd[f"{src}.{bn}.running_var"])
        if f"{src}.downsample.0.weight" in sd:
            put(params, dst + ("down_conv", "kernel"),
                k(sd[f"{src}.downsample.0.weight"]))
            put(params, dst + ("down_bn", "scale"),
                sd[f"{src}.downsample.1.weight"])
            put(params, dst + ("down_bn", "bias"),
                sd[f"{src}.downsample.1.bias"])
            put(stats, dst + ("down_bn", "mean"),
                sd[f"{src}.downsample.1.running_mean"])
            put(stats, dst + ("down_bn", "var"),
                sd[f"{src}.downsample.1.running_var"])
    return {"params": params, "batch_stats": stats}
