"""Flax building blocks for the YOLOv7 family (NHWC, TPU-native).

Functional re-implementations of the reference block zoo subset used by
the shipped cfgs (models/common.py): Conv(+BN+SiLU/LeakyReLU) :99-113,
MP :30-36, SP :39-45, ReOrg :48-53, DownC :181-192, SPPCSPC :262-280,
RepConv :463-508, ImplicitA/M :433-461. Activations stay NHWC so convs
map straight onto the MXU; BN keeps torch defaults (eps 1e-5,
momentum 0.1) for checkpoint parity.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

BN_EPS = 1e-5
BN_MOM = 0.9  # flax momentum = 1 - torch momentum (0.1)


def activation(name: str) -> Callable:
    """Activation registry (reference utils/activations.py:9-65 set:
    SiLU/Hardswish/Mish/FReLU — FReLU is a conv-act, unused by any cfg,
    handled as a ValueError here)."""
    if name == "silu":
        return jax.nn.silu
    if name.startswith("leaky:"):
        slope = float(name.split(":")[1])
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name == "id":
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if name == "mish":
        return lambda x: x * jnp.tanh(jax.nn.softplus(x))
    if name == "hardswish":
        return jax.nn.hard_swish
    raise ValueError(name)


class ConvBnAct(nn.Module):
    """Conv (no bias, pad k//2 or explicit p) + BatchNorm + activation.

    fused=True uses a single biased conv (BN folded into the kernel by
    models/fuse.fuse_variables) — the inference analogue of the
    reference's Model.fuse() (utils/torch_utils.py:181,
    models/yolo.py:403-417)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: str = "silu"
    fused: bool = False
    p: Optional[int] = None  # explicit pad (yolov5's 6x6/s2/p2 stem)

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(
            self.c2, (self.k, self.k), strides=self.s,
            padding=self.k // 2 if self.p is None else self.p,
            feature_group_count=self.g,
            use_bias=self.fused, name="conv",
        )(x)
        if not self.fused:
            x = nn.BatchNorm(
                use_running_average=not training, epsilon=BN_EPS,
                momentum=BN_MOM, name="bn",
            )(x)
        return activation(self.act)(x)


class RepConv(nn.Module):
    """Training-form RepVGG conv: 3x3+BN, 1x1+BN, (+identity BN), summed.

    Deploy form (fused rbr_reparam) is handled by the checkpoint
    converter, which folds fused weights back into the dense branch.
    """

    c2: int
    s: int = 1
    act: str = "silu"
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        if self.fused:
            out = nn.Conv(self.c2, (3, 3), strides=self.s, padding=1,
                          use_bias=True, name="rbr_reparam")(x)
            return activation(self.act)(out)
        dense = nn.Conv(self.c2, (3, 3), strides=self.s, padding=1,
                        use_bias=False, name="rbr_dense_conv")(x)
        dense = nn.BatchNorm(use_running_average=not training,
                             epsilon=BN_EPS, momentum=BN_MOM,
                             name="rbr_dense_bn")(dense)
        one = nn.Conv(self.c2, (1, 1), strides=self.s, padding=0,
                      use_bias=False, name="rbr_1x1_conv")(x)
        one = nn.BatchNorm(use_running_average=not training,
                           epsilon=BN_EPS, momentum=BN_MOM,
                           name="rbr_1x1_bn")(one)
        out = dense + one
        if c1 == self.c2 and self.s == 1:
            ident = nn.BatchNorm(use_running_average=not training,
                                 epsilon=BN_EPS, momentum=BN_MOM,
                                 name="rbr_identity")(x)
            out = out + ident
        return activation(self.act)(out)


def max_pool(x, k: int, s: int, pad: int):
    return nn.max_pool(
        x, (k, k), strides=(s, s),
        padding=((pad, pad), (pad, pad)),
    )


def mp(x, k: int = 2):
    """MaxPool k=s=2 (models/common.py:30-36)."""
    return max_pool(x, k, k, 0)


def sp(x, k: int = 3, s: int = 1):
    """Same-size max pool (models/common.py:39-45)."""
    return max_pool(x, k, s, k // 2)


def reorg(x):
    """Space-to-depth x4 (models/common.py:48-53), NHWC: channel order
    matches the reference's cat([::2,::2], [1::2,::2], [::2,1::2],
    [1::2,1::2]) with (h, w) = torch's (w?, h?) — torch comment uses
    (b,c,w,h) but the op is symmetric in the two spatial dims."""
    return jnp.concatenate(
        [
            x[:, ::2, ::2, :],
            x[:, 1::2, ::2, :],
            x[:, ::2, 1::2, :],
            x[:, 1::2, 1::2, :],
        ],
        axis=-1,
    )


class DownC(nn.Module):
    """Two-path downsample (models/common.py:181-192)."""

    c2: int
    k: int = 2
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        f = self.fused
        a = ConvBnAct(c1, 1, 1, fused=f, name="cv1")(x, training)
        a = ConvBnAct(self.c2 // 2, 3, self.k, fused=f, name="cv2")(a, training)
        b = max_pool(x, self.k, self.k, 0)
        b = ConvBnAct(self.c2 // 2, 1, 1, fused=f, name="cv3")(b, training)
        return jnp.concatenate([a, b], axis=-1)


class SPPCSPC(nn.Module):
    """CSP spatial pyramid pooling (models/common.py:262-280)."""

    c2: int
    e: float = 0.5
    k: Sequence[int] = (5, 9, 13)
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(2 * self.c2 * self.e)
        f = self.fused
        x1 = ConvBnAct(c_, 1, 1, fused=f, name="cv1")(x, training)
        x1 = ConvBnAct(c_, 3, 1, fused=f, name="cv3")(x1, training)
        x1 = ConvBnAct(c_, 1, 1, fused=f, name="cv4")(x1, training)
        pooled = [x1] + [sp(x1, k) for k in self.k]
        y1 = jnp.concatenate(pooled, axis=-1)
        y1 = ConvBnAct(c_, 1, 1, fused=f, name="cv5")(y1, training)
        y1 = ConvBnAct(c_, 3, 1, fused=f, name="cv6")(y1, training)
        y2 = ConvBnAct(c_, 1, 1, fused=f, name="cv2")(x, training)
        return ConvBnAct(self.c2, 1, 1, fused=f, name="cv7")(
            jnp.concatenate([y1, y2], axis=-1), training
        )


def upsample_nearest(x, factor: int):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), "nearest")


class Bottleneck(nn.Module):
    """Darknet bottleneck (models/common.py:209-220); n>1 stacks
    sequentially (parse_model nn.Sequential, models/yolo.py:497)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        for j in range(self.n):
            c1 = x.shape[-1]
            c_ = int(self.c2 * self.e)
            pre = f"m{j}_" if self.n > 1 else ""
            y = ConvBnAct(c_, 1, 1, fused=f, name=f"{pre}cv1")(x, training)
            y = ConvBnAct(self.c2, 3, 1, g=self.g, fused=f,
                          name=f"{pre}cv2")(y, training)
            x = x + y if (self.shortcut and c1 == self.c2) else y
        return x


class Res(nn.Module):
    """ResNet bottleneck (models/common.py:223-234)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = ConvBnAct(c_, 1, 1, fused=f, name="cv1")(x, training)
        y = ConvBnAct(c_, 3, 1, g=self.g, fused=f, name="cv2")(y, training)
        y = ConvBnAct(self.c2, 1, 1, fused=f, name="cv3")(y, training)
        return x + y if (self.shortcut and c1 == self.c2) else y


class CSP(nn.Module):
    """CSP wrapper covering the A/B/C split topologies with Bottleneck
    or Res inner stacks (models/common.py:307-404: BottleneckCSPA/B/C,
    ResCSPA/B/C, ResXCSPA/B/C):

      A: y1 = m(cv1(x)),      y2 = cv2(x)   -> cv3(cat)
      B: x1 = cv1(x); y1 = m(x1), y2 = cv2(x1) -> cv3(cat)  (c_ = c2)
      C: y1 = cv3(m(cv1(x))), y2 = cv2(x)   -> cv4(cat)
    """

    c2: int
    n: int = 1
    variant: str = "a"          # 'a' | 'b' | 'c'
    inner: str = "bottleneck"   # 'bottleneck' | 'res'
    shortcut: bool = True
    g: int = 1                  # inner conv groups (32 for ResX)
    inner_e: float = 1.0
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        c_ = self.c2 if self.variant == "b" else self.c2 // 2
        x1 = ConvBnAct(c_, 1, 1, fused=f, name="cv1")(x, training)
        y1 = x1
        for j in range(self.n):
            if self.inner == "res":
                y1 = Res(c_, self.shortcut, self.g, self.inner_e,
                         fused=f, name=f"m{j}")(y1, training)
            else:
                y1 = Bottleneck(c_, 1, self.shortcut, self.g,
                                self.inner_e, fused=f,
                                name=f"m{j}")(y1, training)
        if self.variant == "c":
            y1 = ConvBnAct(c_, 1, 1, fused=f, name="cv3")(y1, training)
        y2 = ConvBnAct(
            c_, 1, 1, fused=f, name="cv2"
        )(x1 if self.variant == "b" else x, training)
        out_name = "cv4" if self.variant == "c" else "cv3"
        return ConvBnAct(self.c2, 1, 1, fused=f, name=out_name)(
            jnp.concatenate([y1, y2], axis=-1), training
        )


class SPP(nn.Module):
    """YOLOv3-SPP pyramid pooling (models/common.py:195-206)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        c_ = x.shape[-1] // 2
        x = ConvBnAct(c_, 1, 1, fused=f, name="cv1")(x, training)
        pools = [max_pool(x, k, 1, k // 2) for k in self.k]
        return ConvBnAct(self.c2, 1, 1, fused=f, name="cv2")(
            jnp.concatenate([x] + pools, axis=-1), training
        )


class Stem(nn.Module):
    """4x-downsampling stem (models/common.py:165-178): stride-2 conv,
    then a conv branch and a maxpool branch concatenated."""

    c2: int
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        c_ = self.c2 // 2
        x = ConvBnAct(c_, 3, 2, fused=f, name="cv1")(x, training)
        a = ConvBnAct(c_, 1, 1, fused=f, name="cv2")(x, training)
        a = ConvBnAct(c_, 3, 2, fused=f, name="cv3")(a, training)
        b = max_pool(x, 2, 2, 0)
        return ConvBnAct(self.c2, 1, 1, fused=f, name="cv4")(
            jnp.concatenate([a, b], axis=-1), training
        )


# ---------------------------------------------------------------------------
# YOLOv5 / YOLOv8 family blocks — the detector families behind the
# reference's track_yolov5.py / track_yolov8.py entries (which import
# ultralytics as a black box; these are clean-room re-implementations of
# the published architectures so the same tracking loop runs on them).
# ---------------------------------------------------------------------------


class C3(nn.Module):
    """YOLOv5 CSP bottleneck with 3 convs: two 1x1 branches, n darknet
    bottlenecks (1x1 -> 3x3, e=1.0) on the first, 1x1 fuse on the concat."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, fused=f, name="cv1")(x, training)
        for j in range(self.n):
            y1 = Bottleneck(c_, 1, self.shortcut, e=1.0, fused=f,
                            name=f"m{j}")(y1, training)
        y2 = ConvBnAct(c_, 1, 1, fused=f, name="cv2")(x, training)
        return ConvBnAct(self.c2, 1, 1, fused=f, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), training
        )


class BottleneckV8(nn.Module):
    """YOLOv8 bottleneck: 3x3 -> 3x3 with optional residual (the C2f
    inner block; kernel pair (3, 3), expansion 1.0)."""

    c2: int
    shortcut: bool = True
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        c1 = x.shape[-1]
        y = ConvBnAct(self.c2, 3, 1, fused=f, name="cv1")(x, training)
        y = ConvBnAct(self.c2, 3, 1, fused=f, name="cv2")(y, training)
        return x + y if (self.shortcut and c1 == self.c2) else y


class C2f(nn.Module):
    """YOLOv8 'fast' CSP: one 1x1 producing 2c channels split in two,
    n BottleneckV8 stages each appending their output, 1x1 fuse over
    the (2 + n) * c concat."""

    c2: int
    n: int = 1
    shortcut: bool = False
    e: float = 0.5
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        c = int(self.c2 * self.e)
        y = ConvBnAct(2 * c, 1, 1, fused=f, name="cv1")(x, training)
        ys = [y[..., :c], y[..., c:]]
        for j in range(self.n):
            ys.append(
                BottleneckV8(c, self.shortcut, fused=f,
                             name=f"m{j}")(ys[-1], training)
            )
        return ConvBnAct(self.c2, 1, 1, fused=f, name="cv2")(
            jnp.concatenate(ys, axis=-1), training
        )


class SPPF(nn.Module):
    """Fast SPP (yolov5 v6+/yolov8): three chained k=5 same-size
    maxpools, concat of all four stages — receptive-field-equivalent to
    SPP(5, 9, 13) at a third of the pooling cost."""

    c2: int
    k: int = 5
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        c_ = x.shape[-1] // 2
        x = ConvBnAct(c_, 1, 1, fused=f, name="cv1")(x, training)
        y1 = max_pool(x, self.k, 1, self.k // 2)
        y2 = max_pool(y1, self.k, 1, self.k // 2)
        y3 = max_pool(y2, self.k, 1, self.k // 2)
        return ConvBnAct(self.c2, 1, 1, fused=f, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), training
        )
