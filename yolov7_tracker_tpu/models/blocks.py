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

# fused-flag sentinel: fused="int8" selects the W8A8 post-training
# quantized serving form (models/quant.py). The string is truthy, so
# every composite block that forwards ``fused=self.fused`` to its inner
# ConvBnAct/RepConv propagates the mode automatically, while plain
# ``fused=True`` call sites are unaffected (True == INT8 is False).
INT8 = "int8"


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


class _ReOrgFoldedConv(nn.Module):
    """conv3x3(reorg(x)) computed as ONE 6x6 stride-2 pad-2 conv on the
    raw image — exact algebraic identity (output (i,j) of the folded
    form touches x[2i-2..2i+3, 2j-2..2j+3], the union of the 3x3
    window's space-to-depth taps; W6[u,v,c] = W3[u//2, v//2,
    ((v%2)*2 + (u%2))*C + c]). Removes the reorg's materialized
    12-channel intermediate and its layout copies (~0.2 ms/frame for
    w6@1088/b16, profiled). Parameters keep nn.Conv's tree structure
    and the (3, 3, 4C, c2) reorg-input shape, so checkpoints and the
    torch converter are unaffected."""

    c2: int
    use_bias: bool

    @nn.compact
    def __call__(self, x):
        c1 = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 4 * c1, self.c2),
        )
        # W6[2a+dy, 2b+dx] = W3[a, b, (dx*2+dy)*C:...] as one
        # reshape/transpose: split the input-channel axis into the
        # (dx, dy) phase pair and interleave into the spatial axes.
        k6 = (kernel
              .reshape(3, 3, 2, 2, c1, self.c2)   # (a, b, dx, dy, C, c2)
              .transpose(0, 3, 1, 2, 4, 5)        # (a, dy, b, dx, C, c2)
              .reshape(6, 6, c1, self.c2))
        y = jax.lax.conv_general_dilated(
            x, k6.astype(x.dtype), window_strides=(2, 2),
            padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, (self.c2,)
            ).astype(y.dtype)
        return y


class _WPackConv(nn.Module):
    """Fused conv executed on width-packed tensors (models/wpack.py).

    Parameters keep the regular fused-conv tree ("kernel"/"bias" with
    reference shapes — for mode='stem' the _ReOrgFoldedConv shape
    (3, 3, 4C, c2)), so checkpoints, the torch converter, and
    fuse_variables are all unaffected; the packed kernel is a cheap
    in-call rearrangement (a few dynamic-update-slices on a tensor of
    kernel size, nothing proportional to activations).

    Modes:
      'stem'   letterbox canvas in -> packed out: fold ReOrg+3x3 to
               6x6/s2 (exact, see _ReOrgFoldedConv), then emit the
               packed output straight from the UNPACKED canvas
               (wpack.stem_kernel_unpacked — no image relayout);
      'packed' packed in -> packed out (s in {1, 2});
      'exit'   packed in -> regular out (s=2 only).
    perm: canonical packed input channel held at each raw position —
    set when the input is a concat of packed tensors (wpack.concat_perm).
    raw_in: the canvas skipped BGR->RGB and /255 (device_preprocess
    normalize=False); both fold into the stem kernel — exact for the
    flip, and the scale just moves one rounding from every canvas
    element onto the kernel (zero conv padding commutes with a linear
    scale; the 114 pad band scales identically on either side).
    """

    c2: int
    k: int
    s: int
    mode: str
    perm: Optional[Tuple[int, ...]] = None
    raw_in: bool = False

    @nn.compact
    def __call__(self, x, bands=None):
        from . import wpack

        if bands is not None and self.mode != "stem":
            raise ValueError("bands only apply to the stem mode")
        if self.mode == "stem":
            c1 = x.shape[-1]
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (3, 3, 4 * c1, self.c2),
            )
            # ReOrg fold: (3,3,4C,c2) -> 6x6/s2 kernel (the exact
            # relabeling derived in _ReOrgFoldedConv)
            k6 = (kernel
                  .reshape(3, 3, 2, 2, c1, self.c2)
                  .transpose(0, 3, 1, 2, 4, 5)
                  .reshape(6, 6, c1, self.c2))
            if self.raw_in:
                k6 = k6[:, :, ::-1, :] * (1.0 / 255.0)
            kp, strides, pads = wpack.stem_kernel_unpacked(k6)
            if bands is not None and any(bands):
                # input is the UNPADDED letterbox resize: widen the H
                # conv padding by the band rows (zeros) and add the
                # exact constant-band contribution to the affected
                # output rows (wpack.stem_band_corrections)
                top_b, bot_b = bands
                pads = ((pads[0][0] + top_b, pads[0][1] + bot_b),
                        pads[1])
            y = jax.lax.conv_general_dilated(
                x, kp.astype(x.dtype), strides, pads,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if bands is not None and any(bands):
                # canvas band value: raw stems see the raw-scale 114,
                # normalized stems the /255 one (BGR flip is moot — the
                # band is channel-constant)
                band_val = 114.0 if self.raw_in else 114.0 / 255.0
                ct, cb, r_top, r_bot = wpack.stem_band_corrections(
                    kp.astype(x.dtype), x.shape[1], x.shape[2],
                    bands, band_val)
                if ct is not None:
                    y = y.at[:, :r_top].add(ct.astype(y.dtype))
                if cb is not None:
                    y = y.at[:, r_bot:].add(cb.astype(y.dtype))
            bias = self.param("bias", nn.initializers.zeros, (self.c2,))
            return y + wpack.packed_bias(bias, 2).astype(y.dtype)
        c1 = x.shape[-1] // 2
        q = 2 if self.mode == "packed" else 1
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.k, self.k, c1, self.c2),
        )
        kp, sp, pads = wpack.pack_kernel(
            kernel, s=self.s, pad=self.k // 2, q=q, in_perm=self.perm)
        y = jax.lax.conv_general_dilated(
            x, kp.astype(x.dtype), (self.s, sp),
            ((self.k // 2, self.k // 2), pads),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bias = self.param("bias", nn.initializers.zeros, (self.c2,))
        return y + wpack.packed_bias(bias, q).astype(y.dtype)


class _QuantConv(nn.Module):
    """W8A8 static-PTQ conv (no reference counterpart — the reference
    serves fp16; this is a TPU-native lever: the v5e MXU runs int8
    MACs at 2x the bf16 rate).

    Params (produced by models/quant.quantize_variables):
      kernel  int8 HWIO, per-output-channel symmetric
      w_scale f32 (c2,)   weight dequant scale (absmax/127 per channel)
      a_scale f32 ()      static per-tensor input scale from calibration
      bias    f32 (c2,)   the fused conv bias, applied after dequant

    Forward: quantize the bf16 input (round/clip — fuses into the
    producing op), int8xint8->int32 conv on the MXU, dequant
    ``int32 * (w_scale*a_scale) + bias`` in f32 (fuses into the
    following activation), cast back to the network compute dtype.
    reorg_fold reuses _ReOrgFoldedConv's kernel reshape on the int8
    kernel (pure relabeling, exact)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    p: Optional[int] = None
    reorg_fold: bool = False

    @nn.compact
    def __call__(self, x):
        c1 = x.shape[-1]
        if self.reorg_fold:
            kshape = (3, 3, 4 * c1, self.c2)
        else:
            kshape = (self.k, self.k, c1 // self.g, self.c2)
        kernel = self.param(
            "kernel", nn.initializers.zeros, kshape, jnp.int8
        )
        w_scale = self.param(
            "w_scale", nn.initializers.ones, (self.c2,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.c2,), jnp.float32
        )
        a_scale = self.param(
            "a_scale", nn.initializers.ones, (), jnp.float32
        )
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
        ).astype(jnp.int8)
        if self.reorg_fold:
            k6 = (kernel
                  .reshape(3, 3, 2, 2, c1, self.c2)
                  .transpose(0, 3, 1, 2, 4, 5)
                  .reshape(6, 6, c1, self.c2))
            y = jax.lax.conv_general_dilated(
                q, k6, window_strides=(2, 2),
                padding=((2, 2), (2, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
        else:
            pad = self.k // 2 if self.p is None else self.p
            y = jax.lax.conv_general_dilated(
                q, kernel, window_strides=(self.s, self.s),
                padding=((pad, pad), (pad, pad)),
                feature_group_count=self.g,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
        y = y.astype(jnp.float32) * (w_scale * a_scale) + bias
        return y.astype(x.dtype)


class ConvBnAct(nn.Module):
    """Conv (no bias, pad k//2 or explicit p) + BatchNorm + activation.

    fused=True uses a single biased conv (BN folded into the kernel by
    models/fuse.fuse_variables) — the inference analogue of the
    reference's Model.fuse() (utils/torch_utils.py:181,
    models/yolo.py:403-417).

    reorg_fold=True: the layer consumes the RAW pre-ReOrg input and
    computes conv(reorg(x)) as one folded 6x6/s2 conv
    (_ReOrgFoldedConv); only valid for k=3, s=1, g=1.

    wpack ('stem' | 'packed' | 'exit'): the layer participates in a
    width-packed region (models/wpack.py): column pairs ride in the
    channel axis so the narrow-channel w6 front hits the full 128-lane
    tile width. 'stem' consumes the letterbox canvas directly and
    emits a packed output (implies reorg_fold); 'packed' consumes +
    produces packed tensors; 'exit' is the region's stride-2 boundary
    (packed in, regular out). wpack_raw marks a 'stem' whose canvas is
    raw-scale BGR (the kernel absorbs BGR->RGB and /255). Exact
    transform — parameters keep their reference shapes, the
    block-structured packed kernel is built in-call. Inference-only:
    requires fused=True."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: str = "silu"
    fused: bool = False
    p: Optional[int] = None  # explicit pad (yolov5's 6x6/s2/p2 stem)
    reorg_fold: bool = False
    wpack: str = ""
    wpack_perm: Optional[Tuple[int, ...]] = None
    wpack_raw: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False, bands=None):
        if self.wpack:
            if self.fused is not True:
                raise ValueError("wpack requires fused=True")
            x = _WPackConv(
                self.c2, self.k, self.s, mode=self.wpack,
                perm=self.wpack_perm, raw_in=self.wpack_raw,
                name="conv",
            )(x, bands=bands)
            return activation(self.act)(x)
        if bands is not None:
            raise ValueError("bands require the width-packed stem")
        if self.fused == INT8:
            x = _QuantConv(
                self.c2, self.k, self.s, self.g, self.p,
                reorg_fold=self.reorg_fold, name="conv",
            )(x)
            return activation(self.act)(x)
        if self.reorg_fold:
            x = _ReOrgFoldedConv(
                self.c2, use_bias=bool(self.fused), name="conv"
            )(x)
        else:
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
    g: int = 1
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        if self.fused == INT8:
            out = _QuantConv(self.c2, 3, self.s, self.g,
                             name="rbr_reparam")(x)
            return activation(self.act)(out)
        if self.fused:
            out = nn.Conv(self.c2, (3, 3), strides=self.s, padding=1,
                          feature_group_count=self.g,
                          use_bias=True, name="rbr_reparam")(x)
            return activation(self.act)(out)
        dense = nn.Conv(self.c2, (3, 3), strides=self.s, padding=1,
                        feature_group_count=self.g,
                        use_bias=False, name="rbr_dense_conv")(x)
        dense = nn.BatchNorm(use_running_average=not training,
                             epsilon=BN_EPS, momentum=BN_MOM,
                             name="rbr_dense_bn")(dense)
        one = nn.Conv(self.c2, (1, 1), strides=self.s, padding=0,
                      feature_group_count=self.g,
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
    (b,c,w,h) but the op is symmetric in the two spatial dims.

    Implemented as one reshape/transpose instead of 4 strided slices +
    concat: the slice form lowered to four separate layout-change
    fusions costing ~0.6 ms/frame for w6@1088/b16 (profiled); output
    channel (sw*2 + sh)*C + c == the reference's concat order."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)      # (n, H, sh, W, sw, c)
    x = x.transpose(0, 1, 3, 4, 2, 5)              # (n, H, W, sw, sh, c)
    return x.reshape(n, h // 2, w // 2, 4 * c)


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
    """Integer-factor nearest upsample (nn.Upsample, common.py via
    parse_model) as broadcast+reshape. For integer factors this is
    element-identical to jax.image.resize(..., 'nearest'), but lowers
    to a broadcast instead of the per-pixel gather loops the resize
    path emits (1.7 ms/iter of pure gather at the w6@1088 b64 trace).
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return x.reshape(b, h * factor, w * factor, c)


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


class RepBottleneck(nn.Module):
    """Bottleneck with a RepConv second conv (models/common.py:646-651;
    the reference ctor pins the parent's shortcut/g/e to defaults, so
    cv1 always uses e=0.5 and the residual is always on for c1==c2)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * 0.5)
        y = ConvBnAct(c_, 1, 1, fused=self.fused, name="cv1")(x, training)
        y = RepConv(self.c2, 1, g=self.g, fused=self.fused,
                    name="cv2")(y, training)
        return x + y if c1 == self.c2 else y


class RepRes(nn.Module):
    """Res with a RepConv middle conv (models/common.py:678-683,
    710-715 for the g=32 ResX variant)."""

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
        y = RepConv(c_, 1, g=self.g, fused=f, name="cv2")(y, training)
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
            elif self.inner == "rep_res":
                y1 = RepRes(c_, self.shortcut, self.g, self.inner_e,
                            fused=f, name=f"m{j}")(y1, training)
            elif self.inner == "ghost":
                y1 = Ghost(c_, fused=f, name=f"m{j}")(y1, training)
            elif self.inner == "rep_bottleneck":
                y1 = RepBottleneck(c_, self.shortcut, self.g,
                                   self.inner_e, fused=f,
                                   name=f"m{j}")(y1, training)
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


# ---------------------------------------------------------------------------
# Ghost family (models/common.py:143-162, 243-255, 385-404: GhostConv,
# Ghost bottleneck, GhostCSPA/B/C inner stacks; DWConv at :136-140 is a
# Conv with groups=gcd(c1, c2))
# ---------------------------------------------------------------------------


def _gcd(a: int, b: int) -> int:
    import math

    return math.gcd(a, b)


class GhostConv(nn.Module):
    """Half the channels from a dense conv, the other half from a cheap
    5x5 depthwise on top of them (models/common.py:152-162)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: str = "silu"
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = self.c2 // 2
        y = ConvBnAct(c_, self.k, self.s, g=self.g, act=self.act,
                      fused=self.fused, name="cv1")(x, training)
        y2 = ConvBnAct(c_, 5, 1, g=c_, act=self.act,
                       fused=self.fused, name="cv2")(y, training)
        return jnp.concatenate([y, y2], axis=-1)


class Ghost(nn.Module):
    """Ghost bottleneck (models/common.py:243-255): pw GhostConv ->
    (stride-2 depthwise) -> linear GhostConv, plus a shortcut that is
    identity at s=1 or depthwise+pointwise at s=2."""

    c2: int
    k: int = 3
    s: int = 1
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        c1 = x.shape[-1]
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, fused=f, name="conv0")(x, training)
        if self.s == 2:
            y = ConvBnAct(c_, self.k, 2, g=c_, act="id", fused=f,
                          name="conv1")(y, training)
        y = GhostConv(self.c2, 1, 1, act="id", fused=f,
                      name="conv2")(y, training)
        if self.s == 2:
            sc = ConvBnAct(c1, self.k, 2, g=c1, act="id", fused=f,
                           name="shortcut0")(x, training)
            sc = ConvBnAct(self.c2, 1, 1, act="id", fused=f,
                           name="shortcut1")(sc, training)
        else:
            sc = x
        return y + sc


class GhostSPPCSPC(nn.Module):
    """SPPCSPC with every conv replaced by a GhostConv
    (models/common.py GhostSPPCSPC)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        c_ = self.c2  # e=0.5 -> int(2 * c2 * 0.5)
        x1 = GhostConv(c_, 1, 1, fused=f, name="cv1")(x, training)
        x1 = GhostConv(c_, 3, 1, fused=f, name="cv3")(x1, training)
        x1 = GhostConv(c_, 1, 1, fused=f, name="cv4")(x1, training)
        pools = [max_pool(x1, k, 1, k // 2) for k in self.k]
        y1 = GhostConv(c_, 1, 1, fused=f, name="cv5")(
            jnp.concatenate([x1] + pools, axis=-1), training)
        y1 = GhostConv(c_, 3, 1, fused=f, name="cv6")(y1, training)
        y2 = GhostConv(c_, 1, 1, fused=f, name="cv2")(x, training)
        return GhostConv(self.c2, 1, 1, fused=f, name="cv7")(
            jnp.concatenate([y1, y2], axis=-1), training)


# ---------------------------------------------------------------------------
# yolov5 conveniences (models/common.py:796-852, 1015-1035: Focus,
# Contract, Expand, Classify) and the ViT block (:746-790)
# ---------------------------------------------------------------------------


class Focus(nn.Module):
    """Space-to-depth then conv (models/common.py:796-805); the slice
    order matches ReOrg, so this is conv(reorg(x))."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: str = "silu"
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        return ConvBnAct(self.c2, self.k, self.s, g=self.g, act=self.act,
                         fused=self.fused, name="conv")(reorg(x), training)


def contract(x, gain: int = 2):
    """Width/height into channels (models/common.py:824-835); output
    channel index = (i_sh * gain + i_sw) * C + c, identical to the
    torch NCHW permute semantics."""
    n, h, w, c = x.shape
    s = gain
    x = x.reshape(n, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)      # (n, h/s, w/s, s_h, s_w, c)
    return x.reshape(n, h // s, w // s, s * s * c)


def expand(x, gain: int = 2):
    """Channels into width/height (models/common.py:838-849), the exact
    inverse of contract for channel index (i_sh*s + i_sw)*C' + c'."""
    n, h, w, c = x.shape
    s = gain
    x = x.reshape(n, h, w, s, s, c // (s * s))
    x = x.transpose(0, 1, 3, 2, 4, 5)      # (n, h, s_h, w, s_w, c')
    return x.reshape(n, h * s, w * s, c // (s * s))


class Classify(nn.Module):
    """Classification head: global average pool -> biased conv ->
    flatten (models/common.py:1015-1025); list inputs concatenate their
    pooled features."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        xs = x if isinstance(x, (list, tuple)) else [x]
        z = jnp.concatenate(
            [y.mean(axis=(1, 2), keepdims=True) for y in xs], axis=-1)
        z = nn.Conv(self.c2, (self.k, self.k), strides=self.s,
                    padding=self.k // 2, feature_group_count=self.g,
                    use_bias=True, name="conv")(z)
        return z.reshape(z.shape[0], -1)


class TransformerLayer(nn.Module):
    """Pre-projected multi-head self-attention + 2-layer MLP, both with
    residuals and no LayerNorm (models/common.py:746-760). Matches torch
    nn.MultiheadAttention's in/out projection structure."""

    c: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        # x: (B, L, C)
        c, h = self.c, self.num_heads
        hd = c // h
        q = nn.Dense(c, use_bias=False, name="q")(x)
        k = nn.Dense(c, use_bias=False, name="k")(x)
        v = nn.Dense(c, use_bias=False, name="v")(x)
        # torch MHA in-projection: one (3c, c) weight + (3c,) bias
        wi = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                        (3 * c, c))
        bi = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        qq = q @ wi[:c].T + bi[:c]
        kk = k @ wi[c:2 * c].T + bi[c:2 * c]
        vv = v @ wi[2 * c:].T + bi[2 * c:]

        def split(t):  # (B, L, C) -> (B, h, L, hd)
            b, l, _ = t.shape
            return t.reshape(b, l, h, hd).transpose(0, 2, 1, 3)

        attn = jax.nn.softmax(
            split(qq) @ split(kk).transpose(0, 1, 3, 2) / jnp.sqrt(hd),
            axis=-1)
        o = attn @ split(vv)                    # (B, h, L, hd)
        b, _, l, _ = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, l, c)
        o = nn.Dense(c, use_bias=True, name="out_proj")(o)
        x = o + x
        y = nn.Dense(c, use_bias=False, name="fc1")(x)
        y = nn.Dense(c, use_bias=False, name="fc2")(y)
        return y + x


class TransformerBlock(nn.Module):
    """ViT block over the flattened feature map with a learned
    per-position embedding (models/common.py:763-790)."""

    c2: int
    num_heads: int
    num_layers: int
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        if x.shape[-1] != self.c2:
            x = ConvBnAct(self.c2, 1, 1, fused=self.fused,
                          name="conv")(x, training)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)              # row-major (H, W) order
        e = nn.Dense(c, use_bias=True, name="linear")(p)
        x = p + e
        for j in range(self.num_layers):
            x = TransformerLayer(c, self.num_heads, name=f"tr{j}")(x)
        return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Swin transformer v1/v2 (models/common.py:1367-2006: WindowAttention(_v2),
# SwinTransformerLayer(_v2), SwinTransformer(2)Block, ST(2)CSPA/B/C).
# NHWC throughout; window partition/reverse are pure reshapes.
# ---------------------------------------------------------------------------


def _rel_pos_index(ws: int):
    """Pairwise relative-position index inside a (ws, ws) window
    (common.py:1382-1393)."""
    import numpy as _np

    coords = _np.stack(_np.meshgrid(_np.arange(ws), _np.arange(ws),
                                    indexing="ij"))        # 2, ws, ws
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]              # 2, N, N
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                     # N, N


def _window_partition(x, ws: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(win, ws: int, h: int, w: int):
    b = win.shape[0] // (h * w // ws // ws)
    x = win.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _shift_mask(h: int, w: int, ws: int, shift: int):
    """SW-MSA attention mask (common.py:1500-1520): -100 between tokens
    whose windows wrap across the cyclic shift."""
    import numpy as _np

    img = _np.zeros((1, h, w, 1), _np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = _np.asarray(_window_partition(jnp.asarray(img), ws))[..., 0]
    diff = mw[:, None, :] - mw[:, :, None]
    return _np.where(diff != 0, -100.0, 0.0).astype(_np.float32)


class WindowAttention(nn.Module):
    """Swin v1 window MSA with a learned relative-position bias table
    (common.py:1367-1435)."""

    dim: int
    ws: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        bw, n, c = x.shape
        h = self.num_heads
        hd = c // h
        scale = hd ** -0.5
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = q @ k.transpose(0, 1, 3, 2)                 # bw, h, n, n
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.ws - 1) ** 2, self.num_heads))
        idx = _rel_pos_index(self.ws)
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, h, n, n) \
                + mask[None, :, None]
            attn = attn.reshape(bw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, use_bias=True, name="proj")(out)


class WindowAttentionV2(nn.Module):
    """Swin v2 window MSA: cosine attention with a clamped learned
    temperature and a continuous log-CPB MLP (common.py:1662-1765)."""

    dim: int
    ws: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        import numpy as _np

        bw, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv_w = self.param(
            "qkv_kernel", nn.initializers.xavier_uniform(), (c, 3 * c))
        q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
        bias = jnp.concatenate([q_bias, jnp.zeros_like(v_bias), v_bias])
        qkv = (x @ qkv_w + bias).reshape(bw, n, 3, h, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        def l2n(t):
            return t / jnp.maximum(
                jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)

        attn = l2n(q) @ l2n(k).transpose(0, 1, 3, 2)
        logit_scale = self.param(
            "logit_scale",
            lambda rng, s: jnp.log(10.0) * jnp.ones(s), (h, 1, 1))
        attn = attn * jnp.exp(
            jnp.minimum(logit_scale, jnp.log(1.0 / 0.01)))

        # continuous relative position bias: sign(x)*log2(|8x|+1)/log2(8)
        ws = self.ws
        rng_h = _np.arange(-(ws - 1), ws, dtype=_np.float32)
        table = _np.stack(
            _np.meshgrid(rng_h, rng_h, indexing="ij"), -1)  # 2w-1,2w-1,2
        table = table / (ws - 1) * 8.0
        table = (_np.sign(table) * _np.log2(_np.abs(table) + 1.0)
                 / _np.log2(8.0)).reshape(-1, 2)
        t = nn.Dense(512, use_bias=True, name="cpb_fc1")(
            jnp.asarray(table))
        t = nn.Dense(self.num_heads, use_bias=False, name="cpb_fc2")(
            jax.nn.relu(t))
        idx = _rel_pos_index(ws)
        bias_t = t[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + 16.0 * jax.nn.sigmoid(bias_t)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, h, n, n) \
                + mask[None, :, None]
            attn = attn.reshape(bw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, use_bias=True, name="proj")(out)


class SwinTransformerLayer(nn.Module):
    """One (shifted-)window attention layer (common.py:1472-1582 for
    v1 pre-norm, 1816-1942 for v2 post-norm), with the same pad-to-
    window-multiple behavior. v2 flips norm placement and attention."""

    dim: int
    num_heads: int
    ws: int = 8
    shift: int = 0
    mlp_ratio: float = 4.0
    v2: bool = False

    @nn.compact
    def __call__(self, x):
        b, h0, w0, c = x.shape
        ws = self.ws
        pad_b = (ws - h0 % ws) % ws
        pad_r = (ws - w0 % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        h, w = x.shape[1], x.shape[2]

        mask = (jnp.asarray(_shift_mask(h, w, ws, self.shift))
                if self.shift > 0 else None)
        shortcut = x.reshape(b, h * w, c)
        y = x
        if not self.v2:
            y = nn.LayerNorm(name="norm1")(y)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        win = _window_partition(y, ws)
        attn_cls = WindowAttentionV2 if self.v2 else WindowAttention
        win = attn_cls(c, ws, self.num_heads, name="attn")(win, mask)
        y = _window_reverse(win, ws, h, w)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y.reshape(b, h * w, c)
        if self.v2:
            y = nn.LayerNorm(name="norm1")(y)
        x = shortcut + y
        hid = int(c * self.mlp_ratio)
        if self.v2:
            m = nn.Dense(hid, name="mlp_fc1")(x)
            m = nn.Dense(c, name="mlp_fc2")(jax.nn.silu(m))
            x = x + nn.LayerNorm(name="norm2")(m)
        else:
            m = nn.LayerNorm(name="norm2")(x)
            m = nn.Dense(hid, name="mlp_fc1")(m)
            m = nn.Dense(c, name="mlp_fc2")(jax.nn.silu(m))
            x = x + m
        x = x.reshape(b, h, w, c)
        if pad_b or pad_r:
            x = x[:, :h0, :w0]
        return x


class SwinBlock(nn.Module):
    """SwinTransformer(2)Block (common.py:1584-1599, 1946-1961):
    optional channel-matching conv then alternating W-MSA / SW-MSA
    layers (shift = ws//2 on odd layers)."""

    c2: int
    num_heads: int
    num_layers: int
    ws: int = 8          # v1 default 8, v2 default 7
    v2: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        if x.shape[-1] != self.c2:
            x = ConvBnAct(self.c2, 1, 1, fused=self.fused,
                          name="conv")(x, training)
        for i in range(self.num_layers):
            x = SwinTransformerLayer(
                self.c2, self.num_heads, ws=self.ws,
                shift=0 if i % 2 == 0 else self.ws // 2,
                v2=self.v2, name=f"blocks{i}")(x)
        return x


class STCSP(nn.Module):
    """ST(2)CSPA/B/C: the CSP split topologies with a Swin block as the
    inner stack; num_heads = c_ // 32 (common.py:1602-1659, 1964-2006)."""

    c2: int
    n: int = 1
    variant: str = "a"
    v2: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        f = self.fused
        c_ = self.c2 if self.variant == "b" else self.c2 // 2
        ws = 7 if self.v2 else 8
        x1 = ConvBnAct(c_, 1, 1, fused=f, name="cv1")(x, training)
        y1 = SwinBlock(c_, max(c_ // 32, 1), self.n, ws=ws, v2=self.v2,
                       fused=f, name="m")(x1, training)
        if self.variant == "c":
            y1 = ConvBnAct(c_, 1, 1, fused=f, name="cv3")(y1, training)
        y2 = ConvBnAct(
            c_, 1, 1, fused=f, name="cv2"
        )(x1 if self.variant == "b" else x, training)
        out_name = "cv4" if self.variant == "c" else "cv3"
        return ConvBnAct(self.c2, 1, 1, fused=f, name=out_name)(
            jnp.concatenate([y1, y2], axis=-1), training
        )


# ---------------------------------------------------------------------------
# OREPA re-parameterized convs (models/common.py:1038-1364: ConvBN,
# OREPA_3x3_RepConv, RepConv_OREPA). The branch weights stay in torch's
# OIHW layout so checkpoint conversion is a straight copy; the composed
# kernel transposes to HWIO once per call and XLA folds the whole
# weight_gen into a constant at inference.
# ---------------------------------------------------------------------------


def _orepa_prior(o: int, k: int):
    """fre_init cosine prior (common.py:1143-1153)."""
    import math as _math

    import numpy as _np

    prior = _np.zeros((o, k, k), _np.float32)
    half = o / 2
    for i in range(o):
        for h in range(k):
            for w in range(k):
                if i < half:
                    prior[i, h, w] = _math.cos(
                        _math.pi * (h + 0.5) * (i + 1) / 3)
                else:
                    prior[i, h, w] = _math.cos(
                        _math.pi * (w + 0.5) * (i + 1 - half) / 3)
    return prior


class OREPA3x3RepConv(nn.Module):
    """OREPA_3x3_RepConv (groups=1, internal==in_channels id-conv path,
    the configuration RepConv_OREPA instantiates): five weight branches
    composed into one kxk kernel by learned per-branch channel vectors,
    then conv + BN (+ optional activation)."""

    c2: int
    k: int = 3
    s: int = 1
    act: str = "id"

    @nn.compact
    def __call__(self, x, training: bool = False):
        import numpy as _np

        c1 = x.shape[-1]
        o, k = self.c2, self.k
        w_origin = self.param("weight_rbr_origin",
                              nn.initializers.he_uniform(), (o, c1, k, k))
        w_avg = self.param("weight_rbr_avg_conv",
                           nn.initializers.he_uniform(), (o, c1, 1, 1))
        w_pfir = self.param("weight_rbr_pfir_conv",
                            nn.initializers.he_uniform(), (o, c1, 1, 1))
        w_id1 = self.param("weight_rbr_1x1_kxk_idconv1",
                           nn.initializers.zeros, (c1, c1, 1, 1))
        w_kxk2 = self.param("weight_rbr_1x1_kxk_conv2",
                            nn.initializers.he_uniform(), (o, c1, k, k))
        w_dw = self.param("weight_rbr_gconv_dw",
                          nn.initializers.he_uniform(), (c1 * 8, 1, k, k))
        w_pw = self.param("weight_rbr_gconv_pw",
                          nn.initializers.he_uniform(), (o, c1 * 8, 1, 1))
        n_branch = 6 if (o == c1 and self.s == 1) else 5
        vector = self.param(
            "vector",
            lambda rng, s_: jnp.stack(
                [jnp.full((o,), v) for v in
                 ([0.25, 0.25, 0.0, 0.5, 0.5] + [0.0] * (n_branch - 5))]
            ), (n_branch, o))

        avg_avg = jnp.full((k, k), 1.0 / (k * k), jnp.float32)
        prior = jnp.asarray(_orepa_prior(o, k))
        id_t = jnp.asarray(_np.eye(c1, dtype=_np.float32)[:, :, None, None])

        w0 = jnp.einsum("oihw,o->oihw", w_origin, vector[0])
        w1 = jnp.einsum("oihw,o->oihw",
                        jnp.einsum("oihw,hw->oihw", w_avg, avg_avg),
                        vector[1])
        w2 = jnp.einsum("oihw,o->oihw",
                        jnp.einsum("oihw,ohw->oihw", w_pfir, prior),
                        vector[2])
        conv1 = (w_id1 + id_t)[:, :, 0, 0]           # (t, i)
        w3 = jnp.einsum("oihw,o->oihw",
                        jnp.einsum("ti,othw->oihw", conv1, w_kxk2),
                        vector[3])
        # depthwise-separable collapsed to full (dwsc2full, groups=c1)
        dw = w_dw.reshape(c1, 8, 1, k, k)
        pw = w_pw[:, :, 0, 0].reshape(o, c1, 8)
        w4 = jnp.einsum("gtihw,ogt->ogihw", dw, pw).reshape(o, c1, k, k)
        w4 = jnp.einsum("oihw,o->oihw", w4, vector[4])

        weight = w0 + w1 + w2 + w3 + w4              # OIHW
        y = jax.lax.conv_general_dilated(
            x, weight.transpose(2, 3, 1, 0), (self.s, self.s),
            [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn.BatchNorm(use_running_average=not training, epsilon=BN_EPS,
                         momentum=BN_MOM, name="bn")(y)
        return activation(self.act)(y)


class RepConvOREPA(nn.Module):
    """RepConv_OREPA (common.py:1224-1264): OREPA dense 3x3 + 1x1
    ConvBN + optional identity BN, summed, SiLU."""

    c2: int
    s: int = 1
    act: str = "silu"

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        out = OREPA3x3RepConv(self.c2, 3, self.s,
                              name="rbr_dense")(x, training)
        one = nn.Conv(self.c2, (1, 1), strides=self.s, padding=0,
                      use_bias=False, name="rbr_1x1_conv")(x)
        one = nn.BatchNorm(use_running_average=not training,
                           epsilon=BN_EPS, momentum=BN_MOM,
                           name="rbr_1x1_bn")(one)
        out = out + one
        if c1 == self.c2 and self.s == 1:
            ident = nn.BatchNorm(use_running_average=not training,
                                 epsilon=BN_EPS, momentum=BN_MOM,
                                 name="rbr_identity")(x)
            out = out + ident
        return activation(self.act)(out)


class RobustConv(nn.Module):
    """Large-kernel depthwise + biased pointwise with a LayerScale gamma
    (models/common.py RobustConv)."""

    c2: int
    k: int = 7
    s: int = 1
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        x = ConvBnAct(c1, self.k, self.s, g=c1, fused=self.fused,
                      name="conv_dw")(x, training)
        x = nn.Conv(self.c2, (1, 1), use_bias=True, name="conv1x1")(x)
        gamma = self.param("gamma",
                           lambda rng, s_: 1e-6 * jnp.ones(s_), (self.c2,))
        return x * gamma


class RobustConv2(nn.Module):
    """Strided large-kernel depthwise + transposed-conv upsample back to
    the input resolution, with LayerScale (models/common.py
    RobustConv2)."""

    c2: int
    k: int = 7
    s: int = 4
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        x = ConvBnAct(c1, self.k, self.s, g=c1, fused=self.fused,
                      name="conv_strided")(x, training)
        x = nn.ConvTranspose(self.c2, (self.s, self.s),
                             strides=(self.s, self.s), padding="VALID",
                             use_bias=True, name="conv_deconv")(x)
        gamma = self.param("gamma",
                           lambda rng, s_: 1e-6 * jnp.ones(s_), (self.c2,))
        return x * gamma


def chuncat(parts):
    """Concat the first halves then the second halves of each input's
    channels (models/common.py Chuncat, channel dimension)."""
    halves = [jnp.split(p, 2, axis=-1) for p in parts]
    return jnp.concatenate([h[0] for h in halves]
                           + [h[1] for h in halves], axis=-1)


def foldcut(x):
    """Halve channels by summing the two halves (models/common.py
    Foldcut; the reference's dimension=0 default would chunk the batch
    axis, but parse_model's c2 = ch[f]//2 shows the channel semantics
    intended)."""
    a, b = jnp.split(x, 2, axis=-1)
    return a + b


class CrossConv(nn.Module):
    """Cross Convolution Downsample: (1,k) then (k,1) convs with
    optional residual (models/experimental.py:9-21)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = x

        def conv(cout, kk, ss, g, name):
            def run(t, tr):
                t = nn.Conv(cout, kk, strides=ss,
                            padding=[(kk[0] // 2, kk[0] // 2),
                                     (kk[1] // 2, kk[1] // 2)],
                            feature_group_count=g, use_bias=self.fused,
                            name=f"{name}_conv")(t)
                if not self.fused:
                    t = nn.BatchNorm(use_running_average=not tr,
                                     epsilon=BN_EPS, momentum=BN_MOM,
                                     name=f"{name}_bn")(t)
                return jax.nn.silu(t)
            return run

        y = conv(c_, (1, self.k), (1, self.s), 1, "cv1")(y, training)
        y = conv(self.c2, (self.k, 1), (self.s, 1), self.g,
                 "cv2")(y, training)
        return x + y if (self.shortcut and c1 == self.c2) else y


class Sum(nn.Module):
    """(Optionally weighted) sum of n inputs (models/experimental.py:
    23-41; weights pass a sigmoid*2)."""

    n: int
    weight: bool = False

    @nn.compact
    def __call__(self, xs):
        y = xs[0]
        if self.weight:
            w = self.param(
                "w", lambda rng, s_: -jnp.arange(1.0, self.n) / 2,
                (self.n - 1,))
            w = jax.nn.sigmoid(w) * 2
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i]
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y


class MixConv2d(nn.Module):
    """Mixed depthwise conv: parallel kernels over channel splits,
    concatenated, BN + LeakyReLU(0.1), residual
    (models/experimental.py:44-65, equal_ch split)."""

    c2: int
    k: Tuple[int, ...] = (1, 3)
    s: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        groups = len(self.k)
        idx = jnp.floor(jnp.linspace(0, groups - 1e-6, self.c2))
        c_ = [int((idx == g).sum()) for g in range(groups)]
        outs = []
        for g, kk in enumerate(self.k):
            outs.append(nn.Conv(
                c_[g], (kk, kk), strides=self.s, padding=kk // 2,
                use_bias=False, name=f"m{g}")(x))
        y = jnp.concatenate(outs, axis=-1)
        y = nn.BatchNorm(use_running_average=not training,
                         epsilon=BN_EPS, momentum=BN_MOM, name="bn")(y)
        return x + jax.nn.leaky_relu(y, negative_slope=0.1)
