"""YOLOv7 in Flax: spec-driven DAG + detection heads.

Replaces the reference Model (models/yolo.py:236-520): the topology DAG
replays saved intermediates exactly like forward_once (:321-351), the
heads implement the Detect / IDetect / IAuxDetect decode (:23-158):

    xy = (2*sigmoid - 0.5 + grid) * stride
    wh = (2*sigmoid)^2 * anchor

All activations are NHWC; raw head outputs use (B, ny, nx, na, no) so
the flattened prediction order differs from torch's (na, ny, nx) — NMS
and loss are order-independent.

Everything is static: strides come from the spec (no dummy forward) and
one jit of apply() compiles the whole detector into a single XLA graph.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from . import blocks
from . import spec as spec_mod
from .spec import ModelSpec


def wpack_stem_active(spec: ModelSpec) -> bool:
    """True iff YoloV7(fused=True, wpack=True) will run the width-packed
    stem for this spec — i.e. wpack.plan_region matches AND the ReOrg
    fold is eligible (the same two conditions setup() checks). The
    serving pipeline keys its preprocess off this: a packed stem can
    absorb the canvas normalization (wpack_raw_stem)."""
    from . import wpack as wpack_mod

    if wpack_mod.plan_region(spec) is None:
        return False
    by_index = {l.index: l for l in spec.layers}
    l0, l1 = by_index.get(0), by_index.get(1)
    return (l0 is not None and l0.kind == "ReOrg"
            and l0.index not in spec.save
            and l1 is not None and l1.kind == "Conv"
            and tuple(l1.frm) == (0,)
            and tuple(l1.args[:3]) == (3, 1, 1)
            and (len(l1.args) < 5 or l1.args[4] is None))


class YoloV7(nn.Module):
    spec: ModelSpec
    fused: bool = False  # BN folded into conv (models/fuse.py)
    # Width-packed execution of the narrow-channel front (models/
    # wpack.py): when the spec matches the w6-family ReOrg-stem
    # pattern, the stem through the first E-ELAN stages runs on
    # column-pair-packed tensors so 64-channel convs use all 128
    # vector lanes (measured ~4x per-conv on v5e,
    # tools/tpu_pack_probe.py). Exact transform, parameter tree
    # unchanged; inference-only (requires fused=True). No-op when the
    # spec doesn't match (plan_region returns None).
    wpack: bool = False
    # The serving pipeline feeds the stem a RAW-SCALE BGR canvas
    # (device_preprocess normalize=False) and the packed stem kernel
    # absorbs BGR->RGB + /255 — removes the canvas-sized normalize
    # multiply from the graph. Only meaningful when the wpack stem is
    # engaged (see wpack_stem_active); ignored otherwise.
    wpack_raw_stem: bool = False
    # Applied to each per-level decoded tensor, both the (B, ny, nx,
    # [na,] C) grid-shaped form and the flattened (B, N, C) form. The
    # spatial-inference path (parallel/spatial.py) installs a
    # with_sharding_constraint here so GSPMD keeps the decode sharded
    # on the image-height axis and gathers each level EXPLICITLY before
    # the cross-level concat, instead of the involuntary full
    # rematerialization it otherwise falls back to. None = identity.
    decode_hook: Optional[Callable[[Any], Any]] = None

    def setup(self):
        # ReOrg -> Conv(k=3, s=1) stems fold into one 6x6/s2 conv on the
        # raw image (blocks._ReOrgFoldedConv): find ReOrg layers whose
        # ONLY consumer is the immediately-following eligible Conv (the
        # w6/e6/d6/e6e stems). The ReOrg layer then passes its input
        # through untouched in the forward loop.
        folded_reorg = set()
        fold_convs = set()
        by_index = {l.index: l for l in self.spec.layers}
        for l in self.spec.layers:
            if l.kind != "ReOrg" or l.index in self.spec.save:
                continue
            nxt = by_index.get(l.index + 1)
            if (nxt is not None and nxt.kind == "Conv"
                    and tuple(nxt.frm) == (l.index,)
                    and tuple(nxt.args[:3]) == (3, 1, 1)
                    and (len(nxt.args) < 5 or nxt.args[4] is None)):
                folded_reorg.add(l.index)
                fold_convs.add(nxt.index)
        self._folded_reorg = tuple(folded_reorg)

        wplan = {}
        wperm = {}
        if self.wpack and self.fused is True:
            from . import wpack as wpack_mod

            region = wpack_mod.plan_region(self.spec)
            # the packed stem subsumes the ReOrg fold; only engage when
            # the fold itself is eligible (it always is for w6-family)
            if region is not None and 1 in fold_convs:
                wplan = region["plan"]
                wperm = {i: tuple(int(v) for v in p)
                         for i, p in region["perm"].items()}
        self._wpack_stem = next(
            (i for i, m in wplan.items() if m == "stem"), None)

        mods = {}
        for l in self.spec.layers:
            if l.kind == "Conv":
                k, s, g, act = l.args[:4]
                p = l.args[4] if len(l.args) > 4 else None
                mode = wplan.get(l.index, "")
                mods[str(l.index)] = blocks.ConvBnAct(
                    l.c_out, k, s, g, act, fused=self.fused, p=p,
                    reorg_fold=l.index in fold_convs,
                    wpack=mode if mode in ("stem", "packed", "exit")
                    else "",
                    wpack_perm=wperm.get(l.index),
                    wpack_raw=(mode == "stem" and self.wpack_raw_stem),
                    name=f"layer{l.index}",
                )
            elif l.kind == "RepConv":
                _, s = l.args
                mods[str(l.index)] = blocks.RepConv(
                    l.c_out, s, fused=self.fused, name=f"layer{l.index}"
                )
            elif l.kind == "RepConv_OREPA":
                mods[str(l.index)] = blocks.RepConvOREPA(
                    l.c_out, l.args[1], name=f"layer{l.index}"
                )
            elif l.kind == "RobustConv":
                mods[str(l.index)] = blocks.RobustConv(
                    l.c_out, l.args[0], l.args[1], fused=self.fused,
                    name=f"layer{l.index}",
                )
            elif l.kind == "RobustConv2":
                mods[str(l.index)] = blocks.RobustConv2(
                    l.c_out, l.args[0], l.args[1], fused=self.fused,
                    name=f"layer{l.index}",
                )
            elif l.kind == "DownC":
                mods[str(l.index)] = blocks.DownC(
                    l.c_out, l.args[0], fused=self.fused,
                    name=f"layer{l.index}",
                )
            elif l.kind == "SPPCSPC":
                mods[str(l.index)] = blocks.SPPCSPC(
                    l.c_out, fused=self.fused, name=f"layer{l.index}"
                )
            elif l.kind == "Bottleneck":
                mods[str(l.index)] = blocks.Bottleneck(
                    l.c_out, n=l.args[0], shortcut=l.args[1],
                    fused=self.fused, name=f"layer{l.index}",
                )
            elif l.kind in spec_mod.CSP_KINDS:
                variant, inner, sc, g, ie = spec_mod.CSP_KINDS[l.kind]
                mods[str(l.index)] = blocks.CSP(
                    l.c_out, n=l.args[0], variant=variant, inner=inner,
                    shortcut=sc, g=g, inner_e=ie, fused=self.fused,
                    name=f"layer{l.index}",
                )
            elif l.kind == "SPP":
                mods[str(l.index)] = blocks.SPP(
                    l.c_out, k=l.args[0], fused=self.fused,
                    name=f"layer{l.index}",
                )
            elif l.kind == "Stem":
                mods[str(l.index)] = blocks.Stem(
                    l.c_out, fused=self.fused, name=f"layer{l.index}"
                )
            elif l.kind == "C3":
                mods[str(l.index)] = blocks.C3(
                    l.c_out, n=l.args[0], shortcut=l.args[1],
                    fused=self.fused, name=f"layer{l.index}",
                )
            elif l.kind == "C2f":
                mods[str(l.index)] = blocks.C2f(
                    l.c_out, n=l.args[0], shortcut=l.args[1],
                    fused=self.fused, name=f"layer{l.index}",
                )
            elif l.kind == "SPPF":
                mods[str(l.index)] = blocks.SPPF(
                    l.c_out, k=l.args[0], fused=self.fused,
                    name=f"layer{l.index}",
                )
            elif l.kind == "GhostSPPCSPC":
                mods[str(l.index)] = blocks.GhostSPPCSPC(
                    l.c_out, fused=self.fused, name=f"layer{l.index}"
                )
            elif l.kind == "Focus":
                mods[str(l.index)] = blocks.Focus(
                    l.c_out, k=l.args[0], s=l.args[1], fused=self.fused,
                    name=f"layer{l.index}",
                )
            elif l.kind == "DWConv":
                # Conv with groups=gcd(c1, c2) (common.py:136-140)
                c1 = (self.spec.layers[l.frm[0]].c_out
                      if l.index > 0 else 3)
                import math as _math

                mods[str(l.index)] = blocks.ConvBnAct(
                    l.c_out, l.args[0], l.args[1],
                    g=_math.gcd(c1, l.c_out), fused=self.fused,
                    name=f"layer{l.index}",
                )
            elif l.kind == "GhostConv":
                mods[str(l.index)] = blocks.GhostConv(
                    l.c_out, k=l.args[0], s=l.args[1], fused=self.fused,
                    name=f"layer{l.index}",
                )
            elif l.kind == "Ghost":
                mods[str(l.index)] = blocks.Ghost(
                    l.c_out, k=l.args[0], s=l.args[1], fused=self.fused,
                    name=f"layer{l.index}",
                )
            elif l.kind in ("SwinTransformerBlock",
                            "SwinTransformer2Block"):
                v2 = l.kind == "SwinTransformer2Block"
                mods[str(l.index)] = blocks.SwinBlock(
                    l.c_out, l.args[0], l.args[1], ws=7 if v2 else 8,
                    v2=v2, fused=self.fused, name=f"layer{l.index}",
                )
            elif l.kind in ("STCSPA", "STCSPB", "STCSPC",
                            "ST2CSPA", "ST2CSPB", "ST2CSPC"):
                mods[str(l.index)] = blocks.STCSP(
                    l.c_out, n=l.args[0], variant=l.kind[-1].lower(),
                    v2=l.kind.startswith("ST2"), fused=self.fused,
                    name=f"layer{l.index}",
                )
        self._mods = mods
        spec = self.spec
        head_idx = spec.layers[-1].index
        nl, na, no = spec.nl, spec.na, spec.no
        n_heads = len(spec.head_from)
        if spec.head_kind == "DetectV8":
            # decoupled anchor-free head: per level, a box branch ending
            # in 4*REG_MAX DFL logits and a class branch ending in nc
            # logits (clean-room yolov8 Detect)
            reg_max = spec_mod.REG_MAX
            head_ch = [spec.layers[x].c_out for x in spec.head_from]
            c2_ = max(16, head_ch[0] // 4, reg_max * 4)
            c3_ = max(head_ch[0], min(spec.nc, 100))
            # head towers stay un-quantized under fused="int8" (heads
            # keep full precision — standard PTQ practice; quant.py
            # skips "head*" paths to match)
            head_fused = bool(self.fused)
            self._v8_box = [
                [
                    blocks.ConvBnAct(c2_, 3, 1, fused=head_fused,
                                     name=f"head_cv2_{i}_0"),
                    blocks.ConvBnAct(c2_, 3, 1, fused=head_fused,
                                     name=f"head_cv2_{i}_1"),
                    nn.Conv(4 * reg_max, (1, 1), use_bias=True,
                            name=f"head_cv2_{i}_2"),
                ]
                for i in range(nl)
            ]
            self._v8_cls = [
                [
                    blocks.ConvBnAct(c3_, 3, 1, fused=head_fused,
                                     name=f"head_cv3_{i}_0"),
                    blocks.ConvBnAct(c3_, 3, 1, fused=head_fused,
                                     name=f"head_cv3_{i}_1"),
                    nn.Conv(spec.nc, (1, 1), use_bias=True,
                            name=f"head_cv3_{i}_2"),
                ]
                for i in range(nl)
            ]
        else:
            self._head_convs = [
                nn.Conv(na * no, (1, 1), use_bias=True,
                        name=f"head_m{('2' if i >= nl else '')}_{i % nl}")
                for i in range(n_heads)
            ]
        if spec.head_kind in ("IDetect", "IAuxDetect", "IBin"):
            self._ia = [
                ImplicitA(name=f"head_ia_{i}") for i in range(nl)
            ]
            self._im = [
                ImplicitM(name=f"head_im_{i}") for i in range(nl)
            ]

    def __call__(self, x, training: bool = False, stem_bands=None):
        """x: (B, H, W, 3) float in [0, 1].

        stem_bands: optional (top, bottom) letterbox band row counts —
          x is then the UNPADDED resize and the width-packed stem
          absorbs the constant-114 band exactly (conv padding + strip
          corrections, blocks._WPackConv bands). Requires the packed
          stem (wpack_stem_active).

        Returns:
          training: list of nl (or 2*nl for IAuxDetect) raw head tensors
            (B, ny, nx, na, no);
          inference: (decoded (B, N, no), list of nl raw head tensors).
        """
        if stem_bands is not None and self._wpack_stem is None:
            raise ValueError("stem_bands require the width-packed stem")
        spec = self.spec
        saved: Dict[int, Any] = {}
        y = x
        head_inputs: List[Any] = []
        for l in spec.layers:
            if l.kind in ("Detect", "IDetect", "IAuxDetect", "IBin",
                          "DetectV8"):
                head_inputs = [
                    saved[i] if i in saved else y for i in l.frm
                ]
                break
            inp = saved[l.frm[0]] if l.frm[0] != l.index - 1 else y
            if l.index == 0:
                inp = x
            if str(l.index) in self._mods:
                if (stem_bands is not None
                        and l.index == self._wpack_stem):
                    y = self._mods[str(l.index)](
                        inp, training, bands=stem_bands)
                else:
                    y = self._mods[str(l.index)](inp, training)
            elif l.kind == "MP":
                y = blocks.mp(inp, l.args[0])
            elif l.kind == "SP":
                y = blocks.sp(inp, *l.args)
            elif l.kind == "ReOrg":
                # folded stems pass the raw image straight to the
                # 6x6/s2 folded conv (see setup)
                y = inp if l.index in self._folded_reorg \
                    else blocks.reorg(inp)
            elif l.kind == "Upsample":
                y = blocks.upsample_nearest(inp, l.args[0])
            elif l.kind == "Contract":
                y = blocks.contract(inp, l.args[0])
            elif l.kind == "Chuncat":
                y = blocks.chuncat(
                    [saved[i] if i in saved else y for i in l.frm])
            elif l.kind == "Foldcut":
                y = blocks.foldcut(inp)
            elif l.kind == "Expand":
                y = blocks.expand(inp, l.args[0])
            elif l.kind == "Concat":
                parts = [
                    saved[i] if i in saved else y for i in l.frm
                ]
                y = jnp.concatenate(parts, axis=-1)
            elif l.kind == "Shortcut":
                parts = [
                    saved[i] if i in saved else y for i in l.frm
                ]
                y = parts[0]
                for extra in parts[1:]:
                    y = y + extra
            else:  # pragma: no cover
                raise AssertionError(l.kind)
            if l.index in spec.save:
                saved[l.index] = y
        return self._detect(head_inputs, training)

    def _hooked_flatten(self, out, shape):
        """Flatten a per-level decoded grid tensor, routing both forms
        through decode_hook (identity when unset) so a sharding
        constraint can pin the grid form to the spatial axis and make
        the level gather explicit before the cross-level concat."""
        if self.decode_hook is not None:
            out = self.decode_hook(out)
        lvl = out.reshape(shape)
        if self.decode_hook is not None:
            lvl = self.decode_hook(lvl)
        return lvl

    def _detect(self, head_inputs, training: bool):
        spec = self.spec
        if spec.head_kind == "DetectV8":
            return self._detect_v8(head_inputs, training)
        nl, na, no = spec.nl, spec.na, spec.no
        anchors = jnp.asarray(spec.anchors_per_level())  # (nl, na, 2) px
        raw: List[Any] = []
        decoded: List[Any] = []
        # fused variables carry ia/im folded into the lead head convs
        # (fuse._fold_implicit) — any truthy fused mode skips them
        implicit = (spec.head_kind in ("IDetect", "IAuxDetect", "IBin")
                    and not self.fused)
        for i, feat in enumerate(head_inputs):
            lead = i < nl
            if lead and implicit:
                feat = self._ia[i](feat)
            p = self._head_convs[i](feat)
            if lead and implicit:
                p = self._im[i](p)
            b, ny, nx, _ = p.shape
            p = p.reshape(b, ny, nx, na, no)
            raw.append(p)
            if not training and lead:
                stride = float(spec.strides[i])
                gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
                gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
                grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]
                y = jax.nn.sigmoid(p)
                xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * stride
                if spec.head_kind == "IBin":
                    # binned wh decode (models/yolo.py:208-225)
                    from .ibin import sigmoid_bin_decode
                    from .spec import BIN_COUNT

                    L = BIN_COUNT + 1
                    pw = sigmoid_bin_decode(y[..., 2:2 + L]) * anchors[i][..., 0]
                    ph = sigmoid_bin_decode(
                        y[..., 2 + L:2 + 2 * L]
                    ) * anchors[i][..., 1]
                    out = jnp.concatenate(
                        [xy, pw[..., None], ph[..., None],
                         y[..., 2 + 2 * L:]],
                        axis=-1,
                    )
                    decoded.append(self._hooked_flatten(
                        out, (b, ny * nx * na, spec.nc + 5)))
                    continue
                wh = (y[..., 2:4] * 2.0) ** 2 * anchors[i]
                out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
                decoded.append(
                    self._hooked_flatten(out, (b, ny * nx * na, no)))
        if training:
            return raw
        return jnp.concatenate(decoded, axis=1), raw[:nl]

    def _detect_v8(self, head_inputs, training: bool):
        """Anchor-free DFL decode (clean-room yolov8 Detect).

        Per level: box branch -> 4*REG_MAX logits, softmax over the
        REG_MAX bins, expectation = ltrb cell distances from the cell
        center (x+0.5, y+0.5); class branch -> nc sigmoid scores. The
        decoded output keeps the (xywh, obj=1, cls...) layout so
        ops.nms consumes it unchanged (conf = 1 * cls, exactly
        ultralytics' class-score confidence)."""
        spec = self.spec
        reg_max = spec_mod.REG_MAX
        bins = jnp.arange(reg_max, dtype=jnp.float32)
        raw: List[Any] = []
        decoded: List[Any] = []
        for i, feat in enumerate(head_inputs):
            d = feat
            for m in self._v8_box[i][:2]:
                d = m(d, training)
            d = self._v8_box[i][2](d)              # (B, ny, nx, 4*reg_max)
            c = feat
            for m in self._v8_cls[i][:2]:
                c = m(c, training)
            c = self._v8_cls[i][2](c)              # (B, ny, nx, nc)
            b, ny, nx, _ = d.shape
            raw.append(
                jnp.concatenate([d, c], axis=-1)
                .reshape(b, ny, nx, 1, spec.no)
            )
            if training:
                continue
            stride = float(spec.strides[i])
            dist = jax.nn.softmax(
                d.reshape(b, ny, nx, 4, reg_max), axis=-1
            ) @ bins                               # (B, ny, nx, 4) ltrb
            gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
            gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
            ax = jnp.stack([gx, gy], axis=-1) + 0.5  # cell centers
            lt, rb = dist[..., :2], dist[..., 2:]
            xy = (ax + (rb - lt) / 2.0) * stride
            wh = (lt + rb) * stride
            score = jax.nn.sigmoid(c)
            obj = jnp.ones((b, ny, nx, 1), score.dtype)
            out = jnp.concatenate([xy, wh, obj, score], axis=-1)
            decoded.append(
                self._hooked_flatten(out, (b, ny * nx, 5 + spec.nc)))
        if training:
            return raw
        return jnp.concatenate(decoded, axis=1), raw


class ImplicitA(nn.Module):
    """Learned additive embedding (models/common.py:433-443)."""

    @nn.compact
    def __call__(self, x):
        imp = self.param(
            "implicit",
            lambda key, c: 0.02 * jax.random.normal(key, (c,)),
            x.shape[-1],
        )
        return x + imp


class ImplicitM(nn.Module):
    """Learned multiplicative embedding (models/common.py:446-457)."""

    @nn.compact
    def __call__(self, x):
        imp = self.param(
            "implicit",
            lambda key, c: 1.0 + 0.02 * jax.random.normal(key, (c,)),
            x.shape[-1],
        )
        return x * imp


def init_head_biases(params, spec: ModelSpec, cf=None):
    """Detection-head bias init (models/yolo.py:353-368): obj bias
    log(8 / (640/stride)^2), cls bias log(0.6 / (nc - 0.99))."""
    if spec.head_kind == "IBin":  # bin layout has no plain obj/cls slots
        return params
    if spec.head_kind == "DetectV8":
        # v8 bias_init: box branch 1.0, cls branch log(5/nc/(640/s)^2)
        params = jax.tree_util.tree_map(lambda x: x, params)
        for i, s in enumerate(spec.strides):
            box = params["params"][f"head_cv2_{i}_2"]
            params["params"][f"head_cv2_{i}_2"] = {
                **box, "bias": jnp.ones_like(box["bias"]),
            }
            cls = params["params"][f"head_cv3_{i}_2"]
            params["params"][f"head_cv3_{i}_2"] = {
                **cls,
                "bias": jnp.full_like(
                    cls["bias"],
                    math.log(5.0 / spec.nc / (640.0 / float(s)) ** 2),
                ),
            }
        return params
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    nl, na, nc = spec.nl, spec.na, spec.nc
    n_heads = len(spec.head_from)
    for i in range(n_heads):
        stride = float(spec.strides[i % nl])
        name = f"head_m{('2' if i >= nl else '')}_{i % nl}"
        b = np.asarray(params["params"][name]["bias"], np.float64)
        b = b.reshape(na, spec.no).copy()
        b[:, 4] += math.log(8.0 / (640.0 / stride) ** 2)
        if cf is None:
            b[:, 5:] += math.log(0.6 / (nc - 0.99))
        else:
            b[:, 5:] += np.log(cf / cf.sum())
        params["params"][name]["bias"] = jnp.asarray(
            b.reshape(-1), jnp.float32
        )
    return params


def build_model(spec: ModelSpec, rng: Optional[jax.Array] = None,
                img_size: int = 256, init: str = "zeros"):
    """Build a YoloV7 + variables; returns (module, variables).

    init='zeros': shapes come from eval_shape and the tree materializes as
    one jitted zeros graph — no per-parameter RNG ops. Right for inference
    paths that load converted checkpoints (and for benchmarks); remote-
    attached devices pay seconds per eager init op otherwise.

    init='random': real random init, executed on the host CPU backend in
    one go and transferred once — the training entry point.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    model = YoloV7(spec)
    if init == "zeros":
        dummy_s = jax.ShapeDtypeStruct((1, img_size, img_size, 3), jnp.float32)
        shapes = jax.eval_shape(
            lambda r, d: model.init(r, d, training=False), rng, dummy_s
        )
        variables = jax.jit(
            lambda: jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            )
        )()
    else:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
            variables = model.init(rng, dummy, training=False)
        if jax.default_backend() != "cpu":
            variables = jax.device_put(variables, jax.devices()[0])
    variables = {
        "params": init_head_biases(
            {"params": variables["params"]}, spec
        )["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    return model, variables


def ensemble_apply(members, x, mode: str = "nms"):
    """Output-space ensemble (models/experimental.py:68-81
    Ensemble.forward, built by attempt_load with a weights list).

    Runs every (model, variables) member on the same input and combines
    the decoded (B, N, no) predictions:
      * 'nms'  — concatenate along the candidate axis and let NMS merge
        (the reference default);
      * 'mean' / 'max' — elementwise reduce across members (the
        commented-out reference variants; members must share topology).
    Feed the result to ops.nms exactly like a single model's output.
    Unlike weight averaging this is valid for independently-trained
    checkpoints.
    """
    ys = [m.apply(v, x, training=False)[0] for m, v in members]
    if mode == "nms":
        return jnp.concatenate(ys, axis=1)
    stacked = jnp.stack(ys)
    if mode == "mean":
        return jnp.mean(stacked, axis=0)
    if mode == "max":
        return jnp.max(stacked, axis=0)
    raise ValueError(f"unknown ensemble mode {mode!r}")
