"""Width-packing: exact conv transforms for narrow-channel layers.

The v5e vector/matrix units are 128 lanes wide and the minor-most
(channel) dimension pays the padding: a 64-channel conv wastes half of
every memory tile and every MXU pass. The w6-family front (the ReOrg
stem through the first two E-ELAN stages, reference
cfg/training/yolov7-w6.yaml rows 0-11) runs 3-64-128 channels at
1088-px resolution and profiles at 15-30 TFLOP/s — ~25% of what the
same convs achieve once channels reach 128 (tools/tpu_r5_profile.py).

Fix: fold PAIRS OF ADJACENT COLUMNS into channels. A (B, H, W, C)
tensor becomes (B, H, W/2, 2C) by pure reshape, and every conv in the
packed region is replaced by an algebraically IDENTICAL conv on packed
tensors with a block-structured kernel:

  out col (2j+o) of conv_k,s(x) sums taps x[s*(2j+o) + t - P].
  Write u = s*o + t - P; the tap lives at packed column j + u//2,
  channel block u%2. So the packed kernel

     Kp[kh, u//2 - dt_min, (u%2)*C + c, o*Co + d] += K[kh, t, c, d]

  reproduces every product exactly (unused slots are zeros; zero taps
  contribute exactly 0 in the f32 accumulator), with packed stride
  s' = s (both pack factors 2) or s' = 1 for a stride-2 conv that
  EXITS the region unpacked (q=1).

FLOP cost of the zero slots: x2 for s=1 convs, x4/3 for s=2 — paid
back ~4x over by full-lane execution (measured per-shape in
tools/tpu_pack_probe.py). The transform touches only HOW convs are
computed; parameters keep their reference shapes, so checkpoints and
the torch converter are unaffected (same scheme as the folded-ReOrg
stem, blocks._ReOrgFoldedConv).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PACK = 2  # column-pair packing; the derivations below assume 2


def pack_w(x):
    """(B, H, W, C) -> (B, H, W//2, 2C): adjacent column pairs fold
    into channels (block 0 = even columns, block 1 = odd). Pure
    reshape — the packed channel axis is [col-even C | col-odd C]."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpack_w(x):
    """Inverse of pack_w: (B, H, Wp, 2C) -> (B, H, 2*Wp, C)."""
    b, h, wp, c2 = x.shape
    return x.reshape(b, h, 2 * wp, c2 // 2)


def packed_conv_geometry(k: int, s: int, pad: int, q: int):
    """Packed-kernel geometry for a conv with width-k, stride-s,
    pad-pad, input packed by 2, output packed by q (2 = stay packed,
    1 = exit unpacked).

    Returns (taps, kw_p, stride_p, (pad_l, pad_r)) where taps is the
    list of (o, t, dt, i): original kernel column t for output block o
    lands at packed tap offset dt, input channel block i.
    """
    taps = []
    dts = []
    for o in range(q):
        for t in range(k):
            u = s * o + t - pad
            dt = u // 2 if u >= 0 else -((-u + 1) // 2)  # floor div
            i = u - 2 * dt
            taps.append((o, t, dt, i))
            dts.append(dt)
    dt_min, dt_max = min(dts), max(dts)
    kw_p = dt_max - dt_min + 1
    # packed stride: q=2 keeps the original stride (output cols advance
    # 2 per packed position, input cols 2*s -> packed s); q=1 exit
    # halves it (s must be 2)
    if q == 2:
        stride_p = s
    else:
        assert s == 2, "unpacked output needs stride 2 (width halves)"
        stride_p = 1
    return [(o, t, dt - dt_min, i) for (o, t, dt, i) in taps], \
        kw_p, stride_p, (-dt_min, dt_max)


def pack_kernel(kernel, s: int, pad: Optional[int] = None, q: int = 2,
                in_perm: Optional[np.ndarray] = None):
    """(kh, kw, C, Co) conv kernel -> packed (kh, kw_p, 2C, q*Co).

    in_perm: optional permutation of the PACKED input channel axis:
    row a of the returned kernel corresponds to packed input channel
    in_perm[a]. Used after in-region concats, whose raw packed layout
    is [A_lo A_hi B_lo B_hi ...] while the block rule expects
    [A_lo B_lo ... | A_hi B_hi ...]; a 1x1 consumer absorbs the
    permutation here instead of shuffling activations.

    Also returns (stride_p, (pad_l, pad_r)) for the packed conv.
    """
    kh, kw, c, co = kernel.shape
    if pad is None:
        pad = kw // 2
    taps, kw_p, stride_p, pads = packed_conv_geometry(kw, s, pad, q)
    kp = jnp.zeros((kh, kw_p, 2 * c, q * co), kernel.dtype)
    for o, t, dt, i in taps:
        kp = kp.at[:, dt, i * c:(i + 1) * c, o * co:(o + 1) * co].add(
            kernel[:, t])
    if in_perm is not None:
        # raw input position a holds canonical packed channel
        # in_perm[a], so the row it must multiply is kp[in_perm[a]]
        kp = kp[:, :, np.asarray(in_perm), :]
    return kp, stride_p, pads


def stem_kernel_unpacked(k6):
    """Folded-ReOrg 6x6/s2 stem kernel -> a kernel that reads the
    UNPACKED letterbox canvas and emits the q=2 packed output directly:
    (6, 6, C, c2) -> (6, 8, C, 2*c2) with raw strides (2, 4) and
    pads ((2, 2), (2, 2)).

    Output block o of packed column j is stem output column 2j+o,
    whose taps sit at raw columns 4j + (2o + t - 2): offsets u in
    [-2, 5], i.e. a width-8 window advancing 4 raw columns per packed
    position. Same math as pack_w(image) + pack_kernel(k6, s=2, pad=2,
    q=2), but the canvas never takes the (B,H,W,3)->(B,H,W/2,6)
    reshape — a measured 1.36 ms/iter relayout copy at w6@1088 b32
    (tools/tpu_wpack_ab.py trace, copy.38) for a tensor only the stem
    consumes.
    """
    kh, kw, c, co = k6.shape
    assert (kh, kw) == (6, 6), "stem geometry is the folded 6x6/s2 conv"
    kp = jnp.zeros((6, 8, c, 2 * co), k6.dtype)
    for o in range(2):
        for t in range(6):
            kp = kp.at[:, 2 * o + t, :, o * co:(o + 1) * co].add(k6[:, t])
    return kp, (2, 4), ((2, 2), (2, 2))


def stem_band_corrections(kp, h_img: int, w_img: int,
                          bands, band_val: float):
    """Exact letterbox-band contribution to the unpacked-canvas stem.

    The serving path can feed the stem the UNPADDED resize (h_img rows)
    with conv padding ((2+top, 2+bot), (2, 2)) of ZEROS, where the
    reference semantics letterbox the image into a canvas whose extra
    top/bot rows hold the constant 114. Convolution is linear, so the
    difference is conv(band-only canvas) — nonzero only for output rows
    whose 6-row tap window (output row r taps canvas rows 2r-2..2r+3)
    touches the band. This computes those rows with two strip convs
    over constant inputs (~3% of the stem's cost vs the canvas-sized
    pad write it replaces — 0.78 ms/iter of data formatting at w6@1088
    b32, tools/tpu_wpack_ab.py r5).

    Returns (corr_top, corr_bot, r_top, r_bot): add corr_top to output
    rows [0, r_top) and corr_bot to rows [r_bot, n_out); either side is
    None when its band is empty.
    """
    top, bot = bands
    hc = top + h_img + bot
    n_out = (hc - 2) // 2 + 1

    def strip_conv(lo, hi, b0, b1):
        rows = np.arange(lo, hi + 1)
        vals = np.where((rows >= b0) & (rows < b1),
                        np.float32(band_val), np.float32(0.0))
        strip = jnp.broadcast_to(
            jnp.asarray(vals, kp.dtype)[None, :, None, None],
            (1, len(rows), w_img, kp.shape[2]),
        )
        return jax.lax.conv_general_dilated(
            strip, kp, (2, 4), ((0, 0), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    corr_top = corr_bot = None
    r_top, r_bot = 0, n_out
    if top > 0:
        r_top = min(n_out, (top + 3) // 2)  # rows with 2r-2 < top
        corr_top = strip_conv(-2, 2 * r_top + 1, 0, top)
    if bot > 0:
        r_bot = max(0, (top + h_img - 2) // 2)  # 2r+3 >= top+h_img
        corr_bot = strip_conv(2 * r_bot - 2, 2 * (n_out - 1) + 3,
                              top + h_img, hc)
    return corr_top, corr_bot, r_top, r_bot


def concat_perm(part_channels: Sequence[int]) -> np.ndarray:
    """Packed-channel layout produced by concatenating packed parts.

    perm[a] = the canonical packed index (over the concatenated
    C_total tensor: [all-lo | all-hi]) held at position a of the raw
    concat of packed parts. Feed to pack_kernel(in_perm=...) of the
    consuming conv.
    """
    ct = int(sum(part_channels))
    perm = []
    off = 0
    for c in part_channels:
        for i in range(2):           # lo block then hi block of part
            for ch in range(c):
                perm.append(i * ct + off + ch)
        off += c
    return np.asarray(perm)


def packed_bias(bias, q: int = 2):
    """Per-channel bias/scale for a q-packed output: tile per block."""
    if q == 1:
        return bias
    return jnp.concatenate([bias, bias], axis=0)


def plan_region(spec) -> Optional[dict]:
    """Detect the packable front of a spec: the folded-ReOrg stem plus
    every following Conv/Concat while channels stay < 128, ending at
    the first stride-2 conv whose output has >= 128 channels (exits
    unpacked). Returns None when the topology doesn't match (only the
    w6-family front is worth packing; everything else runs unmodified).

    The plan maps layer index -> mode:
      'stem'      folded ReOrg conv, packed input image, packed out
      'packed'    conv with packed in/out (s=1 or in-region s=2)
      'exit'      stride-2 conv, packed in, unpacked out
      'concat'    channel concat of packed tensors (raw block order;
                  the consuming 1x1 conv carries the permutation)
    plus 'perm': {layer_index: np.ndarray} for convs consuming concats.
    """
    layers = {l.index: l for l in spec.layers}
    if not spec.layers or spec.layers[0].kind != "ReOrg":
        return None
    nxt = layers.get(1)
    if nxt is None or nxt.kind != "Conv" or tuple(nxt.args[:3]) != (3, 1, 1):
        return None
    plan = {0: "reorg_passthrough", 1: "stem"}
    perms = {}
    c_out = {0: 12, 1: nxt.c_out}

    def conv_ok(l):
        k, s = l.args[0], l.args[1]
        g = l.args[2] if len(l.args) > 2 else 1
        explicit_p = l.args[4] if len(l.args) > 4 else None
        return (k in (1, 3) and s in (1, 2) and g == 1
                and explicit_p is None)

    def narrow_follows(i):
        """True if a sub-128-channel conv sits between this stride-2
        conv and the next one — packing must continue through it;
        False means the rest of the net is wide: exit here."""
        j = i + 1
        while j <= i + 64:
            l = layers.get(j)
            if l is None or l.kind not in ("Conv", "Concat"):
                return False
            if l.kind == "Conv":
                if not conv_ok(l):
                    return False
                if l.args[1] == 2:
                    return False
                if l.c_out < 128:
                    return True
            j += 1
        return False

    i = 2
    while True:
        l = layers.get(i)
        if l is None:
            return None
        if l.kind == "Conv":
            if not conv_ok(l):
                return None
            src = l.frm[0]
            if src not in plan and src != i - 1:
                return None
            if l.args[1] == 2 and l.c_out >= 128 and not narrow_follows(i):
                plan[i] = "exit"
                c_out[i] = l.c_out
                break
            plan[i] = "packed"
            if layers[src].kind == "Concat":
                perms[i] = concat_perm(
                    [c_out[f] for f in layers[src].frm])
        elif l.kind == "Concat":
            if any(f not in plan for f in l.frm):
                return None
            plan[i] = "concat"
        else:
            return None
        c_out[i] = l.c_out
        i += 1
        if i > 64:  # runaway guard; real fronts end well before this
            return None
    # every saved tensor inside the region must only feed in-region
    # consumers (out-of-region users would see packed activations);
    # the exit layer's own output is unpacked, so its consumers are fine
    region = set(plan) - {i}
    for l in spec.layers:
        if l.index in plan:
            continue
        for f in l.frm:
            if f in region and f != -1:
                return None
    return {"plan": plan, "perm": perms, "exit": i}
