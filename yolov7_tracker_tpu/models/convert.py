"""PyTorch checkpoint -> Flax variables converter.

Maps the reference's state_dict naming (model.{i}.<block-internal>) onto
our spec-driven Flax tree (layer{i}/... + detection-head leaves), with
the layout changes TPU wants: conv kernels OIHW -> HWIO, implicit
embeddings (1,C,1,1) -> (C,). Handles:

- Conv (conv/bn), SPPCSPC (cv1..cv7), DownC (cv1..cv3)  [models/common.py]
- RepConv in training form (rbr_dense/rbr_1x1/rbr_identity) and in
  deploy/fused form (rbr_reparam), which is folded back into the dense
  branch with identity BN so one module form serves both
  (models/common.py:463-541, fuse_repvgg_block)
- Detect/IDetect/IAuxDetect heads: m/m2 1x1 convs + ia/im implicits
  (models/yolo.py:23-158)

Loading a full reference .pt (a pickled nn.Module, models/experimental.py
attempt_load) requires the reference package importable; prefer passing a
plain state_dict (torch.save(model.state_dict())) or use
``state_dict_from_reference_ckpt`` with a reference repo path.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .spec import CSP_KINDS, ModelSpec

BN_EPS = 1e-5


def _k(t):  # OIHW -> HWIO
    return np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0))


def _grouped_k(t, groups: int):
    """torch grouped conv weight (O, I/g, H, W) -> flax HWIO with
    feature_group_count semantics (same memory layout transposed)."""
    return _k(t)


def convert_state_dict(sd: Dict[str, Any], spec: ModelSpec):
    """Return flax variables {'params': ..., 'batch_stats': ...}."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    # strip common prefixes ('model.' / 'module.')
    def norm(k):
        for p in ("module.", "model."):
            if k.startswith(p):
                k = k[len(p):]
        return k

    sd = {norm(k): v for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    head_idx = spec.layers[-1].index
    nl = spec.nl

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(val, np.float32)

    def conv_bn(dst_prefix, src_prefix, layer_name):
        put(params, (layer_name,) + dst_prefix + ("conv", "kernel"),
            _k(sd[src_prefix + ".conv.weight"]))
        put(params, (layer_name,) + dst_prefix + ("bn", "scale"),
            sd[src_prefix + ".bn.weight"])
        put(params, (layer_name,) + dst_prefix + ("bn", "bias"),
            sd[src_prefix + ".bn.bias"])
        put(stats, (layer_name,) + dst_prefix + ("bn", "mean"),
            sd[src_prefix + ".bn.running_mean"])
        put(stats, (layer_name,) + dst_prefix + ("bn", "var"),
            sd[src_prefix + ".bn.running_var"])

    def rep_conv(dst_prefix, src_prefix, layer_name):
        """RepConv branches (training rbr_dense/rbr_1x1/rbr_identity or
        deploy rbr_reparam folded back into the dense branch)."""
        base = (layer_name,) + dst_prefix
        if f"{src_prefix}.rbr_reparam.weight" in sd:
            put(params, base + ("rbr_dense_conv", "kernel"),
                _k(sd[f"{src_prefix}.rbr_reparam.weight"]))
            c2 = sd[f"{src_prefix}.rbr_reparam.bias"].shape[0]
            put(params, base + ("rbr_dense_bn", "scale"), np.ones(c2))
            put(params, base + ("rbr_dense_bn", "bias"),
                sd[f"{src_prefix}.rbr_reparam.bias"])
            put(stats, base + ("rbr_dense_bn", "mean"), np.zeros(c2))
            put(stats, base + ("rbr_dense_bn", "var"),
                np.full(c2, 1.0 - BN_EPS))
            c1 = sd[f"{src_prefix}.rbr_reparam.weight"].shape[1]
            put(params, base + ("rbr_1x1_conv", "kernel"),
                np.zeros((1, 1, c1, c2)))
            put(params, base + ("rbr_1x1_bn", "scale"), np.ones(c2))
            put(params, base + ("rbr_1x1_bn", "bias"), np.zeros(c2))
            put(stats, base + ("rbr_1x1_bn", "mean"), np.zeros(c2))
            put(stats, base + ("rbr_1x1_bn", "var"),
                np.full(c2, 1.0 - BN_EPS))
            return
        put(params, base + ("rbr_dense_conv", "kernel"),
            _k(sd[f"{src_prefix}.rbr_dense.0.weight"]))
        for tgt, src in (("scale", "weight"), ("bias", "bias")):
            put(params, base + ("rbr_dense_bn", tgt),
                sd[f"{src_prefix}.rbr_dense.1.{src}"])
        put(stats, base + ("rbr_dense_bn", "mean"),
            sd[f"{src_prefix}.rbr_dense.1.running_mean"])
        put(stats, base + ("rbr_dense_bn", "var"),
            sd[f"{src_prefix}.rbr_dense.1.running_var"])
        put(params, base + ("rbr_1x1_conv", "kernel"),
            _k(sd[f"{src_prefix}.rbr_1x1.0.weight"]))
        for tgt, src in (("scale", "weight"), ("bias", "bias")):
            put(params, base + ("rbr_1x1_bn", tgt),
                sd[f"{src_prefix}.rbr_1x1.1.{src}"])
        put(stats, base + ("rbr_1x1_bn", "mean"),
            sd[f"{src_prefix}.rbr_1x1.1.running_mean"])
        put(stats, base + ("rbr_1x1_bn", "var"),
            sd[f"{src_prefix}.rbr_1x1.1.running_var"])
        if f"{src_prefix}.rbr_identity.weight" in sd:
            put(params, base + ("rbr_identity", "scale"),
                sd[f"{src_prefix}.rbr_identity.weight"])
            put(params, base + ("rbr_identity", "bias"),
                sd[f"{src_prefix}.rbr_identity.bias"])
            put(stats, base + ("rbr_identity", "mean"),
                sd[f"{src_prefix}.rbr_identity.running_mean"])
            put(stats, base + ("rbr_identity", "var"),
                sd[f"{src_prefix}.rbr_identity.running_var"])

    def dense(dst_path, src_prefix, bias=True):
        put(params, dst_path + ("kernel",),
            sd[f"{src_prefix}.weight"].T)
        if bias:
            put(params, dst_path + ("bias",), sd[f"{src_prefix}.bias"])

    def layer_norm(dst_path, src_prefix):
        put(params, dst_path + ("scale",), sd[f"{src_prefix}.weight"])
        put(params, dst_path + ("bias",), sd[f"{src_prefix}.bias"])

    def swin_block(dst_prefix, src_prefix, layer_name, n_layers, v2):
        """SwinTransformer(2)Block: optional conv + blocks.{i} with
        norm1/norm2, attn (qkv/table or cpb-MLP), proj, mlp fc1/fc2."""
        if f"{src_prefix}.conv.conv.weight" in sd:
            conv_bn(dst_prefix + ("conv",), f"{src_prefix}.conv",
                    layer_name)
        for i in range(n_layers):
            src = f"{src_prefix}.blocks.{i}"
            dst = dst_prefix + (f"blocks{i}",)
            layer_norm((layer_name,) + dst + ("norm1",), f"{src}.norm1")
            layer_norm((layer_name,) + dst + ("norm2",), f"{src}.norm2")
            dense((layer_name,) + dst + ("mlp_fc1",), f"{src}.mlp.fc1")
            dense((layer_name,) + dst + ("mlp_fc2",), f"{src}.mlp.fc2")
            a_src = f"{src}.attn"
            a_dst = (layer_name,) + dst + ("attn",)
            dense(a_dst + ("proj",), f"{a_src}.proj")
            if v2:
                put(params, a_dst + ("qkv_kernel",),
                    sd[f"{a_src}.qkv.weight"].T)
                put(params, a_dst + ("q_bias",), sd[f"{a_src}.q_bias"])
                put(params, a_dst + ("v_bias",), sd[f"{a_src}.v_bias"])
                put(params, a_dst + ("logit_scale",),
                    sd[f"{a_src}.logit_scale"])
                dense(a_dst + ("cpb_fc1",), f"{a_src}.cpb_mlp.0")
                dense(a_dst + ("cpb_fc2",), f"{a_src}.cpb_mlp.2",
                      bias=False)
            else:
                dense(a_dst + ("qkv",), f"{a_src}.qkv")
                put(params, a_dst + ("relative_position_bias_table",),
                    sd[f"{a_src}.relative_position_bias_table"])

    def ghost_conv(dst_prefix, src_prefix, layer_name):
        for cv in ("cv1", "cv2"):
            conv_bn(dst_prefix + (cv,), f"{src_prefix}.{cv}", layer_name)

    def ghost_block(dst_prefix, src_prefix, layer_name):
        """Ghost bottleneck at s=1 (conv.0 / conv.2 GhostConvs; the s=2
        depthwise/shortcut branches appear only in stride-2 uses)."""
        ghost_conv(dst_prefix + ("conv0",), f"{src_prefix}.conv.0",
                   layer_name)
        ghost_conv(dst_prefix + ("conv2",), f"{src_prefix}.conv.2",
                   layer_name)
        if f"{src_prefix}.conv.1.conv.weight" in sd:
            conv_bn(dst_prefix + ("conv1",), f"{src_prefix}.conv.1",
                    layer_name)
            conv_bn(dst_prefix + ("shortcut0",),
                    f"{src_prefix}.shortcut.0", layer_name)
            conv_bn(dst_prefix + ("shortcut1",),
                    f"{src_prefix}.shortcut.1", layer_name)

    for l in spec.layers:
        i = l.index
        name = f"layer{i}"
        pre = f"{i}"
        if l.kind == "Conv":
            conv_bn((), pre, name)
        elif l.kind == "DownC":
            for cv in ("cv1", "cv2", "cv3"):
                conv_bn((cv,), f"{pre}.{cv}", name)
        elif l.kind == "SPPCSPC":
            for cv in ("cv1", "cv2", "cv3", "cv4", "cv5", "cv6", "cv7"):
                conv_bn((cv,), f"{pre}.{cv}", name)
        elif l.kind == "Bottleneck":
            n = l.args[0]
            if n > 1:  # parse_model wraps repeats in nn.Sequential
                for j in range(n):
                    for cv in ("cv1", "cv2"):
                        conv_bn((f"m{j}_{cv}",), f"{pre}.{j}.{cv}", name)
            else:
                for cv in ("cv1", "cv2"):
                    conv_bn((cv,), f"{pre}.{cv}", name)
        elif l.kind in CSP_KINDS:
            variant, inner, *_ = CSP_KINDS[l.kind]
            outer = ("cv1", "cv2", "cv3", "cv4") if variant == "c" else (
                "cv1", "cv2", "cv3")
            for cv in outer:
                conv_bn((cv,), f"{pre}.{cv}", name)
            for j in range(l.args[0]):
                src_m = f"{pre}.m.{j}"
                if inner == "ghost":
                    ghost_block((f"m{j}",), src_m, name)
                elif inner == "rep_bottleneck":
                    conv_bn((f"m{j}", "cv1"), f"{src_m}.cv1", name)
                    rep_conv((f"m{j}", "cv2"), f"{src_m}.cv2", name)
                elif inner == "rep_res":
                    conv_bn((f"m{j}", "cv1"), f"{src_m}.cv1", name)
                    rep_conv((f"m{j}", "cv2"), f"{src_m}.cv2", name)
                    conv_bn((f"m{j}", "cv3"), f"{src_m}.cv3", name)
                else:
                    inner_cvs = (("cv1", "cv2", "cv3") if inner == "res"
                                 else ("cv1", "cv2"))
                    for cv in inner_cvs:
                        conv_bn((f"m{j}", cv), f"{src_m}.{cv}", name)
        elif l.kind == "SPP":
            for cv in ("cv1", "cv2"):
                conv_bn((cv,), f"{pre}.{cv}", name)
        elif l.kind == "Focus":
            conv_bn(("conv",), f"{pre}.conv", name)
        elif l.kind == "RobustConv":
            conv_bn(("conv_dw",), f"{pre}.conv_dw", name)
            put(params, (name, "conv1x1", "kernel"),
                _k(sd[f"{pre}.conv1x1.weight"]))
            put(params, (name, "conv1x1", "bias"),
                sd[f"{pre}.conv1x1.bias"])
            put(params, (name, "gamma"), sd[f"{pre}.gamma"])
        elif l.kind == "RobustConv2":
            conv_bn(("conv_strided",), f"{pre}.conv_strided", name)
            # torch ConvTranspose2d weight is (in, out, kh, kw); flax
            # ConvTranspose expects (kh, kw, in, out)
            put(params, (name, "conv_deconv", "kernel"),
                np.transpose(sd[f"{pre}.conv_deconv.weight"],
                             (2, 3, 0, 1)))
            put(params, (name, "conv_deconv", "bias"),
                sd[f"{pre}.conv_deconv.bias"])
            put(params, (name, "gamma"), sd[f"{pre}.gamma"])
        elif l.kind == "DWConv":
            conv_bn((), pre, name)
        elif l.kind == "GhostConv":
            ghost_conv((), pre, name)
        elif l.kind == "Ghost":
            ghost_block((), pre, name)
        elif l.kind == "GhostSPPCSPC":
            for cv in ("cv1", "cv2", "cv3", "cv4", "cv5", "cv6", "cv7"):
                ghost_conv((cv,), f"{pre}.{cv}", name)
        elif l.kind in ("SwinTransformerBlock", "SwinTransformer2Block"):
            swin_block((), pre, name, l.args[1],
                       l.kind == "SwinTransformer2Block")
        elif l.kind in ("STCSPA", "STCSPB", "STCSPC",
                        "ST2CSPA", "ST2CSPB", "ST2CSPC"):
            outer = (("cv1", "cv2", "cv3", "cv4") if l.kind.endswith("C")
                     else ("cv1", "cv2", "cv3"))
            for cv in outer:
                conv_bn((cv,), f"{pre}.{cv}", name)
            swin_block(("m",), f"{pre}.m", name, l.args[0],
                       l.kind.startswith("ST2"))
        elif l.kind == "SPPF":
            for cv in ("cv1", "cv2"):
                conv_bn((cv,), f"{pre}.{cv}", name)
        elif l.kind in ("C3", "C2f"):
            outer = ("cv1", "cv2", "cv3") if l.kind == "C3" else (
                "cv1", "cv2")
            for cv in outer:
                conv_bn((cv,), f"{pre}.{cv}", name)
            for j in range(l.args[0]):
                for cv in ("cv1", "cv2"):
                    conv_bn((f"m{j}", cv), f"{pre}.m.{j}.{cv}", name)
        elif l.kind == "Stem":
            for cv in ("cv1", "cv2", "cv3", "cv4"):
                conv_bn((cv,), f"{pre}.{cv}", name)
        elif l.kind == "RepConv":
            rep_conv((), pre, name)
        elif l.kind == "RepConv_OREPA":
            if f"{pre}.rbr_reparam.weight" in sd:
                raise NotImplementedError(
                    "deploy-form RepConv_OREPA checkpoints not supported")
            d = f"{pre}.rbr_dense"
            for key in ("weight_rbr_origin", "weight_rbr_avg_conv",
                        "weight_rbr_pfir_conv",
                        "weight_rbr_1x1_kxk_idconv1",
                        "weight_rbr_1x1_kxk_conv2",
                        "weight_rbr_gconv_dw", "weight_rbr_gconv_pw",
                        "vector"):
                put(params, (name, "rbr_dense", key), sd[f"{d}.{key}"])
            put(params, (name, "rbr_dense", "bn", "scale"),
                sd[f"{d}.bn.weight"])
            put(params, (name, "rbr_dense", "bn", "bias"),
                sd[f"{d}.bn.bias"])
            put(stats, (name, "rbr_dense", "bn", "mean"),
                sd[f"{d}.bn.running_mean"])
            put(stats, (name, "rbr_dense", "bn", "var"),
                sd[f"{d}.bn.running_var"])
            put(params, (name, "rbr_1x1_conv", "kernel"),
                _k(sd[f"{pre}.rbr_1x1.conv.weight"]))
            put(params, (name, "rbr_1x1_bn", "scale"),
                sd[f"{pre}.rbr_1x1.bn.weight"])
            put(params, (name, "rbr_1x1_bn", "bias"),
                sd[f"{pre}.rbr_1x1.bn.bias"])
            put(stats, (name, "rbr_1x1_bn", "mean"),
                sd[f"{pre}.rbr_1x1.bn.running_mean"])
            put(stats, (name, "rbr_1x1_bn", "var"),
                sd[f"{pre}.rbr_1x1.bn.running_var"])
            if f"{pre}.rbr_identity.weight" in sd:
                put(params, (name, "rbr_identity", "scale"),
                    sd[f"{pre}.rbr_identity.weight"])
                put(params, (name, "rbr_identity", "bias"),
                    sd[f"{pre}.rbr_identity.bias"])
                put(stats, (name, "rbr_identity", "mean"),
                    sd[f"{pre}.rbr_identity.running_mean"])
                put(stats, (name, "rbr_identity", "var"),
                    sd[f"{pre}.rbr_identity.running_var"])
        elif l.kind == "DetectV8":
            # decoupled anchor-free head: cv2 box branch (2 conv+bn then
            # a biased 1x1 of 4*reg_max), cv3 class branch (same shape
            # ending in nc); the fixed DFL expectation conv is a constant
            # arange and lives in the decode, not the params
            for br in ("cv2", "cv3"):
                for hi in range(nl):
                    for j in (0, 1):
                        conv_bn((), f"{pre}.{br}.{hi}.{j}",
                                f"head_{br}_{hi}_{j}")
                    dst = f"head_{br}_{hi}_2"
                    put(params, (dst, "kernel"),
                        _k(sd[f"{pre}.{br}.{hi}.2.weight"]))
                    put(params, (dst, "bias"), sd[f"{pre}.{br}.{hi}.2.bias"])
        elif l.kind in ("Detect", "IDetect", "IAuxDetect", "IBin"):
            n_heads = len(spec.head_from)
            for hi in range(n_heads):
                aux = hi >= nl
                src = f"{head_idx}.{'m2' if aux else 'm'}.{hi % nl}"
                dst = f"head_m{('2' if aux else '')}_{hi % nl}"
                put(params, (dst, "kernel"), _k(sd[f"{src}.weight"]))
                put(params, (dst, "bias"), sd[f"{src}.bias"])
            if l.kind in ("IDetect", "IAuxDetect", "IBin"):
                for hi in range(nl):
                    put(params, (f"head_ia_{hi}", "implicit"),
                        sd[f"{head_idx}.ia.{hi}.implicit"].reshape(-1))
                    put(params, (f"head_im_{hi}", "implicit"),
                        sd[f"{head_idx}.im.{hi}.implicit"].reshape(-1))
    import jax.numpy as jnp
    import jax

    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    return {"params": params, "batch_stats": stats}


def ensemble_variables(variables_list):
    """Parameter averaging for SAME-RUN checkpoints only (EMA/SWA-style
    snapshots in one loss basin). For independently-trained checkpoints
    weight averaging is NOT equivalent to the reference Ensemble and can
    produce degenerate predictions — use models.yolo.ensemble_apply,
    which combines decoded outputs (models/experimental.py:68-81).
    Returns averaged {'params', 'batch_stats'}."""
    import jax

    def avg(*xs):
        return sum(xs) / len(xs)

    return jax.tree.map(avg, *variables_list)


def state_dict_from_reference_ckpt(path: str, reference_repo: str):
    """Unpickle a reference .pt (attempt_load-style dict) by making the
    reference package importable, and return its fp32 state_dict."""
    import sys

    import torch

    if reference_repo not in sys.path:
        sys.path.insert(0, reference_repo)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt.get("ema") or ckpt.get("model") if isinstance(ckpt, dict) else ckpt
    model = model.float()
    return model.state_dict()
