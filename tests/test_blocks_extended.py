"""Extended block-zoo parity vs the reference torch modules: Ghost and
Rep CSP families, Focus/DWConv/GhostConv/Contract/Expand through a cfg
yaml and the full converter; TransformerBlock and Classify at block
level (the reference parse_model does not accept them, so no cfg path
exists)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_parity import REF, _stub_missing_modules

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference repo not available"),
]

EXT_CFG = """
nc: 8
depth_multiple: 1.0
width_multiple: 1.0
anchors:
  - [10,13, 16,30, 33,23]
  - [30,61, 62,45, 59,119]

backbone:
  [[-1, 1, Focus, [16, 3]],
   [-1, 1, DWConv, [24, 3, 2]],
   [-1, 1, GhostConv, [32, 1, 1]],
   [-1, 1, Ghost, [32, 3, 1]],
   [-1, 2, GhostCSPA, [32]],
   [-1, 1, Conv, [48, 3, 2]],
   [-1, 2, RepResCSPA, [48]],
   [-1, 1, Contract, [2]],
   [-1, 1, Conv, [64, 1, 1]],
   [-1, 2, RepResCSPC, [64]],
   [-1, 1, Expand, [2]],
   [-1, 1, Conv, [32, 1, 1]],
   [-1, 1, GhostSPPCSPC, [32]],
   [-1, 2, GhostCSPB, [32]],
  ]

head:
  [[-2, 1, Conv, [32, 1, 1]],
   [[-1, -2], 1, Concat, [1]],
   [-1, 1, RepResCSPB, [48]],
   [[16, 9], 1, Detect, [nc, anchors]],
  ]
"""


def test_extended_zoo_cfg_forward_parity(tmp_path):
    torch = pytest.importorskip("torch")
    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.yolo import Model

    from yolov7_tracker_tpu.models import convert, yolo
    from yolov7_tracker_tpu.models.spec import load_yaml_file

    path = str(tmp_path / "ext.yaml")
    with open(path, "w") as f:
        f.write(EXT_CFG)
    torch.manual_seed(0)
    ref = Model(path, ch=3, nc=8)
    ref.float().eval()
    gen = torch.Generator().manual_seed(1)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                0.1 * torch.randn(m.num_features, generator=gen))
            m.running_var.copy_(
                1.0 + 0.1 * torch.rand(m.num_features, generator=gen))

    spec = load_yaml_file(path, nc=8)
    variables = convert.convert_state_dict(ref.state_dict(), spec)
    model = yolo.YoloV7(spec)

    import jax

    n_ref = sum(p.numel() for p in ref.parameters())
    n_mine = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n_mine == n_ref, (n_mine, n_ref)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))[0].numpy()
    dec, _ = model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        training=False)
    dec = np.asarray(dec)
    assert dec.shape == ref_out.shape
    a = np.sort(ref_out.reshape(-1, ref_out.shape[-1]), axis=0)
    b = np.sort(dec.reshape(-1, dec.shape[-1]), axis=0)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_unbuildable_reference_variants_build_here():
    """RepResXCSP* and RepBottleneckCSP* have no torch oracle: the
    reference ResX ctor typo ('shortcu', common.py:712) and
    RepBottleneckCSP*'s inner e=1.0 against the parent's pinned e=0.5
    cv1 (common.py:646-651, 654-675) make both families unbuildable
    upstream. Implemented here per the evident intent; check
    construction + shapes + grouped-RepConv params."""
    import jax

    from yolov7_tracker_tpu.models import blocks

    m = blocks.CSP(64, n=2, variant="c", inner="rep_res", shortcut=True,
                   g=32, inner_e=1.0)
    x = jnp.zeros((1, 16, 16, 64))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 16, 16, 64)
    k = variables["params"]["m0"]["cv2"]["rbr_dense_conv"]["kernel"]
    assert k.shape == (3, 3, 1, 32)  # 32 groups over 32 channels

    m2 = blocks.CSP(64, n=2, variant="a", inner="rep_bottleneck")
    v2 = m2.init(jax.random.PRNGKey(0), x)
    assert m2.apply(v2, x).shape == (1, 16, 16, 64)


def test_transformer_block_parity():
    torch = pytest.importorskip("torch")
    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.common as C

    from yolov7_tracker_tpu.models import blocks

    torch.manual_seed(0)
    c1, c2, heads, layers = 24, 32, 4, 2
    ref = C.TransformerBlock(c1, c2, heads, layers).float().eval()

    params = {}
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params["conv"] = {
        "conv": {"kernel": np.transpose(sd["conv.conv.weight"],
                                        (2, 3, 1, 0))},
        "bn": {"scale": sd["conv.bn.weight"], "bias": sd["conv.bn.bias"]},
    }
    stats = {"conv": {"bn": {"mean": sd["conv.bn.running_mean"],
                             "var": sd["conv.bn.running_var"]}}}
    params["linear"] = {"kernel": sd["linear.weight"].T,
                        "bias": sd["linear.bias"]}
    for j in range(layers):
        t = f"tr.{j}."
        params[f"tr{j}"] = {
            "q": {"kernel": sd[t + "q.weight"].T},
            "k": {"kernel": sd[t + "k.weight"].T},
            "v": {"kernel": sd[t + "v.weight"].T},
            "in_proj_weight": sd[t + "ma.in_proj_weight"],
            "in_proj_bias": sd[t + "ma.in_proj_bias"],
            "out_proj": {"kernel": sd[t + "ma.out_proj.weight"].T,
                         "bias": sd[t + "ma.out_proj.bias"]},
            "fc1": {"kernel": sd[t + "fc1.weight"].T},
            "fc2": {"kernel": sd[t + "fc2.weight"].T},
        }
    variables = {"params": params, "batch_stats": stats}

    m = blocks.TransformerBlock(c2, heads, layers)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, c1, 8, 6)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = m.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_classify_parity():
    torch = pytest.importorskip("torch")
    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.common as C

    from yolov7_tracker_tpu.models import blocks

    torch.manual_seed(0)
    ref = C.Classify(32, 10).float().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = {"params": {"conv": {
        "kernel": np.transpose(sd["conv.weight"], (2, 3, 1, 0)),
        "bias": sd["conv.bias"],
    }}}
    m = blocks.Classify(10)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (3, 32, 12, 9)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(m.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_contract_expand_roundtrip_and_order():
    """contract/expand channel ordering matches the torch permute
    semantics exactly (checked against a torch reference computation)."""
    torch = pytest.importorskip("torch")
    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.common as C

    from yolov7_tracker_tpu.models import blocks

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 8, 6, 4)).astype(np.float32)  # NCHW
    want_c = C.Contract(2)(torch.from_numpy(x)).numpy()
    got_c = np.transpose(np.asarray(blocks.contract(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 2)), (0, 3, 1, 2))
    np.testing.assert_array_equal(got_c, want_c)

    want_e = C.Expand(2)(torch.from_numpy(x)).numpy()
    got_e = np.transpose(np.asarray(blocks.expand(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 2)), (0, 3, 1, 2))
    np.testing.assert_array_equal(got_e, want_e)


SWIN_CFG = """
nc: 4
depth_multiple: 1.0
width_multiple: 1.0
anchors:
  - [10,13, 16,30, 33,23]

backbone:
  [[-1, 1, Conv, [32, 3, 2]],
   [-1, 1, Conv, [64, 3, 2]],
   [-1, 2, STCSPA, [64]],
   [-1, 1, Conv, [64, 3, 2]],
   [-1, 2, ST2CSPC, [64]],
   [-1, 1, SwinTransformerBlock, [64, 2, 2]],
   [-1, 1, SwinTransformer2Block, [64, 2, 1]],
   [-1, 2, STCSPB, [64]],
  ]

head:
  [[[7], 1, Detect, [nc, anchors]],
  ]
"""


def test_swin_cfg_forward_parity(tmp_path):
    """Swin v1/v2 layers, blocks and ST(2)CSP wrappers through a cfg
    and the full converter, vs the reference torch Model. 64x64 input
    exercises both the pad-to-window path (8x8 maps vs ws=7/8) and the
    shifted-window mask."""
    torch = pytest.importorskip("torch")
    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.yolo import Model

    from yolov7_tracker_tpu.models import convert, yolo
    from yolov7_tracker_tpu.models.spec import load_yaml_file

    path = str(tmp_path / "swin.yaml")
    with open(path, "w") as f:
        f.write(SWIN_CFG)
    torch.manual_seed(0)
    ref = Model(path, ch=3, nc=4)
    ref.float().eval()
    gen = torch.Generator().manual_seed(1)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                0.1 * torch.randn(m.num_features, generator=gen))
            m.running_var.copy_(
                1.0 + 0.1 * torch.rand(m.num_features, generator=gen))

    spec = load_yaml_file(path, nc=4)
    variables = convert.convert_state_dict(ref.state_dict(), spec)
    model = yolo.YoloV7(spec)

    import jax

    n_ref = sum(p.numel() for p in ref.parameters())
    n_mine = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n_mine == n_ref, (n_mine, n_ref)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))[0].numpy()
    dec, _ = model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        training=False)
    dec = np.asarray(dec)
    assert dec.shape == ref_out.shape
    a = np.sort(ref_out.reshape(-1, ref_out.shape[-1]), axis=0)
    b = np.sort(dec.reshape(-1, dec.shape[-1]), axis=0)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


OREPA_CFG = """
nc: 4
depth_multiple: 1.0
width_multiple: 1.0
anchors:
  - [10,13, 16,30, 33,23]

backbone:
  [[-1, 1, Conv, [32, 3, 2]],
   [-1, 1, RepConv_OREPA, [32, 3, 1]],
   [-1, 1, RepConv_OREPA, [64, 3, 2]],
   [-1, 1, Conv, [64, 1, 1]],
  ]

head:
  [[[3], 1, Detect, [nc, anchors]],
  ]
"""


def test_orepa_cfg_forward_parity(tmp_path):
    """RepConv_OREPA (identity and non-identity forms) through a cfg
    and the converter vs the reference torch Model; covers the 5-branch
    OREPA weight composition, the ConvBN 1x1 and the identity BN."""
    torch = pytest.importorskip("torch")
    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.yolo import Model

    from yolov7_tracker_tpu.models import convert, yolo
    from yolov7_tracker_tpu.models.spec import load_yaml_file

    path = str(tmp_path / "orepa.yaml")
    with open(path, "w") as f:
        f.write(OREPA_CFG)
    torch.manual_seed(0)
    ref = Model(path, ch=3, nc=4)
    ref.float().eval()
    gen = torch.Generator().manual_seed(1)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                0.1 * torch.randn(m.num_features, generator=gen))
            m.running_var.copy_(
                1.0 + 0.1 * torch.rand(m.num_features, generator=gen))

    spec = load_yaml_file(path, nc=4)
    variables = convert.convert_state_dict(ref.state_dict(), spec)
    model = yolo.YoloV7(spec)

    import jax

    n_ref = sum(p.numel() for p in ref.parameters())
    n_mine = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n_mine == n_ref, (n_mine, n_ref)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))[0].numpy()
    dec, _ = model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        training=False)
    dec = np.asarray(dec)
    assert dec.shape == ref_out.shape
    a = np.sort(ref_out.reshape(-1, ref_out.shape[-1]), axis=0)
    b = np.sort(dec.reshape(-1, dec.shape[-1]), axis=0)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


ROBUST_CFG = """
nc: 4
depth_multiple: 1.0
width_multiple: 1.0
anchors:
  - [10,13, 16,30, 33,23]

backbone:
  [[-1, 1, Conv, [32, 3, 2]],
   [-1, 1, RobustConv, [32, 7, 1]],
   [-1, 1, Conv, [32, 3, 2]],
   [-1, 1, RobustConv2, [32, 5, 2]],
   [[-1, -2], 1, Chuncat, [1]],
   [-1, 1, Foldcut, [1]],
   [-1, 1, Conv, [64, 1, 1]],
  ]

head:
  [[[6], 1, Detect, [nc, anchors]],
  ]
"""


def test_robust_chuncat_foldcut_parity(tmp_path):
    """RobustConv(2), Chuncat and Foldcut through a cfg vs the
    reference torch Model. The reference Foldcut default dimension=0
    chunks the batch axis, which no-ops batch-1 parity; our channel
    implementation matches parse_model's c2=ch//2 contract, so the
    torch side is patched to dimension=1 as the evident intent."""
    torch = pytest.importorskip("torch")
    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.common as C
    from models.yolo import Model

    from yolov7_tracker_tpu.models import convert, yolo
    from yolov7_tracker_tpu.models.spec import load_yaml_file

    path = str(tmp_path / "robust.yaml")
    with open(path, "w") as f:
        f.write(ROBUST_CFG)
    torch.manual_seed(0)
    ref = Model(path, ch=3, nc=4)
    for m in ref.modules():
        if isinstance(m, C.Foldcut):
            m.d = 1
    ref.float().eval()
    gen = torch.Generator().manual_seed(1)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                0.1 * torch.randn(m.num_features, generator=gen))
            m.running_var.copy_(
                1.0 + 0.1 * torch.rand(m.num_features, generator=gen))

    spec = load_yaml_file(path, nc=4)
    variables = convert.convert_state_dict(ref.state_dict(), spec)
    model = yolo.YoloV7(spec)

    import jax

    n_ref = sum(p.numel() for p in ref.parameters())
    n_mine = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n_mine == n_ref, (n_mine, n_ref)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))[0].numpy()
    dec, _ = model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        training=False)
    dec = np.asarray(dec)
    assert dec.shape == ref_out.shape
    a = np.sort(ref_out.reshape(-1, ref_out.shape[-1]), axis=0)
    b = np.sort(dec.reshape(-1, dec.shape[-1]), axis=0)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_crossconv_sum_mixconv_parity():
    """CrossConv / Sum / MixConv2d block-level goldens vs the reference
    torch modules (models/experimental.py:9-65)."""
    torch = pytest.importorskip("torch")
    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.experimental as E

    from yolov7_tracker_tpu.models import blocks

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 16, 10, 12)).astype(np.float32)  # NCHW
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    # CrossConv
    torch.manual_seed(0)
    ref = E.CrossConv(16, 16, k=3, s=1, shortcut=True).float().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def cb(prefix):
        return ({"kernel": np.transpose(sd[f"{prefix}.conv.weight"],
                                        (2, 3, 1, 0))},
                {"scale": sd[f"{prefix}.bn.weight"],
                 "bias": sd[f"{prefix}.bn.bias"]},
                {"mean": sd[f"{prefix}.bn.running_mean"],
                 "var": sd[f"{prefix}.bn.running_var"]})

    k1, b1, s1 = cb("cv1")
    k2, b2, s2 = cb("cv2")
    variables = {"params": {"cv1_conv": k1, "cv1_bn": b1,
                            "cv2_conv": k2, "cv2_bn": b2},
                 "batch_stats": {"cv1_bn": s1, "cv2_bn": s2}}
    m = blocks.CrossConv(16, 3, 1, shortcut=True)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.transpose(np.asarray(
        m.apply(variables, x_nhwc)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # Sum (weighted)
    torch.manual_seed(0)
    refs = E.Sum(3, weight=True).float().eval()
    ws = refs.w.detach().numpy()
    ms = blocks.Sum(3, weight=True)
    xs = [rng.normal(0, 1, (2, 5, 4, 3)).astype(np.float32)
          for _ in range(3)]
    with torch.no_grad():
        want = refs([torch.from_numpy(v) for v in xs]).numpy()
    got = np.asarray(ms.apply({"params": {"w": ws}},
                              [jnp.asarray(v) for v in xs]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # MixConv2d
    torch.manual_seed(0)
    refm = E.MixConv2d(16, 16, k=(1, 3), s=1).float().eval()
    gen = torch.Generator().manual_seed(1)
    for mod in refm.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.copy_(
                0.1 * torch.randn(mod.num_features, generator=gen))
            mod.running_var.copy_(
                1.0 + 0.1 * torch.rand(mod.num_features, generator=gen))
    sdm = {k: v.detach().numpy() for k, v in refm.state_dict().items()}
    variables = {
        "params": {
            "m0": {"kernel": np.transpose(sdm["m.0.weight"],
                                          (2, 3, 1, 0))},
            "m1": {"kernel": np.transpose(sdm["m.1.weight"],
                                          (2, 3, 1, 0))},
            "bn": {"scale": sdm["bn.weight"], "bias": sdm["bn.bias"]},
        },
        "batch_stats": {"bn": {"mean": sdm["bn.running_mean"],
                               "var": sdm["bn.running_var"]}},
    }
    mm = blocks.MixConv2d(16, (1, 3), 1)
    with torch.no_grad():
        want = refm(torch.from_numpy(x)).numpy()
    got = np.transpose(np.asarray(
        mm.apply(variables, x_nhwc)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
