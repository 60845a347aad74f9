"""YOLOv5 / YOLOv8 family parity.

The reference swaps detectors via ultralytics black boxes
(tracker/track_yolov5.py:28 DetectMultiBackend, track_yolov8.py:27
``from ultralytics import YOLO``). ultralytics is not installable here,
so the oracle is a clean-room torch implementation of the published
C3/SPPF (v5) and C2f/DFL (v8) architectures built in this test, plus
exact published parameter counts:

- yolov5 n/s/m/l/x v6.0+: 1,872,157 / 7,235,389 / 21,190,557 /
  46,563,709 / 86,749,405 params (ultralytics/yolov5 README table)
- yolov8 n/s/m/l/x: 3,157,200 / 11,166,560 / 25,902,640 / 43,691,520 /
  68,229,648 (ultralytics README) — minus the 16 fixed DFL arange
  weights, which live in our decode as a constant, not a parameter.

The forward-parity test validates block math, DAG wiring, head decode
and the checkpoint converter in one shot, exactly like
test_model_parity does for the v7 family.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov7_tracker_tpu.models import convert, yolo, zoo
from yolov7_tracker_tpu.models.spec import CSP_KINDS, REG_MAX  # noqa: F401

EXPECTED_PARAMS = {
    "yolov5n": 1_872_157,
    "yolov5s": 7_235_389,
    "yolov5m": 21_190_557,
    "yolov5l": 46_563_709,
    "yolov5x": 86_749_405,
    "yolov8n": 3_157_200 - 16,
    "yolov8s": 11_166_560 - 16,
    "yolov8m": 25_902_640 - 16,
    "yolov8l": 43_691_520 - 16,
    "yolov8x": 68_229_648 - 16,
}


@pytest.mark.parametrize(
    "name",
    [
        # the l/x variants take ~30 s of init each; n/s/m exercise the
        # same builder code paths in the fast lane
        pytest.param(n, marks=pytest.mark.slow)
        if n[-1] in "lx" else n
        for n in sorted(EXPECTED_PARAMS)
    ],
)
def test_param_counts(name):
    spec = zoo.get_spec(name, nc=80)
    _, variables = yolo.build_model(spec, img_size=64)
    n = sum(int(np.prod(x.shape))
            for x in jax.tree.leaves(variables["params"]))
    assert n == EXPECTED_PARAMS[name], (name, n, EXPECTED_PARAMS[name])


# ---------------------------------------------------------------------------
# torch oracle: spec-driven clean-room v5/v8 modules
# ---------------------------------------------------------------------------


def _build_torch(spec):
    torch = pytest.importorskip("torch")
    nn = torch.nn

    class TConv(nn.Module):
        def __init__(self, c1, c2, k=1, s=1, p=None, g=1):
            super().__init__()
            self.conv = nn.Conv2d(c1, c2, k, s,
                                  k // 2 if p is None else p,
                                  groups=g, bias=False)
            self.bn = nn.BatchNorm2d(c2)
            self.act = nn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class TBottleneckV5(nn.Module):
        def __init__(self, c1, c2, shortcut=True, e=1.0):
            super().__init__()
            c_ = int(c2 * e)
            self.cv1 = TConv(c1, c_, 1)
            self.cv2 = TConv(c_, c2, 3)
            self.add = shortcut and c1 == c2

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class TC3(nn.Module):
        def __init__(self, c1, c2, n=1, shortcut=True, e=0.5):
            super().__init__()
            c_ = int(c2 * e)
            self.cv1 = TConv(c1, c_, 1)
            self.cv2 = TConv(c1, c_, 1)
            self.cv3 = TConv(2 * c_, c2, 1)
            self.m = nn.Sequential(
                *(TBottleneckV5(c_, c_, shortcut, 1.0) for _ in range(n))
            )

        def forward(self, x):
            return self.cv3(
                torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1)
            )

    class TBottleneckV8(nn.Module):
        def __init__(self, c, shortcut=True):
            super().__init__()
            self.cv1 = TConv(c, c, 3)
            self.cv2 = TConv(c, c, 3)
            self.add = shortcut

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class TC2f(nn.Module):
        def __init__(self, c1, c2, n=1, shortcut=False, e=0.5):
            super().__init__()
            self.c = int(c2 * e)
            self.cv1 = TConv(c1, 2 * self.c, 1)
            self.cv2 = TConv((2 + n) * self.c, c2, 1)
            self.m = nn.ModuleList(
                TBottleneckV8(self.c, shortcut) for _ in range(n)
            )

        def forward(self, x):
            y = list(self.cv1(x).chunk(2, 1))
            y.extend(m(y[-1]) for m in self.m)
            return self.cv2(torch.cat(y, 1))

    class TSPPF(nn.Module):
        def __init__(self, c1, c2, k=5):
            super().__init__()
            c_ = c1 // 2
            self.cv1 = TConv(c1, c_, 1)
            self.cv2 = TConv(c_ * 4, c2, 1)
            self.mp = nn.MaxPool2d(k, 1, k // 2)

        def forward(self, x):
            x = self.cv1(x)
            y1 = self.mp(x)
            y2 = self.mp(y1)
            y3 = self.mp(y2)
            return self.cv2(torch.cat([x, y1, y2, y3], 1))

    class TDetectV5(nn.Module):
        def __init__(self, ch, na, no):
            super().__init__()
            self.m = nn.ModuleList(nn.Conv2d(c, na * no, 1) for c in ch)

    class TDetectV8(nn.Module):
        def __init__(self, ch, nc):
            super().__init__()
            c2 = max(16, ch[0] // 4, REG_MAX * 4)
            c3 = max(ch[0], min(nc, 100))
            self.cv2 = nn.ModuleList(
                nn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3),
                              nn.Conv2d(c2, 4 * REG_MAX, 1)) for c in ch
            )
            self.cv3 = nn.ModuleList(
                nn.Sequential(TConv(c, c3, 3), TConv(c3, c3, 3),
                              nn.Conv2d(c3, nc, 1)) for c in ch
            )

    class TModel(nn.Module):
        """Spec-driven DAG executor (NCHW)."""

        def __init__(self, spec):
            super().__init__()
            mods = []
            ch = []
            for l in spec.layers:
                c1 = ch[l.frm[0]] if l.index > 0 else 3
                if l.kind == "Conv":
                    k, s, g, act = l.args[:4]
                    p = l.args[4] if len(l.args) > 4 else None
                    mods.append(TConv(c1, l.c_out, k, s, p, g))
                elif l.kind == "C3":
                    mods.append(TC3(c1, l.c_out, l.args[0], l.args[1]))
                elif l.kind == "C2f":
                    mods.append(TC2f(c1, l.c_out, l.args[0], l.args[1]))
                elif l.kind == "SPPF":
                    mods.append(TSPPF(c1, l.c_out, l.args[0]))
                elif l.kind == "Upsample":
                    mods.append(nn.Upsample(scale_factor=l.args[0],
                                            mode="nearest"))
                elif l.kind == "Concat":
                    mods.append(nn.Identity())
                elif l.kind == "Detect":
                    hch = [ch[x] for x in l.frm]
                    mods.append(TDetectV5(hch, spec.na, spec.nc + 5))
                elif l.kind == "DetectV8":
                    hch = [ch[x] for x in l.frm]
                    mods.append(TDetectV8(hch, spec.nc))
                else:
                    raise AssertionError(l.kind)
                ch.append(l.c_out)
            self.model = nn.ModuleList(mods)
            self.spec = spec

        def forward(self, x):
            spec = self.spec
            saved, y = {}, x
            for l in spec.layers:
                if l.kind in ("Detect", "DetectV8"):
                    heads = [saved.get(i, y) for i in l.frm]
                    return self._decode(self.model[l.index], heads)
                inp = saved[l.frm[0]] if l.frm[0] != l.index - 1 else y
                if l.index == 0:
                    inp = x
                if l.kind == "Concat":
                    parts = [saved.get(i, y) for i in l.frm]
                    y = torch.cat(parts, 1)
                else:
                    y = self.model[l.index](inp)
                if l.index in spec.save:
                    saved[l.index] = y
            raise AssertionError("no head")

        def _decode(self, head, feats):
            spec = self.spec
            outs = []
            if spec.head_kind == "Detect":
                anchors = torch.tensor(
                    np.asarray(spec.anchors_per_level()))
                for i, f in enumerate(feats):
                    p = head.m[i](f)
                    b, _, ny, nx = p.shape
                    p = (p.view(b, spec.na, spec.no, ny, nx)
                         .permute(0, 1, 3, 4, 2))
                    ys = torch.sigmoid(p)
                    gy, gx = torch.meshgrid(
                        torch.arange(ny), torch.arange(nx), indexing="ij")
                    grid = torch.stack((gx, gy), 2).float()
                    stride = float(spec.strides[i])
                    xy = (ys[..., 0:2] * 2.0 - 0.5 + grid) * stride
                    wh = ((ys[..., 2:4] * 2.0) ** 2
                          * anchors[i][:, None, None, :])
                    out = torch.cat((xy, wh, ys[..., 4:]), -1)
                    # flatten in our (ny, nx, na) order for comparison
                    out = out.permute(0, 2, 3, 1, 4)
                    outs.append(out.reshape(b, -1, spec.no))
                return torch.cat(outs, 1)
            bins = torch.arange(REG_MAX).float()
            for i, f in enumerate(feats):
                d = head.cv2[i](f)  # (B, 64, ny, nx)
                c = head.cv3[i](f)  # (B, nc, ny, nx)
                b, _, ny, nx = d.shape
                dist = d.view(b, 4, REG_MAX, ny, nx).softmax(2)
                dist = (dist * bins[None, None, :, None, None]).sum(2)
                gy, gx = torch.meshgrid(
                    torch.arange(ny), torch.arange(nx), indexing="ij")
                ax = torch.stack((gx, gy), 0).float() + 0.5
                lt, rb = dist[:, :2], dist[:, 2:]
                stride = float(spec.strides[i])
                xy = (ax[None] + (rb - lt) / 2.0) * stride
                wh = (lt + rb) * stride
                score = torch.sigmoid(c)
                obj = torch.ones_like(score[:, :1])
                out = torch.cat((xy, wh, obj, score), 1)
                out = out.permute(0, 2, 3, 1)
                outs.append(out.reshape(b, -1, 5 + spec.nc))
            return torch.cat(outs, 1)

    return TModel(spec)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["yolov5n", "yolov8n", "yolov5s",
                                  "yolov8s"])
def test_forward_parity(name):
    torch = pytest.importorskip("torch")
    spec = zoo.get_spec(name, nc=80)
    torch.manual_seed(0)
    tmodel = _build_torch(spec)
    tmodel.float().eval()
    gen = torch.Generator().manual_seed(1)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                0.1 * torch.randn(m.num_features, generator=gen))
            m.running_var.copy_(
                1.0 + 0.1 * torch.rand(m.num_features, generator=gen))

    variables = convert.convert_state_dict(tmodel.state_dict(), spec)
    model = yolo.YoloV7(spec)

    rng = np.random.default_rng(0)
    img = rng.random((1, 128, 128, 3), np.float32)
    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).numpy()
    got, _ = model.apply(variables, jnp.asarray(img), training=False)
    got = np.asarray(got)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    # xy/wh are in pixels (<= 128 here), scores in [0, 1]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)


@pytest.mark.slow  # v8 pipeline compile; v8 forward parity + param counts stay fast
def test_v8_tracking_pipeline_smoke():
    """A v8 detector drops into the same compiled tracking pipeline."""
    from yolov7_tracker_tpu.pipeline import PipelineConfig, TrackingPipeline
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    pcfg = PipelineConfig(model="yolov8n", nc=4, img_size=160,
                          detector_batch=2, conf_thres=0.001)
    tcfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.3,
                         capacity=32, det_capacity=16)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pipe = TrackingPipeline(pcfg, tcfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 180, 320, 3), np.uint8)
    boxes, score, cls, counts = pipe.detect_batch(frames)
    assert boxes.shape[-1] == 4 and score.shape == cls.shape
    slab, outs = pipe.process_batch(pipe.init_tracker(), frames)
    assert outs.valid.shape == (2, 32)
