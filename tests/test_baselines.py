"""RobMOTS baselines golden vs the vendored trackeval.baselines (STP,
thresholder, non_overlap) on a synthetic unified-format detections
file. The vendored code runs on the RLE-codec shim, as in
tests/test_readers.py."""

import os
import sys

import numpy as np
import pytest

from tests.test_readers import REF_TE, _install_pycoco_shim

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TE), reason="reference trackeval not available"
)


def synth_dets(path, seed=0):
    from yolov7_tracker_tpu.eval import rle as RL

    rng = np.random.default_rng(seed)
    H, W = 64, 96
    rows = []
    next_id = 1
    # two classes, moving rectangles, varied scores, some overlap
    for t in range(8):
        for ci, cls in enumerate((1, 3)):
            for k in range(3):
                if rng.uniform() < 0.2:
                    continue
                y0 = 4 + 6 * k + ((t + k) % 3)
                x0 = 6 + 28 * k + 2 * t + 10 * ci
                m = np.zeros((H, W), np.uint8)
                m[y0:y0 + 12, x0:x0 + 14] = 1
                rle = RL.encode(m)["counts"].decode()
                rows.append(f"{t} {next_id} {cls} "
                            f"{rng.uniform(0.2, 1.0):.4f} {H} {W} {rle}")
                next_id += 1
        # a pair of strongly-overlapping dets for non_overlap/NMS
        m = np.zeros((H, W), np.uint8)
        m[40:60, 40:70] = 1
        rows.append(f"{t} {next_id} 1 0.9 {H} {W} "
                    f"{RL.encode(m)['counts'].decode()}")
        next_id += 1
        m2 = np.zeros((H, W), np.uint8)
        m2[44:62, 48:74] = 1
        rows.append(f"{t} {next_id} 1 0.6 {H} {W} "
                    f"{RL.encode(m2)['counts'].decode()}")
        next_id += 1
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def _vendored_butils():
    _install_pycoco_shim()
    # the vendored baselines/__init__.py uses py2-style bare imports
    # ("import baseline_utils"); satisfy them via sys.path
    bdir = os.path.join(REF_TE, "trackeval", "baselines")
    if bdir not in sys.path:
        sys.path.insert(0, bdir)
    from yolov7_tracker_tpu.eval import rle as RL

    m = sys.modules["pycocotools.mask"]

    def to_bbox_multi(d):
        return RL.to_bbox(d)

    m.toBbox = to_bbox_multi
    m.encode = lambda arr: RL.encode(np.asarray(arr))
    import trackeval.baselines.baseline_utils as butils

    butils.mask_utils = m
    return butils


def test_stp_golden(tmp_path):
    butils = _vendored_butils()
    import trackeval.baselines.stp as ref_stp

    from yolov7_tracker_tpu.eval import baselines as B

    det_file = str(tmp_path / "in" / "seq01.txt")
    os.makedirs(os.path.dirname(det_file))
    synth_dets(det_file)

    ref_stp.config["INPUT_FOL"] = str(tmp_path / "in")
    ref_stp.config["OUTPUT_FOL"] = str(tmp_path / "out_ref")
    ref_stp.config["SPLIT"] = ""
    ref_stp.track_sequence(det_file)
    want = open(str(tmp_path / "out_ref" / "seq01.txt")).read()

    data = B.load_robmots_dets(det_file)
    rows = B.stp_track_sequence(data)
    got_file = str(tmp_path / "got.txt")
    B.write_rows(rows, got_file)
    got = open(got_file).read()

    def norm(txt):
        out = []
        for line in txt.strip().splitlines():
            p = line.split()
            out.append((int(p[0]), int(p[1]), int(p[2]),
                        round(float(p[3]), 6), int(p[4]), int(p[5]),
                        p[6]))
        return out

    assert norm(got) == norm(want)


def test_thresholder_golden(tmp_path):
    butils = _vendored_butils()

    from yolov7_tracker_tpu.eval import baselines as B

    det_file = str(tmp_path / "seq01.txt")
    synth_dets(det_file, seed=1)
    data_ref = butils.load_seq(det_file)
    want = []
    for cls, cls_data in data_ref.items():
        for t, td in enumerate(cls_data):
            td = butils.threshold(td, 0.5)
            for i in range(len(td["ids"])):
                want.append((t, int(td["ids"][i]), cls,
                             round(float(td["scores"][i]), 6),
                             td["mask_rles"][i]))
    data = B.load_robmots_dets(det_file)
    rows = B.thresholder_sequence(data, 0.5)
    got = [(r[0], r[1], r[2], round(float(r[3]), 6), r[6]) for r in rows]
    assert got == want


def test_non_overlap_golden(tmp_path):
    butils = _vendored_butils()

    from yolov7_tracker_tpu.eval import baselines as B
    from yolov7_tracker_tpu.eval import rle as RL

    det_file = str(tmp_path / "seq01.txt")
    synth_dets(det_file, seed=2)
    data = B.load_robmots_dets(det_file)

    # vendored: combine one timestep across classes, sort, non-overlap
    t = 0
    fields = {"ids": [], "scores": [], "im_hs": [], "im_ws": [],
              "mask_rles": []}
    for cls, cls_data in data.items():
        td = cls_data[t]
        for i in range(len(td["ids"])):
            for k in fields:
                fields[k].append(td[k][i])
    td = {k: np.asarray(v) for k, v in fields.items()}
    want = butils.non_overlap({k: v.copy() for k, v in td.items()})
    got = B.non_overlap({k: v.copy() for k, v in td.items()})
    assert list(got["ids"]) == list(want["ids"])
    for a, b in zip(got["mask_rles"], want["mask_rles"]):
        np.testing.assert_array_equal(
            RL.decode({"size": [64, 96], "counts": a.encode()}),
            RL.decode({"size": [64, 96], "counts": b.encode()}))

    # mask_NMS agrees too
    want_nms = butils.mask_NMS({k: v.copy() for k, v in td.items()})
    got_nms = B.mask_nms({k: v.copy() for k, v in td.items()})
    assert list(got_nms["ids"]) == list(want_nms["ids"])


def test_vizualize_golden(tmp_path):
    """Label PNGs golden vs the vendored vizualize/save_as_png chain:
    per-class and all-class palettized frames match pixel-for-pixel
    (indices AND palette colors)."""
    butils = _vendored_butils()
    from PIL import Image

    from yolov7_tracker_tpu.eval import baselines as B

    det_file = str(tmp_path / "in" / "seq01.txt")
    os.makedirs(os.path.dirname(det_file))
    synth_dets(det_file)

    # colormap itself matches the vendored literal table
    from trackeval.baselines.pascal_colormap import pascal_colormap as ref_cmap

    want_cmap = (np.array(ref_cmap).reshape(-1, 3) * 255).round().astype(
        np.uint8)
    np.testing.assert_array_equal(B.pascal_colormap(), want_cmap)

    # vendored per-class + all-class rendering (vizualize.do_sequence
    # body, driven directly to avoid its global config)
    data_ref = butils.load_seq(det_file)
    im_h, im_w = butils.get_frame_size(data_ref)
    ref_out = tmp_path / "ref"
    for cls, cls_data in data_ref.items():
        if cls >= 100:
            continue
        for t, td in enumerate(cls_data):
            butils.save_as_png(
                td, str(ref_out / str(cls) / (str(t).zfill(5) + ".png")),
                im_h, im_w)
    comb = butils.combine_classes(data_ref)
    for t, td in enumerate(comb):
        butils.save_as_png(
            td, str(ref_out / "all_classes" / (str(t).zfill(5) + ".png")),
            im_h, im_w)

    got_out = tmp_path / "got"
    B.visualize_sequence(det_file, str(got_out))

    ref_pngs = sorted(p.relative_to(ref_out)
                      for p in ref_out.rglob("*.png"))
    got_pngs = sorted(p.relative_to(got_out)
                      for p in got_out.rglob("*.png"))
    assert ref_pngs == got_pngs and len(ref_pngs) > 0
    for rel in ref_pngs:
        w_im = Image.open(ref_out / rel)
        g_im = Image.open(got_out / rel)
        np.testing.assert_array_equal(
            np.asarray(g_im), np.asarray(w_im), err_msg=str(rel))
        np.testing.assert_array_equal(
            np.asarray(g_im.convert("RGB")),
            np.asarray(w_im.convert("RGB")), err_msg=str(rel))
