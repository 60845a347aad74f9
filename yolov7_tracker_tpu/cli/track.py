"""Dataset tracking CLI — the reference's tracker/track.py surface.

Usage:
    python -m yolov7_tracker_tpu.cli.track --dataset mot17 \
        --tracker bytetrack --model_path ckpt.msgpack [...]

Pipeline per sequence: frames -> device letterbox -> compiled YOLOv7 ->
fixed-shape NMS -> tracker slab scan -> MOT txt (+ optional TrackEval
scoring). Also accepts the reference's dataset config yamls
(tracker/config_files/*.yaml) directly.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import yaml


def parse_args(argv=None):
    p = argparse.ArgumentParser("tpu tracker")
    p.add_argument("--dataset", type=str, default="visdrone")
    p.add_argument("--data_format", type=str, default="origin",
                   choices=["origin", "yolo"])
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--split_txt", type=str, default="",
                   help="image-list txt for --data_format yolo")
    p.add_argument("--tracker", type=str, default="sort")
    p.add_argument("--model", type=str, default="yolov7-w6",
                   help="zoo model name or reference cfg yaml path")
    p.add_argument("--model_path", type=str, default="",
                   help="converted checkpoint (.msgpack/.npz) or torch "
                        "state_dict (.pt)")
    p.add_argument("--nc", type=int, default=80)
    p.add_argument("--img_size", type=int, default=1280)
    p.add_argument("--reid_model_path", type=str, default="")
    p.add_argument("--reid_capacity", type=int, default=0,
                   help="embed only the top-K score-ordered dets "
                        "per frame (0 = all det_capacity, the "
                        "reference semantics; 128 bounds the ReID "
                        "stage at the slab capacity)")
    p.add_argument("--dhn_path", type=str, default="",
                   help="DeepMOT: trained DHN msgpack "
                        "(train with -m yolov7_tracker_tpu.train.dhn_train)")
    p.add_argument("--conf_thresh", type=float, default=0.2)
    p.add_argument("--nms_thresh", type=float, default=0.7)
    p.add_argument("--iou_thresh", type=float, default=0.5)
    p.add_argument("--track_buffer", type=int, default=30)
    p.add_argument("--gamma", type=float, default=0.1)
    p.add_argument("--dhn_hidden", type=int, default=256)
    p.add_argument("--dhn_arch", type=str, default="gru",
                   choices=["gru", "sinkhorn"],
                   help="DHN architecture: 'gru' mirrors the reference "
                        "Munkrs; 'sinkhorn' is the parallel TPU head "
                        "(reid/dhn.py SinkhornDHN)")
    p.add_argument("--kalman_format", type=str, default="default")
    p.add_argument("--min_area", type=float, default=150)
    p.add_argument("--save_images", action="store_true")
    p.add_argument("--save_videos", action="store_true")
    p.add_argument("--track_eval", type=lambda s: s.lower() != "false",
                   default=True)
    p.add_argument("--detector_batch", type=int, default=8)
    p.add_argument("--gmc", type=str, default="",
                   help="camera-motion compensation: orb | ecc "
                        "(defaults: botsort=orb, strongsort=ecc)")
    p.add_argument("--detect_per_frame", type=int, default=1)
    p.add_argument("--quant", type=str, default="none",
                   choices=("none", "int8"),
                   help="int8: W8A8 static-PTQ detector serving "
                        "(models/quant.py; calibrates on the first "
                        "frames of the first sequence)")
    p.add_argument("--capacity", type=int, default=256)
    # >= the NMS max_det (300) so ByteTrack's low-score second stage never
    # silently loses detections in crowded scenes (the reference is uncapped)
    p.add_argument("--det_capacity", type=int, default=300)
    p.add_argument("--config_dir", type=str,
                   default=os.path.join(os.path.dirname(__file__), "..",
                                        "configs"))
    p.add_argument("--output_dir", type=str, default="./results")
    p.add_argument("--aflink", type=str, default="",
                   help="PostLinker weights (.msgpack): AFLink offline "
                        "fragment linking on the results (the reference "
                        "leaves this TODO, strongsort.py:34-36)")
    p.add_argument("--gsi", action="store_true",
                   help="Gaussian-smoothed interpolation post-processing "
                        "(StrongSORT++ GSI)")
    p.add_argument("--detections", type=str, default="",
                   help="directory of per-sequence MOT-format detection "
                        "txts (<seq>.txt: frame,id,x,y,w,h,score[,cls]); "
                        "tracks from these instead of running a detector "
                        "— the detector-agnostic seam behind the "
                        "reference's track_yolov5/track_yolov8 entries")
    return p.parse_args(argv)


def load_dataset_config(opts):
    """Load our configs/ yaml, or a reference-format config file."""
    for base in (opts.config_dir, "./config_files",
                 "./tracker/config_files"):
        path = os.path.join(base, f"{opts.dataset}.yaml")
        if os.path.isfile(path):
            with open(path) as f:
                return yaml.safe_load(f)
    raise FileNotFoundError(f"no dataset config for {opts.dataset!r}")


def main(argv=None):
    opts = parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    cfgs = load_dataset_config(opts)

    import jax

    from ..data import sequence as seqmod
    from ..data import writer
    from ..pipeline import PipelineConfig, TrackingPipeline
    from ..trackers.slab import TrackerConfig
    from ..utils.timer import Timer

    gmc = opts.gmc or {"botsort": "orb", "strongsort": "ecc"}.get(
        opts.tracker, "none"
    )
    # --reid_model_path activates on-device appearance embeddings: the
    # DeepSORT CNN for deepsort, OSNet otherwise (arch inferred from
    # the filename, default osnet_x0_25 — the checkpoint the reference
    # ships). Mirrors the reference's Extractor wiring
    # (deepsort.py:19-40, strongsort.py:47-72).
    from ..reid import resolve_reid

    reid, reid_variables = resolve_reid(opts.tracker,
                                        opts.reid_model_path)
    pcfg = PipelineConfig(
        model=opts.model, nc=opts.nc, img_size=opts.img_size,
        conf_thres=0.01, iou_thres=0.45, detector_batch=opts.detector_batch,
        gmc_method=gmc, detect_per_frame=opts.detect_per_frame,
        quant=opts.quant, reid=reid, reid_capacity=opts.reid_capacity,
    )
    tcfg = TrackerConfig(
        tracker=opts.tracker, kalman_format=opts.kalman_format,
        conf_thresh=opts.conf_thresh, iou_thresh=opts.iou_thresh,
        track_buffer=opts.track_buffer, capacity=opts.capacity,
        det_capacity=opts.det_capacity, gamma=opts.gamma,
        min_area=opts.min_area, dhn_weights=opts.dhn_path,
        dhn_hidden=opts.dhn_hidden, dhn_arch=opts.dhn_arch,
        # trackers whose registry entry doesn't set a feature dim
        # (bytetrack gamma-fusion, botsort with-reid) get 512 when a
        # reid model is supplied; deepsort/strongsort resolve their own
        feature_dim=512 if reid != "none" else 0,
    )
    # --model accepts a zoo name OR any reference-format cfg yaml — the
    # analogue of the reference's track_yolov5/track_yolov8 entries
    # (swap the detector, keep the tracking loop); any model the spec
    # DSL supports plugs into the same compiled pipeline.
    spec = None
    if opts.model.endswith((".yaml", ".yml")):
        from ..models.spec import load_yaml_file

        spec = load_yaml_file(opts.model, nc=opts.nc)
    variables = None
    if opts.model_path:
        from ..models import convert, zoo

        if spec is None:
            spec = zoo.get_spec(opts.model, nc=opts.nc)
        if opts.model_path.endswith(".pt"):
            sd = convert.state_dict_from_reference_ckpt(
                opts.model_path, "/root/reference"
            )
            variables = convert.convert_state_dict(sd, spec)
        else:
            from ..utils import checkpoint

            variables = checkpoint.load_variables(opts.model_path)
    data_root = cfgs.get("DATASET_ROOT", ".")
    ignore = [s for s in (cfgs.get("IGNORE_SEQS") or []) if s]
    certain = [s for s in (cfgs.get("CERTAIN_SEQS") or []) if s]
    seqs = seqmod.discover_sequences(
        data_root, opts.data_format, split=opts.split,
        seqs=certain or None, ignore_seqs=ignore,
        split_txt=opts.split_txt or None,
    )

    quant_calib = None
    if opts.quant == "int8" and seqs:
        # calibrate activation scales on real frames from the first
        # sequence (falls back to models/quant.py's synthetic batches
        # when no frames load)
        import jax.numpy as jnp

        frames = []
        for batch, _ in seqmod.iter_frames(seqs[0], 1):
            frames.append(batch[0])
            if len(frames) >= 4:
                break
        if frames:
            arr = jnp.asarray(np.stack(frames), jnp.float32) / 255.0
            arr = jax.image.resize(
                arr,
                (len(frames), opts.img_size, opts.img_size, 3),
                method="bilinear",
            )
            quant_calib = [arr]

    pipe = TrackingPipeline(pcfg, tcfg, variables=variables, spec=spec,
                            quant_calib=quant_calib,
                            reid_variables=reid_variables)
    folder = os.path.join(
        opts.output_dir, f"{opts.tracker}_{time.strftime('%Y%m%d_%H%M%S')}"
    )
    seq_fps = []
    for spec_seq in seqs:
        timer = Timer()
        timer.tic()
        if opts.detections:
            from ..data.detections import load_mot_detections

            det_path = os.path.join(opts.detections,
                                    f"{spec_seq.name}.txt")
            if not os.path.isfile(det_path):
                print(f"{spec_seq.name}: no detections at {det_path}, "
                      "skipping")
                continue
            results = pipe.run_sequence_detections(
                load_mot_detections(det_path), len(spec_seq)
            )
        else:
            results = pipe.run_sequence(
                frame
                for batch, _ in seqmod.iter_frames(spec_seq, 1)
                for frame in batch
            )
        dt = timer.toc(average=False)
        fps = len(spec_seq) / max(dt, 1e-9)
        seq_fps.append(fps)
        print(f"{spec_seq.name}: {len(spec_seq)} frames, {fps:.1f} fps")
        if opts.aflink or opts.gsi:
            rows = [
                [fid, tid, t[0], t[1], t[2], t[3]]
                for fid, ids, tlwhs, _ in results
                for tid, t in zip(ids, tlwhs)
            ]
            if rows:
                rows = np.asarray(rows, float)
                if opts.aflink:
                    from ..trackers.aflink_post import link_tracks
                    from ..utils import checkpoint as ckpt_mod

                    rows = link_tracks(
                        rows, ckpt_mod.load_variables(opts.aflink)
                    )
                if opts.gsi:
                    from ..trackers.aflink_post import gsi_interpolation

                    rows = gsi_interpolation(rows)
                by_frame = {}
                for r in rows:
                    by_frame.setdefault(int(r[0]), []).append(r)
                results = [
                    (fid,
                     [int(r[1]) for r in by_frame.get(fid, [])],
                     [r[2:6] for r in by_frame.get(fid, [])],
                     [c for c, _ in zip(clses, by_frame.get(fid, []))])
                    for fid, ids, tlwhs, clses in results
                ]
        writer.save_results(folder, spec_seq.name, results)
    if seq_fps:
        print(f"mean fps: {np.mean(seq_fps):.2f}")

    if opts.track_eval and "TRACK_EVAL" in cfgs and cfgs["TRACK_EVAL"]:
        te = cfgs["TRACK_EVAL"]
        seq_info = te.get("SEQ_INFO") or {}
        from ..eval import evaluator
        from ..eval.data import seq_length_from_seqinfo

        seq_lengths = {}
        for s, n in seq_info.items():
            if n is None:
                n = seq_length_from_seqinfo(
                    os.path.join(te["GT_FOLDER"], s)
                ) or 0
            seq_lengths[s] = int(n)
        benchmark = "VisDrone" if "visdrone" in opts.dataset.lower() else "MOT17"
        table = evaluator.evaluate_benchmark(
            te["GT_FOLDER"], folder, seq_lengths, benchmark=benchmark,
            gt_loc_format=te.get("GT_LOC_FORMAT",
                                 "{gt_folder}/{seq}/gt/gt.txt"),
            output_folder=folder,
        )
        classes = list(table.keys() - {"cls_comb_cls_av"})
        print(evaluator.render_table(table, classes))
    return folder


if __name__ == "__main__":
    main()
