"""End-to-end tracking pipeline: frames -> detections -> tracks.

The reference loop (tracker/track.py:138-179) round-trips host<->GPU every
frame: model forward, NMS on device, then ``det_results.cpu().numpy()``
into a pure-Python tracker. Here the whole per-frame path is compiled:

  uint8 frames (host) --> device_preprocess --> YOLOv7 --> fixed-shape NMS
      --> scale_coords --> DetSlab --> tracker slab step --> FrameOutput

Two execution modes:
  * ``step_frame``    — streaming, one jitted call per frame;
  * ``run_sequence``  — detector batched over B frames on the MXU, then
    ``lax.scan`` of the tracker over the detection slabs; only the final
    outputs cross back to the host. This is the throughput path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data import letterbox
from .models import yolo, zoo
from .ops import nms as nms_mod
from .trackers import slab as S
from .trackers.registry import build_tracker


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    model: str = "yolov7-tiny"
    nc: int = 80
    img_size: int = 640            # letterbox target (square budget)
    conf_thres: float = 0.01       # NMS conf (post_process_v7, track.py:238)
    iou_thres: float = 0.45
    max_det: int = 300
    nms_top_k: int = 2048          # candidate slab (reference max_nms 30000;
                                   # post-gate candidates rarely exceed 2k;
                                   # measured on v5e: 512/1024/2048 within
                                   # 1% — the suppression loop, which
                                   # early-exits on real scenes, dominates)
    detector_batch: int = 8
    dtype: str = "bfloat16"        # detector compute dtype
    fuse: bool = True              # fold BN into convs (reference fuse())
    gmc_method: str = "none"       # camera-motion comp: none | orb | ecc
    detect_per_frame: int = 1      # run the detector every k-th frame
                                   # (reference --detect_per_frame)
    quant: str = "none"            # "none" | "int8": W8A8 static-PTQ
                                   # serving (models/quant.py). Measured
                                   # win is ~11% — halved HBM weight/act
                                   # traffic, NOT a doubled MXU MAC rate
                                   # (tools/mxu_probe.py: this runtime
                                   # runs int8 convs at ~bf16 rate).
                                   # Heads stay in the compute dtype.
    wpack: bool = True             # width-packed execution of the
                                   # narrow-channel model front
                                   # (models/wpack.py) — exact, ~4x on
                                   # the w6 stem/ELAN-1 convs; no-op
                                   # for specs without a ReOrg front.
                                   # Auto-disabled for int8 and the
                                   # spatially-sharded mode.
    reid: str = "none"             # appearance embeddings for the
                                   # feature trackers: "deepsort_cnn"
                                   # (128h x 64w crops, deepsort.py:19-40)
                                   # or an OSNet name ("osnet_x0_25"...,
                                   # 128h x 256w quirk crops,
                                   # strongsort.py:56-58). Crops + CNN
                                   # run ON DEVICE inside the fused step
                                   # (reid/extractor.py) — no host crop
                                   # loop. Pass trained weights via the
                                   # TrackingPipeline reid_variables arg.
    reid_capacity: int = 0         # embed only the top-K NMS survivors
                                   # (score-ordered) per frame; 0 = all
                                   # det_capacity. Dets past K carry a
                                   # zero feature = cosine distance 1
                                   # ("no appearance evidence"), so they
                                   # still match by IoU / init tracks.
                                   # The reference embeds every det
                                   # (deepsort.py:109) but real scenes
                                   # hold a few dozen; a 128 cap bounds
                                   # the crop+CNN stage at the slab
                                   # capacity instead of det_capacity.


@jax.jit
def _pack_frame_output(outs: S.FrameOutput):
    """FrameOutput's 5 leaves -> one (..., T, 8) float32 array (a
    single D2H transfer). Track ids ride BIT-cast, not value-cast:
    float32 is exact only to 2^24, and a long-lived serving process
    (cli/serve.py persists next_id across relaunches) can pass that,
    after which value-cast ids silently collide."""
    return jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(
                outs.track_id.astype(jnp.int32), jnp.float32
            )[..., None],
            outs.tlwh,
            outs.score[..., None],
            outs.cls[..., None],
            outs.valid[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )


class TrackingPipeline:
    def __init__(self, pcfg: PipelineConfig, tcfg: S.TrackerConfig,
                 variables=None, spec=None, quant_calib=None,
                 reid_variables=None):
        self.pcfg = pcfg
        self.spec = spec or zoo.get_spec(pcfg.model, nc=pcfg.nc)
        if variables is None:
            _, variables = yolo.build_model(self.spec, img_size=256)
        if pcfg.fuse:
            from .models.fuse import fuse_variables

            variables = fuse_variables(variables)
        if pcfg.quant == "int8":
            if not pcfg.fuse:
                raise ValueError("quant='int8' requires fuse=True")
            from .models import quant as quant_mod

            # quant_calib: list of (B, H, W, 3) float[0,1] calibration
            # images; default synthetic (performance mode — see
            # models/quant.py docstring)
            variables = quant_mod.quantize_variables(
                self.spec, variables, calib_batches=quant_calib
            )
            self.model = yolo.YoloV7(self.spec, fused="int8")
            self._wpack_raw = False
        else:
            # raw-canvas serving: when the width-packed stem is engaged
            # it absorbs BGR->RGB + /255, so the preprocess emits the
            # raw-scale canvas (normalize=False in _detect_fn)
            wpack_on = pcfg.wpack and pcfg.fuse is True
            self._wpack_raw = wpack_on and yolo.wpack_stem_active(self.spec)
            self.model = yolo.YoloV7(
                self.spec, fused=pcfg.fuse, wpack=wpack_on,
                wpack_raw_stem=self._wpack_raw)
        # int8 variables stay as produced (int8 kernels + f32 scales:
        # the dequant multiply runs in f32 regardless, and bf16-rounding
        # the scales would only add error); otherwise cast to bf16
        if pcfg.quant != "int8" and pcfg.dtype == "bfloat16":
            # one jitted cast — eager per-leaf casts pay dispatch latency
            # per parameter on remote-attached devices
            cast = jax.jit(
                lambda p: jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x,
                    p,
                )
            )
            variables = {
                "params": cast(variables["params"]),
                "batch_stats": variables["batch_stats"],
            }
        self.variables = variables
        self.step, self.tcfg = build_tracker(tcfg)
        # appearance embeddings: device crops + ReID CNN fill
        # DetSlab.feature inside the fused step. The reference pays a
        # host crop loop + a separate torch batch per frame
        # (deepsort.py:19-40, strongsort.py:47-72).
        self._reid = None
        if pcfg.reid != "none":
            if self.tcfg.feature_dim <= 0:
                raise ValueError(
                    f"reid={pcfg.reid!r} but tracker "
                    f"{self.tcfg.tracker!r} resolves feature_dim=0 — "
                    "pass TrackerConfig(feature_dim=512) to enable "
                    "appearance fusion for this tracker")
            if pcfg.reid == "deepsort_cnn":
                from .reid.deepsort_cnn import DeepSortCNN

                reid_model = DeepSortCNN()
                reid_hw = (128, 64)      # deepsort_reid.py:123-146
            else:
                from .reid.osnet import build_osnet

                reid_model = build_osnet(pcfg.reid)
                reid_hw = (128, 256)     # strongsort.py:56-58 quirk
            if reid_variables is None:
                # untrained embeddings (tests / perf runs); real
                # deployments pass converted weights
                reid_variables = reid_model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1,) + reid_hw + (3,), jnp.float32),
                )
            self._reid = (reid_model, reid_variables, reid_hw)
        if tcfg.det_capacity < pcfg.max_det:
            import warnings

            warnings.warn(
                f"det_capacity={tcfg.det_capacity} < max_det={pcfg.max_det}:"
                " frames with more NMS survivors keep only the top-scoring"
                f" {tcfg.det_capacity}, dropping exactly the low-confidence"
                " detections ByteTrack's second stage uses. Raise"
                " det_capacity (CLI default is 300) for crowded scenes.",
                stacklevel=2,
            )
        self._detect_cache = {}
        self._gmc = None
        if pcfg.gmc_method != "none":
            from .trackers.gmc import GMC

            self._gmc = GMC(method=pcfg.gmc_method)
        self._predict_only = None

    # ------------------------------------------------------------------
    # detector
    # ------------------------------------------------------------------

    def _detect_fn(self, src_hw: Tuple[int, int], spatial_mesh=None):
        """Compiled detector closure for one source resolution.

        spatial_mesh: optional jax.sharding.Mesh — height-shard the
        forward over its first axis (parallel/spatial.py's low-latency
        mode, reachable from the detect CLI via --spatial_devices):
        every conv partitions spatially with GSPMD halo exchanges over
        ICI, per-level decodes gather explicitly (decode_hook), and the
        fixed-shape NMS runs replicated on the gathered predictions.
        """
        key = src_hw if spatial_mesh is None else (
            src_hw,
            tuple(str(d) for d in spatial_mesh.devices.flat),
            spatial_mesh.axis_names,
        )
        if key in self._detect_cache:
            return self._detect_cache[key]
        pcfg = self.pcfg
        # letterbox output size for this resolution (minimum rectangle,
        # exact reference pad arithmetic)
        r, (uw, uh), (dw, dh) = letterbox.letterbox_params(
            src_hw, (pcfg.img_size, pcfg.img_size), stride=max(self.spec.strides)
        )
        top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
        left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
        out_h, out_w = uh + top + bottom, uw + left + right

        compute_dtype = (
            jnp.bfloat16 if self.pcfg.dtype == "bfloat16" else jnp.float32
        )

        # anchor-based non-bin heads take the fused score-first NMS:
        # anchors are scored in the compute dtype, only the top-k decode
        # in f32, and XLA dead-code-eliminates the model's full decode
        # (saves the (B, N, 85) f32 materialization, ~0.5 ms/frame for
        # w6@1088)
        fused_nms = self.spec.head_kind in ("Detect", "IDetect",
                                            "IAuxDetect")

        model = self.model
        h_sharded = None
        if spatial_mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            axis = spatial_mesh.axis_names[0]
            rep = NamedSharding(spatial_mesh, P())
            h_sharded = NamedSharding(spatial_mesh, P(None, axis))

            def _hook(x, _h=h_sharded, _r=rep):
                if x.ndim >= 4:
                    return jax.lax.with_sharding_constraint(x, _h)
                return jax.lax.with_sharding_constraint(x, _r)

            # wpack off under spatial sharding: the packed region would
            # drag GSPMD through the block-kernel rearrangement for no
            # gain (the mode targets single-chip lane utilization)
            model = model.clone(decode_hook=_hook, wpack=False)
            # spatial mode consumes the model's DECODED predictions
            # (gathered replicated by the hook) so the NMS stays out of
            # the partitioned region; the raw-path fused NMS would drag
            # its reshapes/top_k through GSPMD instead
            fused_nms = False

        # the packed stem absorbs normalization (raw-scale BGR canvas);
        # spatial mode clones the model with wpack=False, so it keeps
        # the normalized preprocess
        normalize = not (self._wpack_raw and spatial_mesh is None)
        # ...and, when the letterbox pad is row-bands only, the stem
        # also absorbs the 114 band itself (conv padding + exact strip
        # corrections, blocks._WPackConv bands): the preprocess emits
        # the UNPADDED resize and the canvas pad write never happens
        # (0.78 ms/iter of data formatting at w6@1088 b32, r5 trace)
        stem_bands = None
        if (not normalize and left == 0 and right == 0
                and (top or bottom) and uh >= 8):
            stem_bands = (top, bottom)

        @jax.jit
        def detect(variables, frames_u8):
            imgs, _ = letterbox.device_preprocess(
                frames_u8, src_hw, (out_h, out_w), unpad_hw=(uh, uw),
                dtype=compute_dtype, normalize=normalize,
                pad_to_canvas=stem_bands is None,
            )
            if h_sharded is not None:
                imgs = jax.lax.with_sharding_constraint(imgs, h_sharded)
            pred, raw = model.apply(variables, imgs, training=False,
                                    stem_bands=stem_bands)
            if fused_nms:
                dets, counts = nms_mod.nms_from_raw(
                    raw, jnp.asarray(self.spec.anchors_per_level()),
                    tuple(self.spec.strides), pcfg.conf_thres,
                    pcfg.iou_thres, max_det=pcfg.max_det,
                    top_k=pcfg.nms_top_k,
                )
            else:
                pred = pred.astype(jnp.float32)
                dets, counts = nms_mod.nms(
                    pred, pcfg.conf_thres, pcfg.iou_thres,
                    max_det=pcfg.max_det, top_k=pcfg.nms_top_k,
                )
            boxes = letterbox.scale_coords_device(
                dets[..., :4], (out_h, out_w), src_hw
            )
            return boxes, dets[..., 4], dets[..., 5], counts

        self._detect_cache[key] = detect
        return detect

    def detect_batch(self, frames_u8: np.ndarray):
        """(B, H, W, 3) uint8 -> (boxes (B,D,4) tlbr, score, cls, counts)."""
        src_hw = frames_u8.shape[1:3]
        return self._detect_fn(tuple(src_hw))(self.variables, frames_u8)

    def detect_batch_spatial(self, frames_u8: np.ndarray, mesh):
        """detect_batch with the forward height-sharded over `mesh`
        (jax.sharding.Mesh, first axis): the low-latency serving mode
        when chips outnumber streams — one frame's rows split across
        the devices and every conv partitions spatially. Same contract
        and (validated) same outputs as detect_batch."""
        src_hw = frames_u8.shape[1:3]
        return self._detect_fn(tuple(src_hw), spatial_mesh=mesh)(
            self.variables, frames_u8)

    # ------------------------------------------------------------------
    # tracking
    # ------------------------------------------------------------------

    def init_tracker(self) -> S.TrackSlab:
        return S.init_slab(self.tcfg)

    def save_tracker_state(self, slab: S.TrackSlab, path: str,
                           tag: str = "") -> None:
        """Checkpoint mid-sequence tracker state to ``path`` (npz). The
        reference cannot resume a stream — its tracker state is Python
        STrack objects plus a global id counter, reset per sequence
        (track.py:132, basetrack.py:22) — while the slab pytree
        round-trips bit-exactly (see trackers/slab.save_slab). When the
        pipeline runs GMC, its host-side previous-frame state is saved
        alongside the slab so the first post-resume warp matches an
        uninterrupted run. ``tag`` (e.g. the stream source) guards
        against resuming another stream's state."""
        aux = None
        if self._gmc is not None:
            aux = {"gmc_" + k: v for k, v in self._gmc.get_state().items()}
        S.save_slab(path, slab, self.tcfg, tag=tag, aux=aux)

    def load_tracker_state(self, path: str,
                           expect_tag: str = "") -> S.TrackSlab:
        """Resume tracker state saved by :meth:`save_tracker_state`;
        raises ValueError on a config- or tag-incompatible checkpoint.
        Restores the pipeline's GMC previous-frame state when present."""
        slab, aux = S.load_slab(path, self.tcfg, expect_tag=expect_tag,
                                with_aux=True)
        if self._gmc is not None:
            self._gmc.set_state(
                {k[len("gmc_"):]: v for k, v in aux.items()
                 if k.startswith("gmc_")}
            )
        return slab

    def _embed_dets(self, frame_u8, tlbr):
        """(H, W, 3) uint8 frame + (D, 4) det boxes -> (D, F) ReID
        features via on-device crops (reid/extractor.py). Traced inside
        the fused step jits. With reid_capacity K in (0, D), only the
        top-K score-ordered dets are embedded (NMS emits survivors in
        greedy score order, ops/nms.py); the rest get zero features."""
        from .reid import extractor

        reid_model, reid_vars, reid_hw = self._reid
        d = tlbr.shape[0]
        k = self.pcfg.reid_capacity
        sub = tlbr[:k] if 0 < k < d else tlbr
        crops = extractor.extract_crops(frame_u8, sub, reid_hw)
        feats = reid_model.apply(reid_vars, crops).astype(jnp.float32)
        if feats.shape[0] < d:
            feats = jnp.concatenate([
                feats,
                jnp.zeros((d - feats.shape[0], feats.shape[1]),
                          jnp.float32),
            ])
        return feats

    def dets_to_slab(self, boxes, score, cls, count):
        d = self.tcfg.det_capacity
        idx = jnp.arange(d)
        valid = idx < count
        return S.DetSlab(
            tlbr=boxes[:d].astype(jnp.float32),
            score=score[:d].astype(jnp.float32),
            cls=cls[:d].astype(jnp.float32),
            valid=valid,
            feature=jnp.zeros((d, self.tcfg.feature_dim), jnp.float32),
        )

    @functools.cached_property
    def _scan_fn(self):
        def body(slab, det):
            slab, out = self.step(slab, det)
            return slab, out

        @jax.jit
        def scan(slab, det_slabs):
            return jax.lax.scan(body, slab, det_slabs)

        return scan

    def track_scan(self, slab: S.TrackSlab, det_slabs: S.DetSlab):
        """Run the tracker over a stacked (T-frames) DetSlab pytree."""
        return self._scan_fn(slab, det_slabs)

    @functools.cached_property
    def _scan_multi_fn(self):
        """Sequence-parallel tracking: vmap the step over independent
        sequences, scan over frames. Tracker state never crosses
        sequences (the reference's per-seq loop, track.py:123, is
        embarrassingly parallel), so S sequences amortize the
        association solver's lockstep iteration cost."""
        vstep = jax.vmap(self.step)

        def body(slabs, dets):
            slabs, outs = vstep(slabs, dets)
            return slabs, outs

        @jax.jit
        def scan(slabs, det_streams):
            return jax.lax.scan(body, slabs, det_streams)

        return scan

    def track_scan_multi(self, slabs: S.TrackSlab, det_streams: S.DetSlab):
        """slabs: (S, ...) stacked slab; det_streams: (T, S, D, ...)."""
        return self._scan_multi_fn(slabs, det_streams)

    # ------------------------------------------------------------------
    # fused batch step: detect + slab-ify + tracker scan in ONE call
    # ------------------------------------------------------------------

    def _process_batch_fn(self, src_hw: Tuple[int, int]):
        """One jitted (variables, slab, frames_u8 (B,H,W,3), warps (B,3,3))
        -> (slab, per-frame outputs) call: detector batch on the MXU, then
        lax.scan of the tracker over the batch's detections. The detector
        output feeds the tracker on device — nothing crosses the host
        between stages (vs the reference's per-frame det_results.cpu(),
        track.py:138-179)."""
        key = ("proc", src_hw)
        if key in self._detect_cache:
            return self._detect_cache[key]
        detect = self._detect_fn(src_hw)
        d = self.tcfg.det_capacity

        def body(slab, det):
            slab, out = self.step(slab, det)
            return slab, out

        @jax.jit
        def process(variables, slab, frames_u8, warps):
            boxes, score, cls, counts = detect(variables, frames_u8)
            det_slabs = jax.vmap(self.dets_to_slab)(
                boxes[:, :d], score[:, :d], cls[:, :d], counts
            )
            det_slabs = det_slabs._replace(warp=warps)
            if self._reid is not None:
                # lax.map, not vmap: one frame's crop batch at a time
                # keeps the (D, 128, 256, 3) activations from
                # multiplying by the detector batch
                feats = jax.lax.map(
                    lambda fb: self._embed_dets(fb[0], fb[1]),
                    (frames_u8, boxes[:, :d]),
                )
                det_slabs = det_slabs._replace(feature=feats)
            return jax.lax.scan(body, slab, det_slabs)

        self._detect_cache[key] = process
        return process

    def process_batch(self, slab: S.TrackSlab, frames_u8, warps=None):
        """Detect + track a batch of frames in a single device call."""
        src_hw = tuple(np.asarray(frames_u8).shape[1:3])
        if warps is None:
            warps = jnp.tile(
                S.IDENTITY_WARP, (np.asarray(frames_u8).shape[0], 1, 1)
            )
        return self._process_batch_fn(src_hw)(
            self.variables, slab, frames_u8, warps
        )

    # ------------------------------------------------------------------
    # fused multi-stream step (throughput serving: S independent
    # sequences advance one frame each per call)
    # ------------------------------------------------------------------

    def _process_multistream_fn(self, src_hw: Tuple[int, int]):
        """(variables, slabs (stacked over streams), frames (S,H,W,3),
        warps (S,2,3)) -> (slabs, outputs): ONE detector batch over the
        S streams' current frames, then a vmapped tracker step — the
        production many-camera configuration. Unlike process_batch
        there is no sequential scan: the tracker advances every stream
        in parallel, so per-frame tracker cost amortizes ~S-fold
        (measured 0.45 ms/frame at S=16 vs 1.9 single-stream)."""
        key = ("mstream", src_hw)
        if key in self._detect_cache:
            return self._detect_cache[key]
        detect = self._detect_fn(src_hw)
        d = self.tcfg.det_capacity
        vstep = jax.vmap(self.step)

        @jax.jit
        def process(variables, slabs, frames_u8, warps):
            boxes, score, cls, counts = detect(variables, frames_u8)
            det_slabs = jax.vmap(self.dets_to_slab)(
                boxes[:, :d], score[:, :d], cls[:, :d], counts
            )
            det_slabs = det_slabs._replace(warp=warps)
            if self._reid is not None:
                feats = jax.lax.map(
                    lambda fb: self._embed_dets(fb[0], fb[1]),
                    (frames_u8, boxes[:, :d]),
                )
                det_slabs = det_slabs._replace(feature=feats)
            return vstep(slabs, det_slabs)

        self._detect_cache[key] = process
        return process

    def init_multistream(self, n_streams: int) -> S.TrackSlab:
        import jax.tree_util as jtu

        slab = S.init_slab(self.tcfg)
        return jtu.tree_map(
            lambda x: jnp.tile(
                x[None], (n_streams,) + (1,) * x.ndim), slab)

    def process_multistream(self, slabs: S.TrackSlab, frames_u8,
                            warps=None):
        """One frame for each of S independent streams in one call."""
        src_hw = tuple(np.asarray(frames_u8).shape[1:3])
        if warps is None:
            warps = jnp.tile(
                S.IDENTITY_WARP, (np.asarray(frames_u8).shape[0], 1, 1)
            )
        return self._process_multistream_fn(src_hw)(
            self.variables, slabs, frames_u8, warps
        )

    # ------------------------------------------------------------------
    # fused single-frame step (lowest latency streaming)
    # ------------------------------------------------------------------

    def _step_frame_fn(self, src_hw: Tuple[int, int]):
        key = ("step", src_hw)
        if key in self._detect_cache:
            return self._detect_cache[key]
        detect = self._detect_fn(src_hw)
        d = self.tcfg.det_capacity

        @jax.jit
        def step(variables, slab, frame_u8, warp):
            boxes, score, cls, counts = detect(variables, frame_u8[None])
            det = self.dets_to_slab(
                boxes[0, :d], score[0, :d], cls[0, :d], counts[0]
            )._replace(warp=warp)
            if self._reid is not None:
                det = det._replace(
                    feature=self._embed_dets(frame_u8, boxes[0, :d]))
            slab, out = self.step(slab, det)
            return slab, out

        self._detect_cache[key] = step
        return step

    def step_frame(self, slab: S.TrackSlab, frame: np.ndarray, warp=None):
        """Detect + associate one frame in a single compiled call — the
        latency-oriented streaming mode (one device round trip/frame)."""
        if warp is None:
            warp = S.IDENTITY_WARP
        return self._step_frame_fn(tuple(frame.shape[:2]))(
            self.variables, slab, frame, jnp.asarray(warp, jnp.float32)
        )

    # ------------------------------------------------------------------
    # output packing: one D2H transfer instead of one per pytree leaf
    # ------------------------------------------------------------------

    def pack_output(self, outs: S.FrameOutput):
        """FrameOutput pytree -> one (..., T, 8) device array. Each D2H
        transfer pays a full round trip on remote-attached runtimes;
        packing turns FrameOutput's 5 leaves into a single fetch."""
        return _pack_frame_output(outs)

    @staticmethod
    def unpack_output(arr: np.ndarray) -> S.FrameOutput:
        """Host-side inverse of pack_output (numpy leaves)."""
        arr = np.asarray(arr)
        return S.FrameOutput(
            track_id=np.ascontiguousarray(
                arr[..., 0], dtype=np.float32).view(np.int32),
            tlwh=arr[..., 1:5],
            score=arr[..., 5],
            cls=arr[..., 6],
            valid=arr[..., 7] > 0.5,
        )

    # ------------------------------------------------------------------
    # external detections (pluggable-detector seam, data level)
    # ------------------------------------------------------------------

    def run_sequence_detections(self, dets_by_frame, n_frames: int,
                                chunk: int = 64):
        """Track a sequence from externally-supplied detections — the
        detector-agnostic analogue of the reference's track_yolov5/v8
        entries (any backend's output drops in; data/detections.py).

        dets_by_frame: {frame (1-based): (N, 6) [x1,y1,x2,y2,score,cls]}.
        Returns per-frame results [(frame_id, ids, tlwhs, clses)].
        """
        d = self.tcfg.det_capacity
        fd = self.tcfg.feature_dim
        slab = S.init_slab(self.tcfg)
        results = []

        def emit(out, frame_id):
            valid = np.asarray(out.valid)
            results.append(
                (
                    frame_id,
                    np.asarray(out.track_id)[valid].tolist(),
                    list(np.asarray(out.tlwh)[valid]),
                    np.asarray(out.cls)[valid].astype(int).tolist(),
                )
            )

        for start in range(1, n_frames + 1, chunk):
            t = min(chunk, n_frames + 1 - start)
            tlbr = np.zeros((t, d, 4), np.float32)
            score = np.zeros((t, d), np.float32)
            cls = np.zeros((t, d), np.float32)
            valid = np.zeros((t, d), bool)
            for j in range(t):
                rows = dets_by_frame.get(start + j)
                if rows is None or len(rows) == 0:
                    continue
                rows = np.asarray(rows, np.float32)
                if rows.shape[0] > d:
                    # keep top-scoring d (mirrors dets_to_slab capacity)
                    rows = rows[np.argsort(-rows[:, 4])[:d]]
                n = rows.shape[0]
                tlbr[j, :n] = rows[:, :4]
                score[j, :n] = rows[:, 4]
                cls[j, :n] = rows[:, 5]
                valid[j, :n] = True
            det_slabs = S.DetSlab(
                tlbr=jnp.asarray(tlbr),
                score=jnp.asarray(score),
                cls=jnp.asarray(cls),
                valid=jnp.asarray(valid),
                feature=jnp.zeros((t, d, fd), jnp.float32),
                warp=jnp.tile(S.IDENTITY_WARP, (t, 1, 1)),
            )
            slab, outs = self.track_scan(slab, det_slabs)
            outs = self.unpack_output(self.pack_output(outs))
            for j in range(t):
                emit(jax.tree.map(lambda x: x[j], outs), start + j)
        return results

    # ------------------------------------------------------------------
    # full sequence
    # ------------------------------------------------------------------

    def run_sequence(self, frames: Iterable[np.ndarray]):
        """Track a sequence of uint8 HWC frames; returns per-frame results
        [(frame_id, ids, tlwhs, clses)] in reference format.

        Detection runs in device batches; with gmc_method set, a per-frame
        camera warp rides in each DetSlab; with detect_per_frame=k > 1,
        skipped frames run the predict-only step
        (update_without_detection, basetrack.py:489)."""
        results, _ = self.run_sequence_stateful(frames)
        return results

    def run_sequence_stateful(self, frames: Iterable[np.ndarray],
                              initial_slab: Optional[S.TrackSlab] = None):
        """:meth:`run_sequence` with explicit tracker state: resumes from
        ``initial_slab`` (frame numbering continues from its frame
        counter) and returns ``(results, final_slab)`` so callers can
        checkpoint the state (save_tracker_state) and carry a stream
        across process restarts — a capability the reference lacks
        (state resets per sequence, track.py:132)."""
        slab = initial_slab if initial_slab is not None \
            else self.init_tracker()
        results = []
        frame_id = int(np.asarray(slab.frame))
        batch = []
        warps = []
        k_det = max(1, self.pcfg.detect_per_frame)

        def emit(out, frame_id):
            valid = np.asarray(out.valid)
            results.append(
                (
                    frame_id,
                    np.asarray(out.track_id)[valid].tolist(),
                    list(np.asarray(out.tlwh)[valid]),
                    np.asarray(out.cls)[valid].astype(int).tolist(),
                )
            )

        # one batch of packed outputs stays in flight: its D2H transfer
        # (started by copy_to_host_async) overlaps the NEXT batch's
        # device compute and host-side frame prep — the same software
        # pipeline the bench harness times, now on the CLI path
        pending = []  # [(packed device array, n frames)]

        def drain():
            nonlocal frame_id
            while pending:
                packed, nb = pending.pop(0)
                outs = self.unpack_output(np.asarray(packed))
                for b in range(nb):
                    frame_id += 1
                    emit(jax.tree.map(lambda x: x[b], outs), frame_id)

        def flush(batch, warps, slab):
            arr = np.stack(batch)
            wstack = jnp.asarray(np.stack(warps), jnp.float32)
            slab, outs = self.process_batch(slab, arr, wstack)
            packed = self.pack_output(outs)  # 5 leaves -> one transfer
            packed.copy_to_host_async()
            drain()  # previous batch: transfer already landed
            pending.append((packed, arr.shape[0]))
            return slab

        # detect/predict-only cadence is keyed on the GLOBAL frame
        # index (the slab's counter), not this call's local index: a
        # resumed stream must detect on the same frames an
        # uninterrupted run would have
        phase0 = frame_id
        for i, f in enumerate(frames):
            if k_det > 1 and (phase0 + i) % k_det != 0:
                # predict-only frame; flush pending detections first to
                # keep emit order by frame
                if batch:
                    slab = flush(batch, warps, slab)
                    batch, warps = [], []
                drain()
                if self._predict_only is None:
                    from .trackers.registry import build_predict_only

                    self._predict_only = build_predict_only(self.tcfg)
                slab, out = self._predict_only(slab)
                frame_id += 1
                emit(jax.tree.map(np.asarray, out), frame_id)
                continue
            batch.append(f)
            warps.append(
                self._gmc.apply(f) if self._gmc is not None else
                np.asarray(S.IDENTITY_WARP)
            )
            if len(batch) == self.pcfg.detector_batch:
                slab = flush(batch, warps, slab)
                batch, warps = [], []
        if batch:
            slab = flush(batch, warps, slab)
        drain()
        return results, slab
