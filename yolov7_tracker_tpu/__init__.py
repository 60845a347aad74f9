"""TPU-native multi-object-tracking framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
JackWoo0831/Yolov7-tracker (reference at /root/reference): a YOLOv7
detector family plus eight pluggable trackers (SORT, ByteTrack, DeepSORT,
BoT-SORT, UAVMOT, DeepMOT, StrongSORT, C-BIoU), MOT-challenge evaluation
(HOTA/CLEAR/Identity) and a full training stack — designed TPU-first:

- the per-frame tracker state lives in a fixed-size padded "track slab"
  pytree and every tracker update is a pure jitted function, so whole
  sequences run under ``lax.scan`` with zero per-frame host sync
  (the reference pays a GPU->CPU copy per frame, tracker/track.py:144+);
- pairwise IoU / cosine-cost / Kalman / Hungarian-with-cost-limit all run
  on device as batched XLA ops (replacing cython_bbox, lap.lapjv and
  scipy LAPACK in the reference hot loop, tracker/matching.py:9,34);
- the detector is a compiled Flax graph built from the same yaml topology
  DSL as the reference (models/yolo.py:443+), with class-offset NMS as a
  fixed-shape XLA op;
- scaling is a jax.sharding Mesh: data-parallel pjit for training,
  sequence-parallel sharding for tracking throughput.
"""

__version__ = "0.1.0"


def load_pipeline(model: str = "yolov7-tiny", tracker: str = "bytetrack",
                  img_size: int = 640, nc: int = 80, weights: str = "",
                  **tracker_kw):
    """hubconf-style one-call loader (reference hubconf.py analogue):
    returns a ready TrackingPipeline."""
    from .pipeline import PipelineConfig, TrackingPipeline
    from .trackers.slab import TrackerConfig

    variables = None
    if weights:
        if weights.endswith(".pt"):
            from .models import convert, zoo

            sd = convert.state_dict_from_reference_ckpt(weights, ".")
            variables = convert.convert_state_dict(
                sd, zoo.get_spec(model, nc=nc)
            )
        else:
            from .utils import checkpoint

            variables = checkpoint.load_variables(weights)
    return TrackingPipeline(
        PipelineConfig(model=model, nc=nc, img_size=img_size),
        TrackerConfig(tracker=tracker, **tracker_kw),
        variables=variables,
    )
