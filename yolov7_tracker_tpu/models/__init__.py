"""Detector layer: YOLOv7 family in Flax, built from topology specs.

Replaces the reference's models/ package (models/yolo.py Model + the
cfg/*.yaml DSL) with a functional spec -> compiled-XLA-graph pipeline.
"""

from .spec import ModelSpec, parse_yaml_cfg  # noqa: F401
from .yolo import YoloV7, build_model  # noqa: F401
