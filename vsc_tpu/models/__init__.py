"""Depth models: DepthPro-class multi-scale ViT, ViT backbone, stubs."""

from vsc_tpu.models.depthpro import DepthPro, DepthProConfig, preprocess_frames
from vsc_tpu.models.vit import ViT, ViTConfig

__all__ = ["DepthPro", "DepthProConfig", "ViT", "ViTConfig",
           "preprocess_frames"]
