"""TPU compute ops: resizes, filters, forward warp, inpaint, SBS pipeline."""

from vsc_tpu.ops.stereo import StereoParams, generate_sbs, sbs_shapes

__all__ = ["StereoParams", "generate_sbs", "sbs_shapes"]
