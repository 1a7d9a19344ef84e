"""
Stub depth models
=================

Weight-free depth estimators with the exact input/output contract of the
DepthPro model, used for end-to-end pipeline tests and benches that must not
depend on a checkpoint (SURVEY.md section 4, item 3), and as a CPU-cheap
fallback when no checkpoint is configured.

Contract (same as models.depthpro.DepthPro + depth_map_generator semantics):
  in:  [B, S, S, 3] float in [-1, 1]
  out: [B, S, S] float "nearness" (larger = closer); only *relative* values
       matter — the save path min-max normalizes
       (/root/reference/depth_map_generator.py:217-230).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["luminance_depth", "gradient_depth"]


@jax.jit
def luminance_depth(images):
    """Brightness-as-nearness: smooth, deterministic, resolution-preserving.
    Good enough to exercise warping, hole-filling and the full file flow."""
    lum = (0.299 * images[..., 0] + 0.587 * images[..., 1]
           + 0.114 * images[..., 2])
    # light smoothing so the warp sees natural gradients, not pixel noise
    B, H, W = lum.shape
    k = jnp.ones((1, 5, 5, 1), jnp.float32) / 25.0
    x = lum[..., None]
    x = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "OHWI", "NHWC"))
    return (x[..., 0] + 1.0) * 0.5  # [-1,1] -> [0,1]


@jax.jit
def gradient_depth(images):
    """Synthetic top-far/bottom-near ramp — fully content-independent, used
    for deterministic golden tests of the downstream stereo stages."""
    B, H, W, _ = images.shape
    ramp = jnp.linspace(0.0, 1.0, H)[None, :, None]
    return jnp.broadcast_to(ramp, (B, H, W))
