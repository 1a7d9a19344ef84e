"""Fused crop+unsharp+box-downscale kernel vs the jnp reference path."""

import numpy as np

import jax.numpy as jnp

from vsc_tpu.ops.filters import unsharp_mask
from vsc_tpu.ops.finish_pallas import sharpen_downscale
from vsc_tpu.ops.resize import resize


def _jnp_reference(plane, ratio, strength, off_r, off_c, out_h, out_w):
    crop = plane[:, off_r:off_r + out_h * ratio, off_c:off_c + out_w * ratio]
    sharp = unsharp_mask(crop[..., None], strength, channel_last=True)[..., 0]
    return np.asarray(resize(sharp, out_h, out_w, "area"))


def test_fused_finish_matches_jnp():
    rng = np.random.default_rng(0)
    B, H, W = 2, 230, 800
    ratio, out_h, out_w = 3, 64, 256
    off_r, off_c = 17, 23
    plane = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.float32))

    ref = _jnp_reference(plane, ratio, strength=4.0, off_r=off_r, off_c=off_c,
                         out_h=out_h, out_w=out_w)
    got = np.asarray(sharpen_downscale(plane, ratio, 4.0, off_r, off_c,
                                       out_h, out_w))
    diff = np.abs(got - ref)
    # interior exact; image borders may touch reflect halo values that the
    # jnp path (operating on the pre-cropped array) reflects differently
    assert diff[:, 2:-2, 2:-2].max() < 1e-2, diff[:, 2:-2, 2:-2].max()


def test_fused_finish_ratio2():
    rng = np.random.default_rng(1)
    plane = jnp.asarray((rng.random((1, 140, 600)) * 255).astype(np.float32))
    ref = _jnp_reference(plane, 2, 8.0, 4, 8, 48, 256)
    got = np.asarray(sharpen_downscale(plane, 2, 8.0, 4, 8, 48, 256))
    assert np.abs(got - ref)[:, 2:-2, 2:-2].max() < 1e-2
