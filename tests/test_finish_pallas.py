"""Fused unsharp+box-downscale kernel vs the jnp reference path (the
convergence crop is applied by the caller in both paths)."""

import numpy as np

import jax.numpy as jnp

from vsc_tpu.ops.filters import unsharp_mask
from vsc_tpu.ops.finish_pallas import sharpen_downscale
from vsc_tpu.ops.resize import resize


def _jnp_reference(img, ratio, strength, out_h, out_w):
    sharp = unsharp_mask(img, strength, channel_last=True)
    return np.asarray(resize(sharp, out_h, out_w, "area", channel_last=True))


def test_fused_finish_matches_jnp():
    rng = np.random.default_rng(0)
    B, out_h, out_w, ratio = 2, 64, 256, 3
    # u8-valued floats: the entry contract (postprocess emits round/clip
    # values; the compat wrapper casts to u8 for the planar kernel)
    img = jnp.asarray(rng.integers(
        0, 256, (B, out_h * ratio, out_w * ratio, 3)).astype(np.float32))
    ref = _jnp_reference(img, ratio, 4.0, out_h, out_w)
    got = np.asarray(sharpen_downscale(img, ratio, 4.0, out_h, out_w))
    np.testing.assert_allclose(got, ref, atol=1e-2)


def test_fused_finish_ratio2_ragged_blocks():
    # out dims not multiples of the block size exercise grid padding
    rng = np.random.default_rng(1)
    out_h, out_w, ratio = 48, 300, 2
    img = jnp.asarray(rng.integers(
        0, 256, (1, out_h * ratio, out_w * ratio, 3)).astype(np.float32))
    ref = _jnp_reference(img, ratio, 8.0, out_h, out_w)
    got = np.asarray(sharpen_downscale(img, ratio, 8.0, out_h, out_w))
    np.testing.assert_allclose(got, ref, atol=1e-2)


def test_small_input_fallback():
    # ADVICE r2: inputs narrower than 129 cols / shorter than 5 rows must not
    # crash on the kernel's reflect pads — they take the jnp path.
    import numpy as np

    from vsc_tpu.ops.filters import unsharp_mask
    from vsc_tpu.ops.finish_pallas import sharpen_downscale
    from vsc_tpu.ops.resize import resize

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, 12, 24, 3)).astype(np.float32)
    out = np.asarray(sharpen_downscale(img, 3, 1.5, 4, 8))
    ref = np.asarray(resize(unsharp_mask(img, 1.5), 4, 8, "area",
                            channel_last=True))
    assert out.shape == (1, 4, 8, 3)
    np.testing.assert_allclose(out, ref, atol=1e-4)
