"""Pallas warp kernel vs the jnp reference implementation.

The kernel emits floor(clip(., 0, 255)) u8 colors (exact: flooring commutes
with the winner-take selection, and the postprocess stage's first op is the
same floor/clip in both paths — ops/stereo._postprocess_eye), so the jnp
reference colors are floored before comparison; masks must match exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vsc_tpu.ops.warp import forward_warp_stereo
from vsc_tpu.ops.warp_pallas import forward_warp_stereo_pallas


def _floor_ref(ref):
    l, lm, r, rm = ref
    q = lambda x: jnp.floor(jnp.clip(x, 0.0, 255.0))
    return q(l), lm, q(r), rm


def _inputs(b=2, h=24, w=96, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((b, h, w, 3)).astype(np.float32) * 255.0
    depth = rng.random((b, h, w)).astype(np.float32)
    # smooth the depth a little so disparity gradients are realistic
    depth = (depth + np.roll(depth, 1, 1) + np.roll(depth, 1, 2)) / 3.0
    return img, depth


@pytest.mark.parametrize("max_disp", [4.0, 9.7])
def test_pallas_matches_jnp(max_disp):
    img, depth = _inputs()
    ref = _floor_ref(forward_warp_stereo(img, depth, max_disp))
    got = forward_warp_stereo_pallas(img, depth, max_disp)
    for name, r, g in zip(("L", "Lm", "R", "Rm"), ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5,
                                   err_msg=f"mismatch in {name}")


def test_pallas_ragged_rows():
    # rows not a multiple of the block size exercise the grid remainder
    img, depth = _inputs(b=1, h=13, w=64, seed=3)
    ref = _floor_ref(forward_warp_stereo(img, depth, 5.0))
    got = forward_warp_stereo_pallas(img, depth, 5.0, block_rows=8)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)


def test_planar_variant_matches_channel_last():
    from vsc_tpu.ops.warp_pallas import forward_warp_stereo_pallas_planar
    rng = np.random.default_rng(4)
    rgb = rng.uniform(0, 255, (2, 24, 80, 3)).astype(np.float32)
    depth = rng.uniform(0, 1, (2, 24, 80)).astype(np.float32)
    a = forward_warp_stereo_pallas(jnp.asarray(rgb), jnp.asarray(depth), 7.0)
    b = forward_warp_stereo_pallas_planar(
        jnp.asarray(np.moveaxis(rgb, -1, 1)), jnp.asarray(depth), 7.0)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_packed_carry_matches_legacy(monkeypatch):
    """VSC_TPU_WARP_PACKED selects the 3-plane (key, frac, packed-color)
    scan carry; outputs must be bit-identical to the legacy 5-plane form
    (colors are u8-exact either way, the weight threshold reconstructs
    from the key class band)."""
    from vsc_tpu.ops.warp_pallas import forward_warp_stereo_pallas_planar_u8

    rng = np.random.default_rng(5)
    rgb_cf = jnp.asarray(rng.integers(0, 256, (2, 3, 24, 96), np.uint8))
    depth = jnp.asarray(rng.uniform(0, 1, (2, 24, 96)).astype(np.float32))

    import jax

    monkeypatch.setenv("VSC_TPU_WARP_PACKED", "0")  # packed is the default
    legacy = forward_warp_stereo_pallas_planar_u8(rgb_cf, depth, 6.0)
    monkeypatch.setenv("VSC_TPU_WARP_PACKED", "1")
    jax.clear_caches()
    packed = forward_warp_stereo_pallas_planar_u8(rgb_cf, depth, 6.0)
    for x, y in zip(legacy, packed):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
