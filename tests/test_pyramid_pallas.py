"""Single-kernel below-quarter pyramid == the jnp level chain
(interpret mode; the same kernel code runs compiled on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vsc_tpu.ops.pyramid_pallas import pyramid_fill_below


def _jnp_chain(img, msk):
    """The exact ladder pyramid_fill_below replaces (the tail of
    ops/inpaint._pyramid_fill_planar_coarse)."""
    from vsc_tpu.ops.inpaint import _avgpool2_hw, _upsample_nearest_hw
    levels = []
    size = max(img.shape[-2], img.shape[-1])
    while size > 1:
        levels.append((img, msk))
        img, msk = _avgpool2_hw(img), _avgpool2_hw(msk)
        size = (size + 1) // 2
    filled = img / jnp.maximum(msk, 1e-8)
    for img_l, msk_l in reversed(levels):
        up = _upsample_nearest_hw(filled, img_l.shape[-2], img_l.shape[-1], 2)
        local = img_l / jnp.maximum(msk_l, 1e-8)
        filled = jnp.where(msk_l > 1e-8, local, up)
    return filled


@pytest.mark.parametrize("h,w", [
    (48, 96),     # even/even
    (37, 155),    # odd dims exercise the edge-pad at every level
])
def test_matches_jnp_chain(h, w):
    rng = np.random.default_rng(0)
    msk = (rng.random((2, h, w)) > 0.35).astype(np.float32)
    # a fully-hole region deeper than a few levels (exercises the upsweep)
    msk[:, h // 4:h // 2, w // 4:w // 2] = 0.0
    img = (rng.random((3, 2, h, w)) * 255).astype(np.float32) * msk
    got = np.asarray(pyramid_fill_below(
        jnp.asarray(np.concatenate([img, msk[None]], axis=0))))
    want = np.asarray(_jnp_chain(jnp.asarray(img), jnp.asarray(msk)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fractional_mask_from_prepass():
    # prepass pools make msk fractional in (0, 1]; predicate must match
    rng = np.random.default_rng(1)
    msk = rng.choice([0.0, 0.25, 0.5, 1.0],
                     (1, 33, 65), p=[0.3, 0.1, 0.1, 0.5]).astype(np.float32)
    img = (rng.random((3, 1, 33, 65)) * 255).astype(np.float32) * msk
    got = np.asarray(pyramid_fill_below(
        jnp.asarray(np.concatenate([img, msk[None]], axis=0))))
    want = np.asarray(_jnp_chain(jnp.asarray(img), jnp.asarray(msk)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
