"""The split bilateral + pool-prepass kernel (ops/bilateral_pallas.py,
interpret mode) vs its two jnp references:

- filtered planes vs the postprocess-entry bilateral semantics
  (round(bilateral_filter(img_u8, d, 30, s*25)) on reflect-101 borders,
  ops/stereo._postprocess_eye / reference stereo_core.py:387-412);
- the quarter pool stack vs the _pyramid_fill avgpool ladder it replaces.
"""

import numpy as np
import pytest


def _eye4(b=2, h=40, w=260, seed=0, hole_frac=0.06):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 90 * np.sin(xx / 11.0) * np.cos(yy / 7.0)
    img = np.stack([base, base * 0.6 + 30, 255 - base])
    img = np.clip(img + rng.normal(0, 12, (3, h, w)), 0, 255)
    valid = (rng.random((h, w)) > hole_frac)
    img = img * valid  # warp holes carry zero color
    eye = np.concatenate([img, valid[None]], 0).astype(np.uint8)
    out = np.broadcast_to(eye[:, None], (4, b, h, w)).copy()
    out[:, 1] = np.roll(out[:, 1], 7, axis=-1)  # frames differ
    return out


@pytest.mark.parametrize("smoothing", [1.0, 2.5])
def test_filtered_matches_jnp_bilateral(smoothing):
    import jax.numpy as jnp

    from vsc_tpu.ops.bilateral_pallas import (bilateral_pool_planar,
                                              bilateral_pool_supported)
    from vsc_tpu.ops.filters import bilateral_filter

    eye4 = _eye4()
    _, B, H, W = eye4.shape
    assert bilateral_pool_supported(H, W, smoothing)
    filt, _ = bilateral_pool_planar(jnp.asarray(eye4), smoothing)
    filt = np.asarray(filt)

    d = max(5, min(int(smoothing * 4), 15))
    img_cl = np.moveaxis(eye4[:3], 0, -1).astype(np.float32)  # [B, H, W, 3]
    ref = np.asarray(jnp.round(bilateral_filter(
        jnp.asarray(img_cl), d, 30.0, smoothing * 25.0)))
    ref = np.clip(ref, 0, 255).astype(np.uint8)

    # same weight laws; accumulation order differs (pairing) -> <=1 code
    diff = np.abs(filt[:3].astype(int) - np.moveaxis(ref, -1, 0).astype(int))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01, (diff > 0).mean()
    np.testing.assert_array_equal(filt[3], eye4[3])  # valid passthrough


def test_quarter_matches_pool_ladder():
    import jax.numpy as jnp

    from vsc_tpu.ops.bilateral_pallas import bilateral_pool_planar
    from vsc_tpu.ops.inpaint import _avgpool2_hw

    eye4 = _eye4(h=48, w=250)  # W/2 = 125 odd: exercises the edge-col pad
    _, quarter = bilateral_pool_planar(jnp.asarray(eye4), 1.0)

    msk = eye4[3].astype(np.float32)
    img = eye4[:3].astype(np.float32) * msk
    lvl = np.concatenate([img, msk[None]], 0)
    lvl = np.asarray(_avgpool2_hw(jnp.asarray(lvl)))
    if lvl.shape[-1] & 1:  # jnp ladder edge-pads odd dims before level 2
        lvl = np.concatenate([lvl, lvl[..., -1:]], axis=-1)
    ref = np.asarray(_avgpool2_hw(jnp.asarray(lvl)))

    np.testing.assert_array_equal(np.asarray(quarter), ref)


def test_pipeline_split_matches_fused(monkeypatch):
    """generate_sbs through the split path (VSC_TPU_PP_SPLIT=1 opt-in)
    vs the fused single-kernel default: bit-identical by design."""
    from vsc_tpu.ops import stereo
    from tests.test_stereo_planar_u8 import _PARAMS, _content

    rgb, depth = _content()
    monkeypatch.setenv("VSC_TPU_SBS", "planar")

    monkeypatch.setenv("VSC_TPU_PP_SPLIT", "1")
    split = np.asarray(stereo.generate_sbs(rgb, depth, _PARAMS))
    stereo._generate_sbs_impl.clear_cache()

    monkeypatch.setenv("VSC_TPU_PP_SPLIT", "0")
    fused = np.asarray(stereo.generate_sbs(rgb, depth, _PARAMS))
    stereo._generate_sbs_impl.clear_cache()

    np.testing.assert_array_equal(split, fused)
