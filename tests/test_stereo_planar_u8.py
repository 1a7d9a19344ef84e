"""The planar-u8 TPU eye pipeline (warp -> postprocess -> finish, all u8
planes) vs the jnp reference path, composed end-to-end through
generate_sbs (interpret-mode kernels, forced via VSC_TPU_SBS=planar).

The planar path's quantization points are exactly where the jnp path
truncates, so differences are bounded by the documented kernel deviations
(polish border handling <=1 code) plus floor flips on near-integer float
disagreements from the fused finish (~1e-3 absolute).
"""

import numpy as np
import pytest

from vsc_tpu.config import StereoParams


def _content(b=1, h=48, w=96, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.5 + 0.5 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    rgb = np.stack([base, 0.7 * base + 0.2, 1.0 - base], -1)
    rgb = np.clip(rgb * 255 + rng.normal(0, 6, (h, w, 3)), 0, 255)
    rgb = np.broadcast_to(rgb.astype(np.uint8), (b, h, w, 3)).copy()
    depth = np.clip(0.5 + 0.4 * np.sin(xx / 17.0)
                    + 0.2 * (xx > w // 2) + rng.normal(0, 0.02, (h, w)),
                    0, 1)
    depth = np.broadcast_to((depth * 255).astype(np.uint8), (b, h, w)).copy()
    return rgb, depth


_PARAMS = StereoParams(max_disparity=6.0, convergence=-2.0,
                       super_sampling=2.0, edge_softness=3.0,
                       artifact_smoothing=1.0, depth_gamma=0.2,
                       sharpen=10.0)


def test_planar_u8_pipeline_matches_jnp(monkeypatch):
    from vsc_tpu.ops import stereo

    rgb, depth = _content()

    monkeypatch.setenv("VSC_TPU_SBS", "planar")
    got = np.asarray(stereo.generate_sbs(rgb, depth, _PARAMS)).astype(int)

    monkeypatch.delenv("VSC_TPU_SBS", raising=False)
    monkeypatch.setenv("VSC_TPU_WARP", "jnp")
    monkeypatch.setenv("VSC_TPU_POSTPROCESS", "jnp")
    monkeypatch.setenv("VSC_TPU_FINISH", "jnp")
    stereo._generate_sbs_impl.clear_cache()
    ref = np.asarray(stereo.generate_sbs(rgb, depth, _PARAMS)).astype(int)
    stereo._generate_sbs_impl.clear_cache()

    assert got.shape == ref.shape
    diff = np.abs(got - ref)
    # floor-flip and border-polish deviations only: tiny and sparse
    # measured on this content: mean 0.0018, 0.11% nonzero, max 4
    assert float(diff.mean()) < 0.05, diff.mean()
    assert float((diff > 1).mean()) < 0.005, (diff > 1).mean()
    assert int(diff.max()) <= 16, diff.max()


def test_planar_pyramid_matches_channel_last():
    import jax.numpy as jnp

    from vsc_tpu.ops.inpaint import (_pyramid_fill,
                                     _pyramid_fill_planar_coarse)

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (2, 40, 72, 3)).astype(np.float32)
    valid = (rng.random((2, 40, 72)) > 0.2).astype(np.float32)
    img = img * valid[..., None]

    ref = _pyramid_fill(jnp.asarray(img), jnp.asarray(valid)[..., None],
                        coarse_factor=4, return_coarse=True)
    eye4 = np.concatenate([np.moveaxis(img, -1, 0),
                           valid[None]], axis=0).astype(np.uint8)
    got = _pyramid_fill_planar_coarse(jnp.asarray(eye4))

    np.testing.assert_allclose(np.asarray(got),
                               np.moveaxis(np.asarray(ref), -1, 0),
                               rtol=1e-5, atol=1e-4)


def test_small_frame_falls_back_gracefully(monkeypatch):
    """ADVICE r3: a tiny video (crop_w < 129 after supersampling) must take
    the compat path instead of tripping the planar finish kernel's
    geometry assert at trace time."""
    from vsc_tpu.ops import stereo

    rgb, depth = _content(h=24, w=48)  # crop_w = 96 at super_sampling=2
    monkeypatch.setenv("VSC_TPU_SBS", "planar")
    out = np.asarray(stereo.generate_sbs(rgb, depth, _PARAMS))
    assert out.shape == (1, 24, 96, 3)
    stereo._generate_sbs_impl.clear_cache()
