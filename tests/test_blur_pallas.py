"""Equivalence of the fused Pallas gaussian blur (interpret mode on CPU)
against the jnp shift-accumulate path — bit-exact same tap order."""
import numpy as np
import pytest

from vsc_tpu.ops.blur_pallas import gaussian_blur_pallas
from vsc_tpu.ops.filters import gaussian_blur


@pytest.mark.parametrize("ksize,sigma", [(5, 1.0), (31, 5.0)])
@pytest.mark.parametrize("shape", [(2, 40, 150), (1, 3, 33, 140)])
def test_blur_pallas_matches_jnp(ksize, sigma, shape, monkeypatch):
    monkeypatch.setenv("VSC_TPU_BLUR", "jnp")
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, shape).astype(np.float32)
    ref = np.asarray(gaussian_blur(x, ksize, sigma))
    out = np.asarray(gaussian_blur_pallas(x, ksize, sigma))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=0)


def test_blur_dispatch_env_forced_pallas(monkeypatch):
    # channel-last plane folding through the public entry point
    monkeypatch.setenv("VSC_TPU_BLUR", "pallas")
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (1, 30, 140, 3)).astype(np.float32)
    out = np.asarray(gaussian_blur(x, 5, 1.0, channel_last=True))
    monkeypatch.setenv("VSC_TPU_BLUR", "jnp")
    ref = np.asarray(gaussian_blur(x, 5, 1.0, channel_last=True))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=0)
