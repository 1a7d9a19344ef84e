"""deconv2x2_pallas == ConvTranspose2d(k=2, s=2) conv lowering.

The Pallas kernel (interpret mode on CPU) must match the
conv_general_dilated form ConvT2x2 uses everywhere else
(vsc_tpu/models/depthpro.py), bias-free and biased.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsc_tpu.ops.deconv_pallas import deconv2x2_pallas, deconv2x2_supported


def _conv_reference(x, k, b=None):
    y = jax.lax.conv_general_dilated(
        x, k[::-1, ::-1].astype(x.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


@pytest.mark.parametrize("shape,features,bias", [
    ((2, 8, 16, 128), 128, False),
    ((1, 16, 8, 256), 128, True),
    ((1, 24, 24, 128), 256, False),
])
def test_deconv_pallas_matches_conv(shape, features, bias):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.1, (2, 2, shape[-1], features)),
                    jnp.float32)
    b = (jnp.asarray(rng.normal(0, 0.1, (features,)), jnp.float32)
         if bias else None)
    assert deconv2x2_supported(x, features)
    got = deconv2x2_pallas(x, k, b)
    want = _conv_reference(x, k, b)
    assert got.shape == want.shape == (shape[0], 2 * shape[1],
                                       2 * shape[2], features)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_supported_guard():
    x = jnp.zeros((1, 8, 8, 96))          # C not lane-aligned
    assert not deconv2x2_supported(x, 128)
    x = jnp.zeros((1, 8, 8, 128))
    assert not deconv2x2_supported(x, 96)  # O not lane-aligned
    assert not deconv2x2_supported(jnp.zeros((1, 12, 8, 128)), 128)  # H%8
    assert deconv2x2_supported(x, 128)
