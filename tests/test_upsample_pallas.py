"""Pallas banded-matmul bilinear upsample vs the (torch-parity-tested)
resize() integer-factor path — interpret mode on CPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from vsc_tpu.ops.resize import resize
from vsc_tpu.ops.upsample_pallas import upsample_bilinear_int_pallas


@pytest.mark.parametrize("factor", [2, 3, 4])
@pytest.mark.parametrize("shape", [(2, 40, 150), (1, 37, 513)])
def test_upsample_pallas_matches_resize(factor, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    want = np.asarray(resize(x, shape[1] * factor, shape[2] * factor,
                             "bilinear"))
    got = np.asarray(upsample_bilinear_int_pallas(x, factor))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)
