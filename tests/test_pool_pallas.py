"""avgpool2 Pallas kernels == inpaint._avgpool2_hw (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from vsc_tpu.ops.inpaint import _avgpool2_hw
from vsc_tpu.ops.pool_pallas import avgpool2, avgpool2_eye4, avgpool4_eye4


def test_eye4_pool_matches_reference():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (3, 2, 48, 144), np.uint8)
    valid = (rng.random((2, 48, 144)) > 0.3).astype(np.uint8)
    eye4 = jnp.asarray(np.concatenate([img, valid[None]], axis=0))

    got = np.asarray(avgpool2_eye4(eye4))
    mskf = valid.astype(np.float32)
    ref_img = _avgpool2_hw(jnp.asarray(img.astype(np.float32) * mskf))
    ref_msk = _avgpool2_hw(jnp.asarray(mskf))
    np.testing.assert_allclose(got[:3], np.asarray(ref_img), rtol=1e-6)
    np.testing.assert_allclose(got[3], np.asarray(ref_msk), rtol=1e-6)


def test_eye4_oneshot_pool_matches_two_levels():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (3, 2, 48, 272), np.uint8)
    valid = (rng.random((2, 48, 272)) > 0.3).astype(np.uint8)
    eye4 = jnp.asarray(np.concatenate([img, valid[None]], axis=0))

    got = np.asarray(avgpool4_eye4(eye4))
    mskf = valid.astype(np.float32)
    ref_img = _avgpool2_hw(_avgpool2_hw(
        jnp.asarray(img.astype(np.float32) * mskf)))
    ref_msk = _avgpool2_hw(_avgpool2_hw(jnp.asarray(mskf)))
    # bit-exact: integer partial sums + power-of-two scaling
    np.testing.assert_array_equal(got[:3], np.asarray(ref_img))
    np.testing.assert_array_equal(got[3], np.asarray(ref_msk))


def test_f32_pool_matches_reference():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 50, (3, 40, 260)).astype(np.float32)
    got = np.asarray(avgpool2(jnp.asarray(x)))
    ref = np.asarray(_avgpool2_hw(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)
