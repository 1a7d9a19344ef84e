"""One-off TPU lowering smoke for the round-3 planar-u8 kernels.

Checks that each new/changed kernel compiles and executes on the real
chip at small shapes (Mosaic lowering, not numerics — numerics are
covered by the CPU interpret-mode golden tests).
"""
import numpy as np
import jax
import jax.numpy as jnp

from vsc_tpu.utils.jax_setup import sync

print("backend:", jax.default_backend(), jax.devices())

# 1. pool kernels (transpose-pool form)
from vsc_tpu.ops.pool_pallas import avgpool2, avgpool2_eye4, avgpool4_eye4

rng = np.random.default_rng(0)
eye4 = jnp.asarray(rng.integers(0, 256, (4, 2, 96, 640), np.uint8))
out = avgpool2_eye4(eye4)
sync(out)
ref_m = np.asarray(eye4[3], np.float32)
ref_i = np.asarray(eye4[:3], np.float32) * ref_m
def pool_np(x):
    return (x[..., 0::2, :] + x[..., 1::2, :])[..., :, 0::2] * 0.25 + \
           (x[..., 0::2, :] + x[..., 1::2, :])[..., :, 1::2] * 0.25
want = np.concatenate([pool_np(ref_i), pool_np(ref_m)[None]], 0)
got = np.asarray(out)
assert got.shape == want.shape, (got.shape, want.shape)
err = np.abs(got - want).max()
print("avgpool2_eye4 max err:", err)
assert err < 1e-4

out4 = avgpool4_eye4(eye4)
sync(out4)
want4 = np.concatenate([pool_np(pool_np(ref_i)),
                        pool_np(pool_np(ref_m))[None]], 0)
err4 = np.abs(np.asarray(out4) - want4).max()
print("avgpool4_eye4 max err:", err4)
assert err4 == 0.0

x = jnp.asarray(rng.random((3, 96, 640), np.float32))
out2 = avgpool2(x)
sync(out2)
err2 = np.abs(np.asarray(out2) - pool_np(np.asarray(x))).max()
print("avgpool2 max err:", err2)
assert err2 < 1e-5

# 2. upsample quantize_u8
from vsc_tpu.ops.upsample_pallas import upsample_bilinear_int_pallas
xs = jnp.asarray(rng.random((2, 64, 256), np.float32) * 255.0)
u = upsample_bilinear_int_pallas(xs, 3, quantize_u8=True)
f = upsample_bilinear_int_pallas(xs, 3)
sync((u, f))
want_u = np.floor(np.clip(np.asarray(f), 0.0, 255.0)).astype(np.uint8)
errs = int((np.asarray(u) != want_u).sum())
print("upsample u8 mismatches:", errs, "dtype:", u.dtype)
assert errs == 0

# 3. blur gamma epilogue
from vsc_tpu.ops.blur_pallas import gaussian_blur_pallas
d = jnp.asarray(rng.random((2, 96, 512), np.float32))
bg = gaussian_blur_pallas(d, 7, 1.2, gamma=0.8)
b = gaussian_blur_pallas(d, 7, 1.2)
sync((bg, b))
want_g = np.clip(np.asarray(b), 0.001, 1.0) ** 0.8
errg = np.abs(np.asarray(bg) - want_g).max()
print("blur gamma max err:", errg)
assert errg < 1e-5

print("ALL TPU SMOKE OK")
