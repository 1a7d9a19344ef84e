"""Probe which stride-2 idioms Mosaic lowers (for pool_pallas)."""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 1024


def run(name, kern, out_shape):
    try:
        x = jnp.asarray(np.random.default_rng(0).random((H, W), np.float32))
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = np.asarray(f(x))
        want = np.asarray(x)
        ok = np.allclose(r, (want[0::2] if out_shape[0] == H // 2 and out_shape[1] == W
                             else want[:, 0::2] if out_shape == (H, W // 2)
                             else want[0::2, 0::2]))
        print(f"{name}: OK correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


# A. ref strided read, sublane dim
def k_ref_sub(x_ref, o_ref):
    o_ref[...] = x_ref[0::2, :]
run("A ref-strided-sublane", k_ref_sub, (H // 2, W))

# B. ref strided read, lane dim
def k_ref_lane(x_ref, o_ref):
    o_ref[...] = x_ref[:, 0::2]
run("B ref-strided-lane", k_ref_lane, (H, W // 2))

# C. value reshape split sublane, slice parity
def k_reshape_sub(x_ref, o_ref):
    x = x_ref[...]
    o_ref[...] = x.reshape(H // 2, 2, W)[:, 0, :]
run("C reshape-sublane", k_reshape_sub, (H // 2, W))

# D. value reshape split lane, slice parity
def k_reshape_lane(x_ref, o_ref):
    x = x_ref[...]
    o_ref[...] = x.reshape(H, W // 2, 2)[:, :, 0]
run("D reshape-lane", k_reshape_lane, (H, W // 2))

# E. MXU selection matmul both dims (full 2x2 pool of x would be
#    0.25*(Pr @ x @ Pc); here just parity-select to check lowering+cost)
def k_mm(x_ref, o_ref):
    x = x_ref[...]
    rr = jax.lax.broadcasted_iota(jnp.int32, (H // 2, H), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (H // 2, H), 1)
    Pr = (cc == 2 * rr).astype(jnp.float32)
    rr2 = jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 0)
    cc2 = jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 1)
    Pc = (rr2 == 2 * cc2).astype(jnp.float32)
    t = jax.lax.dot_general(Pr, x, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = jax.lax.dot_general(t, Pc, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
run("E mxu-selection", k_mm, (H // 2, W // 2))

# F. pltpu.roll + reshape-merge trick on lanes:
#    s[:, 0::2] compaction via reshape (H, W//2, 2) -> strided? covered by D.

print("probe done")
