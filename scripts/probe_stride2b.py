"""Round 2 probes: in-kernel transpose, int8 dot, one-shot pool candidates."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kern, in_shapes_dtypes, out_shape, out_dtype, check):
    try:
        rng = np.random.default_rng(0)
        xs = []
        for shp, dt in in_shapes_dtypes:
            if np.issubdtype(dt, np.integer):
                xs.append(jnp.asarray(
                    rng.integers(np.iinfo(dt).min, np.iinfo(dt).max, shp, dt)))
            else:
                xs.append(jnp.asarray(rng.random(shp, np.float32)))
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(xs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = np.asarray(f(*xs))
        ok, err = check(r, [np.asarray(x) for x in xs])
        print(f"{name}: OK correct={ok} err={err}")
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


# T. in-kernel 2-D transpose
def k_t(x_ref, o_ref):
    o_ref[...] = x_ref[...].T
run("T transpose", k_t, [((128, 2048), np.float32)], (2048, 128), np.float32,
    lambda r, xs: (np.array_equal(r, xs[0].T), 0))

# T4. transpose + sublane-compact by 4 + transpose back (lane 4x pool core)
def k_t4(x_ref, o_ref):
    x = x_ref[...]                        # [128, 2048]
    t = x.T                               # [2048, 128]
    s = t.reshape(512, 4, 128).sum(axis=1)
    o_ref[...] = s.T                      # [128, 512]
run("T4 transpose-pool", k_t4, [((128, 2048), np.float32)],
    (128, 512), np.float32,
    lambda r, xs: (bool(np.allclose(
        r, xs[0].reshape(128, 512, 4).sum(-1), rtol=1e-6)),
        float(np.abs(r - xs[0].reshape(128, 512, 4).sum(-1)).max())))

# I8. int8 dot -> int32
def k_i8(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
run("I8 int8-dot", k_i8, [((256, 512), np.int8), ((512, 256), np.int8)],
    (256, 256), np.int32,
    lambda r, xs: (np.array_equal(
        r, xs[0].astype(np.int32) @ xs[1].astype(np.int32)), 0))

# M. cols-matmul from u8 (bf16-exact ints): x u8 [512,2048] @ P4 -> [512,512]
def k_m(x_ref, o_ref):
    x = x_ref[...].astype(jnp.int32).astype(jnp.float32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (2048, 512), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (2048, 512), 1)
    P = (rr // 4 == cc).astype(jnp.float32)
    o_ref[...] = jax.lax.dot_general(x, P, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
run("M u8-cols-matmul", k_m, [((512, 2048), np.uint8)],
    (512, 512), np.float32,
    lambda r, xs: (bool(np.array_equal(
        r, xs[0].astype(np.float32).reshape(512, 512, 4).sum(-1))),
        float(np.abs(r - xs[0].astype(np.float32)
                     .reshape(512, 512, 4).sum(-1)).max())))

print("probe2 done")
