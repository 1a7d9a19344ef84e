#!/usr/bin/env python3
"""ConvTranspose 2x2/s2 formulations on TPU: XLA dilated-conv lowering vs
one matmul + depth-to-space reshapes. Checks equivalence, then times both
at the DepthPro upsample-stack shapes."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vsc_tpu.utils.jax_setup import setup_jax, sync


def main():
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    def conv_t(x, k):
        return jax.lax.conv_general_dilated(
            x, k[::-1, ::-1], window_strides=(1, 1), padding=((1, 1), (1, 1)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def matmul_t(x, k):
        B, H, W, I = x.shape
        O = k.shape[-1]
        km = jnp.transpose(k, (2, 0, 1, 3)).reshape(I, 4 * O)
        y = (x.reshape(B * H * W, I) @ km).reshape(B, H, W, 2, 2, O)
        y = jnp.swapaxes(y, 2, 3).reshape(B, 2 * H, 2 * W, O)
        return y

    rng = np.random.default_rng(0)
    # correctness at a small shape
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (2, 2, 16, 32)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(conv_t(x, k)),
                               np.asarray(matmul_t(x, k)), atol=1e-4)
    print("equivalent: ok")

    shapes = [  # (B, H, W, I, O): the three big latent0/latent1/fine deconvs
        (2, 96, 96, 256, 256),
        (2, 192, 192, 256, 256),
        (2, 384, 384, 256, 256),
        (2, 96, 96, 512, 512),
    ]
    for B, H, W, I, O in shapes:
        x = jnp.asarray(rng.normal(0, 1, (B, H, W, I)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 0.02, (2, 2, I, O)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        for name, fn in (("dilated-conv", conv_t), ("matmul+d2s", matmul_t)):
            f = jax.jit(fn)
            out = f(x, k)
            sync(out)
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(x, k)
            sync(out)
            ms = 1000.0 * (time.perf_counter() - t0) / 8
            print(f"{B}x{H}x{W} {I}->{O}  {name:14s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
