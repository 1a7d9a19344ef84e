#!/usr/bin/env python3
"""Component-level timing of the patch ViT workload (35 tiles/frame of
ViT-L/16 @ 577 tokens): isolates the attention kernel, the block matmuls,
and the elementwise chain to locate the gap between the measured ViT time
and the MXU roofline. Usage: python scripts/profile_vit.py [--batch 70]"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vsc_tpu.utils.jax_setup import setup_jax, sync


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=70)  # 35 tiles x 2 frames
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--depth", type=int, default=24)
    args = parser.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    N, T, D, H = args.batch, 577, 1024, 16
    Dh = D // H
    L = args.depth
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.normal(0, 1, (N, T, D)).astype(np.float32)).astype(jnp.bfloat16)
    qkv = jnp.asarray(rng.normal(0, 1, (N, T, H, Dh)).astype(np.float32)).astype(jnp.bfloat16)
    w_qkv = jnp.asarray(rng.normal(0, 0.02, (D, 3 * D)).astype(np.float32)).astype(jnp.bfloat16)
    w_fc1 = jnp.asarray(rng.normal(0, 0.02, (D, 4 * D)).astype(np.float32)).astype(jnp.bfloat16)
    w_fc2 = jnp.asarray(rng.normal(0, 0.02, (4 * D, D)).astype(np.float32)).astype(jnp.bfloat16)
    w_proj = jnp.asarray(rng.normal(0, 0.02, (D, D)).astype(np.float32)).astype(jnp.bfloat16)

    from vsc_tpu.ops.attention_pallas import short_seq_attention

    @jax.jit
    def attn_only(q):
        def body(h, _):
            return short_seq_attention(h, h, h, 0.125), None
        out, _ = jax.lax.scan(body, q, None, length=L)
        return out

    @jax.jit
    def matmuls_only(h):
        def body(a, _):
            z = a @ w_qkv                       # qkv
            z = z[..., :D] @ w_proj             # attn proj
            m = (a + z) @ w_fc1                 # fc1
            m = jax.nn.gelu(m, approximate=False)
            a = a + m @ w_fc2                   # fc2
            return a, None
        out, _ = jax.lax.scan(body, h, None, length=L)
        return out

    @jax.jit
    def elementwise_only(h):
        def body(a, _):
            n1 = jax.nn.standardize(a.astype(jnp.float32), axis=-1,
                                    epsilon=1e-6).astype(a.dtype)
            a = a + n1 * jnp.float32(0.1).astype(a.dtype)
            n2 = jax.nn.standardize(a.astype(jnp.float32), axis=-1,
                                    epsilon=1e-6).astype(a.dtype)
            a = a + n2 * jnp.float32(0.1).astype(a.dtype)
            return a, None
        out, _ = jax.lax.scan(body, h, None, length=L)
        return out

    def bench(label, fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / args.iters
        frames = args.batch / 35.0
        print(f"{label:34s} {ms:8.1f} ms  ({ms / frames:6.1f} ms/frame)")

    @jax.jit
    def attn_xla_blocked(q):
        BH = q.shape[0] * q.shape[2]
        def one(qkv_slice):
            qs = qkv_slice  # [G, T, Dh]
            logits = jnp.einsum("gqd,gkd->gqk", qs, qs,
                                preferred_element_type=jnp.float32) * 0.125
            probs = jax.nn.softmax(logits, axis=-1).astype(qs.dtype)
            return jnp.einsum("gqk,gkd->gqd", probs, qs)
        def body(h, _):
            folded = jnp.moveaxis(h, 2, 1).reshape(BH, h.shape[1], h.shape[3])
            blocks = folded.reshape(8, BH // 8, h.shape[1], h.shape[3])
            out = jax.lax.map(one, blocks)
            out = out.reshape(h.shape[0], h.shape[2], h.shape[1], h.shape[3])
            return jnp.moveaxis(out, 1, 2), None
        out, _ = jax.lax.scan(body, q, None, length=L)
        return out

    @jax.jit
    def fold_unfold_only(q):
        def body(h, _):
            B, T, Hh, Dh_ = h.shape
            f = jnp.moveaxis(h, 2, 1).reshape(B * Hh, T, Dh_)
            f = jnp.pad(f, [(0, 0), (0, 7), (0, 0)])
            g = f[:, :T].reshape(B, Hh, T, Dh_)
            return jnp.moveaxis(g, 1, 2), None
        out, _ = jax.lax.scan(body, q, None, length=L)
        return out

    bench(f"attn fold/unfold only x{L}", fold_unfold_only, qkv)
    bench(f"attention x{L} (xla blocked)", attn_xla_blocked, qkv)
    bench(f"attention x{L} (pallas)", attn_only, qkv)
    bench(f"block matmuls+gelu x{L}", matmuls_only, x)
    bench(f"layernorm/residual chain x{L}", elementwise_only, x)


if __name__ == "__main__":
    main()
