"""
Short-sequence attention — Pallas TPU kernel
============================================

Attention for ViT-length sequences (DepthPro tiles: 577 tokens) where the
entire [T, T] logits block fits in VMEM. Each grid cell handles one
(batch, head): loads q/k/v [T, Dh] once, computes logits, f32 softmax, and
the value contraction entirely on-chip — the [B, H, T, T] logits tensor
(746 MB at production shapes) never exists in HBM.

Compared here on the v5e at [35 tiles, 16 heads, 577 tokens, 64 dims]:
  - einsum attention: HBM-bound on logits (~9 ms/block)
  - generic pallas flash_attention: ~12 ms/block (grid/loop overhead
    dominates at short T)
  - this kernel: see BASELINE.md (single q-pass, no running-max bookkeeping
    needed because the full row is resident)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["short_seq_attention", "qkv_short_seq_attention"]


def _qkv_kernel(qkv_ref, o_ref, *, T: int, scale: float,
                heads: int, Dh: int):
    """One grid cell = one lane-group of `heads` heads for one batch row.
    The fused qkv tensor is PER-HEAD interleaved ([q_h | k_h | v_h] blocks
    of 3*Dh lanes per head — Megatron's fused-qkv layout), so a cell's
    q/k/v are lane-offset slices of ONE contiguous block: no [B,T,H,Dh]
    transpose or separate q/k/v materialization ever happens, and a
    contiguous shard of the lane axis under tensor parallelism carries
    whole heads (models/vit.py shard_maps this kernel over the "model"
    mesh axis)."""
    Tp = qkv_ref.shape[1]
    if Tp != T:
        col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
        neg_bias = jnp.where(col < T, 0.0, -1e30).astype(jnp.float32)
    for h in range(heads):
        base = 3 * Dh * h
        q = qkv_ref[0, :, base:base + Dh]                    # [Tp, Dh]
        k = qkv_ref[0, :, base + Dh:base + 2 * Dh]
        v = qkv_ref[0, :, base + 2 * Dh:base + 3 * Dh]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [Tp, Tp]
        if Tp != T:
            logits = logits + neg_bias
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p32 = jnp.exp(logits)
        denom = jnp.sum(p32, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p32.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, h * Dh:(h + 1) * Dh] = (out / denom).astype(o_ref.dtype)


def qkv_lane_group(D3: int, Dh: int) -> int | None:
    """Lane-group width for qkv_short_seq_attention over the per-head
    interleaved [B, T, D3] qkv tensor: the largest multiple of both the
    128-lane tile and the 3*Dh per-head block that divides D3, capped so a
    cell's operand block stays comfortably in VMEM (None if impossible).
    The output block is lanes/3 wide = a multiple of lcm(Dh, 128)."""
    if D3 % (3 * Dh):
        return None
    step = 3 * Dh * 128 // math.gcd(3 * Dh, 128)
    best = None
    lanes = step
    while lanes <= min(D3, 1536):
        if D3 % lanes == 0:
            best = lanes
        lanes += step
    return best


@functools.partial(jax.jit, static_argnames=("num_heads", "scale"))
def qkv_short_seq_attention(qkv, num_heads: int, scale: float):
    """Attention straight from the fused QKV projection.

    qkv: [B, T, 3*D] PER-HEAD interleaved — [q_h0 | k_h0 | v_h0 | q_h1 ...]
    along lanes (the column order models/vit.py's fused Dense(3D) produces
    and models/convert.py writes); returns [B, T, D] with the usual
    per-head concat layout, ready for the output projection.

    Versus short_seq_attention this removes every transpose around the
    kernel: the [B,T,H,Dh] fold/unfold of q, k, v and out cost 4 HBM
    round-trips of relayout per ViT block (~40% of the measured attention
    stage at DepthPro production shapes). The per-head layout additionally
    makes the kernel SPMD-safe: under tensor parallelism each "model" shard
    holds whole (q, k, v) head groups, so models/vit.py wraps this entry in
    shard_map with zero extra collectives (VERDICT r3 next #4).
    """
    B, T, D3 = qkv.shape
    D = D3 // 3
    Dh = D // num_heads
    lanes = qkv_lane_group(D3, Dh)
    assert lanes is not None, (D, Dh)
    heads = lanes // (3 * Dh)
    Tp = -(-T // 8) * 8
    if Tp != T:
        qkv = jnp.pad(qkv, [(0, 0), (0, Tp - T), (0, 0)])
    G = D3 // lanes

    out = pl.pallas_call(
        functools.partial(_qkv_kernel, T=T, scale=scale, heads=heads, Dh=Dh),
        grid=(B, G),
        in_specs=[pl.BlockSpec((1, Tp, lanes), lambda b, g: (b, 0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Tp, lanes // 3), lambda b, g: (b, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(qkv)
    return out[:, :T]


def _kernel(q_ref, k_ref, v_ref, o_ref, *, T: int, scale: float, group: int):
    """One grid cell = `group` (batch, head) slices. Grouping amortizes the
    per-cell launch/DMA overhead that dominates at these tiny per-head
    workloads (85 MFLOP each): with group=1 the 1120-cell grid of the
    production model spends ~30 us/cell on overhead — most of the stage."""
    Tp = q_ref.shape[1]
    # padded key columns must not receive probability mass; the additive
    # mask is loop-invariant, built once per grid cell
    if Tp != T:
        col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
        neg_bias = jnp.where(col < T, 0.0, -1e30).astype(jnp.float32)
    for g in range(group):
        q = q_ref[g]            # [Tp, Dh]
        k = k_ref[g]
        v = v_ref[g]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [Tp, Tp]
        if Tp != T:
            logits = logits + neg_bias
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p32 = jnp.exp(logits)
        # normalization folded into the [Tp, Dh] output instead of a full
        # [Tp, Tp] division pass (row sums in f32 for exactness)
        denom = jnp.sum(p32, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p32.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[g] = (out / denom).astype(o_ref.dtype)


def _group_size(n: int, tp: int, dh: int) -> int:
    """Largest group that divides n within a VMEM budget (4 operands of
    [Tp, Dh] bf16/f32 per slice + one f32 [Tp, Tp] logits block live)."""
    budget = 24 * 1024 * 1024  # conservative slice of VMEM
    per_slice = 4 * tp * dh * 4 + 64 * 1024
    fixed = tp * tp * 4
    for g in (16, 8, 4, 2):
        if n % g == 0 and fixed + g * per_slice <= budget:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("scale",))
def short_seq_attention(q, k, v, scale: float):
    """q, k, v: [B, T, H, Dh] -> [B, T, H, Dh] (full bidirectional)."""
    B, T, H, Dh = q.shape
    Tp = -(-T // 8) * 8  # sublane alignment

    def fold(x):
        x = jnp.moveaxis(x, 2, 1).reshape(B * H, T, Dh)
        if Tp != T:
            x = jnp.pad(x, [(0, 0), (0, Tp - T), (0, 0)])
        return x

    qf, kf, vf = fold(q), fold(k), fold(v)
    G = _group_size(B * H, Tp, Dh)
    spec = pl.BlockSpec((G, Tp, Dh), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, scale=scale, group=G),
        grid=(B * H // G,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)
    out = out[:, :T].reshape(B, H, T, Dh)
    return jnp.moveaxis(out, 1, 2)
