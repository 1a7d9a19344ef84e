"""Pallas short-sequence attention vs the einsum reference (interpret mode
on CPU; the same kernel code runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsc_tpu.ops.attention_pallas import _group_size, short_seq_attention


def einsum_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@pytest.mark.parametrize("B,T,H,Dh", [
    (2, 37, 4, 16),    # unaligned T -> padded keys must get no mass
    (4, 64, 8, 32),    # grouped grid (B*H = 32 -> group > 1)
])
def test_short_seq_attention_matches_einsum(B, T, H, Dh):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, T, H, Dh)).astype(np.float32))
               for _ in range(3))
    scale = 1.0 / np.sqrt(Dh)
    got = np.asarray(short_seq_attention(q, k, v, scale))
    want = np.asarray(einsum_attention(q, k, v, scale))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_group_size_divides():
    assert _group_size(1120, 584, 64) in (2, 4, 8, 16)
    assert 1120 % _group_size(1120, 584, 64) == 0
    assert _group_size(7, 584, 64) == 1


@pytest.mark.parametrize("B,T,H,Dh", [
    (2, 37, 4, 64),    # unaligned T; 768-lane group = all 4 heads
    (3, 577, 16, 64),  # production geometry (ViT-L tile)
    (2, 64, 2, 128),   # Dh == lane tile
])
def test_qkv_attention_matches_einsum(B, T, H, Dh):
    from vsc_tpu.ops.attention_pallas import (qkv_lane_group,
                                              qkv_short_seq_attention)
    D = H * Dh
    assert qkv_lane_group(3 * D, Dh) is not None
    rng = np.random.default_rng(1)
    # per-head interleaved fused layout: [q_h0 | k_h0 | v_h0 | q_h1 | ...]
    qkv = jnp.asarray(rng.normal(0, 1, (B, T, H, 3, Dh)).astype(np.float32))
    scale = 1.0 / np.sqrt(Dh)
    got = np.asarray(
        qkv_short_seq_attention(qkv.reshape(B, T, 3 * D), H, scale))
    q, k, v = (qkv[:, :, :, i, :] for i in range(3))     # [B, T, H, Dh]
    want = np.asarray(einsum_attention(q, k, v, scale)).reshape(B, T, D)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_qkv_lane_group_rules():
    from vsc_tpu.ops.attention_pallas import qkv_lane_group
    # ViT-L: D3=3072, 3*Dh=192 -> lcm(192,128)=384 step -> best 1536 = 8 heads
    assert qkv_lane_group(3 * 1024, 64) == 1536
    # a lane group must hold whole per-head (q,k,v) blocks
    assert qkv_lane_group(3 * 96, 48) is None  # 288 % lcm(144,128) != 0
