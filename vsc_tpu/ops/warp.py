"""
Forward stereo warp (gather formulation)
========================================

TPU-native re-formulation of the reference's depth-sorted scatter splat
(/root/reference/helper/stereo_core.py:110-190).

Reference semantics (order is load-bearing):
  1. disparity = depth * max_disparity; all pixels sorted by depth ascending.
  2. Floor pass: every source pixel x scatters its color to
     t0 = floor(x + ds) and its weight (1 - frac) to the mask; later
     (nearer) pixels overwrite earlier ones.
  3. Ceil pass (runs after the entire floor pass): sources with
     frac > 0.3 scatter color to t0+1 with weight frac, again in depth
     order — so ANY ceil contribution beats ANY floor contribution.
  4. Valid mask = (final scattered weight) > 0.1.

Sorting + scatter is hostile to TPUs (dynamic memory traffic, no
deterministic lanes). Observe instead that a source pixel can only reach
targets within the disparity window, so each *output* pixel can gather over
the window of shifted candidates and pick the winner by the priority key

    key = (is_ceil_contribution, depth)

which reproduces 2+3 exactly (ceil class dominates, then nearest depth;
ties resolve to the smallest shift — the reference's tie order is the
unstable torch argsort, i.e. unspecified). The loop over the
``ceil(max_disparity)+2`` shifts is a static unroll of pure element-wise
ops on [B, H, W] planes — ideal VPU work, no scatter, no sort, and it
vmaps/shards trivially over batch.
"""

from __future__ import annotations

import math

__all__ = ["forward_warp_stereo"]


def forward_warp_stereo(image, depth, max_disparity: float):
    """Warp both eyes in one pass.

    Args:
      image: [B, H, W, C] float32.
      depth: [B, H, W] float32 in [0, 1] (normalized nearness).
      max_disparity: static maximum disparity in pixels.

    Returns:
      (left, left_mask, right, right_mask): warped images [B, H, W, C] and
      validity masks [B, H, W] (1.0 where a source pixel landed with weight
      > 0.1, matching stereo_core.py:185).
    """
    import jax.numpy as jnp

    B, H, W, C = image.shape
    D = int(math.floor(max_disparity)) + 1  # max possible floor(disp)
    P = D + 2  # horizontal padding covering every shift we read

    disp = depth * max_disparity           # [B, H, W], in [0, max_disparity]

    neg_inf = jnp.float32(-jnp.inf)
    pad_spec = [(0, 0), (0, 0), (P, P)]
    # Padded planes; out-of-image sources carry key -inf so they never win.
    disp_p = jnp.pad(disp, pad_spec, constant_values=0.0)
    depth_p = jnp.pad(depth, pad_spec, constant_values=0.0)
    valid_p = jnp.pad(jnp.ones_like(depth), pad_spec, constant_values=0.0)
    image_p = jnp.pad(image, pad_spec + [(0, 0)], constant_values=0.0)

    def shifted(arr, s):
        """arr sampled at source x = t - s for every target t (static slice)."""
        if arr.ndim == 4:
            return arr[:, :, P - s: P - s + W, :]
        return arr[:, :, P - s: P - s + W]

    def warp_one(sign):
        """sign=+1 -> left eye (targets right of source), -1 -> right eye."""
        best_key = jnp.full((B, H, W), neg_inf, jnp.float32)
        best_img = jnp.zeros((B, H, W, C), image.dtype)
        best_wgt = jnp.zeros((B, H, W), jnp.float32)

        # Source-to-target offsets: for the left eye, floor targets need
        # shift s = floor(+disp) in [0, D]; ceil targets s = floor(disp)+1 in
        # [1, D+1]. For the right eye ds = -disp: floor(ds) in [-D, 0] so
        # s in [-D, 0] (floor) and [-D+1 .. 1] (ceil) — i.e. the mirrored range.
        if sign > 0:
            s_range = range(0, D + 2)
        else:
            s_range = range(-D, 2)

        for s in s_range:
            d_s = shifted(disp_p, s) * sign          # signed disparity at source
            z_s = shifted(depth_p, s)
            v_s = shifted(valid_p, s)
            img_s = shifted(image_p, s)

            k = jnp.floor(d_s)                       # floor(signed disparity)
            frac = d_s - k

            # floor-class: target = x + k, reached when k == s
            is_floor = (k == s) & (v_s > 0)
            w_floor = 1.0 - frac
            # ceil-class: target = x + k + 1, reached when k == s - 1 and
            # frac > 0.3 (stereo_core.py:177)
            is_ceil = (k == s - 1) & (frac > 0.3) & (v_s > 0)
            w_ceil = frac

            # priority: ceil beats floor, then nearest depth (z in [0,1]).
            key = jnp.where(is_ceil, 2.0 + z_s,
                            jnp.where(is_floor, z_s, neg_inf))
            wgt = jnp.where(is_ceil, w_ceil, w_floor)

            take = key > best_key
            best_key = jnp.where(take, key, best_key)
            best_wgt = jnp.where(take, wgt, best_wgt)
            best_img = jnp.where(take[..., None], img_s, best_img)

        mask = (best_wgt > 0.1) & (best_key > neg_inf)
        return best_img, mask.astype(jnp.float32)

    left, left_mask = warp_one(+1)
    right, right_mask = warp_one(-1)
    return left, left_mask, right, right_mask
