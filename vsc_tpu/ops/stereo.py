"""
Stereo SBS pipeline (batched, jit-compiled)
===========================================

The complete depth->stereo compute path of the reference's
``StereoGenerator.process_frame`` (/root/reference/helper/stereo_core.py:225-311),
re-designed as ONE batched, statically-shaped, jit-compiled function: no host
round-trips, no per-frame Python, every stage an XLA-fusable tensor op.

Stage order (load-bearing, mirrors stereo_core.py):
  1.  pre-stretch rgb+depth by (2*max_disparity+|convergence|)/W, Lanczos4
      (stereo_core.py:249-254); integer-quantized like cv2's u8/u16 output
  2.  per-frame min-max depth normalization, zeros if flat
      (stereo_core.py:71-88)
  3.  optional bilinear super-sampling of depth, rgb follows
      (stereo_core.py:260-262, 348-366)
  4.  optional gaussian edge softening of depth, k=max(5,min(int(6s)|1,31))
      (stereo_core.py:264-265, 368-385)
  5.  optional depth gamma: clamp(0.001,1)^gamma (stereo_core.py:91-107)
  6.  forward warp, both eyes, occlusion-aware (ops/warp.py)
  7.  per-eye post-process: bilateral artifact smoothing + hole inpaint on a
      3x3-dilated hole mask (stereo_core.py:387-412, 436-457, 459-485)
  8.  convergence crop (stereo_core.py:275-302)
  9.  unsharp sharpen at warp resolution (stereo_core.py:294-306, 414-434)
  10. area downscale to the original size, clamp, truncate to u8, SBS pack
      (stereo_core.py:298-311)

StereoParams is a static (hashable) argument: output shapes depend on its
values, so each distinct parameter set traces and compiles once.

Divergence from the reference (documented): crop offsets are clamped into
the valid range — the reference produces an empty tensor (crash) when
|convergence| exceeds the stretch buffer on one side.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

import os

from vsc_tpu.config.stereo_params import StereoParams
from vsc_tpu.ops.filters import bilateral_filter, dilate3x3, gaussian_blur, unsharp_mask
from vsc_tpu.ops.inpaint import pyramid_inpaint
from vsc_tpu.ops.resize import resize
from vsc_tpu.ops.warp import forward_warp_stereo as _warp_jnp


def _forward_warp(image, depth, max_disparity):
    """Warp backend selection: the fused Pallas kernel on TPU (one HBM pass
    instead of ~max_disparity shifted reads), the jnp formulation elsewhere.
    Override with VSC_TPU_WARP=jnp|pallas. The kernel emits floor(clip(.))
    u8-valued colors (the postprocess entry's own quantization point, where
    the two backends coincide exactly — tests/test_warp_pallas.py); the jnp
    path keeps the raw fractional f32 until that same entry."""
    choice = os.environ.get("VSC_TPU_WARP")
    if choice == "jnp":
        return _warp_jnp(image, depth, max_disparity)
    if choice == "pallas" or jax.default_backend() == "tpu":
        from vsc_tpu.ops.warp_pallas import forward_warp_stereo_pallas
        return forward_warp_stereo_pallas(image, depth, max_disparity)
    return _warp_jnp(image, depth, max_disparity)

__all__ = ["generate_sbs", "sbs_shapes", "StereoParams"]


def sbs_shapes(height: int, width: int, params: StereoParams) -> dict:
    """All static intermediate geometry for a given input size + params."""
    total_buffer = 2.0 * params.max_disparity + abs(params.convergence)
    stretch_factor = 1.0 + total_buffer / width
    stretched_w = int(width * stretch_factor)

    shapes = {"stretched_w": stretched_w, "stretched_h": height}
    if params.super_sampling > 1.0:
        up_h = int(height * params.super_sampling)
        up_w = int(stretched_w * params.super_sampling)
        scale_ratio = up_w / stretched_w
        shapes.update(
            up_h=up_h, up_w=up_w, scale_ratio=scale_ratio,
            crop_w=int(width * scale_ratio),
        )
    else:
        shapes.update(up_h=height, up_w=stretched_w, scale_ratio=1.0,
                      crop_w=width)
    return shapes


def _normalize_depth(depth):
    """Per-frame min-max normalization; flat frames -> zeros
    (stereo_core.py:71-88)."""
    import jax.numpy as jnp
    d_min = depth.min(axis=(1, 2), keepdims=True)
    d_max = depth.max(axis=(1, 2), keepdims=True)
    rng = d_max - d_min
    safe = jnp.maximum(rng, 1e-12)
    out = (depth - d_min) / safe
    return jnp.where(rng < 1e-6, jnp.zeros_like(depth), out)


def _quantize_like(x, max_value: float):
    """Round + clip to the integer grid cv2.resize would have produced for
    u8/u16 inputs; cv2's fixed-point path rounds half UP (add 1<<(bits-1),
    shift), so floor(x+0.5) rather than banker's rounding."""
    import jax.numpy as jnp
    return jnp.clip(jnp.floor(x + 0.5), 0.0, max_value)


def _postprocess_eye(warped, valid_mask, artifact_smoothing: float):
    """Bilateral artifact smoothing + dilated-mask hole fill for one eye
    (stereo_core.py:459-485). Operates on u8-valued floats, returns
    u8-valued floats.

    On TPU this dispatches to the fused Pallas kernel
    (ops/postprocess_pallas.py) — one HBM pass for the whole filter chain;
    elsewhere (or with VSC_TPU_POSTPROCESS=jnp) the jnp reference path runs.
    Both paths share semantics; the hole-interior pyramid estimate is
    computed from the pre-bilateral image in both.

    Precision note: filters stay in f32 — bf16 was measured 1.2-1.4x faster
    but its ~2^-8 relative accumulation error (+-2..3 code values broadly,
    not just in holes) gets amplified by the downstream unsharp mask and
    drops composite SSIM below the parity gates."""
    import jax.numpy as jnp
    from vsc_tpu.ops.inpaint import _pyramid_fill, _upsample_nearest

    img_u8 = jnp.floor(jnp.clip(warped, 0.0, 255.0))
    # quarter-res pyramid: the estimate only serves hole interiors beyond
    # the frontier sweeps' reach, which are inherently smooth. The fused
    # kernel consumes it AT quarter res (expanding on-chip); the jnp path
    # upsamples to full res here.
    smooth_q = _pyramid_fill(img_u8, valid_mask[..., None], coarse_factor=4,
                             return_coarse=True)

    choice = os.environ.get("VSC_TPU_POSTPROCESS")
    if choice != "jnp" and (choice == "pallas"
                            or jax.default_backend() == "tpu"):
        from vsc_tpu.ops.postprocess_pallas import postprocess_eye_pallas
        return postprocess_eye_pallas(warped, valid_mask, smooth_q,
                                      artifact_smoothing)
    smooth = _upsample_nearest(smooth_q, warped.shape[1], warped.shape[2], 4)

    hole = dilate3x3(1.0 - valid_mask)  # stereo_core.py:455-456

    if artifact_smoothing > 0:
        # cv2 path converts to uint8 by truncation first
        # (stereo_core.py:403-407), filters with
        # d=max(5,min(int(s*4),15)), sigmaColor=30, sigmaSpace=s*25.
        d = max(5, min(int(artifact_smoothing * 4), 15))
        warped = jnp.round(bilateral_filter(img_u8, d, 30.0,
                                            artifact_smoothing * 25.0))

    # _to_numpy_uint8: clamp + truncate (stereo_core.py:332-346)
    img_u8 = jnp.floor(jnp.clip(warped, 0.0, 255.0))
    filled = pyramid_inpaint(img_u8, hole, interior=smooth)
    return jnp.round(jnp.clip(filled, 0.0, 255.0))


def _crop_offsets(height: int, width: int, params: StereoParams) -> tuple[int, int, int]:
    """(left_offset, right_offset, crop_width) in warp-resolution pixels
    (stereo_core.py:275-302), clamped into range."""
    s = sbs_shapes(height, width, params)
    base = (s["stretched_w"] - width) // 2
    shift = int(round(params.convergence))
    left = base + shift
    right = base - shift
    if params.super_sampling > 1.0:
        ratio = s["scale_ratio"]
        left = int(left * ratio)
        right = int(right * ratio)
    crop_w = s["crop_w"]
    hi = s["up_w"] - crop_w
    return max(0, min(left, hi)), max(0, min(right, hi)), crop_w


def _planar_u8_geometry_ok(s: dict, params: StereoParams) -> bool:
    """Small-frame guard for the planar-u8 eye pipeline: the planar finish
    kernel asserts crop_w >= 129 and H' >= 5 (ops/finish_pallas.py), and the
    fused postprocess kernel's reflect-101 pad needs its halo strictly
    smaller than the eye dims. Tiny inputs (e.g. width <= 64 at
    super_sampling=2) fall back to the compat path — which has its own jnp
    small-input fallbacks — instead of raising at trace time."""
    from vsc_tpu.ops.postprocess_pallas import _halo_for
    halo_r, halo_c = _halo_for(params.artifact_smoothing, 3, 1)
    return (s["crop_w"] >= 129 and s["up_h"] >= 5
            and halo_r < s["up_h"] and halo_c < s["up_w"])


@functools.partial(jax.jit, static_argnames=("params", "depth_max"))
def _generate_sbs_impl(rgb, depth, params: StereoParams, depth_max: float):
    import jax.numpy as jnp

    B, H, W, _ = rgb.shape
    s = sbs_shapes(H, W, params)

    rgb = rgb.astype(jnp.float32)
    depth = depth.astype(jnp.float32)

    # 1. pre-stretch (cv2 Lanczos4 on integer images -> integer output)
    rgb_st = _quantize_like(
        resize(rgb, H, s["stretched_w"], "lanczos4", channel_last=True), 255.0)
    depth_st = resize(depth, H, s["stretched_w"], "lanczos4")
    if depth_max != float("inf"):
        depth_st = _quantize_like(depth_st, depth_max)

    # 2. normalize
    depth_n = _normalize_depth(depth_st)

    # 3. super-sampling. On the TPU/Pallas path the supersampled RGB stays
    # channel-FIRST [B, 3, H', W']: the banded-matmul upsample kernel and
    # the warp kernel both consume planes, so no channel-minor relayout of
    # the 9x-supersampled tensor ever happens (the channel-last moveaxis
    # at these shapes costs more than the upsample itself).
    # VSC_TPU_SBS=planar forces the planar kernels off-TPU (interpret-mode
    # test coverage of the composed pipeline).
    on_tpu = (jax.default_backend() == "tpu"
              or os.environ.get("VSC_TPU_SBS") == "planar")
    planar = (params.super_sampling > 1.0
              and os.environ.get("VSC_TPU_WARP") != "jnp"
              and on_tpu)
    # Planar-u8 gating decided up front (stage 3 fuses the warp input
    # quantization into the supersample kernel when it holds).
    ratio = s["scale_ratio"]
    _ff = (params.super_sampling > 1.0 and float(ratio).is_integer()
           and os.environ.get("VSC_TPU_FINISH") != "jnp" and on_tpu)
    planar_u8 = (planar and _ff
                 and os.environ.get("VSC_TPU_POSTPROCESS") != "jnp"
                 and _planar_u8_geometry_ok(s, params))
    rgb_cf = None
    if params.super_sampling > 1.0:
        depth_n = resize(depth_n, s["up_h"], s["up_w"], "bilinear")
        if planar:
            import jax.numpy as _jnp
            x_cf = _jnp.moveaxis(rgb_st, -1, 1)
            SW = s["stretched_w"]
            f_ok = (planar_u8 and s["up_h"] % H == 0 and s["up_w"] % SW == 0
                    and s["up_h"] // H == s["up_w"] // SW
                    and os.environ.get("VSC_TPU_UPSAMPLE") != "jnp")
            if f_ok:
                # u8 straight out of the supersample kernel: the warp's
                # input quantization (floor commutes with its winner-take
                # selection) fused into the upsample epilogue — the 9x
                # supersampled f32 RGB never reaches HBM.
                from vsc_tpu.ops.upsample_pallas import (
                    upsample_bilinear_int_pallas)
                rgb_cf = upsample_bilinear_int_pallas(
                    x_cf.reshape((-1,) + x_cf.shape[2:]),
                    s["up_h"] // H, quantize_u8=True,
                ).reshape(x_cf.shape[:2] + (s["up_h"], s["up_w"]))
            else:
                rgb_cf = resize(x_cf, s["up_h"], s["up_w"], "bilinear")
        else:
            rgb_st = resize(rgb_st, s["up_h"], s["up_w"], "bilinear",
                            channel_last=True)

    # 4-5. edge softening + depth gamma (fused into the blur kernel's
    # epilogue on the Pallas path; an ordinary trailing op on jnp)
    gam = params.depth_gamma if params.depth_gamma != 1.0 else None
    if params.edge_softness > 0:
        k = max(5, min(int(params.edge_softness * 6) | 1, 31))
        depth_n = gaussian_blur(depth_n, k, params.edge_softness, gamma=gam)
    elif gam is not None:
        depth_n = jnp.clip(depth_n, 0.001, 1.0) ** gam

    lo, ro, crop_w = _crop_offsets(H, W, params)
    eye_offsets = jnp.asarray([lo, ro], jnp.int32)

    # Fused unsharp+box-downscale kernel (ops/finish_pallas.py): TPU default
    # for integer supersampling ratios (measured -9 ms/frame at 1080p
    # defaults once it processed all 3 channels per cell with prefetched
    # halo DMA; the round-1 per-channel serial-DMA version was neutral).
    # VSC_TPU_FINISH=jnp opts out.
    fused_finish = _ff

    # Planar-u8 eye pipeline (r3): when every post-warp stage has a fused
    # kernel, the eyes stay [4/3, B, H', W'] uint8 planes from the warp
    # kernel's output to the final downscale — no f32 eye planes and no
    # channel interleave of supersampled tensors ever reach HBM (the
    # channel-last f32 round trips were ~40% of the stage's measured time).
    # Semantics are exact: the u8 quantization points are precisely where
    # both the jnp path and the oracle truncate (_postprocess_eye entry /
    # final SBS floor).
    if planar_u8:
        from vsc_tpu.ops.finish_pallas import sharpen_downscale_planar
        from vsc_tpu.ops.inpaint import _pyramid_fill_planar_coarse
        from vsc_tpu.ops.postprocess_pallas import (
            postprocess_eye_planar_pallas)
        from vsc_tpu.ops.warp_pallas import (
            forward_warp_stereo_pallas_planar_u8)

        eye_l, eye_r = forward_warp_stereo_pallas_planar_u8(
            rgb_cf, depth_n, params.max_disparity)

        # Both eyes ride ONE batched pyramid + postprocess + finish program
        # (r4; previously lax.map ran them as two serial dispatches): same
        # total work, half the kernel launches, and the postprocess's
        # double-buffered halo DMA pipelines across the eye boundary. The
        # u8 planes keep peak HBM well inside budget (the sequential form
        # existed for the f32 jnp path's sake).
        B2 = eye_l.shape[1]
        pair = jnp.concatenate([eye_l, eye_r], axis=1)   # [4, 2B, H', W']
        # Split-bilateral pipeline (r5, LOST BISECT — default OFF): the
        # bilateral in a dedicated full-width-strip kernel
        # (ops/bilateral_pallas.py) that also emits the pyramid's
        # quarter-res pool stack from the same window. Values are
        # bit-identical to the fused form (same weight laws, same
        # accumulation order, same pool ladder), but it MEASURED SLOWER on
        # the axon v5e at 1080p defaults: 49.5 ms/frame (strip rows=32) and
        # 105 ms (rows=64) vs 46.2 fused — full-width strips at the ~6060-
        # lane supersampled width keep multi-MB f32 temporaries live per
        # bilateral tap and lose more to VMEM pressure than the fused
        # form's 1.87x halo recompute costs. VSC_TPU_PP_SPLIT=1 opts in.
        from vsc_tpu.ops.bilateral_pallas import (bilateral_pool_planar,
                                                  bilateral_pool_supported)
        split = (os.environ.get("VSC_TPU_PP_SPLIT", "0") == "1"
                 and bilateral_pool_supported(
                     s["up_h"], s["up_w"], params.artifact_smoothing))
        if split:
            # VSC_TPU_BF_POOL=0: keep the pool prepass kernels (A/B isolating
            # the in-kernel pool; the pyramid reads the PRE-bilateral pair)
            pool_in_a = os.environ.get("VSC_TPU_BF_POOL", "1") != "0"
            filt, quarter4 = bilateral_pool_planar(
                pair, params.artifact_smoothing, pool=pool_in_a)
            smooth_q = _pyramid_fill_planar_coarse(
                None if pool_in_a else pair, quarter4=quarter4)
            out = postprocess_eye_planar_pallas(filt, smooth_q, 0.0)
        else:
            smooth_q = _pyramid_fill_planar_coarse(pair)
            out = postprocess_eye_planar_pallas(
                pair, smooth_q, params.artifact_smoothing)
        # Per-eye convergence crop. The optimization_barrier is LOAD-BEARING:
        # the axon TPU backend miscompiles a fused
        # concat(slice(x[:, :B], lo), slice(x[:, B:], ro)) — the second
        # operand comes back sliced at lo (uniform ro-lo column shift of the
        # whole right eye; round-4 hardware SSIM 0.5772, right-eye 0.159).
        # Hardware-verified 2026-08-19 (scripts/repro_concat_slice.py): the
        # fused form is wrong for u8 AND f32, static AND dynamic slices; the
        # barrier form and vmapped dynamic_slice both compute correctly.
        # CPU/interpret are unaffected, so only the hardware SSIM gate
        # (bench.py measure_ssim, verify skill) can catch a regression here.
        eye_crops = jax.lax.optimization_barrier((
            jax.lax.slice_in_dim(out[:, :B2], lo, lo + crop_w, axis=3),
            jax.lax.slice_in_dim(out[:, B2:], ro, ro + crop_w, axis=3),
        ))
        cropped = jnp.concatenate(eye_crops, axis=1)
        fin = sharpen_downscale_planar(
            cropped, int(ratio), float(params.sharpen), H, W)  # [3, 2B, H, W]
        sbs = jnp.concatenate([fin[:, :B2], fin[:, B2:]], axis=3)
        return jnp.moveaxis(sbs, 0, -1)            # [B, H, 2W, 3] u8

    # 6. forward warp
    if planar:
        from vsc_tpu.ops.warp_pallas import forward_warp_stereo_pallas_planar
        left, left_mask, right, right_mask = forward_warp_stereo_pallas_planar(
            rgb_cf, depth_n, params.max_disparity)
    else:
        left, left_mask, right, right_mask = _forward_warp(
            rgb_st, depth_n, params.max_disparity)

    # 7-10. per-eye post-processing, crop, sharpen, downscale — run
    # SEQUENTIALLY per eye via lax.map so only one eye's full-resolution
    # postprocess temporaries are live at a time (the concurrent form
    # roughly doubles peak HBM, which overflows at 1080p supersampled
    # shapes).
    eyes_img = jnp.stack([left, right])          # [2, B, H', W', 3]
    eyes_mask = jnp.stack([left_mask, right_mask])

    def eye_body(args):
        img, msk, off = args
        img = _postprocess_eye(img, msk, params.artifact_smoothing)
        img = jax.lax.dynamic_slice_in_dim(img, off, crop_w, axis=2)
        if fused_finish:
            # crop already applied, so the kernel's reflect borders match
            # the jnp path exactly
            from vsc_tpu.ops.finish_pallas import sharpen_downscale
            return sharpen_downscale(img, int(ratio), float(params.sharpen),
                                     H, W)
        if params.sharpen > 0:
            img = unsharp_mask(img, params.sharpen)
        if params.super_sampling > 1.0:
            img = resize(img, H, W, "area", channel_last=True)
        return img

    finals = jax.lax.map(eye_body, (eyes_img, eyes_mask, eye_offsets))

    sbs = jnp.concatenate([finals[0], finals[1]], axis=2)
    return jnp.floor(jnp.clip(sbs, 0.0, 255.0)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("params", "depth_max", "mesh"))
def _generate_sbs_sharded(rgb, depth, params: StereoParams,
                          depth_max: float, mesh):
    """SPMD form: the whole SBS program is batch-elementwise, so shard_map
    over the data axis runs it independently per device with ZERO
    collectives — and, unlike plain jit+SPMD, the Pallas kernels inside
    (warp/postprocess) correctly see only their local shard."""
    from jax.sharding import PartitionSpec as P

    body = functools.partial(_generate_sbs_impl.__wrapped__,
                             params=params, depth_max=depth_max)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
        # pallas_call out_shapes carry no varying-mesh-axes metadata
        check_vma=False,
    )(rgb, depth)


def _data_mesh_of(*arrays):
    """The mesh to shard_map over, when every input is sharded over a
    'data' mesh axis that divides the batch."""
    from jax.sharding import NamedSharding
    mesh = None
    for a in arrays:
        sh = getattr(a, "sharding", None)
        if not isinstance(sh, NamedSharding):
            return None
        m = sh.mesh
        if "data" not in m.axis_names or m.shape["data"] <= 1:
            return None
        if mesh is not None and m != mesh:
            return None
        mesh = m
        if a.shape[0] % m.shape["data"] != 0:
            return None
    return mesh


def generate_sbs(rgb, depth, params: StereoParams | None = None):
    """Batched SBS generation.

    Args:
      rgb: [B, H, W, 3] uint8 (or float holding u8 values).
      depth: [B, H, W] uint8/uint16/float depth map ("nearness": larger =
        closer, the convention of the saved depth maps).
      params: static StereoParams (defaults match the reference).

    Returns:
      [B, H, 2W, 3] uint8 side-by-side frames (left | right).

    Inputs sharded over a "data" mesh axis (vsc_tpu.parallel.auto.shard_batch)
    dispatch the SPMD shard_map form — each device converts its own frames.
    """
    params = params or StereoParams()
    dt = np.dtype(getattr(depth, "dtype", np.float32))
    if dt == np.uint8:
        depth_max = 255.0
    elif dt == np.uint16:
        depth_max = 65535.0
    else:
        depth_max = float("inf")  # float depth: no integer quantization
    mesh = _data_mesh_of(rgb, depth)
    if mesh is not None:
        return _generate_sbs_sharded(rgb, depth, params, depth_max, mesh)
    return _generate_sbs_impl(rgb, depth, params, depth_max)
