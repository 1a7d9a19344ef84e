"""
vsc_tpu — TPU-native Video Stereo Converter
===========================================

A ground-up TPU-native (JAX/XLA/Pallas) re-implementation of the capabilities of
jens-duttke/Video-Stereo-Converter: 2D video -> 3D side-by-side stereo conversion
in five resumable pipeline steps (frame extraction, monocular depth estimation,
depth-based stereo warping, chunked x265 encoding, concatenation + audio mux),
plus a multi-workflow orchestrator.

Architecture (TPU-first, not a port):
  - ``vsc_tpu.ops``      fused, batched, jit-compiled stereo compute (jnp + Pallas)
  - ``vsc_tpu.models``   DepthPro-class multi-scale ViT depth estimator (Flax)
  - ``vsc_tpu.parallel`` device-mesh creation, pjit shardings (DP over frames,
                         TP over attention heads / MLP of the ViT)
  - ``vsc_tpu.io``       host media engine: native C++ ``vscmedia`` tool
                         (libavformat/libavcodec/x265) with cv2 fallback,
                         double-buffered host->HBM prefetch
  - ``vsc_tpu.pipeline`` the per-step CLIs (same public CLI surface as the
                         reference scripts)
  - ``vsc_tpu.runtime``  workflow state machine, filesystem metrics, asyncio
                         orchestrator with live dashboard

This top-level module intentionally imports nothing heavy (no jax, no cv2) so
control-plane tools start instantly.
"""

__version__ = "0.1.0"
