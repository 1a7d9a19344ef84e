"""
JAX runtime setup
=================

One-stop configuration applied by every compute entry point:

  - persistent compilation cache: first-compile of the 1080p pipeline costs
    minutes (notably through remote-compile TPU frontends); the on-disk
    cache makes every later process start warm.
  - sync(): a reliable completion barrier. On some experimental TPU
    platforms Array.block_until_ready() returns immediately; transferring a
    tiny slice to the host is the portable barrier. Use for timing only —
    normal result consumption (np.asarray) already synchronizes.
"""

from __future__ import annotations

import os

__all__ = ["setup_jax", "sync"]

_CACHE_ENV = "VSC_TPU_XLA_CACHE"
_done = False


def setup_jax() -> None:
    """Idempotent; call before the first dispatch. Also brings up
    jax.distributed when pod/multi-host env metadata is present (no-op on a
    single host)."""
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("VSC_TPU_FORCE_CPU") == "1":
        # Hermetic-test escape hatch: child processes of the test suite must
        # not touch the real TPU (the sitecustomize in this environment pins
        # the TPU platform regardless of env JAX_PLATFORMS, so the --cpu
        # style jax.config override is the only way).
        force_cpu()
    try:
        from vsc_tpu.parallel.distributed import initialize
        initialize()
    except Exception:
        pass
    import jax
    cache_dir = os.environ.get(
        _CACHE_ENV, os.path.join(os.path.expanduser("~"), ".cache",
                                 "vsc_tpu_xla"))
    if cache_dir and cache_dir != "0":
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass  # older jax or unsupported backend: skip silently


def force_cpu() -> None:
    """Honor a --cpu flag even where a sitecustomize pre-imports jax with a
    pinned TPU platform (env JAX_PLATFORMS is read too early there). Only
    effective before the first backend use."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def sync(x):
    """Block until `x` (array or pytree) is computed, via a host transfer of
    one element of every leaf; returns x."""
    import jax
    import numpy as np
    for leaf in jax.tree.leaves(x):
        try:
            np.asarray(leaf[tuple(0 for _ in range(leaf.ndim))])
        except Exception:
            np.asarray(leaf)
    return x
