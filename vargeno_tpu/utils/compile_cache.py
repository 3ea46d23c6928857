"""Persistent XLA compilation cache (opt-out via VGT_COMPILE_CACHE=0).

The engine's batch step takes minutes to compile on the TPU backend; the
persistent cache makes every later process (bench re-runs, calibration
sweeps, CLI invocations at the same shapes) load it in seconds. Verified
to work with the tunneled TPU backend (cache hits across processes).
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/vgt_jax_cache"


def enable(path: str | None = None) -> bool:
    env = os.environ.get("VGT_COMPILE_CACHE", "")
    if env == "0":
        return False
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          path or env or DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return True
    except Exception:  # noqa: BLE001 - cache is an optimization only
        return False
