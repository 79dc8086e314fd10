"""Persistent XLA compilation cache wiring.

TPU first-compiles are expensive (~20-40s per executable on v5e for the
SlowFast graph; every (shape, mesh, donation) variant compiles
separately).  The reference has nothing comparable — torch re-traces
per process — but on TPU the cache is the difference between a 2-minute
and a 2-second warm start, so every CLI entry point honors
``cfg.tpu.compile_cache_dir`` (or ``$VIDSITU_COMPILE_CACHE``): compiled
executables persist there keyed by (HLO, compile options, backend
version) and later runs — including across preemption restarts and
elastic resizes back to a previously-seen device count — deserialize
instead of recompiling.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compile_cache(cfg=None) -> str:
    """Point jax's persistent compilation cache at
    ``cfg.tpu.compile_cache_dir`` (overridable via the
    ``VIDSITU_COMPILE_CACHE`` env var; empty = disabled).  Returns the
    directory in effect ('' when disabled).  Safe to call more than
    once; later calls re-point the cache."""
    cache_dir = os.environ.get("VIDSITU_COMPILE_CACHE")
    if cache_dir is None and cfg is not None:
        cache_dir = str(cfg.tpu.get("compile_cache_dir", "") or "")
    if not cache_dir:
        return ""
    import jax

    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache even fast compiles: the default 1s floor skips exactly the
    # small eval/decode closures that dominate a resumed run's warm-up
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
