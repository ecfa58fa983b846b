"""Persistent XLA compilation cache.

The flagship train step costs minutes of XLA compile time per process
(BENCH_r01 measured a 225 s tail). The persistent cache amortizes that to
one-time cost per (program, compiler version, device) — every CLI entry and
the benchmark call this before building any jitted computation.
"""
from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

DEFAULT_DIR = os.environ.get(
    "DYNAMICPDB_COMPILE_CACHE", os.path.expanduser("~/.cache/dynamicpdb_jax")
)


def enable_persistent_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent)."""
    import jax

    path = path or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every compile that takes longer than a second; tiny programs
    # aren't worth the disk round-trip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # flag renamed/absent across jax versions
        pass
    log.info("persistent compilation cache: %s", path)
    return path
