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


def _warn_if_stale(path: str) -> None:
    """Committed cache dirs carry a MANIFEST.json (tools/cache_gc.py) pinning
    the jax/jaxlib versions the entries were compiled under. Entries are
    content-keyed, so a toolchain bump never errors — every entry just
    silently misses while staying committed dead weight. Make that loud."""
    manifest = os.path.join(path, "MANIFEST.json")
    if not os.path.exists(manifest):
        return
    try:
        import json

        import jax
        import jaxlib

        with open(manifest) as f:
            recorded = json.load(f).get("toolchain", {})
        current = {"jax": jax.__version__, "jaxlib": jaxlib.__version__}
        if recorded and recorded != current:
            log.warning(
                "STALE compile cache %s: entries recorded under %s, running "
                "%s — every committed entry will miss (dead weight). "
                "Repopulate with a fresh workload, then run "
                "`python tools/cache_gc.py --record` (see `make cache-gc`).",
                path, recorded, current,
            )
    except Exception as e:  # a corrupt manifest must never block the cache
        log.warning("compile-cache manifest check failed for %s: %s", path, e)


def enable_persistent_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent)."""
    import jax

    path = path or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    _warn_if_stale(path)
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
