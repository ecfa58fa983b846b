"""Platform selection workarounds, centralized.

Some TPU PJRT plugins (the axon tunnel in this image) register themselves
unconditionally and IGNORE the ``JAX_PLATFORMS`` env var, so a process
that asked for CPU still blocks on the (possibly unreachable) TPU tunnel
at the first device touch. The fix is to force the platform through
``jax.config`` before any backend initialization. Every entry point
(train_cli, eval_cli, __graft_entry__, tools/*) calls this one helper —
a review found five hand-rolled copies with diverging feature sets.
"""
from __future__ import annotations

import os
import re


def honor_cpu_request() -> bool:
    """If ``JAX_PLATFORMS=cpu`` is set, force the CPU backend through
    jax.config (plugin-proof) and honor any
    ``--xla_force_host_platform_device_count=N`` in ``XLA_FLAGS`` (the
    env-var route is equally ignored once the config route is used).
    Returns whether CPU was forced. Must run before any device use."""
    if os.environ.get("JAX_PLATFORMS") != "cpu":
        return False
    import jax

    jax.config.update("jax_platforms", "cpu")
    m = re.search(
        r"host_platform_device_count=(\d+)", os.environ.get("XLA_FLAGS", "")
    )
    if m:
        jax.config.update("jax_num_cpu_devices", int(m.group(1)))
    return True
