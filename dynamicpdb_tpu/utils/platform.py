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


def raise_cpu_collective_timeouts(warn_s: int = 120,
                                  terminate_s: int = 1800) -> None:
    """Append XLA_FLAGS raising XLA-CPU's collective rendezvous timeouts.

    On the virtual multi-device CPU backend, XLA runs one thread per
    partition and hard-aborts (rendezvous.cc, default warn 20 s /
    terminate 40 s) if a collective's participants don't all arrive in
    time. On a core-starved host the partitions execute effectively
    serially, so per-partition wall time between collectives can exceed
    the default envelope even though the program is correct (observed:
    the flagship-width dryrun's 2-participant 'model'-axis all-gathers,
    MULTICHIP_r03, reproduced and fixed in round 4). The registered flag
    names differ from the DebugOptions fields — the warn flag carries an
    extra "timeout": xla_cpu_collective_call_warn_stuck_TIMEOUT_seconds
    (setting the DebugOptions spelling via XLA_FLAGS is a fatal
    "Unknown flag", and jit compiler_options with either spelling is
    accepted but ignored by the rendezvous — verified empirically).

    MUST run before the first device use in the process: XLA parses the
    env var once at backend initialization. No-op for flags already
    present (a user override wins). Harmless when the process ends up on
    TPU — the flags are CPU-runtime-only."""
    flags = os.environ.get("XLA_FLAGS", "")
    for flag, val in (
        ("xla_cpu_collective_call_warn_stuck_timeout_seconds", warn_s),
        ("xla_cpu_collective_call_terminate_timeout_seconds", terminate_s),
    ):
        if flag not in flags:
            flags = (flags + f" --{flag}={val}").strip()
    os.environ["XLA_FLAGS"] = flags
