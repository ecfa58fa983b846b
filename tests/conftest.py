"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware.

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
so we must force the platform through jax.config before any device use.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # Pin a portable ISA baseline so the committed persistent compile cache
    # (.cache/jax_tests) is loadable on any x86 host. Without this, AOT
    # entries bake in the builder's CPU features (AVX-512/AMX) and XLA warns
    # "could lead to execution errors such as SIGILL" on other machines.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

# On a core-starved host the 8 virtual devices serialize; raise XLA-CPU's
# collective rendezvous abort (default 20 s warn / 40 s terminate) so slow
# multi-device tests don't get SIGABRTed mid-collective.
from dynamicpdb_tpu.utils.platform import raise_cpu_collective_timeouts  # noqa: E402

raise_cpu_collective_timeouts()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the expensive tests are dominated by XLA
# compiles of the fused train step; repeat runs hit the cache and finish in
# seconds. Delete .cache/jax_tests to force fresh compiles.
from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".cache", "jax_tests")
)
