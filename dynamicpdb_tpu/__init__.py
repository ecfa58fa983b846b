"""dynamicpdb_tpu: TPU-native SE(3) trajectory-diffusion framework.

From-scratch JAX/XLA/Pallas rebuild of the dynamicPDB/DFOLD trajectory
prediction stack. See README.md and COVERAGE.md for the component map.
"""

__version__ = "0.1.0"

from dynamicpdb_tpu.config import Config, apply_overrides, load_yaml  # noqa: F401
