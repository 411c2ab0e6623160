"""Test configuration.

Device-engine tests run on a simulated multi-device CPU mesh so sharding
logic is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; see __graft_entry__.py)."""

import os
import sys

# Force CPU with 8 virtual devices BEFORE jax initializes (the environment
# presets JAX_PLATFORMS=axon for the real TPU; tests run on the simulated
# mesh, bench.py uses the TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compilation cache: CPU XLA compiles dominate suite wall-time
# (shard_map programs take minutes each); cached across runs
import jax

# The environment's TPU sitecustomize hook overrides jax_platforms to
# "axon,cpu" in every process; force it back to the env var so tests never
# touch (or hang on) the TPU tunnel.
from dusk_plonk_tpu.utils.platform import honor_env_platform

honor_env_platform()

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
