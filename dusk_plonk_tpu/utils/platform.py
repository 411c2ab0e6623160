"""Make jax honor the JAX_PLATFORMS env var.

The environment's TPU plugin registers itself from a sitecustomize hook in
every python process and calls ``jax.config.update("jax_platforms",
"axon,cpu")`` — which silently overrides a ``JAX_PLATFORMS=cpu`` env var set
by the test harness or the driver's multi-chip dry-run. When the TPU tunnel
is unreachable that override turns every CPU-only process into a hang inside
the plugin's client init.

``honor_env_platform()`` restores env-var semantics: if JAX_PLATFORMS is set
in the environment, the jax config is forced to match it before any backend
initializes. Call it before the first jax.devices()/jit in CPU-only entry
points (tests/conftest.py, __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    env = os.environ.get("JAX_PLATFORMS", "").strip()
    if not env:
        return
    import jax

    cfg = (jax.config.jax_platforms or "").split(",")
    want = env.split(",")
    # "axon" env vs "axon,cpu" config: the default backend already matches;
    # only intervene when the env's platforms are not a prefix of the config
    # (e.g. env "cpu" vs config "axon,cpu", which would init the TPU plugin).
    if cfg[: len(want)] != want:
        jax.config.update("jax_platforms", env)
