"""dusk_plonk_tpu: a TPU-native PLONK proving system (BLS12-381 + KZG10)
with the full capability surface of KogarashiNetwork/dusk-plonk.

Layering (see SURVEY.md for the reference analysis this is built to):
  fields/ curves/ transcript/ rng/ — host exactness engine (bit-exact oracle)
  ops/                            — device (JAX/Pallas) limb kernels: Montgomery
                                    field mul, NTT, EC, Pippenger MSM
  poly/ kzg/ composer/ proving/   — the PLONK protocol stack
  parallel/                       — multi-chip sharding (mesh NTT / MSM)
"""

import os

# Persistent XLA compilation cache: the limb kernels compile slowly (remote
# TPU compiler) but are reused across every proof of the same circuit size.
_CACHE_DIR = os.environ.get(
    "DUSK_PLONK_TPU_JAX_CACHE",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
try:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - jax config names vary across versions
    pass
