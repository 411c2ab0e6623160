"""Weak-scaling harness for the mesh-sharded prover on the virtual CPU
mesh (D = 2/4/8): steady-state sharded proof wall time + collective
traffic counters per D, plus the analytic ICI projection for the same
shape (parallel/model.py).

CPU-mesh wall times measure CODE-PATH overhead (all D virtual devices
share one core), not ICI — the model column is the hardware projection;
the counter column validates the model's traffic terms.  Run:
  env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from dusk_plonk_tpu.utils.platform import honor_env_platform

honor_env_platform()

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.sharding import Mesh

from dusk_plonk_tpu.prelude import (
    PlonkKey, PlonkParams, Circuit, ChaCha12Rng, Constraint,
)
from dusk_plonk_tpu.proving.sharded_engine import ShardedEngine
from dusk_plonk_tpu.parallel.model import projected_efficiency
from dusk_plonk_tpu.utils.tracing import tracer


class WideCircuit(Circuit):
    def __init__(self, a=3):
        self.a = a

    def synthesize(self, c):
        w = c.append_witness(self.a)
        c.component_boolean(c.append_witness(1))
        acc = w
        for _ in range(40):
            acc = c.gate_mul(Constraint().mult(1).a(acc).b(w))


def run(d: int) -> dict:
    rng = ChaCha12Rng.seed_from_u64(8349)
    pp = PlonkParams.setup(7, rng)
    prover, verifier = PlonkKey.compile(pp, WideCircuit)
    mesh = Mesh(np.array(jax.devices()[:d]), axis_names=("shard",))
    prover.use_device_engine(
        ShardedEngine(prover, mesh=mesh, msm_tier="bit_serial"))
    proof, pis = prover.create_proof(rng, WideCircuit(3))   # compile
    verifier.verify(proof, pis)
    tracer.reset()
    t0 = time.perf_counter()
    prover.create_proof(rng, WideCircuit(3))
    dt = time.perf_counter() - t0
    return {
        "d": d,
        "proof_s_cpu_mesh": round(dt, 3),
        "collective_bytes": tracer.counters.get("collective_bytes", 0),
        "collective_ops": tracer.counters.get("collective_ops", 0),
        "model_2e20": projected_efficiency(20, d),
    }


def main():
    ds = [int(x) for x in (sys.argv[1:] or ["2", "4", "8"])]
    for d in ds:
        print(json.dumps(run(d)), flush=True)


if __name__ == "__main__":
    main()
