"""Differential test: the mesh-sharded prover vs the host oracle.

The sharded engine (proving/sharded_engine.py) distributes every hot
component — four-step NTTs, two-phase grand product, point-partitioned
MSM, GSPMD-partitioned quotient grid — over the simulated 8-device CPU
mesh, yet must produce proofs BYTE-IDENTICAL to the host exactness engine
(the mesh analogue of the reference's slow-vs-fast permutation oracle,
src/permutation.rs:957-1088; the parallelism it scales out is the
reference's rayon tier, Cargo.toml:42-48).

The circuit is sized so n = 64 >= D^2: the four-step all-to-all NTT path
engages (not the small-domain fallback), the 8n=512 coset grid is sharded
64-per-device, and the SRS padding path (ns = n+7, not a shard multiple)
is exercised.  ``msm_tier="bit_serial"`` keeps XLA:CPU compile bounded on
the 1-core host; the tier only changes the local MSM schedule, not one
bit of any group element (parallel/msm.py).
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from dusk_plonk_tpu.prelude import (
    Plonk, PlonkKey, PlonkParams, Circuit, ChaCha12Rng, Constraint,
)
from dusk_plonk_tpu.proving.sharded_engine import ShardedEngine


class WideCircuit(Circuit):
    """>32 gates so n = 64 and the four-step NTT engages at D = 8."""

    def __init__(self, a=3):
        self.a = a

    def synthesize(self, c):
        w = c.append_witness(self.a)
        c.component_boolean(c.append_witness(1))
        acc = w
        for _ in range(40):
            acc = c.gate_mul(Constraint().mult(1).a(acc).b(w))


def _proofs_equal(p1, p2):
    for f in ("a_comm", "b_comm", "c_comm", "d_comm", "z_comm",
              "t_low_comm", "t_mid_comm", "t_high_comm", "t_4_comm",
              "w_z_chall_comm", "w_z_chall_w_comm"):
        assert getattr(p1, f) == getattr(p2, f), f"mismatch at {f}"
    assert p1.evaluations == p2.evaluations


def test_sharded_proof_equals_host():
    rng_h = ChaCha12Rng.seed_from_u64(8349)
    pp_h = PlonkParams.setup(7, rng_h)
    prover_h, verifier = PlonkKey.compile(pp_h, WideCircuit)
    assert prover_h.size == 64

    rng_d = ChaCha12Rng.seed_from_u64(8349)
    pp_d = PlonkParams.setup(7, rng_d)
    prover_d, _ = PlonkKey.compile(pp_d, WideCircuit)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("shard",))
    prover_d.use_device_engine(
        ShardedEngine(prover_d, mesh=mesh, msm_tier="bit_serial"))

    proof_h, pis_h = prover_h.create_proof(rng_h, WideCircuit(3))
    proof_d, pis_d = prover_d.create_proof(rng_d, WideCircuit(3))

    assert pis_h == pis_d
    _proofs_equal(proof_h, proof_d)
    verifier.verify(proof_d, pis_d)
