"""Differential test: the full device (JAX) prover vs the host oracle.

Because both paths share the transcript schedule and RNG draw order, a
device proof and a host proof from identical seeds must be IDENTICAL —
commitment-for-commitment, eval-for-eval (the device analogue of the
reference's slow-vs-fast permutation oracle, src/permutation.rs:957-1088).
"""

import pytest

from dusk_plonk_tpu.prelude import (
    Plonk, PlonkKey, PlonkParams, Circuit, ChaCha12Rng, Error,
)
from dusk_plonk_tpu.proving.engine import DeviceEngine


class BoolCircuit(Circuit):
    def __init__(self, a=1):
        self.a = a

    def synthesize(self, composer):
        w = composer.append_witness(self.a)
        composer.component_boolean(w)


class MixedCircuit(Circuit):
    """Arithmetic + range + logic + public input — four gate families."""

    def __init__(self, a=13, b=5):
        self.a = a
        self.b = b

    def synthesize(self, composer):
        from dusk_plonk_tpu.composer.constraint import Constraint
        w_a = composer.append_witness(self.a)
        w_b = composer.append_witness(self.b)
        from dusk_plonk_tpu.fields.constants import R_MOD
        prod = composer.gate_mul(Constraint().mult(1).a(w_a).b(w_b))
        # gate: q_l*prod + q_c + PI = 0  =>  PI = -(a*b)
        composer.assert_equal_constant(prod, 0, (-self.a * self.b) % R_MOD)
        composer.component_range(w_a, 6)
        composer.append_logic_and(w_a, w_b, 8)
        composer.append_logic_xor(w_a, w_b, 8)


def _proofs_equal(p1, p2):
    for f in ("a_comm", "b_comm", "c_comm", "d_comm", "z_comm",
              "t_low_comm", "t_mid_comm", "t_high_comm", "t_4_comm",
              "w_z_chall_comm", "w_z_chall_w_comm"):
        assert getattr(p1, f) == getattr(p2, f), f"mismatch at {f}"
    assert p1.evaluations == p2.evaluations


def test_device_proof_equals_host_boolean():
    rng_h = ChaCha12Rng.seed_from_u64(8349)
    pp_h = PlonkParams.setup(4, rng_h)
    prover_h, verifier = PlonkKey.compile(pp_h, BoolCircuit)

    rng_d = ChaCha12Rng.seed_from_u64(8349)
    pp_d = PlonkParams.setup(4, rng_d)
    prover_d, _ = PlonkKey.compile(pp_d, BoolCircuit)
    prover_d.use_device_engine(DeviceEngine(prover_d))

    proof_h, pis_h = prover_h.create_proof(rng_h, BoolCircuit(1))
    proof_d, pis_d = prover_d.create_proof(rng_d, BoolCircuit(1))

    assert pis_h == pis_d
    _proofs_equal(proof_h, proof_d)
    verifier.verify(proof_d, pis_d)

    # second proof from the same stream (jit reuse) still matches
    proof_h2, _ = prover_h.create_proof(rng_h, BoolCircuit(0))
    proof_d2, pis2 = prover_d.create_proof(rng_d, BoolCircuit(0))
    _proofs_equal(proof_h2, proof_d2)
    verifier.verify(proof_d2, pis2)


def test_device_proof_equals_host_mixed():
    rng_h = ChaCha12Rng.seed_from_u64(8349)
    pp_h = PlonkParams.setup(7, rng_h)
    prover_h, verifier = PlonkKey.compile(pp_h, MixedCircuit)

    rng_d = ChaCha12Rng.seed_from_u64(8349)
    pp_d = PlonkParams.setup(7, rng_d)
    prover_d, _ = PlonkKey.compile(pp_d, MixedCircuit)
    prover_d.use_device_engine(DeviceEngine(prover_d))

    proof_h, pis = prover_h.create_proof(rng_h, MixedCircuit(13, 5))
    proof_d, pis_d = prover_d.create_proof(rng_d, MixedCircuit(13, 5))
    assert pis == pis_d
    _proofs_equal(proof_h, proof_d)
    verifier.verify(proof_d, pis_d)


def test_device_negative_unsatisfied():
    rng = ChaCha12Rng.seed_from_u64(8349)
    pp = PlonkParams.setup(4, rng)
    prover, _ = PlonkKey.compile(pp, BoolCircuit)
    prover.use_device_engine(DeviceEngine(prover))
    with pytest.raises(Error):
        prover.create_proof(rng, BoolCircuit(2))
