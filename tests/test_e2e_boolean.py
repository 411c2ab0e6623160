"""End-to-end prove+verify on the boolean circuit — the minimum slice from
SURVEY.md §7 step 5, mirroring reference tests/boolean.rs."""

import pytest

from dusk_plonk_tpu.prelude import (
    Plonk, PlonkKey, PlonkParams, Circuit, ChaCha12Rng, Error,
)


class BooleanCircuit(Circuit):
    def __init__(self, a=1):
        self.a = a

    def synthesize(self, composer: Plonk):
        w_a = composer.append_witness(self.a)
        composer.component_boolean(w_a)


def test_boolean_works():
    rng = ChaCha12Rng.seed_from_u64(8349)
    pp = PlonkParams.setup(4, rng)

    prover, verifier = PlonkKey.compile(pp, BooleanCircuit)

    for a in (1, 0):
        proof, public_inputs = prover.create_proof(rng, BooleanCircuit(a))
        verifier.verify(proof, public_inputs)  # raises on failure

    # negative: a = 2 is not boolean
    with pytest.raises(Error):
        prover.create_proof(rng, BooleanCircuit(2))


def test_tampered_proof_rejected():
    rng = ChaCha12Rng.seed_from_u64(8349)
    pp = PlonkParams.setup(4, rng)
    prover, verifier = PlonkKey.compile(pp, BooleanCircuit)
    proof, public_inputs = prover.create_proof(rng, BooleanCircuit(1))
    proof.evaluations["a_eval"] = (proof.evaluations["a_eval"] + 1) % \
        (2**255)
    with pytest.raises(Error):
        verifier.verify(proof, public_inputs)
