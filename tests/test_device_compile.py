"""Device key-compilation + device SRS differential tests: same seeds must
produce identical SRS, identical verification-key commitments, and
identical proofs as the all-host path (reference compile trace
src/key.rs:63-327)."""

from dusk_plonk_tpu.prelude import (
    PlonkKey, PlonkParams, Circuit, ChaCha12Rng,
)
from tests.test_device_engine import BoolCircuit, MixedCircuit, _proofs_equal


def test_setup_device_matches_host():
    rng_h = ChaCha12Rng.seed_from_u64(8349)
    pp_h = PlonkParams.setup(5, rng_h)
    rng_d = ChaCha12Rng.seed_from_u64(8349)
    pp_d = PlonkParams.setup_device(5, rng_d)
    assert pp_h.powers == pp_d.powers
    assert pp_h.h == pp_d.h
    assert pp_h.beta_h == pp_d.beta_h


def test_compile_device_matches_host():
    rng_h = ChaCha12Rng.seed_from_u64(8349)
    pp_h = PlonkParams.setup(7, rng_h)
    prover_h, verifier_h = PlonkKey.compile(pp_h, MixedCircuit)

    rng_d = ChaCha12Rng.seed_from_u64(8349)
    pp_d = PlonkParams.setup_device(7, rng_d)
    prover_d, verifier_d = PlonkKey.compile_device(pp_d, MixedCircuit)

    assert prover_h.verifier_key.commitments == \
        prover_d.verifier_key.commitments

    proof_h, pis = prover_h.create_proof(rng_h, MixedCircuit(13, 5))
    proof_d, pis_d = prover_d.create_proof(rng_d, MixedCircuit(13, 5))
    assert pis == pis_d
    _proofs_equal(proof_h, proof_d)
    verifier_d.verify(proof_d, pis_d)
    verifier_h.verify(proof_d, pis)
