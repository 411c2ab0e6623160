"""Proof SCALE (de)serialization round-trip (reference derives
parity-scale-codec Encode/Decode at src/prover/proof.rs:36)."""

import pytest

from dusk_plonk_tpu.prelude import (
    PlonkKey, PlonkParams, Circuit, ChaCha12Rng, Error, Proof,
)
from tests.test_device_engine import BoolCircuit


def test_proof_scale_roundtrip():
    rng = ChaCha12Rng.seed_from_u64(8349)
    pp = PlonkParams.setup(4, rng)
    prover, verifier = PlonkKey.compile(pp, BoolCircuit)
    proof, pis = prover.create_proof(rng, BoolCircuit(1))

    raw = proof.to_bytes()
    assert len(raw) == 11 * 97 + 16 * 32  # 1579: fixed SCALE layout

    back = Proof.from_bytes(raw)
    assert back == proof
    verifier.verify(back, pis)

    # tamper: flipping any byte must break equality (and verification)
    bad = bytearray(raw)
    bad[100] ^= 1
    tampered = Proof.from_bytes(bytes(bad))
    assert tampered != proof
    with pytest.raises(Error):
        verifier.verify(tampered, pis)


def test_bad_length_rejected():
    with pytest.raises(ValueError):
        Proof.from_bytes(b"\x00" * 100)


def test_srs_scale_roundtrip():
    rng = ChaCha12Rng.seed_from_u64(8349)
    pp = PlonkParams.setup(4, rng)
    raw = pp.to_bytes()
    back = PlonkParams.from_bytes(raw)
    assert back.powers == pp.powers
    assert back.h == pp.h and back.beta_h == pp.beta_h
    assert back.to_bytes() == raw
    with pytest.raises(ValueError):
        PlonkParams.from_bytes(raw[:-1])


def test_verification_key_scale_roundtrip():
    from dusk_plonk_tpu.proving.keys import VerificationKey
    rng = ChaCha12Rng.seed_from_u64(8349)
    pp = PlonkParams.setup(4, rng)
    prover, verifier = PlonkKey.compile(pp, BoolCircuit)
    vk = verifier.verifier_key
    raw = vk.to_bytes()
    back = VerificationKey.from_bytes(raw)
    assert back == vk
    assert back.to_bytes() == raw
