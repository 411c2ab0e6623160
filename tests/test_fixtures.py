"""Challenge-stream known-answer fixtures.

Pins the full Fiat-Shamir challenge stream and SCALE proof bytes of the
seeded boolean test circuit (`StdRng::seed_from_u64(8349)` — the seed every
reference integration test uses, reference tests/boolean.rs:21-24) so that
any future cross-check against reference-produced bytes is a single diff
(docs/notes-bit-exactness.md).  Regenerate with REGEN_FIXTURES=1 after an
intentional protocol change.
"""

import json
import os

import pytest

from dusk_plonk_tpu.prelude import (
    Plonk, PlonkKey, PlonkParams, Circuit, ChaCha12Rng,
)
from dusk_plonk_tpu.transcript.plonk_transcript import PlonkTranscript

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "challenge_streams.json")


class BooleanCircuit(Circuit):
    def __init__(self, a=1):
        self.a = a

    def synthesize(self, composer: Plonk):
        w_a = composer.append_witness(self.a)
        composer.component_boolean(w_a)


def _capture_stream():
    """Prove the seeded boolean circuit recording every challenge draw."""
    stream = []
    orig = PlonkTranscript.challenge_scalar

    def recording(self, label):
        value = orig(self, label)
        stream.append({"label": label.decode(), "value": hex(value)})
        return value

    PlonkTranscript.challenge_scalar = recording
    try:
        rng = ChaCha12Rng.seed_from_u64(8349)
        pp = PlonkParams.setup(4, rng)
        prover, verifier = PlonkKey.compile(pp, BooleanCircuit)
        stream.clear()  # keep only the proving-time stream
        proof, pis = prover.create_proof(rng, BooleanCircuit(1))
        verifier_stream_start = len(stream)
        verifier.verify(proof, pis)
    finally:
        PlonkTranscript.challenge_scalar = orig
    return {
        "circuit": "boolean a=1 (reference tests/boolean.rs:19-92)",
        "seed": 8349,
        "k": 4,
        "prover_challenges": stream[:verifier_stream_start],
        "verifier_challenges": stream[verifier_stream_start:],
        "proof_scale_hex": proof.to_bytes().hex(),
        "public_inputs": [hex(p) for p in pis],
    }


def test_challenge_stream_fixture():
    got = _capture_stream()
    if os.environ.get("REGEN_FIXTURES"):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        with open(FIXTURE, "w") as f:
            json.dump(got, f, indent=1)
        pytest.skip("fixture regenerated")
    with open(FIXTURE) as f:
        want = json.load(f)
    assert got["prover_challenges"] == want["prover_challenges"]
    assert got["verifier_challenges"] == want["verifier_challenges"]
    assert got["proof_scale_hex"] == want["proof_scale_hex"]
    assert got["public_inputs"] == want["public_inputs"]
    # prover and verifier must derive the identical stream
    assert [c for c in got["prover_challenges"]] == \
        [c for c in got["verifier_challenges"][:len(got["prover_challenges"])]]
