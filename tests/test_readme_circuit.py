"""The reference README's TestCircuit (README.md:25-90), the BASELINE
"README TestCircuit at 2^12" config: a+b=c (c public), range checks on a
and b, a*b=d (d public), and f = [e]G on JubJub asserted against a public
point — all five gadget families through the real user API, proved on the
host oracle AND the device engine with identical bytes."""

from dusk_plonk_tpu.prelude import (
    PlonkKey, PlonkParams, Circuit, ChaCha12Rng, Constraint, jubjub,
)
from dusk_plonk_tpu.fields.constants import R_MOD


class TestCircuitReadme(Circuit):
    """Mirror of the README circuit (behavior, not code): 1) c = a + b,
    2) a < 2^6, 3) b < 2^5, 4) d = a * b, 5) f = [e]G as public point."""

    def __init__(self, a=1, b=3):
        self.a = a
        self.b = b
        self.c = a + b
        self.d = a * b
        self.e = 7
        self.f = jubjub.mul(jubjub.GENERATOR, 7)

    def synthesize(self, composer):
        a = composer.append_witness(self.a)
        b = composer.append_witness(self.b)
        composer.append_gate(
            Constraint().left(1).right(1)
            .public((-self.c) % R_MOD).a(a).b(b))
        composer.component_range(a, 6)
        composer.component_range(b, 5)
        composer.append_gate(
            Constraint().mult(1).public((-self.d) % R_MOD).a(a).b(b))
        e = composer.append_witness(self.e)
        result = composer.component_mul_generator(e, jubjub.GENERATOR)
        composer.assert_equal_public_point(result, self.f)


def test_readme_circuit_host_prove_verify():
    label = b"transcript-arguments"
    rng = ChaCha12Rng.seed_from_u64(8349)
    pp = PlonkParams.setup(12, rng)          # 2^12 SRS as in the README
    prover, verifier = PlonkKey.compile_with_circuit(
        pp, label, TestCircuitReadme())
    proof, pis = prover.create_proof(rng, TestCircuitReadme())
    verifier.verify(proof, pis)
    # four public inputs: c, d, and the two public point coordinates
    assert len(pis) == 4


def test_readme_circuit_device_matches_host():
    label = b"transcript-arguments"
    rng_h = ChaCha12Rng.seed_from_u64(8349)
    pp_h = PlonkParams.setup(12, rng_h)
    prover_h, verifier_h = PlonkKey.compile_with_circuit(
        pp_h, label, TestCircuitReadme())
    proof_h, pis_h = prover_h.create_proof(rng_h, TestCircuitReadme())

    rng_d = ChaCha12Rng.seed_from_u64(8349)
    pp_d = PlonkParams.setup_device(12, rng_d)
    from dusk_plonk_tpu.proving.keys import compile_circuit_device
    prover_d, verifier_d = compile_circuit_device(
        pp_d, TestCircuitReadme(), label)
    proof_d, pis_d = prover_d.create_proof(rng_d, TestCircuitReadme())

    assert pis_h == pis_d
    assert proof_h.to_bytes() == proof_d.to_bytes()
    verifier_d.verify(proof_d, pis_d)
