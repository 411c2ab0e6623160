"""Public API surface, mirroring the reference prelude
(src/prelude.rs:12-20): Plonk, PlonkKey(compile), Prover, Verifier, Proof,
WitnessPoint, scalar types, Circuit, Error, Constraint."""

from .composer.composer import (
    Plonk, Circuit, WitnessPoint, Error, UnsupportedWNAF2k,
    InconsistentPublicInputsLen, ProofVerificationError, PairingCheckFailure,
)
from .composer.constraint import Constraint
from .proving.keys import compile_circuit, compile_circuit_device
from .proving.prover import Prover
from .proving.verifier import Verifier
from .proving.proof import Proof
from .kzg.srs import PlonkParams, EvaluationKey
from .rng.chacha import ChaCha12Rng, fr_random
from .fields.constants import R_MOD as BLS_SCALAR_MODULUS
from .curves import jubjub

# Scalar/point type names from the reference prelude (src/prelude.rs:12-20).
# Field elements are canonical Python ints and curve points are (x, y)
# tuples in this framework; the aliases keep reference-style imports
# (`from dusk_plonk_tpu.prelude import BlsScalar, JubjubAffine`) working.
BlsScalar = int
JubjubScalar = int
JubjubAffine = tuple
JubjubExtended = tuple


class PlonkKey:
    """Keypair compiler (reference src/key.rs PlonkKey)."""

    @staticmethod
    def compile(params: PlonkParams, circuit_cls, label: bytes = b"plonk"):
        return compile_circuit(params, circuit_cls(), label)

    @staticmethod
    def compile_with_circuit(params: PlonkParams, label: bytes, circuit):
        return compile_circuit(params, circuit, label)

    @staticmethod
    def compile_device(params: PlonkParams, circuit_cls,
                       label: bytes = b"plonk"):
        """Device (TPU) key compilation; returns a prover with the device
        engine attached."""
        return compile_circuit_device(params, circuit_cls(), label)


__all__ = [
    "Plonk", "PlonkKey", "Prover", "Verifier", "Proof", "WitnessPoint",
    "Circuit", "Constraint", "Error", "PlonkParams", "EvaluationKey",
    "ChaCha12Rng", "fr_random", "BLS_SCALAR_MODULUS", "jubjub",
    "UnsupportedWNAF2k", "InconsistentPublicInputsLen",
    "ProofVerificationError", "PairingCheckFailure", "compile_circuit",
    "compile_circuit_device", "BlsScalar", "JubjubScalar", "JubjubAffine",
    "JubjubExtended",
]
