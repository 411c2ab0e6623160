"""Integration suite mirroring the reference's tests/ directory
(boolean/select, range, logic, decomposition, ecc) — positive and negative
cases per gadget family, following the two-tier strategy of SURVEY.md §4.

Heavier circuits (fixed-base mul at 2^10+, 252-bit variable-base mul) are
marked slow; run with RUN_SLOW=1. They are also exercised by bench.py via
the device engine."""

import os

import pytest

from dusk_plonk_tpu.prelude import (
    Plonk, PlonkKey, PlonkParams, Circuit, ChaCha12Rng, Error, jubjub as jj,
)

slow = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="set RUN_SLOW=1 for big circuits")


def run_roundtrip(pp_k, circuit_cls, good, bad=None):
    rng = ChaCha12Rng.seed_from_u64(8349)
    pp = PlonkParams.setup(pp_k, rng)
    prover, verifier = PlonkKey.compile(pp, circuit_cls)
    for args in good:
        proof, pis = prover.create_proof(rng, circuit_cls(*args))
        verifier.verify(proof, pis)
    for args in (bad or []):
        with pytest.raises(Error):
            proof, pis = prover.create_proof(rng, circuit_cls(*args))
            verifier.verify(proof, pis)
    return prover, verifier


# -- select family (reference tests/boolean.rs select_works) -----------------

class SelectCircuit(Circuit):
    def __init__(self, bit=1, a=3, b=5):
        self.bit, self.a, self.b = bit, a, b
        self.res = a if bit == 1 else b
        self.rz = a if bit == 1 else 0
        self.r1 = b if bit == 1 else 1

    def synthesize(self, c: Plonk):
        w_bit = c.append_witness(self.bit)
        w_a = c.append_witness(self.a)
        w_b = c.append_witness(self.b)
        w_res = c.append_witness(self.res)
        w_rz = c.append_witness(self.rz)
        w_r1 = c.append_witness(self.r1)
        c.component_boolean(w_bit)
        r = c.component_select(w_bit, w_a, w_b)
        c.assert_equal(r, w_res)
        rz = c.component_select_zero(w_bit, w_a)
        r1 = c.component_select_one(w_bit, w_b)
        c.assert_equal(rz, w_rz)
        c.assert_equal(r1, w_r1)


def test_select_works():
    run_roundtrip(6, SelectCircuit,
                  good=[(1, 3, 5), (0, 3, 5)])


class SelectPointCircuit(Circuit):
    def __init__(self, bit=1):
        self.bit = bit
        self.pa = jj.mul(jj.GENERATOR, 13)
        self.pb = jj.mul(jj.GENERATOR, 17)

    def synthesize(self, c: Plonk):
        w_bit = c.append_witness(self.bit)
        c.component_boolean(w_bit)
        a = c.append_point(self.pa)
        b = c.append_point(self.pb)
        res = c.component_select_point(w_bit, a, b)
        expected = self.pa if self.bit == 1 else self.pb
        c.assert_equal_public_point(res, expected)
        ident = c.component_select_identity(w_bit, a)
        expected_i = self.pa if self.bit == 1 else jj.IDENTITY
        c.assert_equal_public_point(ident, expected_i)


def test_select_point_works():
    run_roundtrip(6, SelectPointCircuit, good=[(1,), (0,)])


# -- range (reference tests/range.rs) ------------------------------------------

class RangeCircuit(Circuit):
    BITS = 76

    def __init__(self, a=7):
        self.a = a

    def synthesize(self, c: Plonk):
        w_a = c.append_witness(self.a)
        c.component_range(w_a, self.BITS)


def test_range_works():
    from dusk_plonk_tpu.fields.constants import R_MOD
    run_roundtrip(5, RangeCircuit,
                  good=[((1 << 64) - 1,)],
                  bad=[((R_MOD - (1 << 77)),)])


def test_range_odd_bits_compile():
    class OddRange(RangeCircuit):
        BITS = 77
    rng = ChaCha12Rng.seed_from_u64(8349)
    pp = PlonkParams.setup(5, rng)
    PlonkKey.compile(pp, OddRange)  # must not raise


# -- logic (reference tests/logic.rs) --------------------------------------------

class AndCircuit(Circuit):
    BITS = 30

    def __init__(self, a=7, b=8, c_val=None):
        mask = (1 << self.BITS) - 1
        self.a = a & mask
        self.b = b & mask
        self.c = (self.a & self.b) if c_val is None else c_val

    def synthesize(self, c: Plonk):
        w_a = c.append_witness(self.a)
        w_b = c.append_witness(self.b)
        w_c = c.append_witness(self.c)
        w_x = c.append_logic_and(w_a, w_b, self.BITS)
        c.assert_equal(w_c, w_x)


class XorCircuit(Circuit):
    BITS = 30

    def __init__(self, a=7, b=8, c_val=None):
        mask = (1 << self.BITS) - 1
        self.a = a & mask
        self.b = b & mask
        self.c = (self.a ^ self.b) if c_val is None else c_val

    def synthesize(self, c: Plonk):
        w_a = c.append_witness(self.a)
        w_b = c.append_witness(self.b)
        w_c = c.append_witness(self.c)
        w_x = c.append_logic_xor(w_a, w_b, self.BITS)
        c.assert_equal(w_c, w_x)


def test_logic_and_works():
    run_roundtrip(6, AndCircuit,
                  good=[(0x2AF37B5, 0x1E0FF23), (0, 0)],
                  bad=[(0x2AF37B5, 0x1E0FF23, 12345)])


def test_logic_xor_works():
    run_roundtrip(6, XorCircuit,
                  good=[(0x2AF37B5, 0x1E0FF23)],
                  bad=[(0x2AF37B5, 0x1E0FF23, 54321)])


def test_logic_zero_bits():
    class ZeroBits(AndCircuit):
        BITS = 2
    run_roundtrip(5, ZeroBits, good=[(3, 2)])


# -- decomposition (reference tests/decomposition.rs, shrunk to 64 bits) -----------

class DecompositionCircuit(Circuit):
    N = 64

    def __init__(self, a=1):
        self.a = a

    def synthesize(self, c: Plonk):
        w_a = c.append_witness(self.a)
        c.component_decomposition(w_a, self.N)


def test_decomposition_works():
    run_roundtrip(8, DecompositionCircuit,
                  good=[(1,), ((1 << 64) - 1,)],
                  bad=[((1 << 65),)])  # exceeds N bits -> acc != scalar


@slow
def test_decomposition_256():
    class Full(DecompositionCircuit):
        N = 256
    run_roundtrip(10, Full, good=[(1,)])


# -- ecc (reference tests/ecc.rs) ---------------------------------------------------

class AddPointCircuit(Circuit):
    def __init__(self, k1=13, k2=17):
        self.p1 = jj.mul(jj.GENERATOR, k1) if k1 else jj.IDENTITY
        self.p2 = jj.mul(jj.GENERATOR, k2) if k2 else jj.IDENTITY
        self.expected = jj.add(self.p1, self.p2)

    def synthesize(self, c: Plonk):
        a = c.append_point(self.p1)
        b = c.append_point(self.p2)
        res = c.component_add_point(a, b)
        c.assert_equal_public_point(res, self.expected)


def test_add_point_works():
    run_roundtrip(4, AddPointCircuit,
                  good=[(13, 17), (0, 0), (13, 0)])


@slow
def test_mul_generator_works():
    class MulGen(Circuit):
        def __init__(self, scalar=2):
            self.scalar = scalar
            self.expected = jj.mul(jj.GENERATOR, scalar)

        def synthesize(self, c: Plonk):
            w = c.append_witness(self.scalar)
            res = c.component_mul_generator(w, jj.GENERATOR)
            c.assert_equal_public_point(res, self.expected)

    from dusk_plonk_tpu.fields.constants import JUBJUB_FP
    run_roundtrip(10, MulGen, good=[(2,), (JUBJUB_FP - 1,)])


@slow
def test_mul_point_works():
    class MulPoint(Circuit):
        def __init__(self, scalar=3):
            self.scalar = scalar
            self.p = jj.mul(jj.GENERATOR, 7)
            self.expected = jj.mul(self.p, scalar)

        def synthesize(self, c: Plonk):
            w = c.append_witness(self.scalar)
            p = c.append_point(self.p)
            res = c.component_mul_point(w, p)
            c.assert_equal_public_point(res, self.expected)

    run_roundtrip(13, MulPoint, good=[(3,)])


# -- public inputs --------------------------------------------------------------

class PublicInputCircuit(Circuit):
    def __init__(self, a=3, b=4):
        self.a, self.b = a, b
        self.sum = a + b

    def synthesize(self, c: Plonk):
        from dusk_plonk_tpu.composer.constraint import Constraint
        w_a = c.append_public(self.a)
        w_b = c.append_witness(self.b)
        s = c.gate_add(Constraint().left(1).right(1).a(w_a).b(w_b))
        c.assert_equal_constant(s, 0, -self.sum)


def test_public_inputs():
    prover, verifier = run_roundtrip(5, PublicInputCircuit,
                                     good=[(3, 4), (10, 1)])
    # wrong public input list length
    rng = ChaCha12Rng.seed_from_u64(99)
    proof, pis = prover.create_proof(rng, PublicInputCircuit(3, 4))
    with pytest.raises(Error):
        verifier.verify(proof, pis[:-1])
    # tampered public input value
    with pytest.raises(Error):
        bad = list(pis)
        bad[0] = (bad[0] + 1)
        verifier.verify(proof, bad)
