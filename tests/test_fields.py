"""Host field arithmetic unit tests, pinned against constants visible in the
mounted reference crate."""

import random

from dusk_plonk_tpu.fields.constants import (
    R_MOD, Q_MOD, FR_ROOT_OF_UNITY, FR_MONT_R,
)
from dusk_plonk_tpu.fields import host as F


def test_minus_one_montgomery_literal_matches_reference():
    # reference src/lib.rs:583-588 hard-codes (-1) in Montgomery form
    limbs = [0xFFFFFFFD00000003, 0xFB38EC08FFFB13FC,
             0x99AD88181CE5880F, 0x5BC8F5F97CD877D8]
    value = sum(l << (64 * i) for i, l in enumerate(limbs))
    assert value == (R_MOD - 1) * FR_MONT_R % R_MOD


def test_root_of_unity():
    w = F.fr_root_of_unity(32)
    assert w == FR_ROOT_OF_UNITY
    assert pow(w, 1 << 32, R_MOD) == 1
    assert pow(w, 1 << 31, R_MOD) == R_MOD - 1
    w8 = F.fr_root_of_unity(3)
    assert pow(w8, 8, R_MOD) == 1
    assert pow(w8, 4, R_MOD) != 1


def test_fr_ops_random():
    rnd = random.Random(0)
    for _ in range(50):
        a = rnd.randrange(R_MOD)
        b = rnd.randrange(R_MOD)
        assert F.fr_add(a, b) == (a + b) % R_MOD
        assert F.fr_sub(a, b) == (a - b) % R_MOD
        assert F.fr_mul(a, b) == a * b % R_MOD
        if a:
            assert F.fr_mul(a, F.fr_inv(a)) == 1


def test_fr_batch_inv():
    rnd = random.Random(1)
    vals = [rnd.randrange(1, R_MOD) for _ in range(20)]
    vals[3] = 0
    out = F.fr_batch_inv(vals)
    for v, o in zip(vals, out):
        if v == 0:
            assert o == 0
        else:
            assert v * o % R_MOD == 1


def test_fq2_tower():
    rnd = random.Random(2)
    for _ in range(20):
        a = (rnd.randrange(Q_MOD), rnd.randrange(Q_MOD))
        b = (rnd.randrange(Q_MOD), rnd.randrange(Q_MOD))
        assert F.fq2_mul(a, b) == F.fq2_mul(b, a)
        assert F.fq2_sq(a) == F.fq2_mul(a, a)
        ab = F.fq2_mul(a, F.fq2_inv(a))
        assert ab == (1, 0)
    # u^2 = -1
    u = (0, 1)
    assert F.fq2_mul(u, u) == (Q_MOD - 1, 0)


def test_fq6_fq12_tower():
    rnd = random.Random(3)
    def rand2():
        return (rnd.randrange(Q_MOD), rnd.randrange(Q_MOD))
    a6 = (rand2(), rand2(), rand2())
    b6 = (rand2(), rand2(), rand2())
    assert F.fq6_mul(a6, b6) == F.fq6_mul(b6, a6)
    assert F.fq6_mul(a6, F.fq6_inv(a6)) == F.FQ6_ONE
    a12 = (a6, b6)
    assert F.fq12_mul(a12, F.fq12_inv(a12)) == F.FQ12_ONE
    assert F.fq12_sq(a12) == F.fq12_mul(a12, a12)
    # Frobenius is the q-power map
    assert F.fq12_frobenius(a12) == F.fq12_pow(a12, Q_MOD)


def test_fr_bytes_roundtrip():
    v = 0x1234567890ABCDEF
    assert F.fr_from_bytes(F.fr_to_bytes(v)) == v
    wide = bytes(range(64))
    assert F.fr_from_bytes_wide(wide) == int.from_bytes(wide, "little") % R_MOD
