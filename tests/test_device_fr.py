"""Differential tests: device (JAX limb) field engine vs the host int oracle
— the slow-vs-fast oracle pattern the reference uses for its permutation
argument (src/permutation.rs:957-1088), applied to every device kernel."""

import random

import numpy as np
import jax.numpy as jnp

from dusk_plonk_tpu.fields.constants import R_MOD, Q_MOD
from dusk_plonk_tpu.ops.limb import fr_field, fq_field


def rand_list(rnd, mod, n):
    return [rnd.randrange(mod) for _ in range(n)]


def test_fr_pack_roundtrip():
    F = fr_field()
    rnd = random.Random(11)
    vals = rand_list(rnd, R_MOD, 33) + [0, 1, R_MOD - 1]
    packed = F.pack(vals)
    assert F.unpack(packed) == vals
    raw = F.pack(vals, to_mont=False)
    assert F.unpack(raw, from_mont=False) == vals


def test_fr_mul_matches_host():
    F = fr_field()
    rnd = random.Random(12)
    a = rand_list(rnd, R_MOD, 64) + [0, 1, R_MOD - 1, R_MOD - 1]
    b = rand_list(rnd, R_MOD, 64) + [R_MOD - 1, R_MOD - 1, 1, R_MOD - 1]
    pa, pb = F.pack(a), F.pack(b)
    out = F.unpack(F.mul(pa, pb))
    assert out == [(x * y) % R_MOD for x, y in zip(a, b)]


def test_fr_add_sub_neg():
    F = fr_field()
    rnd = random.Random(13)
    a = rand_list(rnd, R_MOD, 50) + [0, R_MOD - 1]
    b = rand_list(rnd, R_MOD, 50) + [0, R_MOD - 1]
    pa, pb = F.pack(a), F.pack(b)
    assert F.unpack(F.add(pa, pb)) == [(x + y) % R_MOD for x, y in zip(a, b)]
    assert F.unpack(F.sub(pa, pb)) == [(x - y) % R_MOD for x, y in zip(a, b)]
    assert F.unpack(F.neg(pa)) == [(-x) % R_MOD for x in a]


def test_fr_pow_inv():
    F = fr_field()
    rnd = random.Random(14)
    a = rand_list(rnd, R_MOD, 8)
    pa = F.pack(a)
    assert F.unpack(F.pow_const(pa, 5)) == [pow(x, 5, R_MOD) for x in a]
    inv = F.unpack(F.inv(pa))
    assert all(x * y % R_MOD == 1 for x, y in zip(a, inv))


def test_fr_batch_inv():
    F = fr_field()
    rnd = random.Random(15)
    a = rand_list(rnd, R_MOD, 37)
    a[5] = 0
    out = F.unpack(F.batch_inv(F.pack(a)))
    for x, y in zip(a, out):
        assert (y == 0) if x == 0 else (x * y % R_MOD == 1)


def test_fq_mul_matches_host():
    F = fq_field()
    rnd = random.Random(16)
    a = rand_list(rnd, Q_MOD, 32) + [0, 1, Q_MOD - 1]
    b = rand_list(rnd, Q_MOD, 32) + [Q_MOD - 1, Q_MOD - 1, Q_MOD - 1]
    out = F.unpack(F.mul(F.pack(a), F.pack(b)))
    assert out == [(x * y) % Q_MOD for x, y in zip(a, b)]
    pa = F.pack(a)
    assert F.unpack(F.sub(pa, F.pack(b))) == \
        [(x - y) % Q_MOD for x, y in zip(a, b)]


def test_broadcasting():
    F = fr_field()
    a = F.pack([5, 7, 11])
    s = F.pack_scalar(3)
    assert F.unpack(F.mul(a, s)) == [15, 21, 33]
    # 2D batch
    m = F.pack([1, 2, 3, 4], shape=(2, 2))
    out = F.unpack(F.mul(m, s))
    assert out == [3, 6, 9, 12]
