"""Differential tests: C++ native engine vs the pure-Python host oracle
(the slow-vs-fast pattern from reference src/permutation.rs:957-1088)."""

import pytest

from dusk_plonk_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


def test_keccak_matches_python():
    from dusk_plonk_tpu.transcript.keccak import keccak_f1600 as py_keccak
    import os
    for seed in (b"\x00" * 200, bytes(range(200)), os.urandom(200)):
        a = bytearray(seed)
        b = bytearray(seed)
        py_keccak(a)
        native.keccak_f1600(b)
        assert a == b


def test_chacha_matches_python():
    from dusk_plonk_tpu.rng.chacha import chacha_block
    key = [0x11111111 * (i + 1) & 0xFFFFFFFF for i in range(8)]
    for counter in (0, 1, 2**33):
        py = []
        for i in range(4):
            py += chacha_block(key, counter + i, (0, 0), 12)
        nat = native.chacha_blocks(key, counter, (0, 0), 12, 4)
        assert py == nat


def test_msm_matches_python():
    from dusk_plonk_tpu.curves import bls
    from dusk_plonk_tpu.fields.constants import R_MOD
    import random
    rnd = random.Random(42)
    pts = []
    acc = bls._jac_from_affine(bls.G1_GENERATOR)
    for _ in range(40):
        pts.append(bls._jac_to_affine(acc))
        acc = bls._jac_add(acc, bls._jac_from_affine(bls.G1_GENERATOR))
    pts[7] = None
    scalars = [rnd.randrange(R_MOD) for _ in range(40)]
    scalars[3] = 0
    assert native.g1_msm(pts, scalars) == bls.g1_msm(pts, scalars)
    assert native.g1_msm([None], [5]) is None


def test_pairing_matches_python():
    from dusk_plonk_tpu.curves import bls, pairing as pp
    from dusk_plonk_tpu.fields.constants import Q_MOD
    g2 = bls.G2_GENERATOR
    acc = bls._jac_from_affine(bls.G1_GENERATOR)
    for _ in range(14):
        acc = bls._jac_double(acc)
    a = bls._jac_to_affine(acc)
    neg_a = (a[0], (Q_MOD - a[1]) % Q_MOD)
    pairs = [(a, g2), (neg_a, g2)]
    # full Miller-loop value equality, then the is_one fast path both ways
    assert native.miller_loop(pairs) == pp.miller_loop(pairs)
    assert native.final_exp(pp.miller_loop(pairs)) == \
        pp.final_exponentiation(pp.miller_loop(pairs))
    assert native.pairing_is_one(pairs)
    assert not native.pairing_is_one([(a, g2), (a, g2)])
    # infinity handling mirrors the Python oracle (skipped pair)
    assert native.pairing_is_one([(a, g2), (neg_a, g2), (None, g2)])


def test_ntt_matches_python():
    from dusk_plonk_tpu.poly.domain import Domain
    from dusk_plonk_tpu.fields.constants import R_MOD
    import random
    rnd = random.Random(1)
    dom = Domain(6)
    vals = [rnd.randrange(R_MOD) for _ in range(64)]
    assert native.fr_ntt(vals, dom.generator) == dom.dft(vals)
    assert native.fr_scale_geo(vals, 7, 3) == \
        [v * 7 % R_MOD * pow(3, i, R_MOD) % R_MOD
         for i, v in enumerate(vals)]


def test_prepared_pairing_matches_unprepared():
    """dn_g2_prepare + dn_pairing_is_one_prepared vs the affine-loop path
    (the prepared form is the production verifier path; reference
    EvaluationKey prepared_h/prepared_beta_h, commitment_scheme.rs:51-58)."""
    from dusk_plonk_tpu.curves import bls
    from dusk_plonk_tpu.curves.pairing import multi_pairing_is_one
    import random
    rnd = random.Random(11)
    assert native.has_prepared_pairing()
    g1, g2 = bls.G1_GENERATOR, bls.G2_GENERATOR
    k = rnd.randrange(2, 1 << 200)
    kP = bls.g1_mul(g1, k)
    kQ = bls.g2_mul(g2, k)
    cases = [
        ([(kP, g2), (bls.g1_neg(g1), kQ)], True),
        ([(kP, g2), (g1, kQ)], False),
        ([(None, g2), (kP, g2), (bls.g1_neg(g1), kQ)], True),
    ]
    for pairs, expect in cases:
        pre = [native.g2_prepare(q) for _, q in pairs]
        got = native.pairing_is_one_prepared([p for p, _ in pairs], pre)
        assert got == expect
        assert native.pairing_is_one(pairs) == expect
        assert multi_pairing_is_one(pairs) == expect


def test_small_msm_straus_matches_oracle():
    """The m<=32 Straus branch of dn_g1_msm (the verifier's MSM sizes)."""
    from dusk_plonk_tpu.curves import bls
    from dusk_plonk_tpu.fields.constants import R_MOD
    import random
    rnd = random.Random(13)
    for m in (1, 2, 9, 13, 32):
        pts = [bls.g1_mul(bls.G1_GENERATOR, rnd.randrange(2, 1 << 60))
               for _ in range(m)]
        scal = [rnd.randrange(R_MOD) for _ in range(m)]
        scal[0] = 0
        acc = None
        for p, s in zip(pts, scal):
            q = bls.g1_mul(p, s)
            acc = q if acc is None else bls.g1_add(acc, q)
        assert native.g1_msm(pts, scal) == acc
