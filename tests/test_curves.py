"""Curve and pairing tests (host exactness engine)."""

import random

from dusk_plonk_tpu.fields.constants import R_MOD, JUBJUB_FP, JUBJUB_COFACTOR
from dusk_plonk_tpu.curves import bls
from dusk_plonk_tpu.curves import jubjub as jj
from dusk_plonk_tpu.curves.pairing import pairing, multi_pairing_is_one
from dusk_plonk_tpu.fields.host import FQ12_ONE, fq12_mul, fq12_pow


G = bls.G1_GENERATOR
H = bls.G2_GENERATOR


def test_g1_group_law():
    assert bls.g1_is_on_curve(G)
    two_g = bls.g1_double(G)
    assert bls.g1_is_on_curve(two_g)
    assert bls.g1_add(G, G) == two_g
    assert bls.g1_add(two_g, bls.g1_neg(G)) == G
    assert bls.g1_add(G, None) == G
    assert bls.g1_add(G, bls.g1_neg(G)) is None
    assert bls.g1_mul(G, R_MOD) is None  # subgroup order
    assert bls.g1_mul(G, 5) == bls.g1_add(bls.g1_add(two_g, two_g), G)


def test_g1_msm_matches_naive():
    rnd = random.Random(7)
    pts = [bls.g1_mul(G, rnd.randrange(1, 2**40)) for _ in range(17)]
    scalars = [rnd.randrange(R_MOD) for _ in range(17)]
    expected = None
    for p, s in zip(pts, scalars):
        expected = bls.g1_add(expected, bls.g1_mul(p, s))
    assert bls.g1_msm(pts, scalars) == expected
    # zero scalars and identity points are skipped
    assert bls.g1_msm([G, None], [0, 5]) is None


def test_g1_serialization():
    for p in [G, bls.g1_mul(G, 12345), None]:
        b = bls.g1_to_bytes(p)
        assert len(b) == 48
        assert bls.g1_from_bytes(b) == p


def test_g2_group_law():
    assert bls.g2_is_on_curve(H)
    two_h = bls.g2_add(H, H)
    assert bls.g2_is_on_curve(two_h)
    assert bls.g2_mul(H, R_MOD) is None
    assert bls.g2_add(two_h, bls.g2_neg(H)) == H


def test_pairing_bilinearity():
    e = pairing(G, H)
    assert e != FQ12_ONE
    assert fq12_pow(e, R_MOD) == FQ12_ONE  # order r
    a, b = 5, 7
    lhs = pairing(bls.g1_mul(G, a), bls.g2_mul(H, b))
    assert lhs == fq12_pow(e, a * b)
    # e(aP, Q) * e(-aP, Q) == 1
    assert multi_pairing_is_one([
        (bls.g1_mul(G, a), H),
        (bls.g1_neg(bls.g1_mul(G, a)), H),
    ])


def test_pairing_kzg_shape():
    """The exact 2-pair check shape used by batch_check
    (reference src/commitment_scheme.rs:56-62): for a degree-1 'SRS'
    tau, verify e(W, tau*H) * e(C - z*W... ) == 1 via a toy opening."""
    tau = 12345
    z = 678
    y = 999  # f(z) where f(X) = c0 + c1 X
    c0, c1 = 111, 222
    y = (c0 + c1 * z) % R_MOD
    commit = bls.g1_mul(G, (c0 + c1 * tau) % R_MOD)     # [f(tau)]_1
    wit_scalar = c1  # (f(tau)-f(z))/(tau-z) = c1 for linear f
    w = bls.g1_mul(G, wit_scalar)
    # e(C - y*G + z*W, H) * e(-W, tau*H) == 1
    lhs1 = bls.g1_add(bls.g1_add(commit, bls.g1_neg(bls.g1_mul(G, y))),
                      bls.g1_mul(w, z))
    assert multi_pairing_is_one([
        (lhs1, H),
        (bls.g1_neg(w), bls.g2_mul(H, tau)),
    ])


def test_jubjub_group():
    g = jj.GENERATOR
    # pinned published dusk-jubjub GENERATOR (prime order: not killed by the
    # cofactor, killed by the subgroup order)
    assert g == (0x3FD2814C43AC65A6F1FBF02D0FD6CCE62E3EBB21FD6C54ED4DF7B7FFEC7BEACA,
                 0x12)
    assert jj.mul(g, JUBJUB_COFACTOR) != jj.IDENTITY
    assert jj.mul(g, JUBJUB_FP) == jj.IDENTITY
    assert jj.is_on_curve(g)
    assert jj.add(g, jj.IDENTITY) == g
    assert jj.add(g, jj.neg(g)) == jj.IDENTITY
    assert jj.mul(g, JUBJUB_FP * JUBJUB_COFACTOR) == jj.IDENTITY
    assert jj.double(g) == jj.mul(g, 2)


def test_jubjub_wnaf():
    for scalar in [1, 2, 5, 0xDEADBEEF, JUBJUB_FP - 1]:
        digits = jj.compute_windowed_naf(scalar, 2)
        assert len(digits) == 256
        assert all(d in (-1, 0, 1) for d in digits)
        acc = sum(d << i for i, d in enumerate(digits))
        assert acc == scalar % JUBJUB_FP
