"""Direct unit tests of the re-derived gate-family formulas
(dusk_plonk_tpu/proving/widgets.py) — completeness AND soundness, so the
formulas are pinned independently of full proofs."""

import itertools
import random

from dusk_plonk_tpu.fields.constants import R_MOD, JUBJUB_D
from dusk_plonk_tpu.proving import widgets
from dusk_plonk_tpu.proving.widgets import HostOps as ops
from dusk_plonk_tpu.curves import jubjub as jj


def test_arithmetic_quotient():
    # 6*7*1 + 6*2 + 7*3 + (-20)*4 + 1*1 + 4 = 0 (the reference dummy gate)
    v = widgets.arithmetic_quotient(
        ops, 1, 2, 3, 4, 4, 1, 1, 6, 7, R_MOD - 20, 1)
    assert v == 0
    # unsatisfied -> nonzero
    v = widgets.arithmetic_quotient(ops, 1, 2, 3, 4, 4, 1, 1, 6, 7, 0, 1)
    assert v != 0
    # q_arith = 0 disables the gate
    v = widgets.arithmetic_quotient(ops, 1, 2, 3, 4, 4, 1, 0, 6, 7, 0, 1)
    assert v == 0


def test_range_quotient_digits():
    sep = 0xABCDEF
    # valid accumulator chain: d -> c -> b -> a -> d_next, each step base-4
    d, c, b, a = 1, 1 * 4 + 2, (1 * 4 + 2) * 4 + 3, ((1 * 4 + 2) * 4 + 3) * 4
    d_next = a * 4 + 1
    assert widgets.range_quotient(ops, 1, sep, a, b, c, d, d_next) == 0
    # digit out of range
    bad_c = d * 4 + 5
    assert widgets.range_quotient(ops, 1, sep, a, b, bad_c, d, d_next) != 0


def test_logic_quotient_truth_tables():
    """Exhaustive over all 16 quad pairs for both AND (q_c=+1) and
    XOR (q_c=-1): zero iff the output quad and product witness are right."""
    sep = 0x1234567
    for qa, qb in itertools.product(range(4), repeat=2):
        for q_c, op in ((1, lambda x, y: x & y), (R_MOD - 1, lambda x, y: x ^ y)):
            qd = op(qa, qb)
            w = qa * qb
            # accumulators: prev values arbitrary, next = 4*prev + quad
            a, b, d = 5, 9, 13
            a_n, b_n, d_n = 4 * a + qa, 4 * b + qb, 4 * d + qd
            v = widgets.logic_quotient(ops, 1, q_c, sep,
                                       a, a_n, b, b_n, w, d, d_n)
            assert v == 0, (qa, qb, q_c)
            # wrong output quad -> nonzero
            for wrong in range(4):
                if wrong == qd:
                    continue
                v = widgets.logic_quotient(
                    ops, 1, q_c, sep, a, a_n, b, b_n, w, d, 4 * d + wrong)
                assert v != 0, (qa, qb, wrong, q_c)


def test_fixed_base_quotient_group_law():
    """One wNAF round on real JubJub points for each digit in {-1,0,1}."""
    sep = 0xFEDCBA
    g = jj.GENERATOR
    beta = jj.double(jj.double(g))          # the 2^i multiple for this round
    x_beta, y_beta = beta
    xy_beta = x_beta * y_beta % R_MOD
    acc_point = jj.mul(g, 77)
    acc_scalar = 41
    for digit in (-1, 0, 1):
        if digit == 0:
            to_add = jj.IDENTITY
        elif digit == 1:
            to_add = beta
        else:
            to_add = jj.neg(beta)
        nxt = jj.add(acc_point, to_add)
        xy_alpha = to_add[0] * to_add[1] % R_MOD
        acc_next_scalar = (2 * acc_scalar + digit) % R_MOD
        v = widgets.fixed_base_quotient(
            ops, 1, x_beta, y_beta, xy_beta, sep,
            acc_point[0], nxt[0], acc_point[1], nxt[1],
            xy_alpha, acc_scalar, acc_next_scalar)
        assert v == 0, digit
        # wrong next point
        bad = jj.add(nxt, beta)
        v = widgets.fixed_base_quotient(
            ops, 1, x_beta, y_beta, xy_beta, sep,
            acc_point[0], bad[0], acc_point[1], bad[1],
            xy_alpha, acc_scalar, acc_next_scalar)
        assert v != 0
        # digit out of {-1,0,1}
        v = widgets.fixed_base_quotient(
            ops, 1, x_beta, y_beta, xy_beta, sep,
            acc_point[0], nxt[0], acc_point[1], nxt[1],
            xy_alpha, acc_scalar, (2 * acc_scalar + 2) % R_MOD)
        assert v != 0


def test_variable_base_quotient_group_law():
    sep = 0x13579B
    p1 = jj.mul(jj.GENERATOR, 23)
    p2 = jj.mul(jj.GENERATOR, 59)
    p3 = jj.add(p1, p2)
    x1y2 = p1[0] * p2[1] % R_MOD
    v = widgets.variable_base_quotient(
        ops, 1, sep, p1[0], p3[0], p1[1], p3[1], p2[0], p2[1], x1y2)
    assert v == 0
    bad = jj.add(p3, p1)
    v = widgets.variable_base_quotient(
        ops, 1, sep, p1[0], bad[0], p1[1], bad[1], p2[0], p2[1], x1y2)
    assert v != 0
    # wrong x1*y2 witness
    v = widgets.variable_base_quotient(
        ops, 1, sep, p1[0], p3[0], p1[1], p3[1], p2[0], p2[1],
        (x1y2 + 1) % R_MOD)
    assert v != 0


def test_permutation_quotient_telescopes():
    """Over a tiny domain with identity wiring, z == 1 everywhere satisfies
    the permutation check."""
    from dusk_plonk_tpu.poly.domain import Domain
    from dusk_plonk_tpu.fields.constants import PERM_K1, PERM_K2, PERM_K3
    rnd = random.Random(5)
    dom = Domain(2)
    alpha, beta, gamma = (rnd.randrange(R_MOD) for _ in range(3))
    roots = dom.elements
    for i in range(dom.size):
        x = roots[i]
        # identity sigma: sigma_j(x) = K_j * x
        v = widgets.permutation_quotient(
            ops, x, x, PERM_K1 * x % R_MOD, PERM_K2 * x % R_MOD,
            PERM_K3 * x % R_MOD,
            7, 8, 9, 10, 1, 1, alpha, 0, beta, gamma)
        assert v == 0
