"""Differential tests of the fused EC scan/sum Pallas kernels
(ops/pallas_field.py ec_scan_mixed / ec_sum_steps) against the lax.scan
oracle — interpret mode on the CPU test host."""

import numpy as np
import jax
import jax.numpy as jnp

from dusk_plonk_tpu.curves import bls
from dusk_plonk_tpu.ops.ec import device_g1
from dusk_plonk_tpu.ops.limb import fq_field


def _points(n, seed):
    rng = np.random.default_rng(seed)
    pts = []
    acc = bls._jac_from_affine(bls.G1_GENERATOR)
    for _ in range(n):
        acc = bls._jac_double(acc) if rng.integers(2) else \
            bls._jac_add(acc, bls._jac_from_affine(bls.G1_GENERATOR))
        pts.append(bls._jac_to_affine(acc))
    return pts


def test_ec_scan_mixed_matches_lax_scan():
    from dusk_plonk_tpu.ops import pallas_field as pf
    G1 = device_g1()
    Fq = fq_field()
    cl, lanes = 4, 128
    pts = _points(cl * lanes, 1)
    px, py, _ = G1.pack_points(pts)                    # (L, cl*lanes)
    L = Fq.L
    g = jnp.concatenate(
        [px.reshape(L, cl, lanes).transpose(1, 0, 2),
         py.reshape(L, cl, lanes).transpose(1, 0, 2)], axis=1)  # (cl,2L,ln)

    got = jax.jit(lambda v: pf.ec_scan_mixed(v, interpret=True))(g)

    ident = G1.broadcast_identity((), lanes)
    xs = (g[:, :L], g[:, L:])

    def body(carry, x):
        nxt = G1.add_mixed(carry, x)
        return nxt, nxt

    _, want = jax.jit(
        lambda i, x: jax.lax.scan(body, i, x))(ident, xs)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ec_sum_steps_matches_lax_scan():
    from dusk_plonk_tpu.ops import pallas_field as pf
    G1 = device_g1()
    Fq = fq_field()
    steps, lanes = 3, 128
    pts = _points(steps * lanes, 2)
    px, py, pz = G1.pack_points(pts)
    L = Fq.L
    g = jnp.concatenate(
        [c.reshape(L, steps, lanes).transpose(1, 0, 2)
         for c in (px, py, pz)], axis=1)               # (steps, 3L, lanes)

    got = jax.jit(lambda v: pf.ec_sum_steps(v, interpret=True))(g)

    rows = tuple(c.reshape(L, steps, lanes).transpose(1, 0, 2)
                 for c in (px, py, pz))

    def body(acc, x):
        return G1.add(acc, x), None

    want, _ = jax.jit(lambda i, x: jax.lax.scan(body, i, x))(
        G1.broadcast_identity((), lanes), rows)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
