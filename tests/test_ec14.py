"""14-bit lazy-reduction EC kernel differential tests (ops/pallas_field.py
14-bit engine) — the 14-bit scan/sum kernels must match the 16-bit oracle
kernels up to the documented uniform 2^8 projective scale, including the
complete-addition edge cases (identity, doubling, inverse).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dusk_plonk_tpu.ops.pallas_field as pf
from dusk_plonk_tpu.ops.limb import FQ_SPEC, _int_to_limbs
from dusk_plonk_tpu.curves import bls

Q = FQ_SPEC.modulus
R16 = 1 << 384
R14 = 1 << 392
TILE = 128


def _pack(vals, scale):
    return np.stack(
        [_int_to_limbs(FQ_SPEC, v * scale % Q) for v in vals], axis=1)


def _unpack(arr):
    a = np.asarray(arr).astype("<u2")
    flat = np.moveaxis(a, -2, -1).reshape(-1, 24)
    return [int.from_bytes(r.tobytes(), "little") for r in flat]


def _rand_points(n, seed):
    import random
    random.seed(seed)
    out = []
    for i in range(n):
        k = random.randrange(2, 1 << 60)
        out.append(bls.g1_mul(bls.G1_GENERATOR, k))
    return out


def test_scan_mixed14_matches_16():
    cl, lanes = 6, TILE
    pts = _rand_points(cl * lanes, 7)
    # edge cases: repeated point in one lane's run (forces doubling),
    # and a point followed by its negation (forces identity)
    pts[1] = pts[0]
    pts[lanes + 1] = bls.g1_neg(pts[lanes])
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]

    def build(scale):
        gx = _pack(xs, scale).reshape(24, cl, lanes).transpose(1, 0, 2)
        gy = _pack(ys, scale).reshape(24, cl, lanes).transpose(1, 0, 2)
        return jnp.asarray(np.concatenate([gx, gy], axis=1))

    ps16 = pf.ec_scan_mixed(build(R16 % Q), interpret=True)
    psc = pf.ec_scan_mixed14(build(R14 % Q), interpret=True)
    ps14 = (psc[:, :24], psc[:, 24:48], psc[:, 48:])
    for c16, c14 in zip(ps16, ps14):
        v16 = _unpack(c16)
        v14 = _unpack(c14)
        assert all(b == a * (1 << 8) % Q for a, b in zip(v16, v14))


def test_sum_steps14_matches_16():
    steps, lanes = 5, TILE
    pts = _rand_points(steps * lanes, 11)
    pts[1] = pts[0]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    zs = [1] * len(pts)

    def build(scale):
        arrs = [_pack(v, scale).reshape(24, steps, lanes).transpose(1, 0, 2)
                for v in (xs, ys, zs)]
        return jnp.asarray(np.concatenate(arrs, axis=1))

    s16 = pf.ec_sum_steps(build(R16 % Q), interpret=True)
    s14c = pf.ec_sum_steps14(build(R16 % Q), interpret=True)
    s14 = (s14c[:24], s14c[24:48], s14c[48:])
    # both consume the same canonical rows; the 14-bit kernel returns the
    # same group element with every coordinate scaled by 2^-8 relative
    # interpretation — affine-compare
    inv16 = _unpack(s16[2])
    inv14 = _unpack(s14[2])
    x16, x14 = _unpack(s16[0]), _unpack(s14[0])
    y16, y14 = _unpack(s16[1]), _unpack(s14[1])
    rinv = pow(R16, -1, Q)
    for i in range(lanes):
        z16 = inv16[i] * rinv % Q
        z14 = inv14[i] * rinv % Q
        assert (z16 == 0) == (z14 == 0)
        if z16 == 0:
            continue
        assert (x16[i] * pow(inv16[i], -1, Q) % Q
                == x14[i] * pow(inv14[i], -1, Q) % Q)
        assert (y16[i] * pow(inv16[i], -1, Q) % Q
                == y14[i] * pow(inv14[i], -1, Q) % Q)


def test_msm_full_14_interpret():
    """End-to-end MSM through the forced 14-bit pipeline at a small size
    vs the host oracle (covers em pre-scaling + scan + bucket phases)."""
    from dusk_plonk_tpu.utils import config as cfgmod
    from dusk_plonk_tpu.ops.msm import MsmPlan
    from dusk_plonk_tpu.ops.ec import device_g1
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.fields.constants import R_MOD

    old = cfgmod.get_config()
    cfgmod.set_config(ec_limb14_force=True, msm_chunk_len=16,
                      msm_serial_max=16)
    try:
        # n=512, c=5 -> W=52 windows, nc=32 chunks, lanes=52*32=1664
        # (13 tiles of 128); NB=16 keeps the XLA bucket phase small on
        # the 1-core CPU test host
        n = 512
        plan = MsmPlan(n, window_bits=5)
        if not plan.use_pallas_scan:
            pytest.skip(f"lanes {plan.wg * (plan.n_pad // plan.chunk_len)}"
                        " not tile-divisible on this config")
        assert plan.use14
        import random
        random.seed(3)
        pts = _rand_points(n, 13)
        scal = [random.randrange(R_MOD) for _ in range(n)]
        G1 = device_g1()
        packed = G1.pack_points(pts)
        F = fr_field()
        limbs = F.pack(scal, to_mont=False)
        got = plan.msm_affine_batch(packed, limbs[None])[0]
        exp = bls.g1_msm(pts, scal)
        assert got == exp
    finally:
        cfgmod.set_config(**{f: getattr(old, f)
                             for f in old.__dataclass_fields__})


def test_scan_mixed14_em_layout_matches():
    """Element-major scan output == stacked output, re-laid-out."""
    cl, lanes = 4, TILE
    pts = _rand_points(cl * lanes, 17)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]

    def build():
        gx = _pack(xs, R14 % Q).reshape(24, cl, lanes).transpose(1, 0, 2)
        gy = _pack(ys, R14 % Q).reshape(24, cl, lanes).transpose(1, 0, 2)
        return jnp.asarray(np.concatenate([gx, gy], axis=1))

    g = build()
    psc = np.asarray(pf.ec_scan_mixed14(g, interpret=True))
    em = np.asarray(pf.ec_scan_mixed14_em(g, interpret=True))
    assert em.shape == (cl, lanes, 72)
    np.testing.assert_array_equal(em, psc.transpose(0, 2, 1))
