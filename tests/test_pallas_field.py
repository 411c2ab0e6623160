"""Pallas Montgomery-mul kernel vs the XLA/host oracles (interpret mode on
the CPU suite; bench.py exercises the compiled kernel on real TPU)."""

import numpy as np
import jax

from dusk_plonk_tpu.ops.limb import fr_field, fq_field
from dusk_plonk_tpu.ops import pallas_field as pf
from dusk_plonk_tpu.fields.constants import R_MOD, Q_MOD


def test_pallas_fr_mul_matches_oracle():
    F = fr_field()
    rng = np.random.default_rng(3)
    a = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(512)]
    b = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(512)]
    a[0] = 0
    b[1] = R_MOD - 1
    pa, pb = F.pack(a), F.pack(b)
    got = F.unpack(pf.mont_mul(F.spec, pa, pb))
    assert got == [x * y % R_MOD for x, y in zip(a, b)]


def test_pallas_fq_mul_matches_oracle():
    F = fq_field()
    rng = np.random.default_rng(4)
    a = [int.from_bytes(rng.bytes(48), "little") % Q_MOD for _ in range(512)]
    b = [int.from_bytes(rng.bytes(48), "little") % Q_MOD for _ in range(512)]
    a[2] = Q_MOD - 1
    b[2] = Q_MOD - 1
    pa, pb = F.pack(a), F.pack(b)
    got = F.unpack(pf.mont_mul(F.spec, pa, pb))
    assert got == [x * y % Q_MOD for x, y in zip(a, b)]


def test_pallas_ec_add_matches_oracle():
    """Fused EC-add kernel vs host Jacobian arithmetic, including the
    complete-addition special cases (P+P, P+(-P), P+O, O+O)."""
    from dusk_plonk_tpu.ops.ec import device_g1
    from dusk_plonk_tpu.curves import bls

    G1 = device_g1()
    G = bls.G1_GENERATOR
    pts_p, pts_q, expected = [], [], []
    acc = G
    for i in range(256):
        nxt = bls.g1_add(acc, G)
        pts_p.append(acc)
        pts_q.append(nxt)
        expected.append(bls.g1_add(acc, nxt))
        acc = nxt
    pts_p[0] = None            # O + Q
    expected[0] = pts_q[0]
    pts_q[1] = None            # P + O
    expected[1] = pts_p[1]
    pts_q[2] = pts_p[2]        # P + P
    expected[2] = bls.g1_double(pts_p[2])
    pts_q[3] = bls.g1_neg(pts_p[3])  # P + (-P)
    expected[3] = None
    pts_p[4] = None            # O + O
    pts_q[4] = None
    expected[4] = None

    dp = G1.pack_points(pts_p)
    dq = G1.pack_points(pts_q)
    out = pf.ec_add(dp, dq)
    got = G1.unpack_points(out)
    assert got == expected


def test_pallas_tiling_grid():
    """Multi-tile grid (n=1024 -> 2 tiles at 512 or 1 at 1024)."""
    F = fr_field()
    rng = np.random.default_rng(5)
    a = [int.from_bytes(rng.bytes(32), "little") % R_MOD
         for _ in range(2048)]
    pa = F.pack(a)
    got = F.unpack(pf.mont_mul(F.spec, pa, pa))
    assert got == [x * x % R_MOD for x in a]


def test_ntt_ladder_matches_xla_path():
    """Fused pallas butterfly ladder (interpret mode) vs the rolled-XLA
    stage loop on the same stacked twiddle tables."""
    import jax.numpy as jnp
    import numpy as np
    from dusk_plonk_tpu.ops import pallas_field as pf
    from dusk_plonk_tpu.ops.ntt import ntt_plan
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.fields.constants import R_MOD

    k = 11  # n=2048: one local pass (tile 1024) + one global stage
    plan = ntt_plan(k)
    assert plan.stacked
    F = fr_field()
    rng = np.random.default_rng(7)
    vals = [int.from_bytes(rng.bytes(32), "little") % R_MOD
            for _ in range(2 * plan.n)]
    x = F.pack(vals, shape=(2, plan.n))

    # oracle: the XLA rolled loop (pallas off on CPU)
    want = plan._transform(x, plan.tw_fwd, plan.scale_one, plan.scale_one)

    xb = F.mul(x, plan.scale_one)
    xb = jnp.take(xb, plan.bitrev, axis=-1)
    got = pf.ntt_ladder(xb, plan.tw_fwd, k, interpret=True)
    got = F.mul(got, plan.scale_one)
    assert F.unpack(got) == F.unpack(want)
