"""Real-TPU correctness smoke: device Pallas kernels vs host oracles.

Exercises the paths the CPU test suite can't (Pallas fires only on TPU):
Montgomery mul (Fr + Fq), fused EC add/add-mixed, the Pippenger MSM, and
one NTT ladder — each checked against the pure-host implementation.
Run: python tools/tpu_smoke.py  (needs the axon TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dusk_plonk_tpu.ops.limb import fr_field, fq_field
from dusk_plonk_tpu.ops.ec import device_g1
from dusk_plonk_tpu.ops.msm import msm_plan
from dusk_plonk_tpu.ops.ntt import ntt_plan
from dusk_plonk_tpu.fields.constants import R_MOD, Q_MOD
from dusk_plonk_tpu.curves import bls
from dusk_plonk_tpu.poly.domain import Domain

assert jax.devices()[0].platform == "tpu", "needs the TPU"

rng = np.random.default_rng(4242)


def rand_mod(m, n):
    return [int.from_bytes(rng.bytes(48), "little") % m for _ in range(n)]


def check(name, ok):
    print(("PASS " if ok else "FAIL ") + name, flush=True)
    if not ok:
        sys.exit(1)


# --- field muls (n >= 512 lanes routes through the Pallas kernel) ----------
for F, mod, label in ((fr_field(), R_MOD, "fr"), (fq_field(), Q_MOD, "fq")):
    n = 1024
    av = rand_mod(mod, n)
    bv = rand_mod(mod, n)
    out = F.unpack(F._jit_mul(F.pack(av), F.pack(bv)))
    exp = [a * b % mod for a, b in zip(av, bv)]
    check(f"pallas mont_mul {label} (n={n})", out == exp)

# --- EC add + add_mixed (lanes >= 128 routes through Pallas) ----------------
G1 = device_g1()
n = 256
sc = rand_mod(R_MOD, 2 * n)
pts = [bls.g1_mul(bls.G1_GENERATOR, s) for s in sc]
P, Q = pts[:n], pts[n:]
dev = G1.add(G1.pack_points(P), G1.pack_points(Q))
got = G1.unpack_points(dev)
exp = [bls._jac_to_affine(bls._jac_add(bls._jac_from_affine(p),
                                       bls._jac_from_affine(q)))
       for p, q in zip(P, Q)]
check(f"pallas ec_add (n={n})", got == exp)

qx, qy, _ = G1.pack_points(Q)
dev = G1.add_mixed(G1.pack_points(P), (qx, qy))
got = G1.unpack_points(dev)
check(f"pallas ec_add_mixed (n={n})", got == exp)

# --- MSM vs host Pippenger ---------------------------------------------------
n = 2048
sc = rand_mod(R_MOD, n)
base = [bls.g1_mul(bls.G1_GENERATOR, s) for s in rand_mod(R_MOD, 64)]
points = [base[i % 64] if i % 64 else bls.G1_GENERATOR for i in range(n)]
plan = msm_plan(n)
got = plan.msm(G1.pack_points(points), sc)
exp = bls.g1_msm(points, sc)
check(f"pallas msm (n={n})", got == exp)

# --- NTT ladder vs host domain ----------------------------------------------
k = 12
nn = 1 << k
F = fr_field()
vals = rand_mod(R_MOD, nn)
plan = ntt_plan(k)
got = F.unpack(plan.coset_dft(F.pack(vals)))
dom = Domain(k)
exp = dom.coset_dft(vals)
check(f"pallas ntt coset_dft (k={k})", got == exp)

print("all TPU smoke checks passed")
