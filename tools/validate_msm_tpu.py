"""On-chip validation + timing of the fused-scan MSM.

Correctness: MSM linearity — msm(s) + msm(t) == msm((s + t) mod r) as
affine points, over random scalars.  Exercises digits/sort/gather/fused
scan/bucket reduce/combine with three independent digit patterns; any
corruption breaks the group identity with overwhelming probability.
Also checks msm(e_i) == P_i for a few unit vectors (exact anchor).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _random_points
from dusk_plonk_tpu.ops.msm import msm_plan
from dusk_plonk_tpu.ops.limb import fr_field
from dusk_plonk_tpu.ops.ec import device_g1
from dusk_plonk_tpu.fields.constants import R_MOD

N = int(os.environ.get("VAL_N", 1 << 16))
rng = np.random.default_rng(8349)
points = _random_points(N, rng)
plan = msm_plan(N)
G1 = device_g1()
F = fr_field()
em = plan.prepare_points(points)

s = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(N)]
t = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(N)]
st = [(a + b) % R_MOD for a, b in zip(s, t)]

ls = F.pack(s, to_mont=False)
lt = F.pack(t, to_mont=False)
lst = F.pack(st, to_mont=False)

ps = plan.msm_affine_batch(em, jnp.stack([ls, lt, lst]))
import dusk_plonk_tpu.curves.bls as bls
lhs = bls.g1_add_affine(ps[0], ps[1]) if hasattr(bls, "g1_add_affine") else \
    None
if lhs is None:
    a = bls._jac_from_affine(ps[0])
    b = bls._jac_from_affine(ps[1])
    lhs = bls._jac_to_affine(bls._jac_add(a, b))
assert lhs == ps[2], f"linearity FAILED: {lhs} vs {ps[2]}"
print("linearity OK", flush=True)

# unit-vector anchors: msm(e_i) == P_i
for i in (0, 1, N - 1):
    e = [0] * N
    e[i] = 1
    got = plan.msm_affine_batch(em, F.pack(e, to_mont=False)[None])[0]
    want = G1.unpack_points(tuple(c[:, i:i + 1] for c in points))[0]
    assert got == want, f"unit {i} FAILED"
print("unit vectors OK", flush=True)


def _sync(out):
    for c in jax.tree.leaves(out):
        np.asarray(jax.device_get(c))


_sync(plan._msm_fn(em, ls))
times = []
for _ in range(3):
    t0 = time.perf_counter()
    _sync(plan._msm_fn(em, ls))
    times.append(time.perf_counter() - t0)
best = min(times)
print(f"msm 2^{N.bit_length()-1} fused: {best*1000:.1f} ms "
      f"({N/best/1e3:.0f}k pts/s)", flush=True)

# the in-engine batched path (host combine), B=4
fn = plan._msm_totals_fns.get(4)
thunk = plan.msm_affine_batch_start(em, jnp.stack([ls, lt, lst, ls]))
thunk()
t0 = time.perf_counter()
thunk = plan.msm_affine_batch_start(em, jnp.stack([ls, lt, lst, ls]))
thunk()
b4 = time.perf_counter() - t0
print(f"msm B=4 batch (host combine): {b4*1000:.1f} ms "
      f"({4*N/b4/1e3:.0f}k pts/s)", flush=True)
