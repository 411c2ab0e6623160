"""Round-5 MSM speed-of-light profile on the real TPU.

Times the full 2^16 MSM and progressively longer prefixes of the real
_window_group_totals pipeline (current API); stage differences isolate
device time per phase.  Also times the raw Pallas primitives (Fq mul,
mixed-add chain, ec_scan_mixed) to anchor the speed-of-light model.
Run: python tools/profile_r5.py
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

from dusk_plonk_tpu.ops.msm import msm_plan
from dusk_plonk_tpu.ops.limb import fr_field, fq_field
from dusk_plonk_tpu.ops.ec import device_g1
from dusk_plonk_tpu.fields.constants import R_MOD, Q_MOD

N = int(os.environ.get("PROF_N", 1 << 16))
plan = msm_plan(N)
G1 = device_g1()
Fq = fq_field()
Fr = fr_field()
rng = np.random.default_rng(0)
L = 24
wg = plan.wg
cl = plan.chunk_len
n = plan.n_pad
nc = n // cl


def rand_fq(m):
    vals = [int.from_bytes(rng.bytes(48), "little") % Q_MOD
            for _ in range(min(m, 512))]
    reps = -(-m // len(vals))
    return Fq.pack((vals * reps)[:m])


def _fetch(x):
    for c in jax.tree.leaves(x):
        np.asarray(jax.device_get(c))


def timeit(fn, *args, reps=4):
    t0 = time.perf_counter()
    _fetch(fn(*args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


px, py = rand_fq(n), rand_fq(n)
pz = jnp.broadcast_to(jnp.asarray(Fq.one_mont), (L, n))
scal = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(N)]
limbs = Fr.pack(scal, to_mont=False)
em = plan.prepare_points((px, py, pz))


def stage_fn(stage):
    def fn(em, limbs):
        lim = limbs
        if plan.n_pad != N:
            lim = jnp.concatenate(
                [lim, jnp.zeros((16, plan.n_pad - N), lim.dtype)], axis=-1)
        digits = plan._digits(lim)[:wg]
        absd = jnp.abs(digits)
        sign = (digits < 0).astype(jnp.int32)
        shift = (n - 1).bit_length()
        if shift + plan.window_bits + 1 <= 31:
            iota = jax.lax.broadcasted_iota(jnp.int32, (wg, n), 1)
            packed = jnp.bitwise_or(jnp.bitwise_or(
                jnp.left_shift(absd, shift + 1),
                jnp.left_shift(sign, shift)), iota)
            skey = jax.lax.sort(packed, dimension=-1)
            order = jnp.bitwise_and(skey, (1 << shift) - 1)
            ssign = jnp.bitwise_and(jnp.right_shift(skey, shift), 1)
            sd = jnp.right_shift(skey, shift + 1)
        else:
            order = jnp.argsort(absd, axis=-1)
            sd = jnp.take_along_axis(absd, order, axis=-1)
            ssign = jnp.take_along_axis(sign, order, axis=-1)
        if stage == "sort":
            return sd[:, :2]
        g = jax.lax.optimization_barrier(em[order + n * ssign])
        g = g.reshape(wg, nc, cl, 2 * L).transpose(2, 3, 0, 1)
        g = g.reshape(cl, 2 * L, wg * nc)
        if stage == "gather":
            return g[0, :, :2]
        from dusk_plonk_tpu.ops import pallas_field as pf
        if plan.use14:
            if stage == "scan":
                return pf.ec_scan_mixed14(g)[-1][:, :2]
        elif stage == "scan":
            ps = pf.ec_scan_mixed(g)
            return tuple(c[-1][:, :2] for c in ps)
        out = plan._window_group_totals(em, plan._digits(lim)[:wg])
        return out

    return jax.jit(fn)


def main():
    @jax.jit
    def noop(x):
        return x + 1
    t, _ = timeit(noop, jnp.zeros((8, 128), jnp.uint32))
    print(f"noop dispatch+fetch: {t*1e3:.1f} ms")

    # raw primitives
    K = 16
    a, b = rand_fq(1 << 16), rand_fq(1 << 16)

    @jax.jit
    def mul_chain(a, b):
        def body(i, x):
            return Fq.mul(x, b)
        return jax.lax.fori_loop(0, K, body, a)[:, :1]
    t, c = timeit(mul_chain, a, b)
    per = t / K
    print(f"Fq mont_mul (24, 65536): {per*1e3:.2f} ms/mul -> "
          f"{65536/per/1e6:.1f} M muls/s  [compile {c:.0f}s]")

    lanes = wg * nc
    qx, qy = rand_fq(lanes), rand_fq(lanes)
    sx, sy, sz = rand_fq(lanes), rand_fq(lanes), rand_fq(lanes)

    @jax.jit
    def ec_chain(px, py, pz, qx, qy):
        def body(i, p):
            return G1.add_mixed(p, (qx, qy))
        out = jax.lax.fori_loop(0, K, body, (px, py, pz))
        return tuple(x[:, :1] for x in out)
    t, c = timeit(ec_chain, sx, sy, sz, qx, qy)
    per = t / K
    print(f"ec_add_mixed (24, {lanes}): {per*1e3:.2f} ms/add -> "
          f"{lanes/per/1e6:.2f} M adds/s  [compile {c:.0f}s]")

    # the fused Pallas scan at the exact MSM shape
    g = jnp.concatenate([
        rand_fq(lanes * cl).reshape(L, cl, lanes).transpose(1, 0, 2),
        rand_fq(lanes * cl).reshape(L, cl, lanes).transpose(1, 0, 2)],
        axis=1)
    from dusk_plonk_tpu.ops import pallas_field as pf

    @jax.jit
    def scan_k(g):
        ps = pf.ec_scan_mixed(g)
        return tuple(x[-1][:, :2] for x in ps)
    t, c = timeit(scan_k, g)
    adds = cl * lanes
    print(f"ec_scan_mixed ({cl}, 2L, {lanes}): {t*1e3:.1f} ms -> "
          f"{adds/t/1e6:.2f} M adds/s  [compile {c:.0f}s]")

    @jax.jit
    def scan_k14(g):
        return pf.ec_scan_mixed14(g)[-1][:, :2]
    t, c = timeit(scan_k14, g)
    print(f"ec_scan_mixed14 ({cl}, 2L, {lanes}): {t*1e3:.1f} ms -> "
          f"{adds/t/1e6:.2f} M adds/s  [compile {c:.0f}s]")

    # full msm + stage prefixes
    t, c = timeit(lambda: plan.msm_device(em, limbs))
    print(f"full msm 2^{N.bit_length()-1}: {t*1e3:.1f} ms -> "
          f"{N/t/1e3:.0f} k pts/s  [compile {c:.0f}s]")
    prev = 0.0
    for stage in ("sort", "gather", "scan", "full_group"):
        fn = stage_fn(stage)
        t, c = timeit(fn, em, limbs)
        print(f"  prefix through {stage}: {t*1e3:.1f} ms "
              f"(delta {max(t-prev,0)*1e3:.1f} ms)  [compile {c:.0f}s]")
        prev = t


if __name__ == "__main__":
    main()
