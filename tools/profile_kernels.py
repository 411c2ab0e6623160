"""Kernel-level speed-of-light profiling on the real TPU (axon backend).

Times each primitive by chaining K dependent iterations inside ONE jit
(dispatch/fetch overhead amortized away), then prints a per-op table.
Run: python tools/profile_kernels.py
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

from dusk_plonk_tpu.ops.limb import fq_field, fr_field
from dusk_plonk_tpu.ops.ec import device_g1
from dusk_plonk_tpu.fields.constants import Q_MOD, R_MOD


def _fetch(x):
    for c in jax.tree.leaves(x):
        np.asarray(jax.device_get(c))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _fetch(out)  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    Fq = fq_field()
    Fr = fr_field()
    G1 = device_g1()
    rng = np.random.default_rng(0)

    # no-op roundtrip
    @jax.jit
    def noop(x):
        return x + 1
    t = timeit(noop, jnp.zeros((8, 128), jnp.uint32))
    print(f"noop dispatch+fetch: {t*1e3:.1f} ms")

    N = 1 << 16
    K = 16

    def rand_fq(n):
        vals = [int.from_bytes(rng.bytes(48), "little") % Q_MOD
                for _ in range(min(n, 512))]
        reps = -(-n // len(vals))
        return Fq.pack((vals * reps)[:n])

    def rand_fr(n):
        vals = [int.from_bytes(rng.bytes(32), "little") % R_MOD
                for _ in range(min(n, 512))]
        reps = -(-n // len(vals))
        return Fr.pack((vals * reps)[:n])

    a = rand_fq(N)
    b = rand_fq(N)

    @jax.jit
    def mul_chain(a, b):
        def body(i, x):
            return Fq.mul(x, b)
        return jax.lax.fori_loop(0, K, body, a)[:, :1]

    t = timeit(mul_chain, a, b)
    per = t / K
    print(f"Fq mont_mul (24,{N}): {per*1e3:.2f} ms/mul -> "
          f"{N/per/1e6:.1f} M muls/s")

    ar = rand_fr(N)
    br = rand_fr(N)

    @jax.jit
    def mul_chain_fr(a, b):
        def body(i, x):
            return Fr.mul(x, b)
        return jax.lax.fori_loop(0, K, body, a)[:, :1]

    t = timeit(mul_chain_fr, ar, br)
    per = t / K
    print(f"Fr mont_mul (16,{N}): {per*1e3:.2f} ms/mul -> "
          f"{N/per/1e6:.1f} M muls/s")

    # EC add-mixed at the MSM scan width
    for lanes in (8192, 1 << 16):
        px = rand_fq(lanes); py = rand_fq(lanes); pz = rand_fq(lanes)
        qx = rand_fq(lanes); qy = rand_fq(lanes)

        @jax.jit
        def ec_chain(px, py, pz, qx, qy):
            def body(i, p):
                return G1.add_mixed(p, (qx, qy))
            out = jax.lax.fori_loop(0, K, body, (px, py, pz))
            return tuple(c[:, :1] for c in out)

        t = timeit(ec_chain, px, py, pz, qx, qy)
        per = t / K
        print(f"ec_add_mixed (24,{lanes}): {per*1e3:.2f} ms/add -> "
              f"{lanes/per/1e6:.2f} M adds/s")

    # full projective add
    lanes = 8192
    px = rand_fq(lanes); py = rand_fq(lanes); pz = rand_fq(lanes)
    qx = rand_fq(lanes); qy = rand_fq(lanes); qz = rand_fq(lanes)

    @jax.jit
    def ec_full_chain(px, py, pz, qx, qy, qz):
        def body(i, p):
            return G1.add(p, (qx, qy, qz))
        out = jax.lax.fori_loop(0, K, body, (px, py, pz))
        return tuple(c[:, :1] for c in out)

    t = timeit(ec_full_chain, px, py, pz, qx, qy, qz)
    per = t / K
    print(f"ec_add full (24,{lanes}): {per*1e3:.2f} ms/add")

    # MSM phase breakdown at 2^16
    from dusk_plonk_tpu.ops.msm import msm_plan
    plan = msm_plan(N)
    print(f"msm plan: wg={plan.wg} chunk_len={plan.chunk_len} "
          f"n_pad={plan.n_pad}")
    pts = (px_ := rand_fq(plan.n_pad), rand_fq(plan.n_pad),
           jnp.broadcast_to(jnp.asarray(Fq.one_mont), (24, plan.n_pad)))
    scal = [int.from_bytes(rng.bytes(32), "little") % R_MOD
            for _ in range(N)]
    limbs = Fr.pack(scal, to_mont=False)

    t = timeit(lambda: plan.msm_device(
        (pts[0][:, :N], pts[1][:, :N], pts[2][:, :N]), limbs))
    print(f"full msm 2^16: {t*1e3:.1f} ms -> {N/t/1e3:.0f} k pts/s")

    # phase: digits + sort only
    @jax.jit
    def sort_only(limbs):
        digits = plan._digits(limbs)
        n = digits.shape[-1]
        shift = (n - 1).bit_length()
        iota = jax.lax.broadcasted_iota(jnp.int32, digits.shape, 1)
        packed = jnp.bitwise_or(jnp.left_shift(digits, shift), iota)
        skey = jax.lax.sort(packed, dimension=-1)
        return skey[:, :4]

    t = timeit(sort_only, limbs)
    print(f"  digits+sort (32 windows): {t*1e3:.1f} ms")

    # phase: gather
    order_np = np.stack([np.argsort(
        np.asarray(rng.integers(0, 256, plan.n_pad), np.int32),
        kind="stable") for _ in range(plan.num_windows)])
    order = jnp.asarray(order_np)

    @jax.jit
    def gather_only(px, py, order):
        L = 24
        wg, n = order.shape
        cl = plan.chunk_len
        nc = n // cl
        def gf(c):
            g = c[:, order].reshape(L, wg, nc, cl)
            return g.transpose(3, 0, 1, 2).reshape(cl, L, wg * nc)
        xs = (gf(px), gf(py))
        return xs[0][0, :, :4], xs[1][0, :, :4]

    t = timeit(gather_only, pts[0], pts[1], order)
    print(f"  gather x/y (32 windows): {t*1e3:.1f} ms")

    # phase: scan only (chained adds over pre-gathered points)
    cl = plan.chunk_len
    nc = plan.n_pad // cl
    lanes = plan.num_windows * nc
    gx = rand_fq(lanes)
    gy = rand_fq(lanes)

    @jax.jit
    def scan_only(gx, gy):
        ident = G1.broadcast_identity((), lanes)
        def body(carry, _):
            nxt = G1.add_mixed(carry, (gx, gy))
            return nxt, nxt[0][:1, :1]
        out, ps = jax.lax.scan(body, ident, None, length=cl)
        return out[0][:, :1], ps[:, 0, 0]

    t = timeit(scan_only, gx, gy)
    print(f"  scan phase ({cl} steps x {lanes} lanes): {t*1e3:.1f} ms")


if __name__ == "__main__" and (len(sys.argv) < 2 or sys.argv[1] != "totals"):
    main()


def main2():
    """Prover-path MSM timing: totals-only (host combine), B=4 batch."""
    import jax
    from dusk_plonk_tpu.ops.msm import msm_plan
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.fields.constants import R_MOD, Q_MOD
    Fr = fr_field()
    rng = np.random.default_rng(0)
    N = 1 << 16
    plan = msm_plan(N)

    def rand_fq(n):
        from dusk_plonk_tpu.ops.limb import fq_field
        Fq = fq_field()
        vals = [int.from_bytes(rng.bytes(48), "little") % Q_MOD
                for _ in range(min(n, 512))]
        reps = -(-n // len(vals))
        return Fq.pack((vals * reps)[:n])

    px, py = rand_fq(N), rand_fq(N)
    pz = jnp.broadcast_to(jnp.asarray(plan.Fq.one_mont), (24, N))
    for B in (1, 4):
        limbs = jnp.stack([Fr.pack(
            [int.from_bytes(rng.bytes(32), "little") % R_MOD
             for _ in range(N)], to_mont=False) for _ in range(B)])
        em = plan.prepare_points((px, py, pz))
        fn = plan._msm_totals_fns.get(B)
        if fn is None:
            fn = plan._msm_totals_fns[B] = jax.jit(
                jax.vmap(plan._msm_totals_jit, in_axes=(None, 0)))
        t = timeit(lambda: fn(em, limbs))
        print(f"totals-only msm B={B}: {t*1e3:.1f} ms "
              f"({t/B*1e3:.1f} ms/msm incl ~31ms fetch)")


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "totals":
        main2()
