"""Round-4 hot-path profiling on the real chip.  All jitted probes return
TINY slices: the axon tunnel fetches at ~40 MB/s, so any full-size output
turns a device measurement into a transfer benchmark."""

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


def _sync(out):
    for c in jax.tree.leaves(out):
        np.asarray(jax.device_get(c))


def bench(label, fn, *args, reps=3):
    _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1000:.1f} ms", flush=True)
    return min(ts)


N = 1 << 16
plan = msm_plan(N)
G1 = device_g1()
Fq = fq_field()
Fr = fr_field()
rng = np.random.default_rng(0)
L = Fq.L
wg, cl, npad = plan.wg, plan.chunk_len, plan.n_pad
nc = npad // cl
print(f"plan: c={plan.window_bits} W={plan.num_windows} wg={wg} "
      f"cl={cl} nc={nc} n_pad={npad}", flush=True)


def rand_fq(m):
    vals = [int.from_bytes(rng.bytes(48), "little") % Q_MOD
            for _ in range(min(m, 512))]
    reps = -(-m // len(vals))
    return Fq.pack((vals * reps)[:m])


def rand_fr(m):
    vals = [int.from_bytes(rng.bytes(32), "little") % R_MOD
            for _ in range(min(m, 512))]
    reps = -(-m // len(vals))
    return Fr.pack((vals * reps)[:m])


px, py = rand_fq(npad), rand_fq(npad)
scal = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(N)]
limbs = Fr.pack(scal, to_mont=False)
em = plan.prepare_points((px, py, None))
_sync(em)


def tiny(x):
    return jax.tree.map(lambda c: c.reshape(-1)[:4], x)


def stage_sorted(em, sl):
    digits = plan._digits(sl)[:wg]
    absd = jnp.abs(digits)
    sign = (digits < 0).astype(jnp.int32)
    shift = (npad - 1).bit_length()
    iota = jax.lax.broadcasted_iota(jnp.int32, (wg, npad), 1)
    packed = jnp.bitwise_or(jnp.bitwise_or(
        jnp.left_shift(absd, shift + 1),
        jnp.left_shift(sign, shift)), iota)
    skey = jax.lax.sort(packed, dimension=-1)
    order = jnp.bitwise_and(skey, (1 << shift) - 1)
    ssign = jnp.bitwise_and(jnp.right_shift(skey, shift), 1)
    sd = jnp.right_shift(skey, shift + 1)
    return order, ssign, sd


def stage_gather(em, sl):
    order, ssign, sd = stage_sorted(em, sl)
    g = jax.lax.optimization_barrier(em[order + npad * ssign])
    g = g.reshape(wg, nc, cl, 2 * L).transpose(2, 3, 0, 1)
    return g.reshape(cl, 2 * L, wg * nc)


def stage_scan(em, sl):
    g = stage_gather(em, sl)
    xs = (g[:, :L], g[:, L:])
    ident = G1.broadcast_identity((), wg * nc)

    def body(carry, x):
        nxt = G1.add_mixed(carry, x)
        return nxt, nxt
    _, ps = jax.lax.scan(body, ident, xs)
    return ps


bench("msm full (1 window group, all 20 windows)", plan._msm_fn, em, limbs)
bench("  sort only", jax.jit(lambda e, s: tiny(stage_sorted(e, s))),
      em, limbs)
bench("  sort+gather", jax.jit(lambda e, s: tiny(stage_gather(e, s))),
      em, limbs)
bench("  sort+gather+scan", jax.jit(lambda e, s: tiny(stage_scan(e, s))),
      em, limbs)
bench("  totals (adds bucket reduce)",
      jax.jit(lambda e, s: tiny(plan._msm_totals_jit(e, s))), em, limbs)

# ---- raw throughput probes -------------------------------------------------

a16 = rand_fq(1 << 16)
t = bench("fq mul n=2^16", jax.jit(lambda a, b: Fq.mul(a, b)[:, :4]),
          a16, a16)
print(f"    -> {(1<<16)/t/1e6:.1f} M muls/s", flush=True)
r19 = rand_fr(1 << 19)
t = bench("fr mul n=2^19", jax.jit(lambda a, b: Fr.mul(a, b)[:, :4]),
          r19, r19)
print(f"    -> {(1<<19)/t/1e6:.1f} M muls/s", flush=True)

lanes = wg * nc
pp = (rand_fq(lanes), rand_fq(lanes), rand_fq(lanes))
qq = (rand_fq(lanes), rand_fq(lanes))
t = bench(f"ec add_mixed lanes={lanes}",
          jax.jit(lambda p, q: tiny(G1.add_mixed(p, q))), pp, qq)
print(f"    -> one scan step; x{cl} sequential = {cl*t*1000:.0f} ms",
      flush=True)

# ---- NTT: ladder vs MXU four-step, tables as ARGS --------------------------

from dusk_plonk_tpu.ops import ntt as ntt_mod
from dusk_plonk_tpu.utils.config import set_config, get_config

for k in (16, 19):
    n = 1 << k
    x = rand_fr(2 * n).reshape(Fr.L, 2, n).transpose(1, 0, 2)

    set_config(ntt_mxu_min_k=None)
    ntt_mod.ntt_plan.cache_clear()
    p = ntt_mod.ntt_plan(k)
    fn = jax.jit(lambda v, tw, pre, post:
                 p._transform(v, tw, pre, post)[..., :2])
    t = bench(f"ntt LADDER coset_dft pair k={k}", fn,
              x, p.tw_fwd, p.scale_coset, p.scale_one)
    print(f"    -> {2*n/t/1e6:.1f} M elems/s", flush=True)

    set_config(ntt_mxu_min_k=14)
    ntt_mod.ntt_plan.cache_clear()
    pm = ntt_mod.ntt_plan(k)
    assert pm.mxu
    fm = jax.jit(lambda v, tw, pre, post:
                 pm._transform(v, tw, pre, post)[..., :2])
    # correctness spot check on chip (int8 matmul numerics)
    ref = p.coset_dft(x[:, :, :])
    got = pm.coset_dft(x)
    same = bool(jnp.all(ref == got))
    print(f"    mxu == ladder on chip: {same}", flush=True)
    t = bench(f"ntt MXU coset_dft pair k={k}", fm,
              x, pm.tw_fwd, pm.scale_coset, pm.scale_one)
    print(f"    -> {2*n/t/1e6:.1f} M elems/s", flush=True)
    set_config(ntt_mxu_min_k=14)
