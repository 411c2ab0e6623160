"""Stagewise MSM profiling: jit progressively longer prefixes of the real
_window_group_totals pipeline; differences isolate each stage's device
time (absolute numbers include one ~31 ms tunnel roundtrip each)."""

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

from dusk_plonk_tpu.ops.msm import msm_plan, WINDOW_BITS, NB
from dusk_plonk_tpu.ops.limb import fr_field, fq_field
from dusk_plonk_tpu.ops.limb import fq_field as _fqf
from dusk_plonk_tpu.ops.ec import device_g1
from dusk_plonk_tpu.fields.constants import R_MOD, Q_MOD

N = 1 << 16
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


px, py = rand_fq(n), rand_fq(n)
scal = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(N)]
limbs = Fr.pack(scal + [0] * (n - N), to_mont=False)


def stage_fn(stage):
    def fn(px, py, limbs):
        digits = plan._digits(limbs)[:wg]
        absd = jnp.abs(digits)
        sign = (digits < 0).astype(jnp.int32)
        shift = (n - 1).bit_length()
        iota = jax.lax.broadcasted_iota(jnp.int32, (wg, n), 1)
        packed = jnp.bitwise_or(jnp.bitwise_or(
            jnp.left_shift(absd, shift + 1),
            jnp.left_shift(sign, shift)), iota)
        skey = jax.lax.sort(packed, dimension=-1)
        order = jnp.bitwise_and(skey, (1 << shift) - 1)
        ssign = jnp.bitwise_and(jnp.right_shift(skey, shift), 1)
        sd = jnp.right_shift(skey, shift + 1)
        if stage == "sort":
            return sd[:, :2]
        em = jnp.concatenate([
            jnp.concatenate([px, py], axis=0),
            jnp.concatenate([px, Fq.neg(py)], axis=0)], axis=-1).T
        em = jax.lax.optimization_barrier(em)
        g = jax.lax.optimization_barrier(em[order + n * ssign])
        g = g.reshape(wg, nc, cl, 2 * L).transpose(2, 3, 0, 1)
        g = g.reshape(cl, 2 * L, wg * nc)
        xs = (g[:, :L], g[:, L:])
        if stage == "gather":
            return xs[0][0, :, :2], xs[1][0, :, :2]
        ident = G1.broadcast_identity((), wg * nc)

        def body(carry, x):
            nxt = G1.add_mixed(carry, x)
            return nxt, nxt

        _, ps = jax.lax.scan(body, ident, xs)
        if stage == "scan":
            return tuple(c[-1][:, :2] for c in ps)
        out = plan._window_group_totals(px, py, plan._digits(limbs)[:wg])
        return out

    return jax.jit(fn)


def timeit(fn, reps=4):
    out = fn(px, py, limbs)
    for c in jax.tree.leaves(out):
        np.asarray(jax.device_get(c))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(px, py, limbs)
        for c in jax.tree.leaves(out):
            np.asarray(jax.device_get(c))
        best = min(best, time.perf_counter() - t0)
    return best


prev = 0.0
for stage in ("sort", "gather", "scan", "all"):
    t = timeit(stage_fn(stage))
    print(f"{stage:7s}: {t*1e3:7.1f} ms  (delta {1e3*(t-prev):+7.1f})",
          flush=True)
    prev = t
