"""Distributed four-step NTT over a device mesh.

The reference's FFT is single-node recursive Rust (poly-commit, usage
src/prover.rs:121-124).  For pod-scale domains (SURVEY.md §5.7: 2^20 one
host, 2^24 multi-host) the radix-2 ladder would exchange data every stage;
the four-step (Bailey) decomposition exchanges exactly TWICE:

With n = D * n2 over D devices (k = k2 + n2*k1, j = j1 + D*j2):

  X[k2 + n2 k1] = sum_j1 W2^(j1 k1) [ w^(j1 k2) * sum_j2 W1^(j2 k2) x[j1 + D j2] ]

  1. ALL-TO-ALL: contiguous shards -> device j1 holds the stride-D
     subsequence x[j1 + D*j2] (j2-ordered);
  2. local size-n2 NTT of that row (W1 = w^D);
  3. twiddle by w^(j1 k2) (precomputed, sharded);
  4. ALL-GATHER + local weighted reduction: device k1 computes
     sum_j1 C[j1] * W2^(j1 k1) (W2 = w^n2, an n1=D-point DFT across
     devices).  Output lands contiguously sharded in natural order.

Forward/inverse/coset variants differ only in table VALUES (w vs w^-1,
pre/post geometric scales) — one compiled program serves all four, the
same trick as ops/ntt.py.  Differentially tested against the host Domain
oracle on the simulated 8-device CPU mesh (tests/test_distributed_ntt.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.constants import R_MOD, FR_GENERATOR
from ..fields.host import fr_root_of_unity
from ..ops.limb import fr_field
from ..ops.ntt import ntt_plan, _powers


class DistNttPlan:
    """Tables for one (devices D, domain 2^k) pair."""

    def __init__(self, d: int, k: int):
        assert (1 << k) % d == 0 and d & (d - 1) == 0
        self.d = d
        self.k = k
        self.n = 1 << k
        self.n2 = self.n // d
        self.k2 = self.n2.bit_length() - 1
        F = fr_field()
        self.F = F
        self.inner = ntt_plan(self.k2)

        w = fr_root_of_unity(k)
        w_inv = pow(w, -1, R_MOD)
        n_inv = pow(self.n, -1, R_MOD)
        g = FR_GENERATOR
        g_inv = pow(g, -1, R_MOD)
        n2 = self.n2

        def mid_twiddles(root):
            """(D, L, n2): w^(j1 k2) per device row."""
            rows = []
            for j1 in range(d):
                rows.append(_powers(pow(root, j1, R_MOD), n2))
            flat = [v for row in rows for v in row]
            return F.pack(flat, shape=(d, n2))

        def outer_weights(root):
            """(D, D, L, 1): W2^(j1 k1) = root^(n2 j1 k1)."""
            w2 = pow(root, n2, R_MOD)
            vals = [pow(w2, (j1 * k1) % self.n, R_MOD)
                    for k1 in range(d) for j1 in range(d)]
            return F.pack(vals, shape=(d, d, 1))

        ones = F.pack([1] * n2)
        self.t_fwd = dict(
            mid=mid_twiddles(w), outer=outer_weights(w),
            pre=jnp.tile(ones, (d, 1, 1)),
            post=jnp.tile(ones, (d, 1, 1)),
            inner_tw=self.inner.tw_fwd, inner_pre=self.inner.scale_one,
            inner_post=self.inner.scale_one)
        # inverse: same structure with w^-1; fold 1/n into the post scale
        ninv_vec = F.pack([n_inv] * n2)
        self.t_inv = dict(
            mid=mid_twiddles(w_inv), outer=outer_weights(w_inv),
            pre=jnp.tile(ones, (d, 1, 1)),
            post=jnp.tile(ninv_vec, (d, 1, 1)),
            inner_tw=self.inner.tw_inv, inner_pre=self.inner.scale_one,
            inner_post=self.inner.scale_one)
        # coset variants: scale x_j by g^j before (fwd) / after (inv);
        # the scale vectors are sharded over the CONTIGUOUS layout
        coset = _powers(g, self.n)
        self.t_coset = dict(
            self.t_fwd,
            pre=F.pack(coset, shape=(d, n2)).reshape(d, F.L, n2))
        coset_inv = [p * 1 % R_MOD for p in _powers(g_inv, self.n)]
        self.t_coset_inv = dict(
            self.t_inv,
            post=F.pack([c * n_inv % R_MOD for c in coset_inv],
                        shape=(d, n2)).reshape(d, F.L, n2))

    def tables(self, kind: str):
        return {"dft": self.t_fwd, "idft": self.t_inv,
                "coset_dft": self.t_coset,
                "coset_idft": self.t_coset_inv}[kind]


@lru_cache(maxsize=None)
def dist_ntt_plan(d: int, k: int) -> DistNttPlan:
    return DistNttPlan(d, k)


@lru_cache(maxsize=None)
def _dist_ntt_fn(mesh: Mesh, axis: str, k: int, batched: bool):
    """One JITTED executable per (mesh, axis, k, rank): shard_map must run
    under jit — eager shard_map executes every primitive of the body as its
    own multi-device pjit program (hundreds of compiles; measured minutes on
    the simulated CPU mesh).  Forward/inverse/coset variants reuse the SAME
    executable: they differ only in table values, which ride as arguments.
    `batched` adds one leading axis (the prover transforms 2-6 polynomials
    per call, amortizing both collectives across the batch)."""
    d = mesh.shape[axis]
    plan = dist_ntt_plan(d, k)
    F = plan.F
    n2 = plan.n2

    def body(x_local, mid, outer, pre, post, inner_tw, inner_pre,
             inner_post):
        # x_local (..., L, n2): device j holds x[j*n2 : (j+1)*n2]
        lead = x_local.shape[:-2]
        x_local = F.mul(x_local, pre[0])
        # ALL-TO-ALL: global element g = j*n2 + u*D + v  ->  device v,
        # position j*(n2/D) + u   (x[j1 + D*j2] ordered by j2)
        t = x_local.reshape(lead + (F.L, n2 // d, d))
        nd = t.ndim
        t = jax.lax.all_to_all(t, axis, split_axis=nd - 1,
                               concat_axis=nd - 2, tiled=False)
        # t: (..., L, n2/D, D) with new blocks ordered by source device
        row = t.reshape(lead + (F.L, n2))
        # local inner NTT (W1 = w^D since the row is the stride-D slice)
        row = plan.inner._transform(row, inner_tw, inner_pre, inner_post)
        # mid twiddle w^(j1 k2): mid is sharded by device, local row 0
        row = F.mul(row, mid[0])
        # outer D-point DFT across devices: gather all rows, weight, sum
        rows = jax.lax.all_gather(row, axis)          # (D, ..., L, n2)
        k1 = jax.lax.axis_index(axis)
        weights = outer[k1]                           # (D, L, 1)
        weights = weights.reshape((d,) + (1,) * len(lead) + (F.L, 1))
        out = F.sum_reduce(F.mul(rows, weights), axis=0)  # (..., L, n2)
        return F.mul(out, post[0])

    spec_x = P(None, axis) if not batched else P(None, None, axis)
    spec_tab = P(axis, None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_x, spec_tab, P(None, None, None, None),
                  spec_tab, spec_tab, P(), P(None, None), P(None, None)),
        out_specs=spec_x,
        check_vma=False)
    return jax.jit(fn)


def distributed_ntt(mesh: Mesh, axis: str, x, k: int, kind: str = "dft"):
    """x: (L, n) or (B, L, n) sharded contiguously on the element axis over
    mesh[axis]; returns the transform, identically sharded, natural order.

    Domains below D^2 (the four-step needs n2 = n/D divisible by D for the
    all-to-all restripe) fall back to the single-plan kernel — at that size
    the whole table is a few KB and GSPMD replication is free."""
    d = mesh.shape[axis]
    if (1 << k) % (d * d):
        plan = ntt_plan(k)
        args = {
            "dft": (plan.tw_fwd, plan.scale_one, plan.scale_one),
            "idft": (plan.tw_inv, plan.scale_one, plan.scale_n_inv),
            "coset_dft": (plan.tw_fwd, plan.scale_coset, plan.scale_one),
            "coset_idft": (plan.tw_inv, plan.scale_one,
                           plan.scale_coset_inv),
        }[kind]
        return plan._transform(x, *args)
    plan = dist_ntt_plan(d, k)
    tb = plan.tables(kind)
    fn = _dist_ntt_fn(mesh, axis, k, x.ndim == 3)
    # collective-traffic accounting (docs/notes-scaling.md): the
    # all-to-all moves (D-1)/D of the array across links once; the
    # all-gather delivers (D-1)/D of the array to each of D devices
    from ..utils.tracing import tracer
    tracer.count("collective_ops", 2)
    tracer.count("collective_bytes",
                 x.nbytes * (d - 1) // d + x.nbytes * (d - 1))
    return fn(x, tb["mid"], tb["outer"], tb["pre"], tb["post"],
              tb["inner_tw"], tb["inner_pre"], tb["inner_post"])
