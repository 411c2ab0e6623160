"""Device Pippenger multi-scalar multiplication (the KZG commit engine).

TPU-first reformulation of bucket accumulation (the data-dependent
scatter-add at the heart of Pippenger, which SIMD hardware cannot do
directly — SURVEY.md §7 hard part #3):

  1. 8-bit window digits are sliced from the scalar limbs: (W=32, N).
  2. Per window, points are SORTED by digit (XLA sort is fast on TPU);
     equal digits become contiguous runs.
  3. An inclusive prefix scan of EC additions runs CHUNKED: the sorted
     sequence is reshaped (num_chunks, chunk_len) and lax.scan runs
     chunk_len sequential steps over num_chunks*window parallel lanes —
     O(N) EC adds with full VPU occupancy (the complete-addition formula
     makes the combiner branch-free).  Layout is limb-major (ops/limb.py):
     scan-step operands are (Wg, L, nc) with the chunk axis in lanes.
  4. Bucket sums are prefix differences at run boundaries, located with
     searchsorted (no scatters anywhere).
  5. The weighted bucket reduction sum(d * B_d) walks buckets from the top
     (running += B_d; total += running) in one fori-free lax.scan.
  6. Windows combine with c doublings per step inside one fori_loop.

Reference equivalents: `PlonkParams::commit` / `msm_curve_addition`
(usage reference src/prover.rs:133-136, src/prover/proof.rs:507).
Differentially tested against the host Pippenger (curves/bls.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.config import get_config
from ..utils.tracing import tracer
from .limb import fr_field, fq_field
from .ec import device_g1

WINDOW_BITS = 8
NUM_WINDOWS = 32  # 256 / 8


class MsmPlan:
    """Compiled MSM for a fixed point-count N (points are a runtime input,
    so one plan serves every polynomial committed against any SRS slice of
    the same padded length)."""

    def __init__(self, n: int, window_group: int | None = None):
        self.n = n
        self.G1 = device_g1()
        self.Fq = fq_field()
        self.Fr = fr_field()
        cfg = get_config()
        if window_group is None:
            # cap gathered-point memory (config: msm_group_slots point-slots
            # per group)
            window_group = max(
                1, min(NUM_WINDOWS, cfg.msm_group_slots // max(n, 1)))
        while NUM_WINDOWS % window_group:
            window_group -= 1
        self.wg = window_group
        self.chunk_len = min(cfg.msm_chunk_len, n)
        # pad to a chunk multiple: zero scalars sort into bucket 0, which the
        # reduction drops, so identity-padding is free of correctness cost.
        # For large inputs, pad further so the flattened scan lanes
        # (wg * num_chunks) are a multiple of 128 and the fused Pallas EC
        # kernel fires (ops/ec.py dispatch rule).
        from math import gcd
        quantum = self.chunk_len
        if n >= 2048:
            quantum *= 128 // gcd(self.wg, 128)
        self.n_pad = -(-n // quantum) * quantum
        # ONE jitted executable for the whole MSM: every eager op on the
        # axon backend costs ~120 ms (separate remote execution), so the
        # padding/digit/combine glue must live inside the jit
        self._msm_fn = jax.jit(self._msm_jit)
        self._msm_affine_fns = {}

    # -- digit extraction ----------------------------------------------------

    def _digits(self, scalar_limbs):
        """(16, N) uint32 16-bit limbs -> (W, N) int32 byte digits."""
        lo = (scalar_limbs & 0xFF).astype(jnp.int32)
        hi = ((scalar_limbs >> 8) & 0xFF).astype(jnp.int32)
        # window 2j   = low byte of limb j; window 2j+1 = high byte
        n = scalar_limbs.shape[-1]
        return jnp.stack([lo, hi], axis=1).reshape(NUM_WINDOWS, n)

    # -- per-window-group kernel ------------------------------------------------

    def _window_group_totals(self, px, py, pz, digits):
        """digits (Wg, N); points (L, N) -> window totals (Wg, L, 1) x3.

        All EC arithmetic runs on FLATTENED (L, lanes) arrays so the fused
        Pallas EC-add kernel fires (lanes = Wg*nc for the chunked prefix
        scan, Wg*nb for the bucket phase)."""
        G1 = self.G1
        wg, n = digits.shape
        L = self.Fq.L
        order = jnp.argsort(digits, axis=-1)             # (Wg, N)
        sd = jnp.take_along_axis(digits, order, axis=-1)

        cl = self.chunk_len
        nc = n // cl

        def gather_flat(c):
            # (L, N)[:, order] -> (L, Wg, N) -> (L, Wg, nc, cl)
            # -> (cl, L, Wg*nc): scan axis first, lanes flattened
            g = c[:, order].reshape(L, wg, nc, cl)
            return g.transpose(3, 0, 1, 2).reshape(cl, L, wg * nc)
        xs = (gather_flat(px), gather_flat(py), gather_flat(pz))
        ident = G1.broadcast_identity((), wg * nc)       # (L, Wg*nc)

        def body(carry, x):
            nxt = G1.add(carry, x)
            return nxt, nxt
        _, ps = jax.lax.scan(body, ident, xs)            # (cl, L, Wg*nc) x3

        # chunk offsets: exclusive scan of chunk totals along nc.
        # lax.scan (sequential, body = ONE add) — an associative_scan would
        # inline log(nc) adds into the graph and blow up compile time.
        totals = tuple(
            c[-1].reshape(L, wg, nc).transpose(2, 0, 1)
            for c in ps)                                 # (nc, L, Wg)
        ident_wg = G1.broadcast_identity((), wg)         # (L, Wg)

        def off_body(carry, x):
            nxt = G1.add(carry, x)
            return nxt, carry                            # exclusive
        _, offs_seq = jax.lax.scan(off_body, ident_wg, totals)
        offsets = tuple(c.transpose(1, 2, 0).reshape(L, wg * nc)
                        for c in offs_seq)               # (L, Wg*nc)

        # locate bucket run boundaries
        nb = 1 << WINDOW_BITS
        buckets = jnp.arange(nb, dtype=jnp.int32)

        def find(side):
            return jax.vmap(
                lambda row: jnp.searchsorted(row, buckets, side=side)
            )(sd)                                        # (Wg, nb)
        head = find("left")
        tail = find("right") - 1
        empty = (head > tail).reshape(wg * nb)           # (Wg*nb,)

        wg_ix = jnp.arange(wg, dtype=jnp.int32)[:, None]

        def ps_at(idx):
            """Prefix-scan value at index (Wg, M) -> (L, Wg*M) flat;
            identity at -1.  ONE G1.add instantiation regardless of how
            many index sets are folded into M (compile-size: each inlined
            EC add is ~20k HLO ops — a second call site doubles it)."""
            m = idx.shape[-1]
            neg = (idx < 0).reshape(wg * m)
            safe = jnp.maximum(idx, 0)
            ci = safe // cl                              # (Wg, M)
            pi = (safe % cl).reshape(wg * m)
            flat_lane = (wg_ix * nc + ci).reshape(wg * m)
            # ps: (cl, L, Wg*nc)[pi, :, flat_lane] -> (Wg*M, L) -> (L, .)
            vals = tuple(c[pi, :, flat_lane].T for c in ps)
            offs = tuple(c[:, flat_lane] for c in offsets)
            summed = G1.add(vals, offs)
            ident_b = G1.broadcast_identity((), wg * m)
            return G1.select(neg, ident_b, summed)

        # hi and lo prefix reads share the single ps_at instantiation
        both = ps_at(jnp.concatenate([tail, head - 1], axis=-1))
        b_hi = tuple(c.reshape(L, wg, 2 * nb)[..., :nb].reshape(L, wg * nb)
                     for c in both)
        b_lo = tuple(c.reshape(L, wg, 2 * nb)[..., nb:].reshape(L, wg * nb)
                     for c in both)
        bucket_sums = G1.add(b_hi, G1.neg(b_lo))         # (L, Wg*nb)
        ident_b = G1.broadcast_identity((), wg * nb)
        bucket_sums = G1.select(empty, ident_b, bucket_sums)
        # drop bucket 0 (digit 0 contributes nothing); iterate buckets from
        # the top: running += B_d; total += running  =>  total = sum d*B_d.
        # The two accumulators ride as EXTRA LANES of one G1.add:
        # add((running | total), (x | running)) per step.  One add per step
        # skews the recurrence to total' = total + running_OLD (total_new
        # cannot see running_new inside the same add), so after n steps
        # total misses the final running — the appended identity step
        # (x = 0: running stays, total += running) restores it without a
        # second EC-add instantiation.
        desc = tuple(
            jnp.concatenate(
                [c.reshape(L, wg, nb)[..., 1:][..., ::-1]
                  .transpose(2, 0, 1),
                 i[None]], axis=0)
            for c, i in zip(bucket_sums, ident_wg))      # (nb, L, Wg)

        def red_body(carry, x):
            running, total = carry
            lhs = tuple(jnp.concatenate([r, t], axis=-1)
                        for r, t in zip(running, total))
            rhs = tuple(jnp.concatenate([xc, r], axis=-1)
                        for xc, r in zip(x, running))
            out = G1.add(lhs, rhs)                       # (L, 2*Wg)
            return (tuple(c[..., :wg] for c in out),
                    tuple(c[..., wg:] for c in out)), None
        (_, total), _ = jax.lax.scan(
            red_body, (ident_wg, ident_wg), desc)        # (L, Wg) x3
        return tuple(jnp.moveaxis(c, -1, 0)[..., None] for c in total)

    def _combine_windows(self, wx, wy, wz):
        """(W, L, 1) window totals -> final (L, 1) point, MSB window first:
        acc = 2^c * acc + T_w.  The doublings run in a nested fori_loop so
        the body inlines TWO EC adds, not nine (each inlined add is ~20k
        HLO ops; the unrolled form alone cost ~3 min of 1-core XLA:CPU
        compile and a comparable slice of the remote TPU build)."""
        G1 = self.G1

        def body(w, acc):
            acc = jax.lax.fori_loop(
                0, WINDOW_BITS, lambda j, a: G1.add(a, a), acc)
            t = tuple(c[w] for c in (wx, wy, wz))
            return G1.add(acc, t)
        acc = jax.lax.fori_loop(
            0, NUM_WINDOWS, body, self.G1.identity)
        return acc

    # -- public ------------------------------------------------------------------

    def _msm_jit(self, px, py, pz, scalar_limbs):
        if self.n_pad != self.n:
            pad = self.n_pad - self.n
            ident = self.G1.broadcast_identity((), pad)
            px = jnp.concatenate([px, ident[0]], axis=-1)
            py = jnp.concatenate([py, ident[1]], axis=-1)
            pz = jnp.concatenate([pz, ident[2]], axis=-1)
            scalar_limbs = jnp.concatenate(
                [scalar_limbs, jnp.zeros((scalar_limbs.shape[0], pad),
                                         scalar_limbs.dtype)], axis=-1)
        digits = self._digits(scalar_limbs)              # (32, n_pad)
        totals = []
        for g in range(0, NUM_WINDOWS, self.wg):
            t = self._window_group_totals(px, py, pz,
                                          digits[g:g + self.wg])
            totals.append(t)
        wx = jnp.concatenate([t[0] for t in totals], axis=0)
        wy = jnp.concatenate([t[1] for t in totals], axis=0)
        wz = jnp.concatenate([t[2] for t in totals], axis=0)
        # windows were emitted LSB-first; combine expects MSB-first
        return self._combine_windows(wx[::-1], wy[::-1], wz[::-1])

    def msm_device(self, points, scalar_limbs):
        """points: ((L,N),(L,N),(L,N)) projective Montgomery (the packed
        SRS slice); scalar_limbs: (16, N) canonical 16-bit limbs.
        Returns a single projective device point (L, 1) x3."""
        px, py, pz = points
        tracer.count("msm_dispatch")
        tracer.count("msm_points", self.n)
        return self._msm_fn(px, py, pz, scalar_limbs)

    def _msm_affine_jit(self, px, py, pz, limbs_stack):
        """limbs_stack (B, 16, N) -> canonical affine limbs (B, 2, L) +
        at-infinity flags (B,).  B sequential MSMs, the projective->affine
        division (Fermat inverse of Z) and the Montgomery->canonical
        conversion all inside ONE executable: each host-visible dispatch +
        fetch cycle costs ~30 ms on the tunneled backend (measured), and
        the per-commit unpack used to take three of them."""
        Fq = self.Fq
        # vmap, not a Python loop: the loop would inline B copies of the
        # MSM graph (B x the compile time); vmap batches each op instead
        X, Y, Z = jax.vmap(self._msm_jit,
                           in_axes=(None, None, None, 0))(
            px, py, pz, limbs_stack)                 # (B, L, 1) each
        zinv = Fq.pow_const(Z, Fq.spec.modulus - 2)  # 0 stays 0
        ax = Fq.from_mont(Fq.mul(X, zinv))
        ay = Fq.from_mont(Fq.mul(Y, zinv))
        inf = jnp.all(Z == 0, axis=(-2, -1))         # (B,)
        return jnp.stack([ax[..., 0], ay[..., 0]], axis=1), inf

    MAX_FUSED_COMMITS = 4

    def msm_affine_batch(self, points, limbs_stack):
        """points: packed SRS slice; limbs_stack (B, 16, N) canonical.
        Returns a list of B affine host points ((x, y) ints or None),
        with ONE dispatch and ONE fetch per group of <=4 (larger fused
        executables would multiply remote compile time)."""
        B = limbs_stack.shape[0]
        if B > self.MAX_FUSED_COMMITS:
            # pad to a multiple of the group size with zero scalars (the
            # pad rows commit to infinity, dropped below) so only ONE
            # fused executable shape ever compiles — an odd tail size is
            # a fresh ~5 min remote compile (measured at B=3)
            M = self.MAX_FUSED_COMMITS
            pad = (-B) % M
            if pad:
                limbs_stack = jnp.concatenate(
                    [limbs_stack, jnp.zeros(
                        (pad,) + limbs_stack.shape[1:],
                        limbs_stack.dtype)], axis=0)
            out = []
            for s in range(0, B + pad, M):
                out.extend(self.msm_affine_batch(
                    points, limbs_stack[s:s + M]))
            return out[:B]
        fn = self._msm_affine_fns.get(B)
        if fn is None:
            fn = self._msm_affine_fns[B] = jax.jit(self._msm_affine_jit)
        px, py, pz = points
        tracer.count("msm_dispatch")
        tracer.count("msm_points", self.n * B)
        coords, inf = fn(px, py, pz, limbs_stack)
        coords = np.asarray(jax.device_get(coords)).astype("<u2")
        inf = np.asarray(jax.device_get(inf))
        out = []
        for b in range(B):
            if inf[b]:
                out.append(None)
            else:
                x = int.from_bytes(coords[b, 0].tobytes(), "little")
                y = int.from_bytes(coords[b, 1].tobytes(), "little")
                out.append((x, y))
        return out

    def msm(self, points, scalars_int):
        """Host convenience: scalars as Python ints -> affine host point."""
        limbs = self.Fr.pack(scalars_int, to_mont=False)
        return self.msm_affine_batch(points, limbs[None])[0]


@lru_cache(maxsize=None)
def msm_plan(n: int) -> MsmPlan:
    return MsmPlan(n)
