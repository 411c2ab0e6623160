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
SUB = 16          # bucket-reduction split: 256 buckets = 16 hi x 16 lo


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
        self._msm_totals_fns = {}

    # -- digit extraction ----------------------------------------------------

    def _digits(self, scalar_limbs):
        """(16, N) uint32 16-bit limbs -> (W, N) int32 byte digits."""
        lo = (scalar_limbs & 0xFF).astype(jnp.int32)
        hi = ((scalar_limbs >> 8) & 0xFF).astype(jnp.int32)
        # window 2j   = low byte of limb j; window 2j+1 = high byte
        n = scalar_limbs.shape[-1]
        return jnp.stack([lo, hi], axis=1).reshape(NUM_WINDOWS, n)

    # -- per-window-group kernel ------------------------------------------------

    def _window_group_totals(self, px, py, digits):
        """digits (Wg, N); points (L, N) STRICTLY AFFINE (z = 1; pads are
        the generator with scalar 0) -> window totals (Wg, L, 1) x3.

        All EC arithmetic runs on FLATTENED (L, lanes) arrays so the fused
        Pallas EC-add kernel fires (lanes = Wg*nc for the chunked prefix
        scan, Wg*nb for the bucket phase).  The prefix scan uses the
        11-mul complete MIXED addition (ops/ec.py add_mixed) — the table
        operand is affine by construction — and gathers only x, y."""
        G1 = self.G1
        wg, n = digits.shape
        L = self.Fq.L
        shift = (n - 1).bit_length()
        if shift + WINDOW_BITS <= 31:
            # pack (digit, index) into ONE int32 key: a single-operand
            # sort beats argsort's two-operand comparator network ~2x on
            # TPU (argsort lowers to a (key, iota) variadic sort AND a
            # separate take_along_axis for the sorted digits)
            iota = jax.lax.broadcasted_iota(jnp.int32, (wg, n), 1)
            packed = jnp.bitwise_or(
                jnp.left_shift(digits, shift), iota)
            skey = jax.lax.sort(packed, dimension=-1)    # (Wg, N)
            order = jnp.bitwise_and(skey, (1 << shift) - 1)
            sd = jnp.right_shift(skey, shift)
        else:  # digit+index exceed 31 bits (domains >= 2^24)
            order = jnp.argsort(digits, axis=-1)         # (Wg, N)
            sd = jnp.take_along_axis(digits, order, axis=-1)

        cl = self.chunk_len
        nc = n // cl

        def gather_flat(c):
            # (L, N)[:, order] -> (L, Wg, N) -> (L, Wg, nc, cl)
            # -> (cl, L, Wg*nc): scan axis first, lanes flattened
            g = c[:, order].reshape(L, wg, nc, cl)
            return g.transpose(3, 0, 1, 2).reshape(cl, L, wg * nc)
        xs = (gather_flat(px), gather_flat(py))
        ident = G1.broadcast_identity((), wg * nc)       # (L, Wg*nc)

        def body(carry, x):
            nxt = G1.add_mixed(carry, x)
            return nxt, nxt
        _, ps = jax.lax.scan(body, ident, xs)            # (cl, L, Wg*nc) x3

        # chunk offsets: EXCLUSIVE prefix of the chunk totals along nc, per
        # window.  Rolled Hillis-Steele in a fori_loop (ONE G1.add
        # instantiation) over the full (L, Wg*nc) lane grid: log2(nc) wide
        # fused steps instead of nc sequential steps on Wg lanes — the
        # old <128-lane sequential scan ran unfused and cost ~90 ms per
        # 2^16 MSM on the TPU.  Cross-window roll contamination lands only
        # on lanes with pos < shift, which the mask keeps unchanged.
        ident_wg = G1.broadcast_identity((), wg)         # (L, Wg)
        if nc == 1:
            offsets = G1.broadcast_identity((), wg * nc)
        else:
            last = tuple(c[-1] for c in ps)              # (L, Wg*nc)
            pos = jax.lax.iota(jnp.int32, wg * nc) % nc
            ident_flat = G1.broadcast_identity((), wg * nc)
            shifted = tuple(jnp.roll(c, 1, axis=-1) for c in last)
            z0 = G1.select(pos == 0, ident_flat, shifted)

            def hs_body(i, cur):
                sh = jnp.int32(1) << i
                rolled = tuple(jnp.roll(c, sh, axis=-1) for c in cur)
                added = G1.add(cur, rolled)
                return G1.select(pos >= sh, added, cur)

            offsets = jax.lax.fori_loop(
                0, (nc - 1).bit_length(), hs_body, z0)   # (L, Wg*nc)

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
        # weighted bucket reduction: total_w = sum_d d*B_d, two-level.
        # With d = 16*hi + lo:
        #   total = 16 * sum_hi hi*(sum_lo B) + sum_hi (sum_lo lo*B).
        # Each level is a 16-step "skewed" scan whose ONE G1.add per step
        # carries the accumulators as extra lanes: after k steps of
        # (r, t) <- (r + x_j, t + r), t = sum_j (k-j)*x_j — so feeding
        # x_j = B_{k-j} (buckets DESCENDING, bucket 0 last with weight 0)
        # yields t = sum d*B_d and r = sum B_d exactly.  2*16+5 wide steps
        # replace the old nb-1 = 255 sequential sub-128-lane steps.
        assert nb == SUB * SUB
        bs = tuple(c.reshape(L, wg, SUB, SUB) for c in bucket_sums)

        # level 1 over lo (digit minor): x_j = B[..., hi, 16-j]
        lvl1 = tuple(
            c[..., ::-1].transpose(3, 0, 1, 2).reshape(SUB, L, wg * SUB)
            for c in bs)                                 # (16, L, Wg*16)
        ident1 = G1.broadcast_identity((), wg * SUB)

        def skew2_body(carry, x):
            r, t = carry
            lhs = tuple(jnp.concatenate([rc, tc], axis=-1)
                        for rc, tc in zip(r, t))
            rhs = tuple(jnp.concatenate([xc, rc], axis=-1)
                        for xc, rc in zip(x, r))
            out = G1.add(lhs, rhs)                       # (L, 2*Wg*16)
            half = out[0].shape[-1] // 2
            return (tuple(c[..., :half] for c in out),
                    tuple(c[..., half:] for c in out)), None

        (h_sum, s_sum), _ = jax.lax.scan(
            skew2_body, (ident1, ident1), lvl1)          # (L, Wg*16) x2
        # h_sum[hi] = sum_lo B_{hi,lo};  s_sum[hi] = sum_lo lo*B_{hi,lo}

        # level 2 over hi: skewed scan on H (t = sum hi*H_hi) with a third
        # accumulator lane plainly summing S: (r,t,s) <- (r+xH, t+r, s+xS)
        lvl2_h = tuple(
            c.reshape(L, wg, SUB)[..., ::-1].transpose(2, 0, 1)
            for c in h_sum)                              # (16, L, Wg)
        lvl2_s = tuple(
            c.reshape(L, wg, SUB)[..., ::-1].transpose(2, 0, 1)
            for c in s_sum)

        def skew3_body(carry, x):
            r, t, s = carry
            xh, xs = x
            lhs = tuple(jnp.concatenate([rc, tc, sc], axis=-1)
                        for rc, tc, sc in zip(r, t, s))
            rhs = tuple(jnp.concatenate([xc, rc, yc], axis=-1)
                        for xc, rc, yc in zip(xh, r, xs))
            out = G1.add(lhs, rhs)                       # (L, 3*Wg)
            return (tuple(c[..., :wg] for c in out),
                    tuple(c[..., wg:2 * wg] for c in out),
                    tuple(c[..., 2 * wg:] for c in out)), None

        (_, hi_w, lo_tot), _ = jax.lax.scan(
            skew3_body, (ident_wg, ident_wg, ident_wg),
            (lvl2_h, lvl2_s))                            # (L, Wg) x3

        # total = 16 * hi_w + lo_tot
        acc16 = jax.lax.fori_loop(
            0, 4, lambda i, a: G1.add(a, a), hi_w)
        total = G1.add(acc16, lo_tot)
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

    def _msm_totals_jit(self, px, py, pz, scalar_limbs):
        """All the N-heavy work: -> LSB-first window totals (W, L, 1) x3
        in projective Montgomery form.  Points must be AFFINE (z = 1,
        no infinity): pads are the GENERATOR with scalar 0 — they sort
        into bucket 0, which the weighted reduction never touches — so
        the mixed-add scan's z2 = 1 precondition holds on every lane.
        pz is accepted for call-site compatibility and ignored."""
        del pz
        if self.n_pad != self.n:
            pad = self.n_pad - self.n
            gen = self.G1.generator_affine                # (L, 1) x2 numpy
            px = jnp.concatenate(
                [px, jnp.broadcast_to(gen[0], (px.shape[0], pad))], axis=-1)
            py = jnp.concatenate(
                [py, jnp.broadcast_to(gen[1], (py.shape[0], pad))], axis=-1)
            scalar_limbs = jnp.concatenate(
                [scalar_limbs, jnp.zeros((scalar_limbs.shape[0], pad),
                                         scalar_limbs.dtype)], axis=-1)
        digits = self._digits(scalar_limbs)              # (32, n_pad)
        totals = []
        for g in range(0, NUM_WINDOWS, self.wg):
            t = self._window_group_totals(px, py,
                                          digits[g:g + self.wg])
            totals.append(t)
        wx = jnp.concatenate([t[0] for t in totals], axis=0)
        wy = jnp.concatenate([t[1] for t in totals], axis=0)
        wz = jnp.concatenate([t[2] for t in totals], axis=0)
        return wx, wy, wz

    def _msm_jit(self, px, py, pz, scalar_limbs):
        wx, wy, wz = self._msm_totals_jit(px, py, pz, scalar_limbs)
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
        px, py, pz = points
        tracer.count("msm_dispatch")
        tracer.count("msm_points", self.n * B)
        from .. import native
        if native.has_combine_windows():
            return self._start_host_combine(points, limbs_stack)()
        fn = self._msm_affine_fns.get(B)
        if fn is None:
            fn = self._msm_affine_fns[B] = jax.jit(self._msm_affine_jit)
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

    def _start_host_combine(self, points, limbs_stack):
        """Host-combine path, dispatch/fetch split: the device returns
        per-window totals (jax dispatch is async); the returned thunk
        fetches (B*9 KB) and runs the 248 doublings + 31 adds per commit
        plus the affine conversion in the C++ engine in microseconds —
        the on-device combine was serial at lane-width B (unfused,
        ~130 ms per batch)."""
        px, py, pz = points
        B = limbs_stack.shape[0]
        fn = self._msm_totals_fns.get(B)
        if fn is None:
            fn = self._msm_totals_fns[B] = jax.jit(
                jax.vmap(self._msm_totals_jit,
                         in_axes=(None, None, None, 0)))
        from .. import native
        wx, wy, wz = fn(px, py, pz, limbs_stack)         # (B, W, L, 1) x3

        def fetch():
            arrs = [np.asarray(jax.device_get(c))[..., 0].astype("<u2")
                    for c in (wx, wy, wz)]               # (B, W, L) u16
            buf = np.stack(arrs, axis=2)                 # (B, W, 3, L)
            return native.g1_combine_windows(
                buf.tobytes(), B, NUM_WINDOWS, WINDOW_BITS)

        return fetch

    def msm_affine_batch_start(self, points, limbs_stack):
        """Dispatch the batch now, fetch later (returns a thunk) — lets a
        host round trip overlap the MSM's device time.  Falls back to a
        plain deferred call when the native combine engine is absent."""
        from .. import native
        if not native.has_combine_windows():
            return lambda: self.msm_affine_batch(points, limbs_stack)
        B = limbs_stack.shape[0]
        M = self.MAX_FUSED_COMMITS
        if B > M:
            pad = (-B) % M
            if pad:
                limbs_stack = jnp.concatenate(
                    [limbs_stack, jnp.zeros(
                        (pad,) + limbs_stack.shape[1:],
                        limbs_stack.dtype)], axis=0)
            thunks = [self._start_host_combine(points,
                                               limbs_stack[s:s + M])
                      for s in range(0, B + pad, M)]
            return lambda: [p for t in thunks for p in t()][:B]
        tracer.count("msm_dispatch")
        tracer.count("msm_points", self.n * B)
        return self._start_host_combine(points, limbs_stack)

    def msm(self, points, scalars_int):
        """Host convenience: scalars as Python ints -> affine host point."""
        limbs = self.Fr.pack(scalars_int, to_mont=False)
        return self.msm_affine_batch(points, limbs[None])[0]


@lru_cache(maxsize=None)
def msm_plan(n: int) -> MsmPlan:
    return MsmPlan(n)
