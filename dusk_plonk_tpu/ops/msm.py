"""Device Pippenger multi-scalar multiplication (the KZG commit engine).

TPU-first reformulation of bucket accumulation (the data-dependent
scatter-add at the heart of Pippenger, which SIMD hardware cannot do
directly — SURVEY.md §7 hard part #3):

  1. SIGNED c-bit window digits are sliced from the scalar limbs (c
     size-adaptive, 13 at production sizes -> W=20 windows): digit
     d >= 2^(c-1) becomes d - 2^c with a +1 carry into the next window,
     so |d| <= 2^(c-1) and the bucket count halves (the per-window
     sort+scan is the cost floor: every (window, point) pair costs one
     EC add regardless of window width, so wider windows win as long as
     the bucket reduction stays cheap).  Negative digits select the
     (x, -y) half of the point table via the gather index.
  2. Per window, points are SORTED by |digit| (XLA sort is fast on TPU);
     equal digits become contiguous runs.
  3. An inclusive prefix scan of EC additions runs CHUNKED: the sorted
     sequence is reshaped (num_chunks, chunk_len) and lax.scan runs
     chunk_len sequential steps over num_chunks*window parallel lanes —
     O(N) EC adds with full VPU occupancy (the complete-addition formula
     makes the combiner branch-free).  Layout is limb-major (ops/limb.py):
     scan-step operands are (Wg, L, nc) with the chunk axis in lanes.
  4. The weighted bucket reduction telescopes: with P(t) the prefix-scan
     value at sorted index t and t_d the last index with |digit| <= d
     (searchsorted; no scatters anywhere),
       sum_d d*B_d = NB*P(N-1) - sum_{d<NB} P(t_d)
     — one contiguous gather of NB prefix points per window plus a
     log-depth halving tree; empty buckets need no special case.
  5. Windows combine with c doublings per step (host C++ engine when
     available, one nested fori_loop on device otherwise).

Tiny point counts (<= config.msm_serial_max) route to a bit-serial
double-and-add tier instead: one EC-add instantiation vs the pipeline's
~seven, keeping XLA:CPU test-host compiles bounded (the tiers differ only
in schedule, never in any group element).

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

MAX_WINDOW_BITS = 13   # 2^16-point MSMs: 20 windows x 4096 buckets


def pick_window_bits(n: int) -> int:
    """Window width minimizing W*(N + 2^(c-1)): scan work is W*N
    regardless of c (one EC add per (window, point) pair), so c grows
    with N until the per-window bucket reduction (~2^(c-1) lane-adds)
    stops being negligible.  c ~ log2(N) - 4, clamped."""
    return max(2, min(MAX_WINDOW_BITS, n.bit_length() - 4))


class MsmPlan:
    """Compiled MSM for a fixed point-count N (points are a runtime input,
    so one plan serves every polynomial committed against any SRS slice of
    the same padded length)."""

    def __init__(self, n: int, window_group: int | None = None,
                 window_bits: int | None = None):
        self.n = n
        self.G1 = device_g1()
        self.Fq = fq_field()
        self.Fr = fr_field()
        cfg = get_config()
        c = window_bits if window_bits is not None else \
            (cfg.msm_window_bits or pick_window_bits(n))
        if not 2 <= c <= 16:
            raise ValueError(
                f"msm window_bits must be in [2, 16], got {c}: _digits "
                "reads at most two 16-bit limbs per window, so wider "
                "windows would silently drop scalar bits")
        self.window_bits = c
        # W = ceil(257/c): guarantees the top window's raw bits + the
        # incoming signed-rewrite carry stay < 2^(c-1), so no carry ever
        # leaves the last window (scalars are < 2^255)
        self.num_windows = -(-257 // c)
        self.nb = 1 << (c - 1)        # weighted reduction runs over
                                      # |d| < nb; |d| = nb rides the
                                      # nb*full_sum term
        if window_group is None:
            # cap gathered-point memory (config: msm_group_slots point-slots
            # per group); at >= 2^20 points even one window's gather/scan
            # working set is ~1.3 GB — single-window groups under the
            # lax.scan group loop keep the reused buffer set minimal
            window_group = max(
                1, min(self.num_windows, cfg.msm_group_slots // max(n, 1)))
            if n >= (1 << 20):
                window_group = 1
        while self.num_windows % window_group:
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
        # compile-lean bit-serial tier for tiny point counts: the full
        # sort/gather/bucket pipeline inlines ~7 EC-add instantiations
        # (~1-2 min of XLA:CPU compile PER PLAN SIZE on the 1-core test
        # host); MSB-first double-and-add needs ONE, and at n <= 512 the
        # 512-step ladder's execution cost is trivial on any backend
        self.serial = self.n_pad <= cfg.msm_serial_max
        # fused-Pallas scan eligibility + 14-bit engine choice are static
        # per plan (the em table layout depends on them: the 14-bit scan
        # consumes a Montgomery-R14 pre-scaled table, _build_em)
        from .limb import _pallas_wanted
        nc0 = self.n_pad // self.chunk_len
        lanes0 = self.wg * nc0
        self.use_pallas_scan = (
            (_pallas_wanted() or cfg.ec_limb14_force)
            and lanes0 % cfg.ec_tile == 0)
        self.use14 = self.use_pallas_scan and cfg.ec_limb14
        self._msm_fn = jax.jit(self._msm_jit)
        self._msm_affine_fns = {}
        self._msm_totals_fns = {}
        self._prep_fn = None
        self._serial_fn = None

    # -- digit extraction ----------------------------------------------------

    def _digits(self, scalar_limbs):
        """(16, N) uint32 16-bit canonical limbs -> (W, N) int32 SIGNED
        c-bit digits, |d| <= 2^(c-1): scalar = sum_w d_w * 2^(cw).
        The signed rewrite (d >= 2^(c-1) -> d - 2^c, carry +1) is a
        W-step static sweep of cheap int ops; W = ceil(257/c) keeps the
        top window small enough to absorb the final carry."""
        wb = self.window_bits
        nl = scalar_limbs.shape[0]
        mask = (1 << wb) - 1
        zero = jnp.zeros_like(scalar_limbs[0]).astype(jnp.int32)
        raw = []
        for w in range(self.num_windows):
            o = wb * w
            i, s = o >> 4, o & 15
            if i >= nl:              # windows past 256 bits (small c)
                raw.append(zero)
                continue
            d = scalar_limbs[i] >> s
            if s + wb > 16 and i + 1 < nl:
                d = d | (scalar_limbs[i + 1] << (16 - s))
            raw.append((d & mask).astype(jnp.int32))
        half = 1 << (wb - 1)
        out = []
        carry = jnp.zeros_like(raw[0])
        for w in range(self.num_windows):
            t = raw[w] + carry
            neg = t >= half
            out.append(jnp.where(neg, t - 2 * half, t))
            carry = neg.astype(jnp.int32)
        return jnp.stack(out)                             # (W, N) signed

    # -- element-major point table -------------------------------------------

    def _build_em(self, px, py):
        """(L, n) affine coord pairs -> MATERIALIZED (2*n_pad, 2L)
        element-major table: row i = (x_i, y_i), row n_pad+i = (x_i, -y_i).
        A limb-major (L, N)[:, order] gather copies L strided 4-byte words
        per index (~7 GB/s effective, measured — random-access bound);
        rows of this table are 2L contiguous words, and the digit sign
        folds into the gather INDEX (a post-gather where(sign, neg(y), y)
        on the (cl, L, lanes) result cost 37 ms of unfused XLA carry
        chains per MSM, one neg of the (L, n) source is ~1 ms)."""
        Fq = self.Fq
        if self.n_pad != self.n:
            pad = self.n_pad - self.n
            gen = self.G1.generator_affine                # (L, 1) x2 numpy
            px = jnp.concatenate(
                [px, jnp.broadcast_to(gen[0], (px.shape[0], pad))], axis=-1)
            py = jnp.concatenate(
                [py, jnp.broadcast_to(gen[1], (py.shape[0], pad))], axis=-1)
        if self.use14:
            # Montgomery base change R16 -> R14 for the 14-bit scan: one
            # mul by mont16(2^8) = 2^392 mod p makes every table entry
            # the R14-canonical form the kernel regroups bit-exactly
            # (ops/pallas_field.py, 14-bit engine notes)
            from .limb import _int_to_limbs
            c392 = jnp.asarray(_int_to_limbs(
                Fq.spec, (1 << 392) % Fq.spec.modulus)[:, None])
            px = Fq.mul(px, c392)
            py = Fq.mul(py, c392)
        em = jnp.concatenate([
            jnp.concatenate([px, py], axis=0),
            jnp.concatenate([px, Fq.neg(py)], axis=0)], axis=-1).T
        # the barrier forces the transposed copy to MATERIALIZE: XLA
        # otherwise fuses the transpose into the gather's operand and
        # reads end up strided again (measured: no speedup without it)
        return jax.lax.optimization_barrier(em)           # (2*n_pad, 2L)

    def prepare_points(self, points):
        """Stage a fixed point set (e.g. the SRS) as the element-major
        device table ONCE; pass the result wherever `points` is accepted.
        Skips ~25 ms of per-dispatch table rebuilding (neg + transpose).
        The serial tier consumes raw coordinate tuples: no-op there."""
        if self.serial or self._is_em(points):
            return points
        if self._prep_fn is None:
            self._prep_fn = jax.jit(self._build_em)
        px, py, _ = points
        return self._prep_fn(px, py)

    @staticmethod
    def _is_em(points):
        """True if `points` is a prepared element-major table (2-D array
        rather than the ((L,N),)*3 projective tuple)."""
        return not isinstance(points, (tuple, list))

    # -- per-window-group kernel ------------------------------------------------

    def _window_group_totals(self, em, digits):
        """digits (Wg, N) SIGNED; points (L, N) STRICTLY AFFINE (z = 1;
        pads are the generator with scalar 0) come pre-staged as the
        element-major table `em` (see _build_em) -> window totals
        (Wg, L, 1) x3.

        All EC arithmetic runs on FLATTENED (L, lanes) arrays so the fused
        Pallas EC-add kernel fires (lanes = Wg*nc for the chunked prefix
        scan, Wg*nb for the bucket phase).  The prefix scan uses the
        11-mul complete MIXED addition (ops/ec.py add_mixed) — the table
        operand is affine by construction — and gathers only x, y; a
        negative digit negates the gathered y (one Fq sub + select)."""
        G1 = self.G1
        Fq = self.Fq
        wg, n = digits.shape
        L = self.Fq.L
        absd = jnp.abs(digits)                           # 0..4096
        sign = (digits < 0).astype(jnp.int32)
        shift = (n - 1).bit_length()
        if shift + self.window_bits + 1 <= 31:
            # pack (|digit|, sign, index) into ONE int32 key: a
            # single-operand sort beats argsort's two-operand comparator
            # network ~2x on TPU (argsort lowers to a (key, iota)
            # variadic sort AND a separate take_along_axis)
            iota = jax.lax.broadcasted_iota(jnp.int32, (wg, n), 1)
            packed = jnp.bitwise_or(jnp.bitwise_or(
                jnp.left_shift(absd, shift + 1),
                jnp.left_shift(sign, shift)), iota)
            skey = jax.lax.sort(packed, dimension=-1)    # (Wg, N)
            order = jnp.bitwise_and(skey, (1 << shift) - 1)
            ssign = jnp.bitwise_and(
                jnp.right_shift(skey, shift), 1)
            sd = jnp.right_shift(skey, shift + 1)
        else:  # |digit|+sign+index exceed 31 bits (domains >= 2^17)
            order = jnp.argsort(absd, axis=-1)           # (Wg, N)
            sd = jnp.take_along_axis(absd, order, axis=-1)
            ssign = jnp.take_along_axis(sign, order, axis=-1)

        cl = self.chunk_len
        nc = n // cl

        # element-major gather: each row is one point's 2L contiguous
        # words; the (Wg, nc, cl, 2L) -> (cl, 2L, Wg*nc) transpose back
        # is regular and rides at HBM bandwidth.  The digit sign selects
        # the (x, -y) half of the table via the index.
        g = jax.lax.optimization_barrier(
            em[order + n * ssign])                       # (Wg, N, 2L)
        g = g.reshape(wg, nc, cl, 2 * L).transpose(2, 3, 0, 1)
        g = g.reshape(cl, 2 * L, wg * nc)
        lanes0 = wg * nc
        psc = None
        psc_em = None
        if self.use_pallas_scan:
            # whole chunk scan in ONE pallas launch (VMEM-carried
            # accumulator): the per-step XLA scan below costs ~55 ms per
            # 2^16 MSM against a ~21 ms VPU floor (launch + carry HBM
            # round-trip per step)
            from . import pallas_field as pf
            if self.use14 and get_config().ec_scan_em:
                psc_em = pf.ec_scan_mixed14_em(g)        # (cl, lanes, 3L)
                ps = None
            elif self.use14:
                psc = pf.ec_scan_mixed14(g)              # (cl, 3L, Wg*nc)
                ps = (psc[:, :L], psc[:, L:2 * L], psc[:, 2 * L:])
            else:
                ps = pf.ec_scan_mixed(g)                 # (cl, L, Wg*nc) x3
        else:
            xs = (g[:, :L], g[:, L:])
            ident = G1.broadcast_identity((), lanes0)    # (L, Wg*nc)

            def body(carry, x):
                nxt = G1.add_mixed(carry, x)
                return nxt, nxt
            _, ps = jax.lax.scan(body, ident, xs)        # (cl, L, Wg*nc) x3

        # chunk offsets: EXCLUSIVE prefix of the chunk totals along nc, per
        # window.  Rolled Hillis-Steele in a fori_loop (ONE G1.add
        # instantiation) over the full (L, Wg*nc) lane grid: log2(nc) wide
        # fused steps instead of nc sequential steps on Wg lanes — the
        # old <128-lane sequential scan ran unfused and cost ~90 ms per
        # 2^16 MSM on the TPU.  Cross-window roll contamination lands only
        # on lanes with pos < shift, which the mask keeps unchanged.
        offsets_st = None
        if self.use14 and nc > 1:
            # exclusive chunk-offset scan in ONE kernel launch over
            # (nc steps, wg lanes padded to a tile): the Hillis-Steele
            # fallback below issues log2(nc) separate EC-add launches
            from . import pallas_field as pf
            cfg14 = get_config()
            wpad = -(-wg // cfg14.ec_tile) * cfg14.ec_tile
            if psc_em is not None:
                seq = jnp.transpose(
                    psc_em[-1].reshape(wg, nc, 3 * L), (1, 2, 0))
            else:
                last3 = psc[-1].reshape(3 * L, wg, nc)   # (3L, wg, nc)
                seq = jnp.transpose(last3, (2, 0, 1))    # (nc, 3L, wg)
            seq = jnp.pad(seq, [(0, 0), (0, 0), (0, wpad - wg)])
            off_seq = pf.ec_scan_excl14(seq)             # (nc, 3L, wpad)
            offsets_st = jnp.transpose(
                off_seq[..., :wg], (1, 2, 0)).reshape(3 * L, wg * nc)
        elif self.use14:                                 # nc == 1
            offsets_st = jnp.concatenate(
                G1.broadcast_identity((), wg * nc), axis=0)
        elif nc == 1:
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

        # weighted bucket reduction via the TELESCOPING identity: with
        # P(t) the inclusive prefix-scan value at sorted index t and
        # t_d = last index with |digit| <= d (-1 if none),
        #   sum_{d=1..NB} d*B_d = NB*P(N-1) - sum_{d=0..NB-1} P(t_d)
        # (a bucket-e point appears in P(t_d) for every d >= e, so its
        # coefficient is NB - (NB - e) = e; bucket-0/pad points cancel).
        # One gather of NB prefix points per window + a log-depth halving
        # tree replaces per-bucket diffs and the two skewed scans — and
        # needs no empty-bucket or |d| = NB special cases at all.
        NB = self.nb
        buckets = jnp.arange(NB, dtype=jnp.int32)

        tails = jax.vmap(
            lambda row: jnp.searchsorted(row, buckets, side="right")
        )(sd) - 1                                        # (Wg, NB)

        wg_ix = jnp.arange(wg, dtype=jnp.int32)[:, None]

        # element-major copies for the prefix reads (same strided-gather
        # trap as the point gather: each read wants one point = 3L
        # contiguous words, not 3L strided rows; a direct strided gather
        # from the (cl, 3L, lanes) layout regressed the vmapped B=4
        # commit batch 13x, measured)
        lanes = wg * nc
        if psc_em is not None:
            # the element-major scan already emitted this layout
            ps_em = psc_em.reshape(cl * lanes, 3 * L)
        else:
            # element-major transposed copy (41 ms per 2^16 MSM): both
            # replacements measured WORSE — a combined fancy gather
            # regressed the vmapped commit batch 13x, per-limb-row
            # jnp.take regressed the fused MSM 205 vs 135 ms
            stacked = psc if psc is not None else \
                jnp.concatenate(ps, axis=1)
            ps_em = jax.lax.optimization_barrier(
                stacked.transpose(0, 2, 1).reshape(
                    cl * lanes, 3 * L))                  # (cl*lanes, 3L)
        off_em = jax.lax.optimization_barrier(
            offsets_st.T if offsets_st is not None else
            jnp.concatenate(offsets, axis=0).T)          # (lanes, 3L)

        def ps_at(idx):
            """Prefix-scan value at index (Wg, M) -> (L, Wg*M) flat;
            identity at -1.  ONE EC-add launch (ec_add14 on the 14-bit
            path: single stacked output buffer)."""
            m = idx.shape[-1]
            neg = (idx < 0).reshape(wg * m)
            safe = jnp.maximum(idx, 0)
            ci = safe // cl                              # (Wg, M)
            pi = (safe % cl).reshape(wg * m)
            flat_lane = (wg_ix * nc + ci).reshape(wg * m)
            vrows = jax.lax.optimization_barrier(
                ps_em[pi * lanes + flat_lane]).T         # (3L, Wg*M)
            orows = jax.lax.optimization_barrier(
                off_em[flat_lane]).T                     # (3L, Wg*M)
            if self.use14:
                from . import pallas_field as pf
                summed_st = pf.ec_add14(vrows, orows)
                summed = (summed_st[:L], summed_st[L:2 * L],
                          summed_st[2 * L:])
            else:
                vals = (vrows[:L], vrows[L:2 * L], vrows[2 * L:])
                offs = (orows[:L], orows[L:2 * L], orows[2 * L:])
                summed = G1.add(vals, offs)
            ident_b = G1.broadcast_identity((), wg * m)
            return G1.select(neg, ident_b, summed)

        # one shared ps_at call: NB tail reads + the full-sum read (N-1)
        idx = jnp.concatenate(
            [tails, jnp.full((wg, 1), n - 1, jnp.int32)], axis=-1)
        pts_all = ps_at(idx)                             # (L, Wg*(NB+1))
        grid = tuple(c.reshape(L, wg, NB + 1) for c in pts_all)
        full_sum = tuple(c[..., NB] for c in grid)       # (L, Wg)
        cur = tuple(c[..., :NB].reshape(L, wg * NB) for c in grid)

        # two-level radix-SUB serial sum over the bucket axis: each level
        # is ONE lax.scan (one G1.add instantiation — a log-depth halving
        # tree would inline 12 separate ~20k-HLO adds into the graph)
        sa = 1 << ((self.window_bits - 1) // 2)
        sb = NB // sa                                    # NB = sa * sb
        t3 = tuple(c.reshape(L, wg, sa, sb) for c in cur)
        lvl1 = tuple(c.transpose(3, 0, 1, 2).reshape(sb, L, wg * sa)
                     for c in t3)

        from .limb import _pallas_wanted
        cfg = get_config()
        if ((_pallas_wanted() or cfg.ec_limb14_force)
                and (wg * sa) % cfg.ec_tile == 0):
            # level-1 bucket sum in ONE launch (same rationale as the
            # chunk scan above: sb sequential XLA steps cost launch +
            # carry HBM round-trips each)
            from . import pallas_field as pf
            cat = jnp.concatenate(lvl1, axis=1)
            if cfg.ec_limb14:
                s14 = pf.ec_sum_steps14(cat)             # (3L, wg*sa)
                acc1 = (s14[:L], s14[L:2 * L], s14[2 * L:])
            else:
                acc1 = pf.ec_sum_steps(cat)
        else:
            def sum_body(acc, x):
                return G1.add(acc, x), None

            acc1, _ = jax.lax.scan(
                sum_body, G1.broadcast_identity((), wg * sa), lvl1)
        if self.use14:
            from . import pallas_field as pf
            wpad = -(-wg // cfg.ec_tile) * cfg.ec_tile
            # lvl2 sum (sa steps, wg lanes) + the NB*full_sum - sum tail,
            # each ONE kernel launch (the XLA fallback below is sa + ~12
            # separate EC-add launches on tiny lane counts)
            l2 = jnp.concatenate(
                [c.reshape(L, wg, sa) for c in acc1], axis=0)  # (3L,wg,sa)
            l2 = jnp.pad(jnp.transpose(l2, (2, 0, 1)),
                         [(0, 0), (0, 0), (0, wpad - wg)])
            cur_st = pf.ec_sum_steps14(l2)[..., :wg]     # (3L, wg)
            full_st = jnp.concatenate(full_sum, axis=0)  # (3L, wg)
            negc = jnp.concatenate(
                [cur_st[:L], self.Fq.neg(cur_st[L:2 * L]),
                 cur_st[2 * L:]], axis=0)
            tot = pf.ec_double_add14(full_st, negc, NB.bit_length() - 1)
            total = (tot[:L], tot[L:2 * L], tot[2 * L:])
            return tuple(jnp.moveaxis(c, -1, 0)[..., None] for c in total)

        lvl2 = tuple(c.reshape(L, wg, sa).transpose(2, 0, 1)
                     for c in acc1)

        def sum_body2(acc, x):
            return G1.add(acc, x), None

        cur, _ = jax.lax.scan(
            sum_body2, G1.broadcast_identity((), wg), lvl2)   # (L, wg)

        # total = NB * full_sum - sum_d P(t_d)
        acc_nb = jax.lax.fori_loop(
            0, NB.bit_length() - 1, lambda i, a: G1.add(a, a), full_sum)
        total = G1.add(acc_nb, G1.neg(cur))
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
                0, self.window_bits, lambda j, a: G1.add(a, a), acc)
            t = tuple(c[w] for c in (wx, wy, wz))
            return G1.add(acc, t)
        acc = jax.lax.fori_loop(
            0, self.num_windows, body, self.G1.identity)
        return acc

    # -- public ------------------------------------------------------------------

    def _msm_totals_jit(self, em, scalar_limbs):
        """All the N-heavy work: -> LSB-first window totals (W, L, 1) x3
        in projective Montgomery form.  `em` is the prepared element-major
        table (_build_em): points AFFINE (z = 1, no infinity), pads are
        the GENERATOR with scalar 0 — they sort into bucket 0, which the
        weighted reduction never touches — so the mixed-add scan's z2 = 1
        precondition holds on every lane.

        Window groups run under lax.scan, NOT a Python loop: the unrolled
        form inlined every group's ~1.5 GB gather/scan buffers into one
        program and the allocator does not reuse in-program temps — 10
        groups at 2^20 planned ~15 GB and OOMed the chip (measured)."""
        if self.n_pad != self.n:
            pad = self.n_pad - self.n
            scalar_limbs = jnp.concatenate(
                [scalar_limbs, jnp.zeros((scalar_limbs.shape[0], pad),
                                         scalar_limbs.dtype)], axis=-1)
        digits = self._digits(scalar_limbs)              # (W, n_pad)
        ngroups = self.num_windows // self.wg
        if ngroups == 1:
            t = self._window_group_totals(em, digits)
            return t
        dg = digits.reshape(ngroups, self.wg, self.n_pad)

        def body(_, d):
            return None, self._window_group_totals(em, d)

        _, (tx, ty, tz) = jax.lax.scan(body, None, dg)   # (G, wg, L, 1)
        W, L = self.num_windows, self.Fq.L
        return (tx.reshape(W, L, 1), ty.reshape(W, L, 1),
                tz.reshape(W, L, 1))

    def _msm_jit(self, em, scalar_limbs):
        wx, wy, wz = self._msm_totals_jit(em, scalar_limbs)
        # windows were emitted LSB-first; combine expects MSB-first
        if self.use14:
            # whole combine ladder (W windows x c doublings + add) in ONE
            # kernel launch vs ~280 sequential XLA EC-add dispatches
            from . import pallas_field as pf
            L = self.Fq.L
            tile = get_config().ec_tile
            g = jnp.concatenate([wx[::-1], wy[::-1], wz[::-1]], axis=1)
            g = jnp.pad(g, [(0, 0), (0, 0), (0, tile - g.shape[-1])])
            out = pf.ec_combine14(g, self.window_bits)[..., :1]
            return (out[:L], out[L:2 * L], out[2 * L:])
        return self._combine_windows(wx[::-1], wy[::-1], wz[::-1])

    def msm_device(self, points, scalar_limbs):
        """points: ((L,N),)*3 projective Montgomery (the packed SRS
        slice) or a prepared element-major table (prepare_points);
        scalar_limbs: (16, N) canonical 16-bit limbs.  Returns a single
        projective device point (L, 1) x3."""
        if self.serial:
            px, py, pz = points
            return tuple(
                c[0] for c in self._serial_proj_jit_wrapped(
                    px, py, pz, scalar_limbs[None]))
        em = points if self._is_em(points) else self.prepare_points(points)
        tracer.count("msm_dispatch")
        tracer.count("msm_points", self.n)
        return self._msm_fn(em, scalar_limbs)

    @property
    def _serial_proj_jit_wrapped(self):
        if not hasattr(self, "_serial_proj_cached"):
            self._serial_proj_cached = jax.jit(self._serial_proj_jit)
        return self._serial_proj_cached

    def _msm_affine_jit(self, em, limbs_stack):
        """limbs_stack (B, 16, N) -> canonical affine limbs (B, 2, L) +
        at-infinity flags (B,).  B sequential MSMs, the projective->affine
        division (Fermat inverse of Z) and the Montgomery->canonical
        conversion all inside ONE executable: each host-visible dispatch +
        fetch cycle costs ~30 ms on the tunneled backend (measured), and
        the per-commit unpack used to take three of them."""
        Fq = self.Fq
        # vmap, not a Python loop: the loop would inline B copies of the
        # MSM graph (B x the compile time); vmap batches each op instead
        X, Y, Z = jax.vmap(self._msm_jit, in_axes=(None, 0))(
            em, limbs_stack)                         # (B, L, 1) each
        zinv = Fq.pow_const(Z, Fq.spec.modulus - 2)  # 0 stays 0
        ax = Fq.from_mont(Fq.mul(X, zinv))
        ay = Fq.from_mont(Fq.mul(Y, zinv))
        inf = jnp.all(Z == 0, axis=(-2, -1))         # (B,)
        return jnp.stack([ax[..., 0], ay[..., 0]], axis=1), inf

    # -- bit-serial tier (tiny plans) ------------------------------------

    def _serial_proj_jit(self, px, py, pz, limbs_stack):
        """(B, 16, n) canonical limbs -> per-commit projective
        (B, L, 1) x3 with ONE EC-add instantiation: MSB-first
        double-and-add, commits folded into the lane axis (mirrors
        parallel/msm.py::_body_bit_serial)."""
        G1 = self.G1
        L = self.Fq.L
        B, _, n = limbs_stack.shape
        lanes = B * n
        lim = jnp.transpose(limbs_stack, (1, 0, 2)).reshape(16, lanes)
        P3 = tuple(jnp.tile(c, (1, B)) for c in (px, py, pz))
        ident = G1.broadcast_identity((), lanes)
        acc = ident

        def step(i, acc):
            b = 255 - i // 2
            is_dbl = jnp.broadcast_to(i % 2 == 0, (lanes,))
            limb = jax.lax.dynamic_index_in_dim(lim, b // 16, 0,
                                                keepdims=False)
            bit = (limb >> (b % 16).astype(jnp.uint32)) & 1
            other = G1.select(is_dbl, acc,
                              G1.select(bit == 1, P3, ident))
            return G1.add(acc, other)

        acc = jax.lax.fori_loop(0, 512, step, acc)        # (L, B*n)
        rows = tuple(c.reshape(L, B, n).transpose(2, 0, 1) for c in acc)

        def sum_body(a, x):
            return G1.add(a, x), None

        out, _ = jax.lax.scan(
            sum_body, G1.broadcast_identity((), B), rows)  # (L, B)
        return tuple(jnp.moveaxis(c, -1, 0)[..., None] for c in out)

    def _serial_affine_jit(self, px, py, pz, limbs_stack):
        Fq = self.Fq
        X, Y, Z = self._serial_proj_jit(px, py, pz, limbs_stack)
        zinv = Fq.pow_const(Z, Fq.spec.modulus - 2)  # 0 stays 0
        ax = Fq.from_mont(Fq.mul(X, zinv))
        ay = Fq.from_mont(Fq.mul(Y, zinv))
        inf = jnp.all(Z == 0, axis=(-2, -1))         # (B,)
        return jnp.stack([ax[..., 0], ay[..., 0]], axis=1), inf

    SERIAL_GROUP = 4

    def _serial_batch(self, points, limbs_stack):
        """Serial-tier msm_affine_batch: every call pads to ONE batch
        shape so exactly one executable compiles per plan size."""
        px, py, pz = points
        B = limbs_stack.shape[0]
        M = self.SERIAL_GROUP
        pad = (-B) % M
        if pad:
            limbs_stack = jnp.concatenate(
                [limbs_stack, jnp.zeros((pad,) + limbs_stack.shape[1:],
                                        limbs_stack.dtype)], axis=0)
        if self._serial_fn is None:
            self._serial_fn = jax.jit(self._serial_affine_jit)
        out = []
        for s in range(0, B + pad, M):
            tracer.count("msm_dispatch")
            tracer.count("msm_points", self.n * M)
            coords, inf = self._serial_fn(px, py, pz,
                                          limbs_stack[s:s + M])
            coords = np.asarray(jax.device_get(coords)).astype("<u2")
            infh = np.asarray(jax.device_get(inf))
            for b in range(M):
                if infh[b]:
                    out.append(None)
                else:
                    out.append((
                        int.from_bytes(coords[b, 0].tobytes(), "little"),
                        int.from_bytes(coords[b, 1].tobytes(), "little")))
        return out[:B]

    MAX_FUSED_COMMITS = 4

    @property
    def max_fused(self) -> int:
        """Commits fused per dispatch, capped so the vmap'd gather/scan
        working set fits HBM: ~2.5 GB per 2^18-point MSM instance
        (measured OOM at B=4, n=2^18 on the 16 GB chip) -> keep
        B * n <= 2^19 point-slots."""
        return max(1, min(self.MAX_FUSED_COMMITS,
                          (1 << 19) // max(self.n, 1)))

    def msm_affine_batch(self, points, limbs_stack):
        """points: packed SRS slice; limbs_stack (B, 16, N) canonical.
        Returns a list of B affine host points ((x, y) ints or None),
        with ONE dispatch and ONE fetch per group of <=4 (larger fused
        executables would multiply remote compile time)."""
        if self.serial:
            return self._serial_batch(points, limbs_stack)
        B = limbs_stack.shape[0]
        points = points if self._is_em(points) else \
            self.prepare_points(points)
        if B > self.max_fused:
            # pad to a multiple of the group size with zero scalars (the
            # pad rows commit to infinity, dropped below) so only ONE
            # fused executable shape ever compiles — an odd tail size is
            # a fresh ~5 min remote compile (measured at B=3)
            M = self.max_fused
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
        em = points if self._is_em(points) else self.prepare_points(points)
        tracer.count("msm_dispatch")
        tracer.count("msm_points", self.n * B)
        from .. import native
        if native.has_combine_windows():
            return self._start_host_combine(em, limbs_stack)()
        fn = self._msm_affine_fns.get(B)
        if fn is None:
            fn = self._msm_affine_fns[B] = jax.jit(self._msm_affine_jit)
        coords, inf = fn(em, limbs_stack)
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
        em = points if self._is_em(points) else self.prepare_points(points)
        B = limbs_stack.shape[0]
        fn = self._msm_totals_fns.get(B)
        if fn is None:
            fn = self._msm_totals_fns[B] = jax.jit(
                jax.vmap(self._msm_totals_jit, in_axes=(None, 0)))
        from .. import native
        wx, wy, wz = fn(em, limbs_stack)                 # (B, W, L, 1) x3

        def fetch():
            arrs = [np.asarray(jax.device_get(c))[..., 0].astype("<u2")
                    for c in (wx, wy, wz)]               # (B, W, L) u16
            buf = np.stack(arrs, axis=2)                 # (B, W, 3, L)
            return native.g1_combine_windows(
                buf.tobytes(), B, self.num_windows, self.window_bits)

        return fetch

    def msm_affine_batch_start(self, points, limbs_stack):
        """Dispatch the batch now, fetch later (returns a thunk) — lets a
        host round trip overlap the MSM's device time.  Falls back to a
        plain deferred call when the native combine engine is absent."""
        from .. import native
        if self.serial or not native.has_combine_windows():
            return lambda: self.msm_affine_batch(points, limbs_stack)
        points = points if self._is_em(points) else \
            self.prepare_points(points)
        B = limbs_stack.shape[0]
        M = self.max_fused
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
