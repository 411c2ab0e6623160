"""Pallas TPU kernels for Montgomery field arithmetic.

The XLA-level mul (ops/limb.py) materializes (L, L, N) product tensors and
pad-reshape binning buffers in HBM — measured ~13 ms per 2^16-element Fr
mul on hardware, entirely memory-bound.  These kernels keep the whole
schoolbook + Montgomery reduction in VMEM per tile:

* product columns via L shifted multiply-accumulates on (L, T) tiles
  (full sublane/lane utilization, no reshapes, no HBM intermediates);
* Kogge-Stone carries as masked sublane rolls;
* one fused kernel per mul — HBM traffic is exactly 3 x (L, T) per tile.

`emit_mont_mul` is the in-kernel emitter, reusable inside larger fused
kernels (EC addition, quotient chunks).  Differentially tested against
LimbField.mul in tests/test_pallas_field.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import get_config
from .limb import FieldSpec, FR_SPEC, FQ_SPEC, _int_to_limbs

MASK16 = 0xFFFF


def _shift_rows_val(x, d):
    """Shift rows toward higher indices by d, zero-filling (on values)."""
    if d == 0:
        return x
    rows = x.shape[0]
    rolled = pltpu.roll(x, d, axis=0)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(idx >= d, rolled, jnp.uint32(0))


def _ks_carry(s):
    """Kogge-Stone carry resolution on (K, T) rows each < 2^17."""
    K = s.shape[0]
    g = (s >> 16).astype(jnp.uint32)
    p = ((s & MASK16) == MASK16).astype(jnp.uint32)
    d = 1
    while d < K:
        g = g | (p & _shift_rows_val(g, d))
        p = p & _shift_rows_val(p, d)
        d *= 2
    return (s + _shift_rows_val(g, 1)) & MASK16


def _carry(cols):
    """Lazy rows < 2^22 -> carried 16-bit limbs (mod 2^(16K))."""
    lo = cols & MASK16
    hi = cols >> 16
    return _ks_carry(lo + _shift_rows_val(hi, 1))


def _product_cols_trunc(a, b, out_rows):
    """Truncated (mod-R) anti-diagonal sums: masked-roll accumulation —
    used for the m-product whose out_rows < La+Lb (rows shifted past
    out_rows drop, matching Montgomery mod-R semantics)."""
    La = a.shape[0]
    Lb = b.shape[0]
    cols = None
    for i in range(La):
        prod = a[i:i + 1] * b                      # (Lb, T) exact u32
        pad = [(0, max(out_rows - Lb, 0)), (0, 0)]
        lo = jnp.pad(prod & MASK16, pad)[:out_rows]
        hi = jnp.pad(prod >> 16, pad)[:out_rows]
        term = _shift_rows_val(lo, i) + _shift_rows_val(hi, i + 1)
        cols = term if cols is None else cols + term
    return cols


def _product_cols(a, b, out_rows):
    """Anti-diagonal column sums of the schoolbook product: a (La, T) times
    b (Lb, T) -> (out_rows, T), rows < 2^21.

    Pre-shifted-operand scheme: b rides in the full (La+Lb+1)-row space
    and is ROLLED by one row per iteration, so each partial product lands
    at its final row offset and accumulates with plain adds — no pads, no
    iota masks (the circular roll only ever wraps guaranteed-zero guard
    rows).  ~40% fewer vector ops per iteration than the masked-roll
    scheme (the data movement dominated, not the multiplies)."""
    La = a.shape[0]
    Lb = b.shape[0]
    full = La + Lb
    if out_rows < full:
        return _product_cols_trunc(a, b, out_rows)
    T = a.shape[1]
    bs = jnp.pad(b, [(0, full - Lb), (0, 0)])      # guard rows stay zero
    lo_acc = None
    hi_acc = None
    for i in range(La):
        if i:
            # rows occupied: i..i+Lb-1; top guard row is always zero, so
            # the circular wrap inserts zeros — no mask needed
            bs = pltpu.roll(bs, 1, axis=0)
        prod = a[i:i + 1] * bs                     # (full, T) exact u32
        lo = prod & MASK16
        hi = prod >> 16
        lo_acc = lo if lo_acc is None else lo_acc + lo
        hi_acc = hi if hi_acc is None else hi_acc + hi
    # hi limbs belong one row up; top row of hi_acc is zero (row full-1
    # only occupied by lo of the last partial), so the wrap is clean
    cols = lo_acc + pltpu.roll(hi_acc, 1, axis=0)
    return jnp.pad(cols, [(0, out_rows - full), (0, 0)])[:out_rows]


def _sub_borrow(a, b):
    """a - b (carried rows) -> (diff, borrow(1,T))."""
    K = a.shape[0]
    one0 = (jax.lax.broadcasted_iota(jnp.uint32, a.shape, 0)
            == 0).astype(jnp.uint32)
    s = a + (MASK16 ^ b) + one0
    g = (s >> 16).astype(jnp.uint32)
    p = ((s & MASK16) == MASK16).astype(jnp.uint32)
    d = 1
    while d < K:
        g = g | (p & _shift_rows_val(g, d))
        p = p & _shift_rows_val(p, d)
        d *= 2
    diff = (s + _shift_rows_val(g, 1)) & MASK16
    borrow = (g[K - 1:K] == 0).astype(jnp.uint32)   # (1, T): 1 if borrow
    return diff, borrow


def emit_mont_mul_sep(a, b, mod_col, np_col):
    """In-kernel Montgomery mul, separated-operand form (three product
    passes over a 2L+1-row workspace).  Kept as the differential oracle
    for the CIOS emitter below; same signature."""
    L = a.shape[0]
    T = a.shape[1]
    # materialize the (L, 1) -> (L, T) broadcasts with an add: Mosaic
    # cannot lower a value broadcast in both sublanes and lanes at once
    z = jnp.zeros((L, T), jnp.uint32)
    mod = mod_col + z
    npr = np_col + z

    t = _carry(_product_cols(a, b, 2 * L + 1))
    m = _carry(_product_cols(t[:L], npr, L))
    mn = _product_cols(m, mod, 2 * L + 1)
    full = _carry(t + mn)
    hi = full[L:2 * L]
    diff, borrow = _sub_borrow(hi, mod)
    return jnp.where(borrow != 0, hi, diff)


def emit_mont_mul(a, b, mod_col, np_col):
    """In-kernel Montgomery mul on (L, T) value tiles — CIOS (coarsely
    integrated operand scanning): the a*b product and the per-word
    reduction interleave in ONE (L+1)-row accumulator, so every partial
    product is a 25-row multiply instead of the separated form's 49-row
    guard-space multiplies (~2x fewer vector ops; the multiplies and
    lo/hi splits dominate the kernel).

    Per outer word i: acc += a_i*b; m = (-acc_0/N)_16; acc += m*N; then
    acc shifts one row down folding acc_0's carry (acc_0 = 0 mod 2^16 by
    construction).  Lazy rows stay < 25*2^18 < 2^23 — one carry pass at
    the end.  mod_col/np_col: (L, 1) values (pallas kernels may not
    capture array constants — they ride as inputs); only row 0 of np_col
    (= -N^-1 mod 2^16) is used."""
    L = a.shape[0]
    T = a.shape[1]
    zrow = jnp.zeros((1, T), jnp.uint32)
    z = jnp.zeros((L, T), jnp.uint32)
    mod = mod_col + z
    b_pad = jnp.concatenate([b, zrow], axis=0)             # (L+1, T)
    n_pad = jnp.concatenate([mod, zrow], axis=0)           # (L+1, T)
    n0 = np_col[0:1]                                       # (1, 1)
    acc = jnp.zeros((L + 1, T), jnp.uint32)
    for i in range(L):
        p1 = a[i:i + 1] * b_pad                            # exact u32
        acc = acc + (p1 & MASK16) + pltpu.roll(p1 >> 16, 1, axis=0)
        m = ((acc[0:1] & MASK16) * n0) & MASK16
        p2 = m * n_pad
        acc = acc + (p2 & MASK16) + pltpu.roll(p2 >> 16, 1, axis=0)
        # downshift: row 0 == 0 mod 2^16; fold its carry into the new row 0
        new0 = acc[1:2] + (acc[0:1] >> 16)
        acc = jnp.concatenate([new0, acc[2:], zrow], axis=0)
    out = _carry(acc)[:L]      # value < 2p < 2^(16L): top row carried to 0
    diff, borrow = _sub_borrow(out, mod)
    return jnp.where(borrow != 0, out, diff)


def emit_add_mod(a, b, mod):
    """In-kernel modular add on carried (L, T) values."""
    s = _ks_carry(a + b)
    diff, borrow = _sub_borrow(s, mod)
    return jnp.where(borrow != 0, s, diff)


def emit_sub_mod(a, b, mod):
    """In-kernel modular sub on carried (L, T) values."""
    d, borrow = _sub_borrow(a, b)
    wrapped = _ks_carry(d + mod)
    return jnp.where(borrow != 0, wrapped, d)


def _emit_mul12(x, mod):
    """12*x = 8x + 4x via 4 modular adds: replaces the b3 Montgomery mul
    (b = 4, b3 = 12) at ~1/15 the vector work."""
    x2 = emit_add_mod(x, x, mod)
    x4 = emit_add_mod(x2, x2, mod)
    x8 = emit_add_mod(x4, x4, mod)
    return emit_add_mod(x8, x4, mod)


def emit_ec_add(p, q, mod_col, np_col):
    """Complete projective G1 addition (RCB15 alg.7, a=0) fused in-kernel:
    12 Montgomery muls (b3-muls are add chains) with NO HBM intermediates
    (the XLA version round-trips ~40 (L, N) buffers through HBM per
    addition)."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    L, T = x1.shape
    zz = jnp.zeros((L, T), jnp.uint32)
    mod = mod_col + zz

    def mul(a, b):
        return emit_mont_mul(a, b, mod_col, np_col)

    add = lambda a, b: emit_add_mod(a, b, mod)
    sub = lambda a, b: emit_sub_mod(a, b, mod)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = mul(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))
    x3 = mul(add(x1, z1), add(x2, z2))
    y3 = sub(x3, add(t0, t2))
    x3 = add(t0, t0)
    t0 = add(x3, t0)
    t2 = _emit_mul12(t2, mod)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = _emit_mul12(y3, mod)
    x3 = mul(t4, y3)
    t2 = mul(t3, t1)
    x3 = sub(t2, x3)
    y3 = mul(y3, t0)
    t1 = mul(t1, z3)
    y3 = add(t1, y3)
    t0 = mul(t0, t3)
    z3 = mul(z3, t4)
    z3 = add(z3, t0)
    return x3, y3, z3


def emit_ec_add_mixed(p, q2, mod_col, np_col):
    """Complete MIXED addition: q = (x2, y2) strictly affine (z2 = 1,
    never infinity) — 11 Montgomery muls.  Correct for p = identity,
    p = q, p = -q (RCB15 mixed specialization, a=0)."""
    x1, y1, z1 = p
    x2, y2 = q2
    L, T = x1.shape
    zz = jnp.zeros((L, T), jnp.uint32)
    mod = mod_col + zz

    def mul(a, b):
        return emit_mont_mul(a, b, mod_col, np_col)

    add = lambda a, b: emit_add_mod(a, b, mod)
    sub = lambda a, b: emit_sub_mod(a, b, mod)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t3 = mul(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))              # x1y2 + x2y1
    t4 = add(y1, mul(y2, z1))              # y1 + y2 z1
    y3 = add(x1, mul(x2, z1))              # x1 + x2 z1
    x3 = add(t0, t0)
    t0 = add(x3, t0)                       # 3 x1x2
    t2 = _emit_mul12(z1, mod)              # b3 z1
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = _emit_mul12(y3, mod)
    x3 = mul(t4, y3)
    t2 = mul(t3, t1)
    x3 = sub(t2, x3)
    y3 = mul(y3, t0)
    t1 = mul(t1, z3)
    y3 = add(t1, y3)
    t0 = mul(t0, t3)
    z3 = mul(z3, t4)
    z3 = add(z3, t0)
    return x3, y3, z3


def _ec_add_kernel(px_ref, py_ref, pz_ref, qx_ref, qy_ref, qz_ref,
                   c_ref, ox_ref, oy_ref, oz_ref):
    x3, y3, z3 = emit_ec_add(
        (px_ref[:], py_ref[:], pz_ref[:]),
        (qx_ref[:], qy_ref[:], qz_ref[:]),
        c_ref[:, 0:1], c_ref[:, 1:2])
    ox_ref[:] = x3
    oy_ref[:] = y3
    oz_ref[:] = z3


def _ec_add_mixed_kernel(px_ref, py_ref, pz_ref, qx_ref, qy_ref,
                         c_ref, ox_ref, oy_ref, oz_ref):
    x3, y3, z3 = emit_ec_add_mixed(
        (px_ref[:], py_ref[:], pz_ref[:]),
        (qx_ref[:], qy_ref[:]),
        c_ref[:, 0:1], c_ref[:, 1:2])
    ox_ref[:] = x3
    oy_ref[:] = y3
    oz_ref[:] = z3


@lru_cache(maxsize=None)
def _ec_consts():
    """(24, 2): Fq modulus, -p^-1 mod R."""
    spec = FQ_SPEC
    nprime = (-pow(spec.modulus, -1, 1 << spec.bits)) % (1 << spec.bits)
    return np.stack([_int_to_limbs(spec, spec.modulus),
                     _int_to_limbs(spec, nprime)], axis=1)


@lru_cache(maxsize=None)
def _ec_add_call(n: int, tile: int, interpret: bool):
    L = FQ_SPEC.limbs
    grid = (n // tile,)
    bs = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((L, 2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n), jnp.uint32)
    return pl.pallas_call(
        _ec_add_kernel,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[bs] * 6 + [cs],
        out_specs=(bs, bs, bs),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _ec_add_mixed_call(n: int, tile: int, interpret: bool):
    L = FQ_SPEC.limbs
    grid = (n // tile,)
    bs = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((L, 2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n), jnp.uint32)
    return pl.pallas_call(
        _ec_add_mixed_kernel,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[bs] * 5 + [cs],
        out_specs=(bs, bs, bs),
        interpret=interpret,
    )


def ec_add_mixed(p, q2, interpret: bool | None = None):
    """Fused complete mixed addition: p ((24,N),)*3 + q2 ((24,N),)*2
    affine.  Same tiling rules as ec_add."""
    n = p[0].shape[-1]
    tile = get_config().ec_tile
    consts = jnp.asarray(_ec_consts())
    if interpret is None:
        interpret = _interpret_default()
    pad = (-n) % tile
    if pad:
        def pd(c):
            return jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, pad)])
        p = tuple(pd(c) for c in p)
        q2 = tuple(pd(c) for c in q2)
    out = _ec_add_mixed_call(n + pad, tile, interpret)(
        p[0], p[1], p[2], q2[0], q2[1], consts)
    if pad:
        out = tuple(c[..., :n] for c in out)
    return out


def ec_add(p, q, interpret: bool | None = None):
    """Fused complete G1 addition on ((24,N),)*3 point tuples.  Tile is
    128 lanes: the full RCB DAG at wider tiles aborts the Mosaic register
    allocator (SIGABRT at T=512, measured).  Odd lane counts are padded
    to the tile (the formula computes garbage on pad lanes; sliced off)."""
    n = p[0].shape[-1]
    tile = get_config().ec_tile
    consts = jnp.asarray(_ec_consts())
    if interpret is None:
        interpret = _interpret_default()
    pad = (-n) % tile
    if pad:
        def pd(c):
            return jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, pad)])
        p = tuple(pd(c) for c in p)
        q = tuple(pd(c) for c in q)
    out = _ec_add_call(n + pad, tile, interpret)(
        p[0], p[1], p[2], q[0], q[1], q[2], consts)
    if pad:
        out = tuple(c[..., :n] for c in out)
    return out


# ---------------------------------------------------------------------------
# 14-bit lazy-reduction Fq engine (in-kernel).
#
# The 16-bit CIOS above is ALU-bound (measured: the fused scan runs at
# ~1 vector op per cycle) and burns most of its ops on the per-product
# hi/lo split + roll that u32 exactness forces on 16x16 products.  With
# 14-bit limbs (L=28, R = 2^392) products are < 2^30, so partial products
# accumulate RAW into the CIOS workspace and a cheap fold pass runs only
# every few iterations — ~1.5x fewer vector ops per Montgomery mul, and
# modular adds become single vector adds (no carry, no conditional
# subtract) because the representation tolerates lazy values.
#
# Conventions:
#  * a value is (rows, hi, val): (29, T) u32 rows (28 limbs + guard),
#    per-row bound `hi`, value bound `val` — bounds are PYTHON ints
#    tracked at trace time, with hard asserts at every overflow hazard;
#  * the Montgomery radix is R14 = 2^392.  Kernel INPUTS must already be
#    Montgomery-R14 canonical values (X * 2^392 mod p, < p) packed as
#    16-bit limbs — produced from the pipeline's Montgomery-R16 form by
#    ONE XLA-level mul with mont16(2^8) (see ops/msm.py _build_em); the
#    in-kernel _to14/_from14 are then pure bit regroups.  Kernel outputs
#    regrouped back to 16-bit limbs read, in R16 terms, as the projective
#    triple scaled by a uniform 2^8 — projectively the same point, which
#    every downstream group op accepts and the final X/Z affine division
#    cancels exactly (the end-to-end MSM result is byte-identical);
#  * subtraction adds a borrow-lent multiple of p whose limbs dominate
#    the subtrahend's per-row bound (_m_rep), keeping rows unsigned.
# ---------------------------------------------------------------------------

L14 = 28
MASK14 = 0x3FFF
_Q = FQ_SPEC.modulus
_N0_14 = (-pow(_Q, -1, 1 << 14)) % (1 << 14)
_Q14_LIMBS = tuple((_Q >> (14 * j)) & MASK14 for j in range(L14))


def _const_rows(limbs, T):
    """(len(limbs), T) constant built from Python ints (scalar constants
    fold in Mosaic; captured jnp arrays do not lower)."""
    rows = [jnp.full((1, T), int(v), jnp.uint32) for v in limbs]
    return jnp.concatenate(rows, axis=0)


class _V14:
    """A 14-bit-limb value with trace-time bounds."""
    __slots__ = ("x", "hi", "val")

    def __init__(self, x, hi, val):
        assert hi < (1 << 32), f"row bound overflow: {hi:#x}"
        self.x = x      # (L14 + 1, T) rows (top row is carry guard)
        self.hi = hi    # per-row value bound
        self.val = val  # value bound (multiple-of-p slack included)


from functools import lru_cache as _lru


@_lru(maxsize=None)
def _m_rep(limb_need: int, top_need: int):
    """Borrow-lent limbs of c*p (c even, minimal) with every limb >=
    limb_need and the top limb >= top_need: row-wise `m - b` is then
    non-negative for any subtrahend b with those bounds, and the value
    added is exactly c*p (= 0 mod p)."""
    for c in range(2, 8192, 2):
        v = c * _Q
        if v >= 1 << (14 * L14):
            break
        m = [(v >> (14 * j)) & MASK14 for j in range(L14)]
        # in_j = units limb j receives from limb j+1 (worth 2^14 each);
        # limb j must end >= its need after receiving and lending
        need = [limb_need] * (L14 - 1) + [top_need]
        inc = [0] * L14
        prev = 0
        for j in range(L14 - 1):
            inc[j] = max(0, -(-(need[j] + prev - m[j]) // (1 << 14)))
            prev = inc[j]
        if m[L14 - 1] - inc[L14 - 2] >= need[L14 - 1]:
            out = [m[j] + (inc[j] << 14) - (inc[j - 1] if j else 0)
                   for j in range(L14)]
            assert all(x >= 0 for x in out)
            assert sum(mm << (14 * j) for j, mm in enumerate(out)) == v
            return tuple(out), max(out), v
    raise AssertionError("no borrow-lent representation found")


def _fold14(v: _V14) -> _V14:
    """One lazy-carry fold: rows -> lo14 + (hi lifted one row).  Value
    unchanged; row bound drops to 2^14 + (hi >> 14)."""
    x = v.x
    lo = x & MASK14
    hi = x >> 14
    return _V14(lo + _shift_rows_val(hi, 1),
                (1 << 14) - 1 + (v.hi >> 14), v.val)


def _ks14(s):
    """Kogge-Stone carry on (K, T) rows each <= 2^15 - 1, mask 14."""
    K = s.shape[0]
    g = (s >> 14).astype(jnp.uint32)
    p = ((s & MASK14) == MASK14).astype(jnp.uint32)
    d = 1
    while d < K:
        g = g | (p & _shift_rows_val(g, d))
        p = p & _shift_rows_val(p, d)
        d *= 2
    return (s + _shift_rows_val(g, 1)) & MASK14


def _sub_borrow14(a, b_limbs):
    """Carried (L14, T) a minus constant limbs -> (diff, borrow)."""
    K = a.shape[0]
    T = a.shape[1]
    binv = _const_rows([MASK14 ^ v for v in b_limbs], T)
    one0 = (jax.lax.broadcasted_iota(jnp.uint32, a.shape, 0)
            == 0).astype(jnp.uint32)
    s = a + binv + one0
    g = (s >> 14).astype(jnp.uint32)
    p = ((s & MASK14) == MASK14).astype(jnp.uint32)
    d = 1
    while d < K:
        g = g | (p & _shift_rows_val(g, d))
        p = p & _shift_rows_val(p, d)
        d *= 2
    diff = (s + _shift_rows_val(g, 1)) & MASK14
    borrow = (g[K - 1:K] == 0).astype(jnp.uint32)
    return diff, borrow


_PROFILE_SKIP = 0   # timing probes only (tools/scan_micro.py): 1 = skip
                    # value cond-subs, 2 = skip output conversion


def _reduce14(v: _V14) -> _V14:
    """Full reduction to carried rows and value < p: fold passes, one
    Kogge-Stone, then a descending ladder of conditional multiple-of-p
    subtracts (sub 2^k p while the slack allows — log passes, not
    val/p)."""
    while v.hi > (1 << 14) + 1:
        v = _fold14(v)
    x = _ks14(v.x)[:L14]
    val = v.val
    while val > _Q and _PROFILE_SKIP != 1:
        ratio = (val - 1) // _Q        # val <= (ratio+1) p
        k = max(0, ratio.bit_length() - 1)
        step = _Q << k                 # largest 2^k p below val
        limbs = tuple((step >> (14 * j)) & MASK14 for j in range(L14))
        diff, borrow = _sub_borrow14(x, limbs)
        x = jnp.where(borrow != 0, x, diff)
        val = max(val - step, step)
    T = x.shape[1]
    return _V14(jnp.concatenate([x, jnp.zeros((1, T), jnp.uint32)], axis=0),
                (1 << 14) - 1, _Q)


def _to14(x16):
    """(24, T) 16-bit limbs of a canonical value v < p -> carried _V14
    of the SAME integer regrouped into 14-bit limbs (no base change —
    callers supply Montgomery-R14 values, see module notes)."""
    rows = []
    for j in range(L14):
        b0 = 14 * j
        i, s = divmod(b0, 16)
        if i >= 24:
            rows.append(jnp.zeros_like(x16[0:1]))
            continue
        w = x16[i:i + 1] >> s
        if 16 - s < 14 and i + 1 < 24:
            w = w | (x16[i + 1:i + 2] << (16 - s))
        rows.append(w & MASK14)
    T = x16.shape[1]
    rows.append(jnp.zeros((1, T), jnp.uint32))
    return _V14(jnp.concatenate(rows, axis=0), (1 << 14) - 1, _Q)


def _from14(v: _V14):
    """Fully-reduced _V14 -> (24, T) 16-bit limbs of the same integer."""
    assert v.hi <= (1 << 14) - 1 and v.val <= _Q
    y = v.x
    rows = []
    for j in range(24):
        b0 = 16 * j
        i, s = divmod(b0, 14)
        w = y[i:i + 1] >> s
        have = 14 - s
        while have < 16 and i + (have + s) // 14 < L14:
            nxt = i + (have + s) // 14
            w = w | (y[nxt:nxt + 1] << have)
            have += 14
        rows.append(w & 0xFFFF)
    return jnp.concatenate(rows, axis=0)


def _mul14(a: _V14, b: _V14) -> _V14:
    """CIOS Montgomery mul in base 2^14: partial products accumulate RAW
    (no per-product split) with fold passes on a bound-driven schedule.

    Returns a LAZY value (rows thin via two folds, value < ~2p) — no
    carry chain, no conditional subtract; callers needing canonical form
    run _reduce14 (the per-step output conversion is the only one)."""
    assert a.hi * b.hi < (1 << 32), "single product overflows u32"
    assert a.val * b.val < _Q * (1 << (14 * L14)), "ab/R >= p"
    T = a.x.shape[1]
    zrow = jnp.zeros((1, T), jnp.uint32)
    b_pad = b.x                                    # (29, T), guard zero
    p_pad = _const_rows(_Q14_LIMBS + (0,), T)
    acc = jnp.zeros((L14 + 1, T), jnp.uint32)
    bound = 0
    growth = a.hi * b.hi + ((1 << 14) - 1) * max(_Q14_LIMBS)
    for i in range(L14 if _PROFILE_SKIP != 3 else 14):
        if bound + growth + (bound >> 14) >= (1 << 32):
            lo = acc & MASK14
            hi = acc >> 14
            acc = lo + _shift_rows_val(hi, 1)
            bound = (1 << 14) - 1 + (bound >> 14)
        p1 = a.x[i:i + 1] * b_pad
        acc = acc + p1
        m = ((acc[0:1] & MASK14) * _N0_14) & MASK14
        p2 = m * p_pad
        acc = acc + p2
        new0 = acc[1:2] + (acc[0:1] >> 14)
        acc = jnp.concatenate([new0, acc[2:], zrow], axis=0)
        bound = bound + growth + (bound >> 14)
    out = _V14(acc, bound, a.val * b.val // (1 << (14 * L14)) + 2 * _Q)
    while out.hi > (1 << 14) + (1 << 6):
        out = _fold14(out)
    return out


def _add14(a: _V14, b: _V14) -> _V14:
    return _V14(a.x + b.x, a.hi + b.hi, a.val + b.val)


def _sub14(a: _V14, b: _V14) -> _V14:
    """a - b via a + (c*p borrow-lent rep - b); b's rows must be within
    the rep's per-limb domination (asserted via bounds)."""
    top = min(b.hi, (b.val >> (14 * (L14 - 1))) + 1)
    limbs, mmax, mval = _m_rep(b.hi, top)
    T = a.x.shape[1]
    mrows = _const_rows(limbs + (0,), T)
    return _V14(a.x + (mrows - b.x), a.hi + mmax, a.val + mval)


def _mul12_14(a: _V14) -> _V14:
    """12*a as lazy adds + one fold (the b3 constant of BLS12-381)."""
    a2 = _add14(a, a)
    a4 = _add14(a2, a2)
    a8 = _add14(a4, a4)
    return _fold14(_add14(a8, a4))


def emit_ec_add_mixed14(p, q2):
    """Complete MIXED addition (RCB15, a=0) on _V14 values: p projective
    (x1, y1, z1), q2 strictly affine (x2, y2) carried.  Same group math
    as emit_ec_add_mixed; ~1.5x fewer vector ops."""
    x1, y1, z1 = p
    x2, y2 = q2
    t0 = _mul14(x1, x2)
    t1 = _mul14(y1, y2)
    t3 = _mul14(_add14(x1, y1), _add14(x2, y2))
    t3 = _fold14(_sub14(t3, _add14(t0, t1)))       # x1y2 + x2y1
    t4 = _add14(y1, _mul14(y2, z1))                # y1 + y2 z1
    y3 = _add14(x1, _mul14(x2, z1))                # x1 + x2 z1
    x3 = _add14(t0, t0)
    t0 = _add14(x3, t0)                            # 3 x1x2
    t2 = _mul12_14(z1)                             # b3 z1
    z3 = _add14(t1, t2)
    t1 = _fold14(_sub14(t1, t2))
    y3 = _mul12_14(y3)
    x3 = _mul14(t4, y3)
    t2 = _mul14(t3, t1)
    x3 = _fold14(_sub14(t2, x3))
    y3 = _mul14(y3, t0)
    t1 = _mul14(t1, z3)
    y3 = _add14(t1, y3)
    t0 = _mul14(t0, t3)
    z3 = _mul14(z3, t4)
    z3 = _add14(z3, t0)
    return x3, _fold14(y3), _fold14(z3)


def emit_ec_add14(p, q):
    """Complete projective addition (RCB15 alg.7, a=0) on _V14 values."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = _mul14(x1, x2)
    t1 = _mul14(y1, y2)
    t2 = _mul14(z1, z2)
    t3 = _mul14(_add14(x1, y1), _add14(x2, y2))
    t3 = _fold14(_sub14(t3, _add14(t0, t1)))
    t4 = _mul14(_add14(y1, z1), _add14(y2, z2))
    t4 = _fold14(_sub14(t4, _add14(t1, t2)))
    x3 = _mul14(_add14(x1, z1), _add14(x2, z2))
    y3 = _fold14(_sub14(x3, _add14(t0, t2)))
    x3 = _add14(t0, t0)
    t0 = _add14(x3, t0)
    t2 = _mul12_14(t2)
    z3 = _add14(t1, t2)
    t1 = _fold14(_sub14(t1, t2))
    y3 = _mul12_14(y3)
    x3 = _mul14(t4, y3)
    t2 = _mul14(t3, t1)
    x3 = _fold14(_sub14(t2, x3))
    y3 = _mul14(y3, t0)
    t1 = _mul14(t1, z3)
    y3 = _add14(t1, y3)
    t0 = _mul14(t0, t3)
    z3 = _mul14(z3, t4)
    z3 = _add14(z3, t0)
    return x3, _fold14(y3), _fold14(z3)


# ---------------------------------------------------------------------------
# Fused EC scan kernels.
#
# The Pippenger chunk scan used to issue chunk_len (=256) separate XLA ops,
# each a fresh pallas launch reading/writing the carry through HBM — the
# scan measured ~55 ms per 2^16 MSM against a ~21 ms VPU floor.  These
# kernels run the WHOLE scan in ONE pallas_call: grid = (lane_tiles, steps)
# with the step axis minor (sequential), the accumulator carried in VMEM
# scratch across grid steps, and block DMAs pipelined by the grid machinery.
# ---------------------------------------------------------------------------


def _ec_scan_mixed_kernel(g_ref, c_ref, ox_ref, oy_ref, oz_ref,
                          accx, accy, accz):
    """Inclusive prefix scan of mixed additions along the step axis.
    g_ref block (1, 2L, T): the step's affine (x, y); scratch persists the
    running sum across the sequential minor grid dim."""
    L = accx.shape[0]
    T = accx.shape[1]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        z = jnp.zeros((L, T), jnp.uint32)
        accx[:] = z
        accy[:] = c_ref[:, 2:3] + z          # Montgomery 1
        accz[:] = z

    x3, y3, z3 = emit_ec_add_mixed(
        (accx[:], accy[:], accz[:]),
        (g_ref[0, :L], g_ref[0, L:]),
        c_ref[:, 0:1], c_ref[:, 1:2])
    accx[:] = x3
    accy[:] = y3
    accz[:] = z3
    ox_ref[0] = x3
    oy_ref[0] = y3
    oz_ref[0] = z3


@lru_cache(maxsize=None)
def _ec_scan_mixed_call(cl: int, lanes: int, tile: int, interpret: bool):
    L = FQ_SPEC.limbs
    grid = (lanes // tile, cl)          # step axis minor => sequential
    gs = pl.BlockSpec((1, 2 * L, tile), lambda l, s: (s, 0, l),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((L, 3), lambda l, s: (0, 0), memory_space=pltpu.VMEM)
    os = pl.BlockSpec((1, L, tile), lambda l, s: (s, 0, l),
                      memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((cl, L, lanes), jnp.uint32)
    return pl.pallas_call(
        _ec_scan_mixed_kernel,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[gs, cs],
        out_specs=(os, os, os),
        scratch_shapes=[pltpu.VMEM((L, tile), jnp.uint32)] * 3,
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _ec_scan_consts():
    """(24, 3): Fq modulus, -p^-1 mod R, Montgomery 1."""
    spec = FQ_SPEC
    nprime = (-pow(spec.modulus, -1, 1 << spec.bits)) % (1 << spec.bits)
    return np.stack([_int_to_limbs(spec, spec.modulus),
                     _int_to_limbs(spec, nprime),
                     _int_to_limbs(spec, spec.mont_r)], axis=1)


def ec_scan_mixed(g, interpret: bool | None = None):
    """g (cl, 2L, lanes) u32 — per-step affine (x, y) rows — -> inclusive
    mixed-add prefix ((cl, L, lanes),)*3 starting from the identity.
    lanes must be a multiple of the EC tile."""
    cl, _, lanes = g.shape
    tile = get_config().ec_tile
    if interpret is None:
        interpret = _interpret_default()
    consts = jnp.asarray(_ec_scan_consts())
    return _ec_scan_mixed_call(cl, lanes, tile, interpret)(g, consts)


def _ec_sum_kernel(g_ref, c_ref, ox_ref, oy_ref, oz_ref,
                   accx, accy, accz):
    """Sum along the step axis (full projective adds); the output block is
    rewritten every step, so the final iteration's value lands."""
    L = accx.shape[0]
    T = accx.shape[1]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        z = jnp.zeros((L, T), jnp.uint32)
        accx[:] = z
        accy[:] = c_ref[:, 2:3] + z
        accz[:] = z

    x3, y3, z3 = emit_ec_add(
        (accx[:], accy[:], accz[:]),
        (g_ref[0, :L], g_ref[0, L:2 * L], g_ref[0, 2 * L:]),
        c_ref[:, 0:1], c_ref[:, 1:2])
    accx[:] = x3
    accy[:] = y3
    accz[:] = z3
    ox_ref[:] = x3
    oy_ref[:] = y3
    oz_ref[:] = z3


@lru_cache(maxsize=None)
def _ec_sum_call(steps: int, lanes: int, tile: int, interpret: bool):
    L = FQ_SPEC.limbs
    grid = (lanes // tile, steps)
    gs = pl.BlockSpec((1, 3 * L, tile), lambda l, s: (s, 0, l),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((L, 3), lambda l, s: (0, 0), memory_space=pltpu.VMEM)
    os = pl.BlockSpec((L, tile), lambda l, s: (0, l),
                      memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, lanes), jnp.uint32)
    return pl.pallas_call(
        _ec_sum_kernel,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[gs, cs],
        out_specs=(os, os, os),
        scratch_shapes=[pltpu.VMEM((L, tile), jnp.uint32)] * 3,
        interpret=interpret,
    )


def ec_sum_steps(g, interpret: bool | None = None):
    """g (steps, 3L, lanes) u32 projective rows -> ((L, lanes),)*3 sum
    along the step axis in ONE launch (identity start)."""
    steps, _, lanes = g.shape
    tile = get_config().ec_tile
    if interpret is None:
        interpret = _interpret_default()
    consts = jnp.asarray(_ec_scan_consts())
    return _ec_sum_call(steps, lanes, tile, interpret)(g, consts)


# ---------------------------------------------------------------------------
# 14-bit EC scan/sum kernels (drop-in upgrades of the two above; inputs
# must be Montgomery-R14 canonical — ops/msm.py pre-scales the point table
# by mont16(2^8), see the 14-bit engine notes).
# ---------------------------------------------------------------------------

# The scratch accumulator stores CANONICAL rows (carried, < p): the
# per-step output conversion must fully reduce anyway, and storing the
# same reduced rows back keeps every in-formula value bound tight for
# free (a lazy accumulator blew the ab/R < p budget through 12*z1).
_ONE14_LIMBS = tuple(((1 << 392) % _Q >> (14 * j)) & MASK14
                     for j in range(L14)) + (0,)


def _acc_in(ref):
    return _V14(ref[:], (1 << 14) - 1, _Q)


def _ec_scan_mixed14_kernel(g_ref, o_ref, accx, accy, accz):
    """S steps per program, ONE stacked (S, 3L, T) output block: on this
    backend every ADDITIONAL pallas output array costs ~25 ms at the 2^16
    scan size (measured: 1 output free, 3 outputs +50 ms, one stacked 3L
    output free again), and blocking S steps per program amortizes the
    grid machinery's per-program cost."""
    L = 24
    T = accx.shape[1]
    S = g_ref.shape[0]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        z = jnp.zeros((L14 + 1, T), jnp.uint32)
        accx[:] = z
        accy[:] = _const_rows(_ONE14_LIMBS, T)
        accz[:] = z

    for si in range(S):
        q = (_to14(g_ref[si, :L]), _to14(g_ref[si, L:]))
        x3, y3, z3 = emit_ec_add_mixed14(
            (_acc_in(accx), _acc_in(accy), _acc_in(accz)), q)
        rx, ry, rz = _reduce14(x3), _reduce14(y3), _reduce14(z3)
        accx[:] = rx.x
        accy[:] = ry.x
        accz[:] = rz.x
        o_ref[si, :L] = _from14(rx)
        o_ref[si, L:2 * L] = _from14(ry)
        o_ref[si, 2 * L:] = _from14(rz)


def _scan_steps_block(cl: int) -> int:
    s = get_config().ec_scan_steps
    while cl % s:
        s //= 2
    return max(s, 1)


@lru_cache(maxsize=None)
def _ec_scan_mixed14_call(cl: int, lanes: int, tile: int, sblk: int,
                          interpret: bool):
    L = FQ_SPEC.limbs
    grid = (lanes // tile, cl // sblk)
    gs = pl.BlockSpec((sblk, 2 * L, tile), lambda l, s: (s, 0, l),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((sblk, 3 * L, tile), lambda l, s: (s, 0, l),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ec_scan_mixed14_kernel,
        out_shape=jax.ShapeDtypeStruct((cl, 3 * L, lanes), jnp.uint32),
        grid=grid,
        in_specs=[gs],
        out_specs=os,
        scratch_shapes=[pltpu.VMEM((L14 + 1, tile), jnp.uint32)] * 3,
        interpret=interpret,
    )


def ec_scan_mixed14(g, interpret: bool | None = None):
    """14-bit engine version of ec_scan_mixed: g rows must hold
    Montgomery-R14 canonical (x, y).  Returns ONE stacked (cl, 3L, lanes)
    array — rows [0:L)=x, [L:2L)=y, [2L:3L)=z — of uniformly-2^8-scaled
    projective triples in Montgomery-R16 form (group-identical)."""
    cl, _, lanes = g.shape
    tile = get_config().ec_tile
    if interpret is None:
        interpret = _interpret_default()
    return _ec_scan_mixed14_call(cl, lanes, tile, _scan_steps_block(cl),
                                 interpret)(g)


def _ec_scan_mixed14_em_kernel(g_ref, o_ref, accx, accy, accz):
    """ec_scan_mixed14 with ELEMENT-MAJOR output (cl, lanes, 3L): the
    bucket phase reads single points (3L contiguous words), and the XLA
    transpose that produced that layout from the stacked form cost 41 ms
    per 2^16 MSM (measured) — here it is one small in-kernel transpose
    per step."""
    L = 24
    T = accx.shape[1]
    S = g_ref.shape[0]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        z = jnp.zeros((L14 + 1, T), jnp.uint32)
        accx[:] = z
        accy[:] = _const_rows(_ONE14_LIMBS, T)
        accz[:] = z

    for si in range(S):
        q = (_to14(g_ref[si, :L]), _to14(g_ref[si, L:]))
        x3, y3, z3 = emit_ec_add_mixed14(
            (_acc_in(accx), _acc_in(accy), _acc_in(accz)), q)
        rx, ry, rz = _reduce14(x3), _reduce14(y3), _reduce14(z3)
        accx[:] = rx.x
        accy[:] = ry.x
        accz[:] = rz.x
        st = jnp.concatenate(
            [_from14(rx), _from14(ry), _from14(rz)], axis=0)   # (3L, T)
        o_ref[si] = st.T                                       # (T, 3L)


@lru_cache(maxsize=None)
def _ec_scan_mixed14_em_call(cl: int, lanes: int, tile: int, sblk: int,
                             interpret: bool):
    L = FQ_SPEC.limbs
    grid = (lanes // tile, cl // sblk)
    gs = pl.BlockSpec((sblk, 2 * L, tile), lambda l, s: (s, 0, l),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((sblk, tile, 3 * L), lambda l, s: (s, l, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ec_scan_mixed14_em_kernel,
        out_shape=jax.ShapeDtypeStruct((cl, lanes, 3 * L), jnp.uint32),
        grid=grid,
        in_specs=[gs],
        out_specs=os,
        scratch_shapes=[pltpu.VMEM((L14 + 1, tile), jnp.uint32)] * 3,
        interpret=interpret,
    )


def ec_scan_mixed14_em(g, interpret: bool | None = None):
    """Element-major-output variant of ec_scan_mixed14: returns
    (cl, lanes, 3L) — row (c, l) is that position's (x, y, z) point as
    3L contiguous words (uniformly-2^8-scaled, group-identical)."""
    cl, _, lanes = g.shape
    tile = get_config().ec_tile
    if interpret is None:
        interpret = _interpret_default()
    return _ec_scan_mixed14_em_call(cl, lanes, tile, _scan_steps_block(cl),
                                    interpret)(g)


def _ec_sum14_kernel(g_ref, o_ref, accx, accy, accz):
    L = 24
    T = accx.shape[1]
    S = g_ref.shape[0]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        z = jnp.zeros((L14 + 1, T), jnp.uint32)
        accx[:] = z
        accy[:] = _const_rows(_ONE14_LIMBS, T)
        accz[:] = z

    for si in range(S):
        q = (_to14(g_ref[si, :L]), _to14(g_ref[si, L:2 * L]),
             _to14(g_ref[si, 2 * L:]))
        x3, y3, z3 = emit_ec_add14(
            (_acc_in(accx), _acc_in(accy), _acc_in(accz)), q)
        rx, ry, rz = _reduce14(x3), _reduce14(y3), _reduce14(z3)
        accx[:] = rx.x
        accy[:] = ry.x
        accz[:] = rz.x
    o_ref[:L] = _from14(_V14(accx[:], (1 << 14) - 1, _Q))
    o_ref[L:2 * L] = _from14(_V14(accy[:], (1 << 14) - 1, _Q))
    o_ref[2 * L:] = _from14(_V14(accz[:], (1 << 14) - 1, _Q))


@lru_cache(maxsize=None)
def _ec_sum14_call(steps: int, lanes: int, tile: int, sblk: int,
                   interpret: bool):
    L = FQ_SPEC.limbs
    grid = (lanes // tile, steps // sblk)
    gs = pl.BlockSpec((sblk, 3 * L, tile), lambda l, s: (s, 0, l),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((3 * L, tile), lambda l, s: (0, l),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ec_sum14_kernel,
        out_shape=jax.ShapeDtypeStruct((3 * L, lanes), jnp.uint32),
        grid=grid,
        in_specs=[gs],
        out_specs=os,
        scratch_shapes=[pltpu.VMEM((L14 + 1, tile), jnp.uint32)] * 3,
        interpret=interpret,
    )


def ec_sum_steps14(g, interpret: bool | None = None):
    """14-bit engine version of ec_sum_steps (canonical projective rows
    in).  Returns ONE stacked (3L, lanes) array (x/y/z row groups) of the
    summed triples, uniformly scaled — group-identical."""
    steps, _, lanes = g.shape
    tile = get_config().ec_tile
    if interpret is None:
        interpret = _interpret_default()
    return _ec_sum14_call(steps, lanes, tile, _scan_steps_block(steps),
                          interpret)(g)


# ---------------------------------------------------------------------------
# 14-bit bucket-phase kernels: the Pippenger tail used to run as ~85
# separate XLA-level EC launches per window group (Hillis-Steele chunk
# offsets, the lvl2 bucket sum, NB doublings, the window combine) — each
# launch costs milliseconds of dispatch + multi-output overhead.  Each
# kernel below runs its whole phase in ONE launch with stacked I/O.
# ---------------------------------------------------------------------------


def _split14(st):
    """(3L, T) canonical 16-bit coordinate rows -> three carried _V14."""
    L = 24
    return (_to14(st[:L]), _to14(st[L:2 * L]), _to14(st[2 * L:]))


def _full_add_rows(rows, q):
    """rows: (x, y, z) canonical 14-limb row arrays; q: _V14 triple.
    One complete add; returns reduced row arrays."""
    p = tuple(_V14(r, (1 << 14) - 1, _Q) for r in rows)
    x3, y3, z3 = emit_ec_add14(p, q)
    return (_reduce14(x3).x, _reduce14(y3).x, _reduce14(z3).x)


def _dbl_rows(rows):
    p = tuple(_V14(r, (1 << 14) - 1, _Q) for r in rows)
    x3, y3, z3 = emit_ec_add14(p, p)
    return (_reduce14(x3).x, _reduce14(y3).x, _reduce14(z3).x)


def _store_rows(o_ref, rows, idx=None):
    L = 24
    groups = [(slice(0, L),), (slice(L, 2 * L),), (slice(2 * L, 3 * L),)]
    for (gslice,), r in zip(groups, rows):
        v = _from14(_V14(r, (1 << 14) - 1, _Q))
        if idx is None:
            o_ref[gslice] = v
        else:
            o_ref[idx, gslice] = v


def _ec_scan_excl14_kernel(g_ref, o_ref, accx, accy, accz):
    """Exclusive prefix scan of complete adds along the step axis (the
    distributed chunk-offset pass): out[s] = sum of g[0..s)."""
    L = 24
    T = accx.shape[1]
    S = g_ref.shape[0]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        z = jnp.zeros((L14 + 1, T), jnp.uint32)
        accx[:] = z
        accy[:] = _const_rows(_ONE14_LIMBS, T)
        accz[:] = z

    for si in range(S):
        _store_rows(o_ref, (accx[:], accy[:], accz[:]), idx=si)
        q = _split14(g_ref[si])
        rx, ry, rz = _full_add_rows((accx[:], accy[:], accz[:]), q)
        accx[:] = rx
        accy[:] = ry
        accz[:] = rz


@lru_cache(maxsize=None)
def _ec_scan_excl14_call(steps: int, lanes: int, tile: int, sblk: int,
                         interpret: bool):
    L = FQ_SPEC.limbs
    grid = (lanes // tile, steps // sblk)
    gs = pl.BlockSpec((sblk, 3 * L, tile), lambda l, s: (s, 0, l),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((sblk, 3 * L, tile), lambda l, s: (s, 0, l),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ec_scan_excl14_kernel,
        out_shape=jax.ShapeDtypeStruct((steps, 3 * L, lanes), jnp.uint32),
        grid=grid,
        in_specs=[gs],
        out_specs=os,
        scratch_shapes=[pltpu.VMEM((L14 + 1, tile), jnp.uint32)] * 3,
        interpret=interpret,
    )


def ec_scan_excl14(g, interpret: bool | None = None):
    """g (steps, 3L, lanes) canonical projective rows -> stacked
    (steps, 3L, lanes) EXCLUSIVE prefix sums (identity at step 0)."""
    steps, _, lanes = g.shape
    tile = min(get_config().ec_tile, lanes)
    if interpret is None:
        interpret = _interpret_default()
    return _ec_scan_excl14_call(steps, lanes, tile, _scan_steps_block(steps),
                                interpret)(g)


def _ec_add14_kernel(a_ref, b_ref, o_ref):
    x3, y3, z3 = emit_ec_add14(_split14(a_ref[:]), _split14(b_ref[:]))
    _store_rows(o_ref, (_reduce14(x3).x, _reduce14(y3).x, _reduce14(z3).x))


@lru_cache(maxsize=None)
def _ec_add14_call(lanes: int, tile: int, interpret: bool):
    L = FQ_SPEC.limbs
    bs = pl.BlockSpec((3 * L, tile), lambda l: (0, l),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ec_add14_kernel,
        out_shape=jax.ShapeDtypeStruct((3 * L, lanes), jnp.uint32),
        grid=(lanes // tile,),
        in_specs=[bs, bs],
        out_specs=bs,
        interpret=interpret,
    )


def ec_add14(a, b, interpret: bool | None = None):
    """Complete add of stacked (3L, lanes) canonical projective rows ->
    stacked (3L, lanes), ONE launch, ONE output buffer."""
    _, lanes = a.shape
    cfg = get_config()
    tile = min(cfg.ec_tile, lanes)
    pad = (-lanes) % tile
    if interpret is None:
        interpret = _interpret_default()
    if pad:
        a = jnp.pad(a, [(0, 0), (0, pad)])
        b = jnp.pad(b, [(0, 0), (0, pad)])
    out = _ec_add14_call(lanes + pad, tile, interpret)(a, b)
    return out[..., :lanes] if pad else out


def _ec_double_add14_kernel(a_ref, b_ref, o_ref, *, k):
    """out = 2^k * a + b (the NB * full_sum - sum term of the weighted
    bucket reduction; the caller negates b up front)."""
    rows = tuple(v.x for v in _split14(a_ref[:]))

    def body(i, rows):
        return _dbl_rows(rows)

    rows = jax.lax.fori_loop(0, k, body, rows)
    x3, y3, z3 = emit_ec_add14(
        tuple(_V14(r, (1 << 14) - 1, _Q) for r in rows),
        _split14(b_ref[:]))
    _store_rows(o_ref, (_reduce14(x3).x, _reduce14(y3).x, _reduce14(z3).x))


@lru_cache(maxsize=None)
def _ec_double_add14_call(lanes: int, tile: int, k: int, interpret: bool):
    L = FQ_SPEC.limbs
    bs = pl.BlockSpec((3 * L, tile), lambda l: (0, l),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_ec_double_add14_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((3 * L, lanes), jnp.uint32),
        grid=(lanes // tile,),
        in_specs=[bs, bs],
        out_specs=bs,
        interpret=interpret,
    )


def ec_double_add14(a, b, k: int, interpret: bool | None = None):
    """Stacked canonical (3L, lanes): 2^k * a + b in ONE launch (the
    doublings run in an in-kernel fori_loop — one add instantiation)."""
    _, lanes = a.shape
    cfg = get_config()
    tile = min(cfg.ec_tile, lanes)
    pad = (-lanes) % tile
    if interpret is None:
        interpret = _interpret_default()
    if pad:
        a = jnp.pad(a, [(0, 0), (0, pad)])
        b = jnp.pad(b, [(0, 0), (0, pad)])
    out = _ec_double_add14_call(lanes + pad, tile, k, interpret)(a, b)
    return out[..., :lanes] if pad else out


def _ec_combine14_kernel(g_ref, o_ref, *, wbits):
    """MSB-first window combine: acc = 2^wbits * acc + T_w over the
    window axis of g (W, 3L, T) — the whole ladder in ONE launch."""
    W = g_ref.shape[0]
    T = g_ref.shape[2]
    zrow = jnp.zeros((L14 + 1, T), jnp.uint32)
    one = _const_rows(_ONE14_LIMBS, T)
    rows0 = (zrow, one, zrow)

    def outer(w, rows):
        def dbl(i, r):
            return _dbl_rows(r)

        rows = jax.lax.fori_loop(0, wbits, dbl, rows)
        tw = _split14(g_ref[w])
        return _full_add_rows(rows, tw)

    rows = jax.lax.fori_loop(0, W, outer, rows0)
    _store_rows(o_ref, rows)


@lru_cache(maxsize=None)
def _ec_combine14_call(nwin: int, lanes: int, wbits: int, interpret: bool):
    L = FQ_SPEC.limbs
    gs = pl.BlockSpec((nwin, 3 * L, lanes), lambda: (0, 0, 0),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((3 * L, lanes), lambda: (0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_ec_combine14_kernel, wbits=wbits),
        out_shape=jax.ShapeDtypeStruct((3 * L, lanes), jnp.uint32),
        in_specs=[gs],
        out_specs=os,
        interpret=interpret,
    )


def ec_combine14(g, wbits: int, interpret: bool | None = None):
    """g (W, 3L, lanes) canonical, windows MSB-first -> (3L, lanes)
    combined acc = sum_w 2^(wbits*(W-1-w)) T_w."""
    nwin, _, lanes = g.shape
    if interpret is None:
        interpret = _interpret_default()
    return _ec_combine14_call(nwin, lanes, wbits, interpret)(g)


def _mul_kernel(a_ref, b_ref, c_ref, o_ref):
    o_ref[:] = emit_mont_mul(a_ref[:], b_ref[:],
                             c_ref[:, 0:1], c_ref[:, 1:2])


@lru_cache(maxsize=None)
def _field_consts(spec: FieldSpec):
    """(L, 2) numpy: column 0 = modulus limbs, column 1 = -p^-1 mod R."""
    nprime = (-pow(spec.modulus, -1, 1 << spec.bits)) % (1 << spec.bits)
    return np.stack([_int_to_limbs(spec, spec.modulus),
                     _int_to_limbs(spec, nprime)], axis=1)


@lru_cache(maxsize=None)
def _mul_call(spec: FieldSpec, n: int, tile: int, interpret: bool):
    L = spec.limbs
    grid = (n // tile,)
    bs = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((L, 2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=grid,
        in_specs=[bs, bs, cs],
        out_specs=bs,
        interpret=interpret,
    )


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def mont_mul(spec: FieldSpec, a, b, interpret: bool | None = None,
             tile: int | None = None):
    """Batched Montgomery mul on (L, N) arrays.  Tiles lanes at 1024/512
    (odd lane counts padded); interpret mode auto-enables off-TPU (for the
    CPU test suite)."""
    if a.ndim != 2 or a.shape != b.shape:
        raise ValueError("mont_mul expects equal 2-D (L, N) operands")
    n = a.shape[-1]
    consts = jnp.asarray(_field_consts(spec))
    if interpret is None:
        interpret = _interpret_default()
    big = tile if tile is not None else get_config().mul_tile
    t = next((c for c in (big, 512) if n % c == 0), None)
    if t is None:
        pad = (-n) % 512
        a = jnp.pad(a, [(0, 0), (0, pad)])
        b = jnp.pad(b, [(0, 0), (0, pad)])
        return _mul_call(spec, n + pad, 512, interpret)(a, b, consts)[..., :n]
    return _mul_call(spec, n, t, interpret)(a, b, consts)


def fr_mul(a, b):
    return mont_mul(FR_SPEC, a, b)


def fq_mul(a, b):
    return mont_mul(FQ_SPEC, a, b)


# ---------------------------------------------------------------------------
# Fused NTT butterfly kernels.
#
# The XLA stage loop costs ~5 full HBM passes per stage (mul, two rolls,
# select chain — measured 15 ms/stage on (2,16,2^19), ~80 GB/s effective).
# Two kernels cut the whole ladder to ~1 + n_global passes:
#
#  * `ntt_local_stages`: all stages with half < T run back-to-back in VMEM
#    on each (L, T) tile — one read, one write for ~s_T stages.  Their
#    twiddle vectors are block-independent ((j & (half-1)) << (k-1-s)
#    depends only on the lane), so one (s_T, L, T) table serves every tile.
#  * `ntt_global_stage`: one butterfly stage with half >= T; each program
#    loads the paired blocks (i, i + half/T) — the pairing rides in the
#    index_map via a scalar-prefetch arg, so ONE compiled kernel serves
#    every global stage of every size.
# ---------------------------------------------------------------------------


def _ntt_local_kernel(x_ref, tws_ref, c_ref, o_ref):
    L, T = x_ref.shape[1], x_ref.shape[2]
    s_t = tws_ref.shape[0]
    mod_col = c_ref[:, 0:1]
    np_col = c_ref[:, 1:2]
    mod = mod_col + jnp.zeros((L, T), jnp.uint32)
    x = x_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.uint32, (L, T), 1)
    for s in range(s_t):
        half = 1 << s
        tw = tws_ref[s]
        t = emit_mont_mul(x, tw, mod_col, np_col)
        # pltpu.roll requires non-negative shifts; -half == T - half (circular)
        tr = pltpu.roll(t, T - half, axis=1)
        xl = pltpu.roll(x, half, axis=1)
        mask = (lane & half) == 0
        x = jnp.where(mask, emit_add_mod(x, tr, mod),
                      emit_sub_mod(xl, t, mod))
    o_ref[0] = x


@lru_cache(maxsize=None)
def _ntt_local_call(b: int, n: int, tile: int, s_t: int, interpret: bool):
    L = FR_SPEC.limbs
    grid = (b, n // tile)
    bs = pl.BlockSpec((1, L, tile), lambda i, j: (i, 0, j),
                      memory_space=pltpu.VMEM)
    ts = pl.BlockSpec((s_t, L, tile), lambda i, j: (0, 0, 0),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((L, 2), lambda i, j: (0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ntt_local_kernel,
        out_shape=jax.ShapeDtypeStruct((b, L, n), jnp.uint32),
        grid=grid,
        in_specs=[bs, ts, cs],
        out_specs=bs,
        interpret=interpret,
    )


def _ntt_global_kernel(s_ref, x1_ref, x2_ref, tw_ref, c_ref,
                       o1_ref, o2_ref):
    L, T = x1_ref.shape[1], x1_ref.shape[2]
    mod_col = c_ref[:, 0:1]
    np_col = c_ref[:, 1:2]
    mod = mod_col + jnp.zeros((L, T), jnp.uint32)
    x1 = x1_ref[0]
    x2 = x2_ref[0]
    tw = tw_ref[0]
    t = emit_mont_mul(x2, tw, mod_col, np_col)
    o1_ref[0] = emit_add_mod(x1, t, mod)
    o2_ref[0] = emit_sub_mod(x1, t, mod)


@lru_cache(maxsize=None)
def _ntt_global_call(b: int, n: int, tile: int, interpret: bool):
    """Scalar-prefetch arg: (hb, stage) int32 — hb = half // tile; the
    index maps derive the paired block ids from it, so one executable
    serves every global stage.  Outputs are COMPACT half arrays (block p
    of out_a is the sum half of pair p); `_merge_halves` reinterleaves."""
    L = FR_SPEC.limbs

    def first(i, p, s_ref):
        hb = s_ref[0]
        return (i, 0, (p // hb) * (2 * hb) + (p % hb))

    def second(i, p, s_ref):
        hb = s_ref[0]
        return (i, 0, (p // hb) * (2 * hb) + (p % hb) + hb)

    def twid(i, p, s_ref):
        hb = s_ref[0]
        return (s_ref[1], 0, (p // hb) * (2 * hb) + (p % hb) + hb)

    def compact(i, p, s_ref):
        return (i, 0, p)

    grid = (b, n // (2 * tile))
    half_shape = jax.ShapeDtypeStruct((b, L, n // 2), jnp.uint32)
    return pl.pallas_call(
        _ntt_global_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, L, tile), first),
                pl.BlockSpec((1, L, tile), second),
                pl.BlockSpec((1, L, tile), twid),
                pl.BlockSpec((L, 2), lambda i, p, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, L, tile), compact),
                pl.BlockSpec((1, L, tile), compact),
            ],
        ),
        out_shape=(half_shape, half_shape),
        interpret=interpret,
    )


def _merge_halves(a, b_, hb: int, tile: int):
    """Compact half outputs (B, L, n/2) in pair order -> full (B, L, n):
    pair p maps to blocks (g*2hb + r, g*2hb + r + hb) with p = g*hb + r,
    so each group of hb*tile lanes interleaves [a-group, b-group]."""
    B, L, half_n = a.shape
    span = hb * tile
    G = half_n // span
    av = a.reshape(B, L, G, 1, span)
    bv = b_.reshape(B, L, G, 1, span)
    return jnp.concatenate([av, bv], axis=3).reshape(B, L, 2 * half_n)


def ntt_ladder(x, stacked_tw, k: int, tile: int | None = None,
               interpret: bool | None = None):
    """Full butterfly ladder on bit-reversed input x (B, L, n) using the
    stacked (k, L, n) twiddle table.  Returns (B, L, n) natural order."""
    from ..utils.config import get_config
    b, L, n = x.shape
    if interpret is None:
        interpret = _interpret_default()
    if tile is None:
        tile = min(get_config().ntt_tile, n)
    s_t = min(k, tile.bit_length() - 1)
    local_tws = stacked_tw[:s_t, :, :tile]
    x = _ntt_local_call(b, n, tile, s_t, interpret)(
        x, local_tws, jnp.asarray(_field_consts(FR_SPEC)))
    if s_t < k:
        gcall = _ntt_global_call(b, n, tile, interpret)
        consts = jnp.asarray(_field_consts(FR_SPEC))
        for s in range(s_t, k):
            hb = 1 << (s - s_t)
            xa, xb = gcall(jnp.asarray([hb, s], jnp.int32),
                           x, x, stacked_tw, consts)
            x = _merge_halves(xa, xb, hb, tile)
    return x
