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
