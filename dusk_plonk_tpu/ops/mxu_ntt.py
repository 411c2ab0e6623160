"""Four-step NTT with the DFT matmuls on the MXU (int8 digit planes).

The butterfly ladder (ops/ntt.py, ops/pallas_field.py) is VPU-bound: every
stage is one Montgomery mul per element, k stages deep — ~2100 u32 vector
ops per element per stage, and the MXU (394 int8 TOPS on v5e vs ~4 T u32
VPU ops/s) sits idle.  This module reformulates the transform so the bulk
arithmetic is int8 matrix multiplies:

  n = n1*n2, j = j2*n1 + j1, k = k1*n2 + k2 (Bailey four-step):
    Y[k1*n2+k2] = sum_{j1} w_n1^{j1 k1} * ( w_n^{j1 k2}
                  * sum_{j2} w_n2^{j2 k2} x[j2*n1+j1] )
  i.e. reshape to an (n2, n1) grid, multiply by the n2-point DFT matrix,
  twiddle elementwise, transpose, multiply by the n1-point DFT matrix.

Modular matmul on the MXU: both operands decompose into BALANCED base-256
digit planes (digits in [-128, 127] -> exact int8 products; 33 planes cover
the <2^256 Montgomery representatives incl. the recode carry).  The DFT
matrix W rides as Montgomery-form digit planes (w*R mod p), the data X is
already Montgomery (x*R), so one Montgomery reduction of the plane
accumulator P[s] = sum_{l+l'=s} W_l' X_l yields Mont(w*x) directly.

The reduction divides by R' = 2^272 (17 limbs: the 520-bit accumulator
value exceeds the R*N bound of a 2^256 reduction), leaving a 2^-16 factor
per matmul step; both factors fold into the mid twiddle table (stored as
Mont(w_n^{j1 k2} * 2^32)), so pre/post scale tables stay unchanged.

Plane -> field element runs in a fused Pallas kernel (_reduce_kernel): a
65-step signed carry sweep turns int32 planes into base-256 digits, then
one truncated + one full product-column pass performs the wide Montgomery
reduction — all in VMEM (the XLA lowering of a 17x34-limb product
materializes ~50 MB of HBM temporaries per 2^16 elements).

Digit-plane accumulation bound: |digit| <= 128, contraction length mi,
33 plane pairs per output plane -> |P| <= 33 * mi * 2^14, which stays
below int31 for mi <= 2^11; `supported(k)` gates the path accordingly
(k <= 22 with the balanced n1/n2 split).

Reference equivalent: the poly-commit crate's Fft (usage reference
src/prover.rs:121-124, src/prover/quotient_poly.rs:54-66).  Differentially
tested against ops/ntt.py and the host oracle in tests/test_mxu_ntt.py.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.constants import R_MOD
from .limb import fr_field, FR_SPEC, _int_to_limbs

D_DIG = 33            # balanced base-256 digit planes for a < 2^256 value
D_PLANES = 2 * D_DIG - 1   # 65 product planes
RED_L = 17            # reduction divides by R' = 2^(16*17)
MAX_CONTRACT = 1 << 11     # |P| <= 33 * mi * 2^14 must stay < 2^31


def supported(k: int) -> bool:
    """True if the 2^k domain fits the int32 plane-accumulator bound
    (correctness only; the efficiency floor is config.ntt_mxu_min_k)."""
    n1 = 1 << ((k + 1) // 2)
    return 2 <= n1 <= MAX_CONTRACT


# ---------------------------------------------------------------------------
# host-side digit tables
# ---------------------------------------------------------------------------


def _balanced_digits_host(vals) -> np.ndarray:
    """list of ints in [0, 2^256) -> (33, n) int8 balanced base-256 digits.
    digit_i = byte_i(v + H) - 128 with H = 0x8080..80 (32 bytes): adding H
    then subtracting 128 per byte is exactly the balanced recode."""
    H = int.from_bytes(b"\x80" * 32, "little")
    buf = b"".join((int(v) + H).to_bytes(33, "little") for v in vals)
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(len(vals), 33)
    out = raw.astype(np.int16)
    out[:, :32] -= 128
    return out.astype(np.int8).T.copy()            # (33, n)


def _dft_matrix_digits(m: int, base: int) -> np.ndarray:
    """(33, m, m) int8: balanced digit planes of Mont(base^(i*j) mod p),
    the m-point DFT matrix in Montgomery form."""
    R = FR_SPEC.mont_r
    pows = [1] * m
    for i in range(1, m):
        pows[i] = pows[i - 1] * base % R_MOD
    dig = _balanced_digits_host([v * R % R_MOD for v in pows])  # (33, m)
    idx = (np.outer(np.arange(m, dtype=np.int64),
                    np.arange(m, dtype=np.int64)) % m).astype(np.int32)
    return dig[:, idx]                              # (33, m, m)


# ---------------------------------------------------------------------------
# device digit decomposition
# ---------------------------------------------------------------------------


def _to_digits(F, x):
    """(..., 16, N) u32 Montgomery limbs -> (..., 33, N) int8 balanced
    digits.  Closed form: digits = bytes(x + 0x8080..80) - 128 and the
    carry-out becomes plane 32 (see _balanced_digits_host)."""
    hrow = np.full((16, 1), 0x8080, np.uint32)
    y, cout = F._ks(x + jnp.asarray(hrow))          # carried limbs + bool
    lo = (y & 0xFF).astype(jnp.int16) - 128
    hi = (y >> 8).astype(jnp.int16) - 128
    inter = jnp.concatenate(
        [lo[..., None, :], hi[..., None, :]], axis=-2)      # (...,16,2,N)
    d32 = inter.reshape(x.shape[:-2] + (32,) + x.shape[-1:])
    top = cout[..., None, :].astype(jnp.int16)
    return jnp.concatenate([d32, top], axis=-2).astype(jnp.int8)


# ---------------------------------------------------------------------------
# fused plane -> field reduction (Pallas)
# ---------------------------------------------------------------------------

from .pallas_field import (_product_cols, _carry, _sub_borrow,
                           _interpret_default)


def _reduce_kernel(p_ref, c_ref, o_ref):
    """planes (65, T) int32 -> canonical-range Montgomery limbs (16, T).

    c_ref (17, 3): column 0 = N'' = -p^-1 mod 2^272 limbs, column 1 = p
    limbs (rows 16 zero-padded), column 2 unused padding."""
    T = p_ref.shape[1]
    npp = c_ref[:, 0:1] + jnp.zeros((RED_L, T), jnp.uint32)   # (17, T)
    mod16 = c_ref[:16, 1:2]                                   # (16, 1)
    mod = mod16 + jnp.zeros((16, T), jnp.uint32)

    # signed carry sweep: planes -> 68 base-256 digits (the total value is
    # non-negative, so the final carry is non-negative and < 2^24)
    carry = jnp.zeros((1, T), jnp.int32)
    digits = []
    for s in range(D_PLANES):
        r = p_ref[s:s + 1] + carry
        digits.append(r & 0xFF)
        carry = r >> 8                       # arithmetic shift
    digits.append(carry & 0xFF)
    digits.append((carry >> 8) & 0xFF)
    digits.append((carry >> 16) & 0xFF)      # 68 digits = 34 limbs
    # pair digits into 16-bit limbs
    rows = [
        (digits[2 * r] | (digits[2 * r + 1] << 8)).astype(jnp.uint32)
        for r in range(34)]
    t34 = jnp.concatenate(rows, axis=0)                       # (34, T)

    # wide Montgomery reduction by R' = 2^272:
    #   m = (T mod R') * N'' mod R';  out = (T + m*p) / R'  (< 2p)
    m1 = _carry(_product_cols(t34[:RED_L], npp, RED_L))       # (17, T)
    mn = _product_cols(m1, mod, 34)                           # (34, T)
    full = _carry(t34 + mn)
    hi = full[RED_L:RED_L + 16]                               # (16, T)
    diff, borrow = _sub_borrow(hi, mod)
    o_ref[:] = jnp.where(borrow != 0, hi, diff)


@lru_cache(maxsize=None)
def _reduce_consts() -> np.ndarray:
    spec = FR_SPEC
    rbits = RED_L * 16
    npp = (-pow(spec.modulus, -1, 1 << rbits)) % (1 << rbits)
    c = np.zeros((RED_L, 3), np.uint32)
    c[:, 0] = np.frombuffer(
        npp.to_bytes(RED_L * 2, "little"), dtype="<u2").astype(np.uint32)
    c[:16, 1] = _int_to_limbs(spec, spec.modulus)
    return c


@lru_cache(maxsize=None)
def _reduce_call(n: int, tile: int, interpret: bool):
    grid = (n // tile,)
    ps = pl.BlockSpec((D_PLANES, tile), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((RED_L, 3), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((16, tile), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _reduce_kernel,
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32),
        grid=grid,
        in_specs=[ps, cs],
        out_specs=os,
        interpret=interpret,
    )


def reduce_planes(planes, interpret: bool | None = None, tile: int = 512):
    """(..., 65, N) int32 product planes -> (..., 16, N) Montgomery limbs,
    value = (sum_s planes[s] * 2^(8s)) * 2^-272 mod p."""
    if interpret is None:
        interpret = _interpret_default()
    lead = planes.shape[:-2]
    n = planes.shape[-1]
    flat = planes.reshape((-1, D_PLANES, n))
    pad = (-n) % tile
    if pad:
        flat = jnp.pad(flat, [(0, 0), (0, 0), (0, pad)])
    consts = jnp.asarray(_reduce_consts())
    outs = [
        _reduce_call(n + pad, tile, interpret)(flat[b], consts)[..., :n]
        for b in range(flat.shape[0])]
    out = jnp.stack(outs) if len(outs) > 1 else outs[0][None]
    return out.reshape(lead + (16, n))


# ---------------------------------------------------------------------------
# modular matmul: digit-plane einsum + reduction
# ---------------------------------------------------------------------------


def mod_matmul(F, wd, x):
    """wd (33, mo, mi) int8 digit planes of a Montgomery-form constant
    matrix; x (..., 16, mi, t) Montgomery limb tensor.  Returns
    (..., 16, mo, t) = Mont(W @ X) * 2^-16 (the R'-reduction residue —
    callers fold the 2^16 into a following twiddle/scale mul)."""
    lead = x.shape[:-3]
    mi, t = x.shape[-2], x.shape[-1]
    mo = wd.shape[1]
    xd = _to_digits(F, x.reshape(lead + (16, mi * t)))
    xd = xd.reshape((-1, D_DIG, mi, t))                   # (B, 33, mi, t)
    B = xd.shape[0]

    planes = jnp.zeros((B, D_PLANES, mo, t), jnp.int32)
    for l in range(D_DIG):
        q = jnp.einsum("wij,bjt->bwit", wd, xd[:, l],
                       preferred_element_type=jnp.int32)  # (B, 33, mo, t)
        planes = planes.at[:, l:l + D_DIG].add(q)
    out = reduce_planes(planes.reshape(B, D_PLANES, mo * t))
    return out.reshape(lead + (16, mo, t))


# ---------------------------------------------------------------------------
# the four-step transform
# ---------------------------------------------------------------------------


class MxuNttTables:
    """Direction-specific device tables (ride as jit arguments)."""

    def __init__(self, k: int, base: int):
        n = 1 << k
        n1 = 1 << ((k + 1) // 2)
        n2 = n // n1
        F = fr_field()
        # DFT matrices: step 1 contracts j2 (n2-point), step 2 j1 (n1-point)
        w1 = pow(base, n2, R_MOD)                 # n1-point root
        w2 = pow(base, n1, R_MOD)                 # n2-point root
        self.w2d = jnp.asarray(_dft_matrix_digits(n2, w2))
        self.w1d = jnp.asarray(_dft_matrix_digits(n1, w1))
        # mid twiddle Mont(base^(j1*k2) * 2^32): the two R'-reduction
        # residues (2^-16 each) cancel against the 2^32
        full = F.powers_host_base(base, n, scale=(1 << 32) % R_MOD)
        idx = (np.outer(np.arange(n2, dtype=np.int64),
                        np.arange(n1, dtype=np.int64)) % n).astype(np.int32)
        self.mid = jnp.take(full, jnp.asarray(idx.reshape(-1)), axis=1)


def four_step(F, k: int, x, tables, pre_scale, post_scale):
    """x (..., 16, n) Montgomery -> DFT along the element axis (natural
    order in and out).  tables: MxuNttTables pytree (w2d, w1d, mid)."""
    n = 1 << k
    n1 = 1 << ((k + 1) // 2)
    n2 = n // n1
    lead = x.shape[:-2]
    x = F.mul(x, pre_scale)
    g = x.reshape(lead + (16, n2, n1))
    g = mod_matmul(F, tables["w2d"], g)                  # (..,16,n2,n1)
    g = F.mul(g.reshape(lead + (16, n)), tables["mid"])
    g = g.reshape(lead + (16, n2, n1))
    g = jnp.swapaxes(g, -1, -2)                          # (..,16,n1,n2)
    g = mod_matmul(F, tables["w1d"], g)                  # (..,16,n1,n2)
    out = g.reshape(lead + (16, n))                      # k1 major ✓
    return F.mul(out, post_scale)
