"""Device (JAX) fixed-limb Montgomery field arithmetic.

TPU-first design (not a port): the reference's 4x64 Montgomery limbs
(src/lib.rs:583-588) assume 64x64->128 hardware multiply, which TPUs lack.
Here a field element is L 16-bit limbs stored in uint32 lanes:

* 16x16 -> 32-bit products are exact in native uint32 VPU multiplies;
* schoolbook columns accumulate lazily (bounded by ~2^22, far below 2^32),
  so carry chains run once per multiply, not once per partial product.

LAYOUT: arrays are LIMB-MAJOR, (..., L, N) — the element axis N is
minormost (fills the 8x128 VPU lanes), limbs live in sublanes.  Carry
propagation and limb shifts are then row operations; with the element axis
minormost they compile to sublane moves instead of the cross-lane shuffles
an (N, L) layout forces (measured 11x faster carries on TPU).  Scalars are
(L, 1) — a one-element batch that broadcasts against any (..., L, N).

Fr uses L=16 (256 bits, R=2^256 — same R as the reference, so Montgomery
values interop bit-for-bit); Fq uses L=24 (384 bits, R=2^384).

The pure-Python host engine (fields/host.py) is the differential oracle;
see tests/test_device_fr.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

MASK16 = 0xFFFF  # Python int: stays a folded literal in traced ops

_PALLAS_PLATFORM = None


def _pallas_wanted() -> bool:
    """Route muls through the Pallas kernel only on TPU backends."""
    global _PALLAS_PLATFORM
    if _PALLAS_PLATFORM is None:
        try:
            _PALLAS_PLATFORM = jax.devices()[0].platform
        except Exception:  # pragma: no cover
            _PALLAS_PLATFORM = "cpu"
    return _PALLAS_PLATFORM == "tpu"


@dataclass(frozen=True)
class FieldSpec:
    """Static parameters of one field's limb representation."""
    name: str
    modulus: int
    limbs: int

    @property
    def bits(self) -> int:
        return self.limbs * 16

    @property
    def mont_r(self) -> int:
        return (1 << self.bits) % self.modulus

    @property
    def mont_r2(self) -> int:
        return pow(self.mont_r, 2, self.modulus)

    @property
    def n0inv(self) -> int:
        """-modulus^-1 mod 2^16 (per-word Montgomery constant)."""
        return (-pow(self.modulus, -1, 1 << 16)) % (1 << 16)


def _int_to_limbs(spec: FieldSpec, x: int) -> np.ndarray:
    return np.frombuffer(
        int(x).to_bytes(spec.limbs * 2, "little"), dtype="<u2"
    ).astype(np.uint32)


class LimbField:
    """JAX ops for one field; all methods are jit-safe and batched over the
    minormost axis (and any extra leading axes)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.limbs
        # Constants are NUMPY, not jnp: a pre-built device array captured
        # in a jitted closure is re-bound per call (measured ~3 ms each on
        # the axon backend), while numpy constants fold into the HLO at
        # trace time for free.  Large tables must be passed as jit ARGS.
        self.mod_limbs = _int_to_limbs(spec, spec.modulus)[:, None]   # (L, 1)
        self.r2 = _int_to_limbs(spec, spec.mont_r2)[:, None]
        self.one_mont = _int_to_limbs(spec, spec.mont_r)[:, None]
        self.zero = np.zeros((self.L, 1), np.uint32)
        self.n0inv = np.uint32(spec.n0inv)
        # -modulus^-1 mod 2^(16L), full width (separated Montgomery reduction)
        nprime = (-pow(spec.modulus, -1, 1 << spec.bits)) % (1 << spec.bits)
        self.nprime_limbs = _int_to_limbs(spec, nprime)[:, None]
        # jitted entry point for host-boundary conversions (eager ops on the
        # axon TPU backend trigger per-op remote compiles — never go eager)
        self._jit_mul = jax.jit(self.mul)

    # -- host <-> device packing ------------------------------------------------

    def pack_host(self, values) -> np.ndarray:
        """Python ints -> (L, N) uint32 limb NUMPY array (canonical, no
        Montgomery, never touches the device — use for host-side staging;
        a device round-trip over the axon tunnel costs minutes per MB)."""
        spec = self.spec
        buf = b"".join(int(v).to_bytes(spec.limbs * 2, "little")
                       for v in values)
        return np.ascontiguousarray(np.frombuffer(buf, dtype="<u2").reshape(
            len(values), spec.limbs).astype(np.uint32).T)      # (L, N)

    def pack(self, values, to_mont: bool = True, shape=None) -> jax.Array:
        """Python ints -> (L, N) uint32 limb array (Montgomery by default).
        With `shape`, returns shape[:-1] + (L, shape[-1])."""
        out = jnp.asarray(self.pack_host(values))              # (L, N)
        if to_mont:
            out = self._jit_mul(out, self.r2)
        if shape is not None:
            out = jnp.moveaxis(out.reshape((self.L,) + tuple(shape)), 0, -2)
        return out

    def pack_scalar(self, value: int, to_mont: bool = True) -> jax.Array:
        return self.pack([value], to_mont)                     # (L, 1)

    def pack_sparse(self, pairs, n: int, to_mont: bool = True) -> jax.Array:
        """[(index, value)] -> (L, n) limb array, zeros elsewhere.  Montgomery
        conversion happens host-side per entry — O(nnz), not O(n)."""
        spec = self.spec
        arr = np.zeros((n, self.L), np.uint32)
        for i, v in pairs:
            if to_mont:
                v = v * spec.mont_r % spec.modulus
            arr[i] = _int_to_limbs(spec, v)
        return jnp.asarray(arr.T)

    def unpack(self, arr, from_mont: bool = True) -> list[int]:
        """(..., L, N) limb array -> flat list of canonical Python ints."""
        if from_mont:
            # numpy constant (an eager device op costs ~120 ms on axon)
            one = np.zeros((self.L, 1), np.uint32)
            one[0, 0] = 1
            arr = self._jit_mul(arr, one)
        host = np.asarray(jax.device_get(arr)).astype("<u2")
        flat = np.moveaxis(host, -2, -1).reshape(-1, self.L)
        return [int.from_bytes(row.tobytes(), "little") for row in flat]

    # -- core arithmetic -----------------------------------------------------------

    @staticmethod
    def _shift_rows(x, d):
        """Shift limb rows up by d (toward higher significance),
        zero-filling: out[..., j, :] = x[..., j-d, :]."""
        pad = jnp.zeros(x.shape[:-2] + (d,) + x.shape[-1:], x.dtype)
        return jnp.concatenate([pad, x[..., :-d, :]], axis=-2)

    def _ks(self, s):
        """Kogge-Stone carry resolution: s (..., K, N) with every row
        < 2^17 (a sum of one 16-bit limb and a small addend).  Returns
        (limbs, carry_out).  Log-depth instead of a K-step ripple."""
        K = s.shape[-2]
        g = (s >> 16).astype(jnp.uint32)                 # carry generate, 0/1
        p = ((s & MASK16) == MASK16).astype(jnp.uint32)  # carry propagate
        d = 1
        while d < K:
            g = g | (p & self._shift_rows(g, d))
            p = p & self._shift_rows(p, d)
            d *= 2
        carry_in = self._shift_rows(g, 1)
        out = (s + carry_in) & MASK16
        return out, g[..., -1, :].astype(bool)

    def _sub_borrow(self, a, b):
        """Limbwise a - b via a + ~b + 1 with Kogge-Stone carries; returns
        (diff, borrow_out).  Inputs must be carried (< 2^16 per limb)."""
        a, b = self._bc(a, b)
        one0 = jnp.zeros((a.shape[-2], 1), jnp.uint32).at[0, 0].set(1)
        s = a + (MASK16 ^ b) + one0
        diff, carry_out = self._ks(s)
        return diff, jnp.logical_not(carry_out)

    def _add_carry(self, a, b):
        """Limbwise a + b with full carry (inputs carried; drops overflow
        beyond the top limb, which callers guarantee is zero)."""
        return self._carry(a + b)

    def _cond_sub_mod(self, a):
        """a - modulus if a >= modulus (expects a < 2*modulus, carried)."""
        diff, borrow = self._sub_borrow(a, self.mod_limbs)
        return jnp.where(borrow[..., None, :], a, diff)

    def _carry(self, t):
        """Full carry propagation of lazy (..., K, N) rows (each < 2^22)
        into 16-bit limbs, mod 2^(16K).  Two-level: fold the high halves one
        row up (still one carry bit per position), then Kogge-Stone."""
        lo = t & MASK16
        hi = t >> 16                       # < 2^6 per row
        s = lo + self._shift_rows(hi, 1)   # each row < 2^16 + 2^6
        out, _ = self._ks(s)
        return out

    def add(self, a, b):
        a, b = self._bc(a, b)
        s = self._carry(a + b)  # lazy sum < 2^17 per row
        return self._cond_sub_mod(s)

    def sub(self, a, b):
        a, b = self._bc(a, b)
        d, borrow = self._sub_borrow(a, b)
        wrapped = self._add_carry(d, jnp.broadcast_to(self.mod_limbs,
                                                      d.shape))
        return jnp.where(borrow[..., None, :], wrapped, d)

    def neg(self, a):
        z = jnp.zeros_like(a)
        is_zero = jnp.all(a == 0, axis=-2, keepdims=True)
        n, _ = self._sub_borrow(
            jnp.broadcast_to(self.mod_limbs, a.shape), a)
        return jnp.where(is_zero, z, n)

    @staticmethod
    def _bc(a, b):
        a = jnp.asarray(a, jnp.uint32)
        b = jnp.asarray(b, jnp.uint32)
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        return jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape)

    def _antidiag_sums(self, p):
        """cols[..., k, :] = sum_{i+j=k} p[..., i, j, :] for p (..., L, L, N),
        output (..., 2L+1, N) (row 2L always 0 — kept for carry headroom).

        Pad-reshape diagonal binning: pad the j axis to width 2L+2 and merge
        (i, j); element (i, j) sits at merged index i*(2L+2) + j =
        i*(2L+1) + (i+j), so re-reading at width 2L+1 puts it in group i,
        row i+j — one reduction over groups sums each anti-diagonal.  The
        element axis N stays minormost throughout: no lane shuffles."""
        L = self.L
        lead = p.shape[:-3]
        n = p.shape[-1]
        w = 2 * L + 1
        padded = jnp.pad(
            p, [(0, 0)] * len(lead) + [(0, 0), (0, L + 2), (0, 0)])
        flat = padded.reshape(lead + (L * (2 * L + 2), n))
        binned = flat[..., : L * w, :].reshape(lead + (L, w, n))
        return jnp.sum(binned, axis=-3)

    def _product_columns(self, a, b, out_cols: int):
        """Lazy anti-diagonal column sums of the schoolbook product a*b:
        cols[k] = sum_{i+j=k} lo(a_i b_j) + sum_{i+j=k-1} hi(a_i b_j),
        truncated to `out_cols` rows.  Row sums stay < 2^21, far below the
        uint32 ceiling."""
        L = self.L
        p = a[..., :, None, :] * b[..., None, :, :]     # (..., L, L, N) exact
        lo = self._antidiag_sums(p & MASK16)            # (..., 2L+1, N)
        hi = self._antidiag_sums(p >> 16)
        hi_shift = self._shift_rows(hi, 1)
        cols = lo + hi_shift
        if out_cols <= 2 * L + 1:
            return cols[..., :out_cols, :]
        return jnp.pad(cols, [(0, 0)] * (cols.ndim - 2)
                       + [(0, out_cols - 2 * L - 1), (0, 0)])

    def mul(self, a, b):
        """Batched Montgomery multiplication, separated-operand form:
            T = a*b;  m = (T mod R) * N' mod R;  out = (T + m*N) / R
        (R = 2^(16L), N' = -N^-1 mod R).  On TPU, large batches route to
        the fused Pallas kernel (ops/pallas_field.py) — the XLA lowering
        materializes the product tensors in HBM (~25x slower measured);
        XLA remains the oracle path on CPU and for small/odd shapes."""
        a, b = self._bc(a, b)
        if _pallas_wanted() and a.shape[-2] == self.L and a.ndim >= 2:
            n = a.shape[-1]
            if n >= 512:
                from . import pallas_field as pf
                if a.ndim == 2:
                    return pf.mont_mul(self.spec, a, b)
                lead = a.shape[:-2]
                fa = a.reshape((-1,) + a.shape[-2:])
                fb = b.reshape((-1,) + b.shape[-2:])
                out = jax.vmap(
                    lambda x, y: pf.mont_mul(self.spec, x, y))(fa, fb)
                return out.reshape(lead + a.shape[-2:])
        return self._mul_xla(a, b)

    def _mul_xla(self, a, b):
        L = self.L
        a, b = self._bc(a, b)

        t = self._carry(self._product_columns(a, b, 2 * L + 1))
        m = self._carry(self._product_columns(
            t[..., :L, :], jnp.broadcast_to(self.nprime_limbs, a.shape), L))
        mn = self._product_columns(
            m, jnp.broadcast_to(self.mod_limbs, a.shape), 2 * L + 1)
        full = self._carry(t + mn)
        # (T + mN) / R < 2N < 2^(16L): rows L..2L-1, row 2L is 0
        return self._cond_sub_mod(full[..., L:2 * L, :])

    def square(self, a):
        return self.mul(a, a)

    def pow_const(self, a, exponent: int):
        """a^e for a Python-int exponent.  Small exponents unroll statically;
        large ones run as a lax.scan over the bit string so the compiled
        graph stays O(1) in the exponent size."""
        e = int(exponent)
        if e == 0:
            return jnp.broadcast_to(self.one_mont, a.shape)
        if e.bit_length() <= 8:
            result = None
            base = a
            while e:
                if e & 1:
                    result = base if result is None else self.mul(result, base)
                e >>= 1
                if e:
                    base = self.mul(base, base)
            return result
        bits = jnp.asarray([int(c) for c in bin(e)[2:]], jnp.uint32)

        def body(acc, bit):
            acc = self.mul(acc, acc)
            acc = jnp.where(bit == 1, self.mul(acc, a), acc)
            return acc, None

        # first bit is always 1: start from a
        acc, _ = jax.lax.scan(body, a, bits[1:])
        return acc

    def inv(self, a):
        """Fermat inverse a^(p-2) (use batch_inv for arrays)."""
        return self.pow_const(a, self.spec.modulus - 2)

    def prefix_mul(self, x):
        """Inclusive prefix product along the ELEMENT (last) axis,
        Hillis-Steele inside ONE lax.fori_loop (body = one mul + one roll).
        An associative_scan combiner inlines every level's Montgomery mul
        into the graph — measured >14 min of remote XLA compile per program
        at 2^19; the rolled loop compiles in seconds and trades a 2x work
        factor the VPU absorbs."""
        n = x.shape[-1]
        if n == 1:
            return x
        nb = (n - 1).bit_length()
        idx = jax.lax.iota(jnp.uint32, n)

        def body(i, arr):
            sh = jnp.left_shift(jnp.uint32(1), i)
            rolled = jnp.roll(arr, sh, axis=-1)
            prod = self.mul(arr, rolled)
            return jnp.where(idx >= sh, prod, arr)

        return jax.lax.fori_loop(0, nb, body, x)

    def batch_inv(self, a):
        """Montgomery's trick over the element axis: 1 Fermat inverse +
        3N multiplications (reference does per-element inversion in the
        quotient loop, src/prover/quotient_poly.rs:111 — this is the
        TPU-friendly replacement). Zero entries map to zero."""
        is_zero = jnp.all(a == 0, axis=-2, keepdims=True)
        safe = jnp.where(is_zero, self.one_mont, a)
        prefix = self.prefix_mul(safe)
        suffix = self.prefix_mul(safe[..., ::-1])[..., ::-1]
        total_inv = self.inv(prefix[..., -1:])
        one = jnp.broadcast_to(self.one_mont, safe[..., :1].shape)
        prefix_excl = jnp.concatenate([one, prefix[..., :-1]], axis=-1)
        suffix_excl = jnp.concatenate([suffix[..., 1:], one], axis=-1)
        out = self.mul(self.mul(prefix_excl, suffix_excl), total_inv)
        return jnp.where(is_zero, jnp.zeros_like(a), out)

    def select(self, cond, a, b):
        """Elementwise select: cond (..., N) bool -> a or b."""
        return jnp.where(cond[..., None, :], a, b)

    def from_mont(self, a):
        """Montgomery -> canonical limbs on device (mul by canonical 1)."""
        one = jnp.zeros((self.L, 1), jnp.uint32).at[0, 0].set(1)
        return self.mul(a, jnp.broadcast_to(one, a.shape))

    def powers(self, base, n: int):
        """[1, base, base^2, ..., base^(n-1)] as (L, n) for a TRACED base.

        Square-and-multiply over the bits of the index inside ONE
        lax.fori_loop whose body is two Montgomery muls — an
        associative_scan combiner would inline ~2·log2(n) muls into the
        graph (measured: >14 min of remote XLA compile at n=2^19; the
        rolled loop compiles in seconds).  For a base known on host use
        `powers_host_base` (zero device muls in the graph but one)."""
        nb = max(1, (n - 1).bit_length())
        idx = jax.lax.iota(jnp.uint32, n)
        out0 = jnp.broadcast_to(self.one_mont, (self.L, n))

        def body(b, carry):
            out, sq = carry
            bit = ((idx >> b) & 1) == 1
            out = jnp.where(bit[None, :], self.mul(out, sq), out)
            return out, self.mul(sq, sq)

        out, _ = jax.lax.fori_loop(0, nb, body, (out0, base))
        return out

    def powers_host_base(self, base_int: int, n: int, scale: int = 1):
        """[scale * base^i] for i<n as (L, n) Montgomery, for a base KNOWN
        ON HOST: two tiny host-computed power tables (~sqrt(n) entries each,
        packed in Montgomery form host-side) and a single broadcast device
        mul — the whole graph is ONE mul, so it compiles instantly and
        uploads ~KBs instead of materializing a scan."""
        spec = self.spec
        p = spec.modulus
        lo_n = 1 << max(1, ((n - 1).bit_length() + 1) // 2)
        hi_n = -(-n // lo_n)
        lo = [1] * lo_n
        for i in range(1, lo_n):
            lo[i] = lo[i - 1] * base_int % p
        stride = lo[-1] * base_int % p
        hi = [scale % p] * hi_n
        for i in range(1, hi_n):
            hi[i] = hi[i - 1] * stride % p
        R = spec.mont_r
        lo_m = jnp.asarray(self.pack_host([v * R % p for v in lo]))
        hi_m = jnp.asarray(self.pack_host([v * R % p for v in hi]))
        return self._jit_outer_powers(lo_m, hi_m, n)

    @partial(jax.jit, static_argnums=(0, 3))
    def _jit_outer_powers(self, lo_m, hi_m, n):
        lo_n = lo_m.shape[-1]
        hi_n = hi_m.shape[-1]
        prod = self.mul(jnp.moveaxis(hi_m, -1, 0)[:, :, None],  # (hi, L, 1)
                        lo_m[None])                             # (1, L, lo)
        return jnp.moveaxis(prod, 0, 1).reshape(
            self.L, hi_n * lo_n)[:, :n]

    def sum_reduce(self, a, axis: int = 0):
        """Modular sum along a BATCH axis (not the limb/element axes) by
        halving (log-depth tree of adds)."""
        a = jnp.moveaxis(a, axis, 0)
        n = a.shape[0]
        while n > 1:
            half = n // 2
            s = self.add(a[:half], a[half:2 * half])
            if n % 2:
                s = jnp.concatenate([s, a[2 * half:n]], axis=0)
                n = half + 1
            else:
                n = half
            a = s
        return a[0]

    def dot(self, coeffs, point_powers):
        """Polynomial evaluation: sum over the element axis of
        coeffs * powers; returns (..., L, 1)."""
        prod = self.mul(coeffs, point_powers)
        n = prod.shape[-1]
        while n > 1:
            half = n // 2
            s = self.add(prod[..., :half], prod[..., half:2 * half])
            if n % 2:
                s = jnp.concatenate([s, prod[..., 2 * half:n]], axis=-1)
                n = half + 1
            else:
                n = half
            prod = s
        return prod


FR_SPEC = FieldSpec(
    name="fr", limbs=16,
    modulus=0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001)
FQ_SPEC = FieldSpec(
    name="fq", limbs=24,
    modulus=0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB)


@lru_cache(maxsize=None)
def fr_field() -> LimbField:
    return LimbField(FR_SPEC)


@lru_cache(maxsize=None)
def fq_field() -> LimbField:
    return LimbField(FQ_SPEC)
