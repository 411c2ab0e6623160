"""Device radix-2 NTT over Fr (Montgomery limb representation, limb-major).

TPU-first design decisions (vs the reference's recursive host FFT in the
unmounted poly-commit crate, usage reference src/prover.rs:121-124):

* iterative Cooley-Tukey with a precomputed bit-reversal gather; every
  butterfly stage operates on the FLAT (..., L, n) array — the pairing
  x[k+j] ± w^j x[k+j+m/2] is expressed as two static lane-rolls plus a
  masked select, so the limb-major layout (ops/limb.py) is preserved and
  no stage ever transposes or reshapes the element axis;
* twiddles are per-stage patterns of length m (1 for the first half-block,
  w_m^j for the second) tiled across the array, so each stage is ONE
  batched Montgomery mul + elementwise selects;
* ONE compiled kernel per domain size serves dft / idft / coset_dft /
  coset_idft: direction and coset are encoded entirely in the twiddle and
  pre/post scale *values*, which are runtime inputs (compile once, run all);
* batched: (..., L, n) transforms amortize fixed cost (the prover runs the
  4 wire iFFTs and 11 selector iFFTs as single batched calls).

Differentially tested against poly/domain.py (the host oracle) in
tests/test_device_ntt.py.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.constants import R_MOD, FR_GENERATOR
from ..fields.host import fr_root_of_unity
from .limb import fr_field


def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    out = np.zeros(n, np.int32)
    for _ in range(bits):
        out = (out << 1) | (idx & 1)
        idx >>= 1
    return out


def _powers(base: int, n: int) -> list[int]:
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * base % R_MOD
    return out


class NttPlan:
    """All device-resident tables for one domain size 2^k."""

    def __init__(self, k: int):
        self.k = k
        self.n = 1 << k
        F = fr_field()
        self.F = F
        n = self.n

        w = fr_root_of_unity(k)
        w_inv = pow(w, -1, R_MOD)
        n_inv = pow(n, -1, R_MOD)
        g = FR_GENERATOR
        g_inv = pow(g, -1, R_MOD)

        # numpy: embeds as a trace-time constant (a captured device array
        # costs ~3 ms per jitted call on axon — ops/limb.py)
        self.bitrev = _bitrev_indices(n)

        def stage_twiddles(root):
            """Per-stage (L, m) patterns: ones then w_m^j."""
            tws = []
            for s in range(1, k + 1):
                m = 1 << s
                wm = pow(root, n // m, R_MOD)
                tws.append(F.pack([1] * (m // 2) + _powers(wm, m // 2)))
            return tws

        self.tw_fwd = stage_twiddles(w)
        self.tw_inv = stage_twiddles(w_inv)
        # first-half-of-block masks per stage (static numpy)
        self.masks = [(np.arange(n) % (1 << s)) < (1 << (s - 1))
                      for s in range(1, k + 1)]

        self.scale_one = F.pack([1] * n)
        self.scale_n_inv = F.pack([n_inv] * n)
        self.scale_coset = F.pack(_powers(g, n))
        # coset_idft: iNTT then multiply by g^-i — fold n_inv in
        self.scale_coset_inv = F.pack(
            [p * n_inv % R_MOD for p in _powers(g_inv, n)])

        self._kernel = jax.jit(self._transform)

    # -- the single compiled kernel ------------------------------------------

    def _transform(self, data, twiddles, pre_scale, post_scale):
        """data (..., L, n) Montgomery (limb-major) -> (..., L, n)."""
        F = self.F
        n = self.n
        x = F.mul(data, pre_scale)
        x = jnp.take(x, self.bitrev, axis=-1)
        for s, tw in enumerate(twiddles):
            m = tw.shape[-1]
            half = m // 2
            tw_vec = jnp.tile(tw, n // m)                  # (L, n)
            mask = self.masks[s]                           # (n,) bool
            t = F.mul(x, tw_vec)
            tr = jnp.roll(t, -half, axis=-1)               # t[j+half] at j
            xl = jnp.roll(x, half, axis=-1)                # x[j-half] at j
            x = F.select(mask, F.add(x, tr), F.sub(xl, t))
        return F.mul(x, post_scale)

    # -- public API (Montgomery limb arrays in and out) ------------------------

    def dft(self, coeffs):
        return self._kernel(coeffs, self.tw_fwd, self.scale_one,
                            self.scale_one)

    def idft(self, evals):
        return self._kernel(evals, self.tw_inv, self.scale_one,
                            self.scale_n_inv)

    def coset_dft(self, coeffs):
        return self._kernel(coeffs, self.tw_fwd, self.scale_coset,
                            self.scale_one)

    def coset_idft(self, evals):
        return self._kernel(evals, self.tw_inv, self.scale_one,
                            self.scale_coset_inv)


@lru_cache(maxsize=None)
def ntt_plan(k: int) -> NttPlan:
    return NttPlan(k)
