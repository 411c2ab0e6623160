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


@jax.jit
def _stack_stages(W, idx):
    """(L, n) power table + (k, n) stage index rows -> (k, L, n) stacked
    per-stage twiddle vectors (one-time, at plan construction)."""
    k, n = idx.shape
    L = W.shape[0]
    g = jnp.take(W, idx.reshape(-1), axis=1)       # (L, k*n)
    return jnp.moveaxis(g.reshape(L, k, n), 1, 0)


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

        # MXU four-step mode: the twiddle "tables" become a dict of digit-
        # plane DFT matrices + the mid twiddle (ops/mxu_ntt.py); direction
        # is still encoded in the table VALUES, so one executable serves
        # dft/idft/coset variants exactly like the ladder path.
        from ..utils.config import get_config as _gc
        from .limb import _pallas_wanted
        from . import mxu_ntt
        cfg = _gc()
        self.mxu = (cfg.ntt_mxu_min_k is not None
                    and k >= cfg.ntt_mxu_min_k
                    and mxu_ntt.supported(k)
                    and (_pallas_wanted() or cfg.ntt_mxu_force))
        if self.mxu:
            tf = mxu_ntt.MxuNttTables(k, w)
            ti = mxu_ntt.MxuNttTables(k, w_inv)
            self.tw_fwd = {"w2d": tf.w2d, "w1d": tf.w1d, "mid": tf.mid}
            self.tw_inv = {"w2d": ti.w2d, "w1d": ti.w1d, "mid": ti.mid}
            self.scale_one = F.pack([1])
            self.scale_n_inv = F.pack([n_inv])
            self.scale_coset = F.powers_host_base(g, n)
            self.scale_coset_inv = F.powers_host_base(g_inv, n, scale=n_inv)
            self._kernel = jax.jit(self._transform)
            return

        # numpy: embeds as a trace-time constant (a captured device array
        # costs ~3 ms per jitted call on axon — ops/limb.py)
        self.bitrev = _bitrev_indices(n)

        # Stage twiddles, rolled-loop form (the old per-stage unroll
        # inlined k Montgomery muls: minutes of remote XLA compile at
        # 2^19).  Stage s needs w_m^j = W[(j & (half-1)) << (k-1-s)] from
        # the full power table W.  Two servings:
        #  * stacked (k, L, n) per-stage tables, indexed by a contiguous
        #    dynamic slice in the loop — fastest (the per-stage element
        #    gather cost 15 ms/stage at 2^19, measured), k*L*n*4B memory;
        #  * the raw (L, n) power table with an in-loop gather — O(n)
        #    memory, for domains past config.ntt_stacked_max_k.
        from ..utils.config import get_config
        self.stacked = 1 <= k <= get_config().ntt_stacked_max_k
        tw_fwd = F.powers_host_base(w, n)
        tw_inv = F.powers_host_base(w_inv, n)
        if self.stacked:
            idx = np.stack([
                ((np.arange(n) & ((1 << s) - 1)) << (k - 1 - s))
                for s in range(k)]).astype(np.int32)         # (k, n)
            self.tw_fwd = _stack_stages(tw_fwd, idx)
            self.tw_inv = _stack_stages(tw_inv, idx)
        else:
            self.tw_fwd = tw_fwd
            self.tw_inv = tw_inv

        # constant scales as (L, 1) broadcasts — (L, n) copies of "1" and
        # "1/n" cost 0.5 GB each at the k=23 coset domain
        self.scale_one = F.pack([1])
        self.scale_n_inv = F.pack([n_inv])
        self.scale_coset = F.powers_host_base(g, n)
        # coset_idft: iNTT then multiply by g^-i — fold n_inv in
        self.scale_coset_inv = F.powers_host_base(g_inv, n, scale=n_inv)

        # uint16 table storage at big domains: the limb VALUES are 16-bit,
        # so u32 planes are half padding — at k=23 this returns ~1.6 GB
        # of HBM (the 2^20 single-chip proof budget); _transform upcasts
        # per use (transient)
        if n >= (1 << 22) and not self.stacked:
            self.tw_fwd = self.tw_fwd.astype(jnp.uint16)
            self.tw_inv = self.tw_inv.astype(jnp.uint16)
            self.scale_coset = self.scale_coset.astype(jnp.uint16)
            self.scale_coset_inv = self.scale_coset_inv.astype(jnp.uint16)

        self._kernel = jax.jit(self._transform)

    # -- the single compiled kernel ------------------------------------------

    def _transform(self, data, twiddles, pre_scale, post_scale):
        """data (..., L, n) Montgomery (limb-major) -> (..., L, n).
        twiddles: (k, L, n) stacked per-stage vectors, or the (L, n) full
        power table of the stage root (gathered in-loop)."""
        F = self.F
        n = self.n
        k = self.k
        if isinstance(twiddles, dict):
            from . import mxu_ntt
            return mxu_ntt.four_step(F, k, data, twiddles,
                                     pre_scale, post_scale)
        if pre_scale.dtype != jnp.uint32:
            pre_scale = pre_scale.astype(jnp.uint32)
        if post_scale.dtype != jnp.uint32:
            post_scale = post_scale.astype(jnp.uint32)
        x = F.mul(data, pre_scale)
        x = jnp.take(x, self.bitrev, axis=-1)
        if k == 0:
            return F.mul(x, post_scale)
        stacked = twiddles.ndim == 3
        from .limb import _pallas_wanted
        if stacked and n >= 1024 and _pallas_wanted():
            # fused butterfly ladder: local stages batched in VMEM +
            # scalar-prefetch paired-block global stages (~5 HBM passes
            # per stage with the XLA loop below, ~1-2 with the kernels)
            from . import pallas_field as pf
            lead = x.shape[:-2]
            xb = x.reshape((-1,) + x.shape[-2:])
            out = pf.ntt_ladder(xb, twiddles, k)
            return F.mul(out.reshape(lead + x.shape[-2:]), post_scale)
        iota = jax.lax.iota(jnp.uint32, n)

        def body(s, x):
            su = s.astype(jnp.uint32)
            half = jnp.left_shift(jnp.uint32(1), su)
            if stacked:
                tw_vec = jax.lax.dynamic_index_in_dim(
                    twiddles, s, 0, keepdims=False)        # (L, n)
            else:
                # twiddle index: (j mod half) * (n / 2half); harmlessly
                # also computed for first-half lanes (their t only feeds
                # the masked add path through the +half roll, which lands
                # on second-half twiddled values)
                idx = jnp.left_shift(iota & (half - 1),
                                     jnp.uint32(k - 1) - su)
                tw_vec = jnp.take(twiddles, idx, axis=-1)  # (L, n)
                if tw_vec.dtype != jnp.uint32:
                    tw_vec = tw_vec.astype(jnp.uint32)
            mask = (iota & half) == 0                      # first half
            t = F.mul(x, tw_vec)
            sh = half.astype(jnp.int32)
            tr = jnp.roll(t, -sh, axis=-1)                 # t[j+half] at j
            xl = jnp.roll(x, sh, axis=-1)                  # x[j-half] at j
            return F.select(mask, F.add(x, tr), F.sub(xl, t))

        x = jax.lax.fori_loop(0, k, body, x)
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
