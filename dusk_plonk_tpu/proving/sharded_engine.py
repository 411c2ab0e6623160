"""Mesh-sharded proving engine: the 5-round prover over a device mesh.

The reference's only parallelism is single-node rayon
(Cargo.toml:23,42-48; e.g. the quotient loop src/prover/quotient_poly.rs:
239-243).  This engine is the TPU-native scaling counterpart (SURVEY.md
§2.3/§5.7): one `jax.sharding.Mesh` axis shards the evaluation domain,
and every hot component runs distributed:

* all n- and 8n-domain transforms -> four-step distributed NTT with two
  collectives per transform (parallel/ntt.py);
* the grand product and batch inversion -> two-phase cross-shard scans
  (parallel/prover_step.py);
* all 11 commitments -> point-partitioned MSM with an all-gathered window
  reduction (parallel/msm.py);
* the fused 8n quotient grid, blinding, folds and Horner evaluations are
  elementwise over sharded tables — GSPMD partitions them with zero
  communication, and the quotient's next-gate wraparound (the reference's
  8-element append, src/prover/quotient_poly.rs:60-66) becomes the one
  boundary collective-permute XLA derives from `jnp.roll` on the sharded
  axis.

Orchestration, transcript schedule and RNG draw order are inherited
unchanged from DeviceEngine, and all device math is exact modular
arithmetic — sharded proofs are byte-identical to the single-chip engine
and the host oracle (tests/test_sharded_engine.py).

``msm_tier="bit_serial"`` swaps the per-shard Pippenger for the
compile-lean double-and-add local tier (identical group math) — used on
the 1-core XLA:CPU test mesh where LLVM codegen of the full bucket
machinery dominates wall-time.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.config import get_config
from ..parallel.ntt import distributed_ntt
from ..parallel.prover_step import (grand_product_sharded,
                                    batch_inv_sharded)
from ..parallel.msm import ShardedMsm
from .engine import DeviceEngine


def default_mesh(axis: str | None = None) -> Mesh:
    """One-axis mesh over every visible device."""
    axis = axis or get_config().mesh_axis
    return Mesh(np.array(jax.devices()), axis_names=(axis,))


class ShardedEngine(DeviceEngine):
    """DeviceEngine with every domain axis sharded over ``mesh[axis]``."""

    def __init__(self, prover, mesh: Mesh | None = None,
                 axis: str | None = None, msm_tier: str = "pippenger",
                 **kw):
        self.mesh = mesh if mesh is not None else default_mesh(axis)
        self.axis = axis or get_config().mesh_axis
        self.D = self.mesh.shape[self.axis]
        self.msm_tier = msm_tier
        super().__init__(prover, **kw)

    # -- sharding helpers ------------------------------------------------------

    def _sh(self, ndim: int) -> NamedSharding:
        """Element-axis (minormost) sharding for an ndim-rank array."""
        return NamedSharding(
            self.mesh, P(*([None] * (ndim - 1) + [self.axis])))

    # -- hook overrides ----------------------------------------------------------

    def _stage_tables(self):
        put = jax.device_put
        tb = self.tb
        for key in ("sel8", "sig8", "l1_8", "lin8", "vh_inv8", "roots_n",
                    "sigma_evals_n", "sel_polys", "sigma_polys"):
            tb[key] = put(tb[key], self._sh(tb[key].ndim))
        # single-plan twiddle tables are dead in mesh mode (the four-step
        # NTT carries its own); dummy them out so the round executables
        # don't ship O(k n L) of unused bytes per call
        z = jnp.zeros((1,), jnp.uint32)
        for key in ("n_fwd", "n_inv", "n_one", "n_ninv",
                    "e_fwd", "e_inv", "e_one", "e_coset", "e_cosetinv"):
            tb[key] = z
        # pad the SRS to the device width (generator points with always-
        # zero coefficients: contribute nothing to any commitment, and
        # keep every lane strictly affine for the mixed-add Pippenger
        # scan) and shard it
        if self.nsd != self.ns:
            pad = self.nsd - self.ns
            gx, gy = self.G1.generator_affine
            mont_one = self.G1.identity[1]       # (L, 1) Montgomery 1
            L = gx.shape[0]
            padpts = (jnp.broadcast_to(gx, (L, pad)),
                      jnp.broadcast_to(gy, (L, pad)),
                      jnp.broadcast_to(mont_one, (L, pad)))
            self.srs = tuple(
                jnp.concatenate([c, p], axis=-1)
                for c, p in zip(self.srs, padpts))
        self.srs = tuple(put(c, self._sh(2)) for c in self.srs)
        self.smsm = ShardedMsm(self.mesh, self.axis, self.nsd,
                               tier=self.msm_tier)
        # four-step NTT plans must exist BEFORE the round kernels trace:
        # table packing runs device ops that would leak tracers if the
        # lru-cached plan were first built inside a jit
        from ..parallel.ntt import dist_ntt_plan
        for k in (self.k, self.k8):
            if (1 << k) % (self.D * self.D) == 0:
                dist_ntt_plan(self.D, k)

    def _t_n(self, tb, x, kind):
        return distributed_ntt(self.mesh, self.axis, x, self.k, kind)

    def _t_8n(self, tb, pair, kind):
        return distributed_ntt(self.mesh, self.axis, pair, self.k8, kind)

    def _prefix_mul(self, x):
        return grand_product_sharded(self.mesh, self.axis, x)

    def _batch_inv(self, x):
        return batch_inv_sharded(self.mesh, self.axis, self.F, x)

    def _constrain(self, x):
        return jax.lax.with_sharding_constraint(x, self._sh(x.ndim))

    def _stage_dom(self, x):
        return jax.device_put(x, self._sh(x.ndim))

    def _quotient_chunk_len(self):
        return self.n8  # domain sharding already divides the working set

    def _round3_compute(self, tb, wire_polys, z_poly, pi_dense, ch):
        """Always decomposed (the single-chip engine fuses round 3 into
        one dispatch on TPU): the 8n transforms are four-step shard_map
        programs issued per call, and the +8 roll on the sharded axis is
        the boundary collective-permute XLA derives from jnp.roll."""
        return self._round3_decomposed(
            tb, wire_polys, z_poly, pi_dense, ch)

    def _device_width(self, ns: int) -> int:
        return -(-ns // self.D) * self.D

    def _commit(self, canon_coeffs):
        return self.smsm.msm_affine_batch(self.srs, canon_coeffs[None])[0]

    def _commit_batch(self, canon_stack):
        return self.smsm.msm_affine_batch(self.srs, canon_stack)
