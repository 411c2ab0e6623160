"""Point-partitioned MSM over a device mesh (the data-parallel axis of the
TPU scaling story, SURVEY.md §2.3).

The reference commits with a single-node MSM (`PlonkParams::commit`, usage
src/prover.rs:133-136); here the SRS points are sharded over the mesh and
each device accumulates only its shard.  Cross-device traffic is tiny and
rides ICI: per commit, D partial results of a few KB are all-gathered and
reduced redundantly on every device (cheaper than a second collective).

Two local tiers share the identical collective structure (and produce
identical group elements — EC arithmetic is exact):

* ``pippenger`` — the production path: each shard runs the full sort-based
  window/bucket machinery of ops/msm.py on its n/D points and emits W
  window totals per commit; the all-gathered (D, G*W) totals are
  scan-reduced and the windows combined per commit.
* ``bit_serial`` — compile-lean tier for the 1-core XLA:CPU test mesh and
  the driver dry-run: MSB-first double-and-add with ONE EC-add
  instantiation; shards emit one partial point each.

Commit batches are always padded to ``GROUP`` scalars so exactly ONE
executable shape ever compiles per tier (an odd tail is a fresh multi-minute
remote compile on the tunneled backend; zero scalars commit to infinity and
are dropped).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.limb import fr_field, fq_field
from ..ops.ec import device_g1
from ..ops.msm import MsmPlan
from ..utils.tracing import tracer


def _scan_reduce_axis0(G1, comps):
    """Sum points along axis 0 of (R, L, lanes) components with ONE
    G1.add instantiation."""
    ident = tuple(jnp.broadcast_to(i, c.shape[1:])
                  for i, c in zip(G1.identity, comps))

    def body(acc, x):
        return G1.add(acc, x), None

    acc, _ = jax.lax.scan(body, ident, comps)
    return acc


class ShardedMsm:
    """MSM engine over ``mesh[axis]``-sharded SRS points.

    ``msm_affine_batch(points, limbs_stack)`` mirrors
    ops/msm.py::MsmPlan.msm_affine_batch: points ((L,N),)*3 and
    limbs_stack (B, 16, N) sharded on the element axis; returns B affine
    host points ((x, y) ints or None for infinity).
    """

    GROUP = 4  # one executable shape: batches pad to this

    def __init__(self, mesh: Mesh, axis: str, n: int,
                 tier: str = "pippenger"):
        assert n % mesh.shape[axis] == 0, "SRS length must divide the mesh"
        assert tier in ("pippenger", "bit_serial")
        self.mesh = mesh
        self.axis = axis
        self.d = mesh.shape[axis]
        self.n = n
        self.n_local = n // self.d
        self.tier = tier
        self.G1 = device_g1()
        self.Fq = fq_field()
        self.Fr = fr_field()
        self.plan = MsmPlan(self.n_local) if tier == "pippenger" else None
        self._fn = jax.jit(self._build())

    # -- local bodies (run per shard under shard_map) -------------------------

    def _body_pippenger(self, px, py, pz, limbs):
        """limbs (G, 16, nl) -> replicated projective (G, L, 1) x3.

        All G commits' digits fold into the window axis, so the sort/scan
        machinery instantiates once per window group, not per commit."""
        G1, plan = self.G1, self.plan
        G = limbs.shape[0]
        # per-shard element-major table (_build_em pads with the
        # generator at scalar 0: lands in dropped bucket 0, and the
        # mixed-add scan keeps every lane strictly affine)
        em = plan._build_em(px, py)
        if plan.n_pad != plan.n:
            pad = plan.n_pad - plan.n
            limbs = jnp.concatenate(
                [limbs, jnp.zeros((G, limbs.shape[1], pad), limbs.dtype)],
                axis=-1)
        digits = jnp.concatenate(
            [plan._digits(limbs[g]) for g in range(G)], axis=0)  # (G*W, np)
        totals = []
        for s in range(0, G * plan.num_windows, plan.wg):
            totals.append(plan._window_group_totals(
                em, digits[s:s + plan.wg]))
        wx = jnp.concatenate([t[0] for t in totals], axis=0)  # (G*W, L, 1)
        wy = jnp.concatenate([t[1] for t in totals], axis=0)
        wz = jnp.concatenate([t[2] for t in totals], axis=0)
        gx = jax.lax.all_gather(wx, self.axis)                 # (D, G*W, ..)
        gy = jax.lax.all_gather(wy, self.axis)
        gz = jax.lax.all_gather(wz, self.axis)
        sx, sy, sz = _scan_reduce_axis0(self.G1, (gx, gy, gz))

        def one(c):
            # (G*32, L, 1) -> per-commit MSB-first window stacks
            return c.reshape(G, plan.num_windows, self.Fq.L, 1)[:, ::-1]

        cx, cy, cz = one(sx), one(sy), one(sz)
        outs = jax.vmap(plan._combine_windows)(cx, cy, cz)     # (G, L, 1) x3
        return outs

    def _body_bit_serial(self, px, py, pz, limbs):
        """limbs (G, 16, nl) -> replicated projective (G, L, 1) x3.

        Commits fold into the lane axis (points tiled G ways) so the
        256-bit double-and-add loop instantiates ONE EC add total; the
        final scan-reduce runs over gathered (D*nl) rows with G lanes."""
        G1 = self.G1
        G, _, nl = limbs.shape
        L = self.Fq.L
        lanes = G * nl
        lim = jnp.transpose(limbs, (1, 0, 2)).reshape(16, lanes)
        tpx = jnp.tile(px, (1, G))
        tpy = jnp.tile(py, (1, G))
        tpz = jnp.tile(pz, (1, G))
        acc = G1.broadcast_identity((), lanes)
        ident = G1.broadcast_identity((), lanes)
        P3 = (tpx, tpy, tpz)
        bits = 256

        def step(i, acc):
            b = bits - 1 - i // 2
            is_dbl = jnp.broadcast_to(i % 2 == 0, (lanes,))
            limb = jax.lax.dynamic_index_in_dim(lim, b // 16, 0,
                                                keepdims=False)
            bit = (limb >> (b % 16).astype(jnp.uint32)) & 1
            other = G1.select(is_dbl, acc, G1.select(bit == 1, P3, ident))
            return G1.add(acc, other)

        acc = jax.lax.fori_loop(0, 2 * bits, step, acc)        # (L, G*nl)
        gathered = tuple(jax.lax.all_gather(c, self.axis)      # (D, L, G*nl)
                         for c in acc)
        rows = tuple(
            c.reshape(self.d, L, G, nl).transpose(0, 3, 1, 2)
            .reshape(self.d * nl, L, G) for c in gathered)     # (D*nl, L, G)
        sx, sy, sz = _scan_reduce_axis0(G1, rows)              # (L, G)
        return tuple(jnp.moveaxis(c, -1, 0)[..., None]
                     for c in (sx, sy, sz))                    # (G, L, 1) x3

    # -- assembled executable ---------------------------------------------------

    def _build(self):
        Fq = self.Fq
        body = (self._body_pippenger if self.tier == "pippenger"
                else self._body_bit_serial)
        sharded = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(None, self.axis),) * 3 + (P(None, None, self.axis),),
            out_specs=(P(), P(), P()),
            check_vma=False)

        def fn(px, py, pz, limbs_stack):
            X, Y, Z = sharded(px, py, pz, limbs_stack)   # (G, L, 1) each
            zinv = Fq.pow_const(Z, Fq.spec.modulus - 2)  # 0 stays 0
            ax = Fq.from_mont(Fq.mul(X, zinv))
            ay = Fq.from_mont(Fq.mul(Y, zinv))
            inf = jnp.all(Z == 0, axis=(-2, -1))         # (G,)
            return jnp.stack([ax[..., 0], ay[..., 0]], axis=1), inf

        return fn

    # -- public -------------------------------------------------------------------

    def msm_affine_batch(self, points, limbs_stack):
        B = limbs_stack.shape[0]
        M = self.GROUP
        pad = (-B) % M
        if pad:
            limbs_stack = jnp.concatenate(
                [limbs_stack,
                 jnp.zeros((pad,) + limbs_stack.shape[1:],
                           limbs_stack.dtype)], axis=0)
        px, py, pz = points
        out = []
        for s in range(0, B + pad, M):
            tracer.count("msm_dispatch")
            tracer.count("msm_points", self.n * M)
            # all-gathered per-device window partials (a few KB)
            w = self.plan.num_windows if self.plan is not None else 1
            tracer.count("collective_ops", 3)
            tracer.count("collective_bytes",
                         3 * M * w * 24 * 4 * (self.d - 1) * self.d)
            coords, inf = self._fn(px, py, pz, limbs_stack[s:s + M])
            coords = np.asarray(jax.device_get(coords)).astype("<u2")
            inf = np.asarray(jax.device_get(inf))
            for g in range(M):
                if inf[g]:
                    out.append(None)
                else:
                    x = int.from_bytes(coords[g, 0].tobytes(), "little")
                    y = int.from_bytes(coords[g, 1].tobytes(), "little")
                    out.append((x, y))
        return out[:B]
