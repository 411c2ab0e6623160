"""Mesh-sharded proving macro-step.

The reference's only parallelism is single-node rayon (Cargo.toml:23,42-48);
the TPU-native scaling story (SURVEY.md §2.3/§5.7) is:

* evaluation-domain sharding (the "sequence parallel" analogue): polynomial
  tables live sharded over the mesh's HBM; the quotient's next-gate
  wraparound (src/prover/quotient_poly.rs:60-66) becomes a cross-shard
  collective permute that XLA derives from a `jnp.roll` on a sharded axis;
* the grand-product prefix scan (src/permutation.rs:281-295, serial in the
  reference) becomes a log-depth `associative_scan` whose cross-shard
  segments ride ICI;
* MSM point partitioning (the "data parallel" analogue): each device runs
  sort-based Pippenger bucket accumulation on its point shard (ops/msm.py),
  and the tiny per-window totals are all-gathered and EC-tree-reduced.

`sharded_prover_step` assembles all three into one jitted step over a
1-D mesh — the driver's multi-chip dry-run target and the template the
full device engine scales with.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.ntt import ntt_plan
from ..ops.limb import fr_field
from ..ops.ec import device_g1
from ..ops.msm import MsmPlan, NUM_WINDOWS


def msm_point_partitioned(mesh: Mesh, axis: str, points, scalar_limbs):
    """Point-partitioned Pippenger over `mesh[axis]`.

    points ((N,L),(N,L),(N,L)) and scalar_limbs (N,16) are sharded on the
    leading axis; each device accumulates buckets for its shard, window
    totals (3 x (32, L) uint32 — a few KB) are all-gathered and EC-reduced
    on every device (redundantly — cheaper than a second collective).
    Returns one replicated projective point.
    """
    n_local = points[0].shape[-1] // mesh.shape[axis]
    plan = MsmPlan(n_local)
    G1 = device_g1()

    def body(px, py, pz, limbs):
        digits = plan._digits(limbs)
        totals = []
        for g in range(0, NUM_WINDOWS, plan.wg):
            totals.append(plan._window_group_totals(
                px, py, pz, digits[g:g + plan.wg]))
        wx = jnp.concatenate([t[0] for t in totals], axis=0)  # (32, L, 1)
        wy = jnp.concatenate([t[1] for t in totals], axis=0)
        wz = jnp.concatenate([t[2] for t in totals], axis=0)
        gx = jax.lax.all_gather(wx, axis)                     # (D, 32, L, 1)
        gy = jax.lax.all_gather(wy, axis)
        gz = jax.lax.all_gather(wz, axis)
        sx, sy, sz = G1.tree_reduce((gx, gy, gz))             # (32, L, 1)
        # combine windows MSB-first: acc = 2^8 acc + T_w
        return plan._combine_windows(sx[::-1], sy[::-1], sz[::-1])

    px, py, pz = points
    spec_pt = P(None, axis)
    spec_out = P()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_pt, spec_pt, spec_pt, spec_pt),
        out_specs=(spec_out, spec_out, spec_out),
        check_vma=False)
    return fn(px, py, pz, scalar_limbs)


def sharded_prover_step(mesh: Mesh, k: int, args):
    """One jitted, mesh-sharded proving macro-step on tiny shapes:
    iNTT -> coset DFT -> quotient-style elementwise with wraparound ->
    grand-product scan -> point-partitioned MSM."""
    wires, points, scalars = args
    plan = ntt_plan(k)
    F = fr_field()

    dom = NamedSharding(mesh, P(None, None, "shard"))
    pts = NamedSharding(mesh, P(None, "shard"))

    wires = jax.device_put(wires, dom)
    points = tuple(jax.device_put(c, pts) for c in points)
    scalars = jax.device_put(scalars, pts)

    # NTT tables ride as ARGS (captured device arrays are re-bound per
    # jitted call on axon — ops/limb.py)
    nt = dict(fwd=plan.tw_fwd, inv=plan.tw_inv, one=plan.scale_one,
              ninv=plan.scale_n_inv, coset=plan.scale_coset)

    @jax.jit
    def step(wires, points, scalars, nt):
        # round-1 style: evaluation -> coefficient form (domain-sharded)
        polys = plan._transform(wires, nt["inv"], nt["one"], nt["ninv"])
        polys = jax.lax.with_sharding_constraint(polys, dom)
        # round-3 style: back onto the coset
        evals = plan._transform(polys, nt["fwd"], nt["coset"], nt["one"])
        evals = jax.lax.with_sharding_constraint(evals, dom)
        # next-gate wraparound: cross-shard permute
        nxt = jnp.roll(evals, -1, axis=-1)
        t = F.mul(F.add(evals, nxt), evals)
        # grand-product scan across the sharded domain
        z = jax.lax.associative_scan(F.mul, F.add(t[0], nt["one"]),
                                     axis=1)
        # round-1 style commit: partitioned MSM
        commit = msm_point_partitioned(mesh, "shard", points, scalars)
        return z, commit

    with mesh:
        z, commit = step(wires, points, scalars, nt)
        jax.block_until_ready((z, commit))
    return z, commit
