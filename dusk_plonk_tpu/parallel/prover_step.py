"""Mesh-sharded proving macro-step.

The reference's only parallelism is single-node rayon (Cargo.toml:23,42-48);
the TPU-native scaling story (SURVEY.md §2.3/§5.7) is:

* evaluation-domain sharding (the "sequence parallel" analogue): polynomial
  tables live sharded over the mesh's HBM; the quotient's next-gate
  wraparound (src/prover/quotient_poly.rs:60-66) becomes a cross-shard
  collective permute that XLA derives from a `jnp.roll` on a sharded axis;
* the grand-product prefix scan (src/permutation.rs:281-295, serial in the
  reference) runs two-phase: a rolled per-shard Hillis-Steele prefix, then
  an all-gather of the D shard totals and one tiny exclusive scan — the
  cross-shard traffic is D field elements per device, riding ICI;
* MSM point partitioning (the "data parallel" analogue): each device
  accumulates its point shard, the per-device partials (a few KB) are
  all-gathered and reduced on every device.

Two MSM tiers share that collective structure:

* `msm_point_partitioned` — full sort-based Pippenger per shard
  (ops/msm.py).  The production TPU path: EC adds there are fused Pallas
  calls, so the XLA graph stays small on TPU.
* `msm_bit_serial` — MSB-first double-and-add with every EC add inside a
  loop body (4 add instantiations total).  On the virtual CPU mesh the
  inlined Pippenger bucket machinery is ~250k StableHLO lines and XLA:CPU
  needs >10 min to compile it; this tier compiles in seconds and is what
  the driver's multi-chip dry-run and the CPU test tier run.  It is also
  the right algorithm for genuinely small N (Pippenger's window overhead
  dominates below ~2^8 points per shard).

`sharded_prover_step` assembles the pieces as THREE separately jitted
steps (NTT / quotient+scan / MSM) — one giant jit multiplies XLA:CPU
compile time superlinearly, three small ones keep the cold-start of the
driver's dry-run bounded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from math import prod as np_prod

from ..ops.ntt import ntt_plan
from ..ops.limb import fr_field
from ..ops.ec import device_g1
from ..ops.msm import MsmPlan


def msm_point_partitioned(mesh: Mesh, axis: str, points, scalar_limbs):
    """Point-partitioned Pippenger over `mesh[axis]`.

    points ((N,L),(N,L),(N,L)) and scalar_limbs (N,16) are sharded on the
    leading axis; each device accumulates buckets for its shard, window
    totals (3 x (W, L) uint32 — a few KB) are all-gathered and EC-reduced
    on every device (redundantly — cheaper than a second collective).
    Returns one replicated projective point.
    """
    n_local = points[0].shape[-1] // mesh.shape[axis]
    plan = MsmPlan(n_local)
    if plan.serial:
        # tier dispatch, mirroring parallel/msm.py ShardedMsm: below
        # msm_serial_max points per shard the full sort/bucket pipeline
        # is all compile cost and no win (its shard_map graph took >50
        # min of 1-core XLA:CPU compile at n_local=4, measured); the
        # bit-serial ladder is the same group math with ONE EC-add
        # instantiation
        return msm_bit_serial(mesh, axis, points, scalar_limbs)
    G1 = device_g1()

    def body(px, py, pz, limbs):
        del pz
        wx, wy, wz = _local_window_totals(plan, px, py, limbs)
        gx = jax.lax.all_gather(wx, axis)                     # (D, W, L, 1)
        gy = jax.lax.all_gather(wy, axis)
        gz = jax.lax.all_gather(wz, axis)
        sx, sy, sz = _scan_reduce(G1, (gx, gy, gz))           # (W, L, 1)
        # combine windows MSB-first: acc = 2^c acc + T_w
        return plan._combine_windows(sx[::-1], sy[::-1], sz[::-1])

    px, py, pz = points
    spec_pt = P(None, axis)
    spec_out = P()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_pt, spec_pt, spec_pt, spec_pt),
        out_specs=(spec_out, spec_out, spec_out),
        check_vma=False)
    from ..utils.tracing import tracer
    d = mesh.shape[axis]
    tracer.count("collective_ops", 3)
    tracer.count("collective_bytes",
                 3 * plan.num_windows * 24 * 4 * (d - 1) * d)
    return fn(px, py, pz, scalar_limbs)


def _local_window_totals(plan, px, py, limbs):
    """One shard's Pippenger window totals (W, L, 1) x3.

    Digits must cover the SAME padded length as the element-major table:
    _window_group_totals derives the negative-half gather offset from
    digits.shape[1], and the (x, -y) rows start at n_pad.  Pad scalars are
    zero -> bucket 0, which the weighted reduction drops (mirrors
    ShardedMsm._body_pippenger).  Unit-tested directly at an n_pad != n
    shard size in tests/test_multichip.py (advisor r3 high)."""
    import jax.numpy as jnp
    em = plan._build_em(px, py)
    if plan.n_pad != plan.n:
        pad = plan.n_pad - plan.n
        limbs = jnp.concatenate(
            [limbs, jnp.zeros((limbs.shape[0], pad), limbs.dtype)],
            axis=-1)
    digits = plan._digits(limbs)
    totals = []
    for g in range(0, plan.num_windows, plan.wg):
        totals.append(plan._window_group_totals(
            em, digits[g:g + plan.wg]))
    wx = jnp.concatenate([t[0] for t in totals], axis=0)      # (W, L, 1)
    wy = jnp.concatenate([t[1] for t in totals], axis=0)
    wz = jnp.concatenate([t[2] for t in totals], axis=0)
    return wx, wy, wz


def _scan_reduce(G1, pts):
    """Sum points along axis 0 with ONE G1.add instantiation (lax.scan),
    vs log(n) inlined adds for tree_reduce — compile-size over depth (the
    reduced axis is small: D shards or n_local lanes)."""
    ident = tuple(jnp.broadcast_to(i, c.shape[1:])
                  for i, c in zip(G1.identity, pts))

    def body(acc, x):
        return G1.add(acc, x), None

    acc, _ = jax.lax.scan(body, ident, pts)
    return acc


def msm_bit_serial(mesh: Mesh, axis: str, points, scalar_limbs,
                   bits: int = 256):
    """Point-partitioned MSM, compile-lean tier (see module docstring).

    MSB-first double-and-add with ONE G1.add instantiation: iteration 2i
    doubles (operand = acc itself), iteration 2i+1 conditionally adds P
    (operand = P masked to identity when the bit is clear).  Addition is
    complete (RCB15), so identity operands are safe.  Halving the loop-body
    HLO matters here: the driver's dry-run compiles this on a 1-core
    XLA:CPU host where LLVM codegen of the 24-limb field ops dominates."""
    G1 = device_g1()
    F = G1.F

    def body(px, py, pz, limbs):
        n_local = px.shape[-1]
        acc = G1.broadcast_identity((), n_local)           # (L, n_local)
        ident = G1.broadcast_identity((), n_local)
        P3 = (px, py, pz)

        def step(i, acc):
            b = bits - 1 - i // 2
            is_dbl = jnp.broadcast_to(i % 2 == 0, (n_local,))
            limb = jax.lax.dynamic_index_in_dim(
                limbs, b // 16, 0, keepdims=False)         # (n_local,)
            bit = (limb >> (b % 16).astype(jnp.uint32)) & 1
            other = G1.select(is_dbl, acc,
                              G1.select(bit == 1, P3, ident))
            return G1.add(acc, other)

        acc = jax.lax.fori_loop(0, 2 * bits, step, acc)
        # all-gather the (L, n_local) lane partials, then ONE scan-reduce
        # over the flattened (D * n_local) axis — one G1.add instantiation
        # covers both the lane and the shard reduction
        gathered = tuple(
            jax.lax.all_gather(c, axis) for c in acc)      # (D, L, nl)
        rows = tuple(
            jnp.moveaxis(c, -1, 1).reshape((-1,) + c.shape[-2:-1] + (1,))
            for c in gathered)                             # (D*nl, L, 1)
        return _scan_reduce(G1, rows)                      # (L, 1)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis),) * 4,
        out_specs=(P(), P(), P()),
        check_vma=False)
    px, py, pz = points
    return fn(px, py, pz, scalar_limbs)


def grand_product_sharded(mesh: Mesh, axis: str, ratio):
    """Two-phase distributed prefix product of ratio (..., L, n) sharded on
    the element axis: per-shard rolled Hillis-Steele (F.prefix_mul), then an
    all-gather of the D shard totals and an exclusive scan of those — the
    distributed form of the reference's serial grand product
    (src/permutation.rs:281-295)."""
    F = fr_field()

    def body(r):
        local = F.prefix_mul(r)                            # (..., L, nl)
        tot = local[..., -1:]                              # (..., L, 1)
        alltot = jax.lax.all_gather(tot, axis)             # (D, ..., L, 1)
        one = jnp.broadcast_to(F.one_mont, tot.shape)

        def sbody(carry, x):
            return F.mul(carry, x), carry                  # exclusive

        _, offs = jax.lax.scan(sbody, one, alltot)         # (D, ..., L, 1)
        off = jax.lax.dynamic_index_in_dim(
            offs, jax.lax.axis_index(axis), 0, keepdims=False)
        return F.mul(local, off)

    from ..utils.tracing import tracer
    d = mesh.shape[axis]
    tracer.count("collective_ops", 1)
    # all-gather of one (..., L, 1) shard total per device
    tracer.count("collective_bytes",
                 int(np_prod(ratio.shape[:-1])) * 4 * (d - 1) * d)
    return shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis),) if ratio.ndim == 2 else
        (P(*([None] * (ratio.ndim - 1) + [axis])),),
        out_specs=P(*([None] * (ratio.ndim - 1) + [axis])),
        check_vma=False)(ratio)


def batch_inv_sharded(mesh: Mesh, axis: str, F, a):
    """Distributed Montgomery's trick over the sharded element axis:
    prefix/suffix products via the two-phase sharded scan, ONE Fermat
    inverse of the (replicated) total, 3N multiplications.  The sharded
    counterpart of LimbField.batch_inv (reference inverts per element,
    src/prover/quotient_poly.rs:111)."""
    import jax.numpy as jnp

    is_zero = jnp.all(a == 0, axis=-2, keepdims=True)
    safe = jnp.where(is_zero, F.one_mont, a)
    prefix = grand_product_sharded(mesh, axis, safe)
    suffix = grand_product_sharded(mesh, axis, safe[..., ::-1])[..., ::-1]
    total_inv = F.inv(prefix[..., -1:])
    one = jnp.broadcast_to(F.one_mont, safe[..., :1].shape)
    prefix_excl = jnp.concatenate([one, prefix[..., :-1]], axis=-1)
    suffix_excl = jnp.concatenate([suffix[..., 1:], one], axis=-1)
    out = F.mul(F.mul(prefix_excl, suffix_excl), total_inv)
    return jnp.where(is_zero, jnp.zeros_like(a), out)


def sharded_prover_step(mesh: Mesh, k: int, args):
    """One mesh-sharded proving macro-step on tiny shapes:
    iNTT -> coset DFT | quotient-style elementwise with wraparound ->
    grand-product | point-partitioned MSM — three separately jitted
    stages (compile-size; see module docstring)."""
    wires, points, scalars = args
    plan = ntt_plan(k)
    F = fr_field()

    dom = NamedSharding(mesh, P(None, None, "shard"))
    dom1 = NamedSharding(mesh, P(None, "shard"))
    pts = NamedSharding(mesh, P(None, "shard"))

    wires = jax.device_put(wires, dom)
    points = tuple(jax.device_put(c, pts) for c in points)
    scalars = jax.device_put(scalars, pts)

    # NTT tables ride as ARGS (captured device arrays are re-bound per
    # jitted call on axon — ops/limb.py)
    nt = dict(fwd=plan.tw_fwd, inv=plan.tw_inv, one=plan.scale_one,
              ninv=plan.scale_n_inv, coset=plan.scale_coset)

    @jax.jit
    def ntt_step(wires, nt):
        # round-1 style: evaluation -> coefficient form (domain-sharded)
        polys = plan._transform(wires, nt["inv"], nt["one"], nt["ninv"])
        polys = jax.lax.with_sharding_constraint(polys, dom)
        # round-3 style: back onto the coset
        evals = plan._transform(polys, nt["fwd"], nt["coset"], nt["one"])
        return jax.lax.with_sharding_constraint(evals, dom)

    @jax.jit
    def quotient_step(evals, nt):
        # next-gate wraparound: cross-shard permute
        nxt = jnp.roll(evals, -1, axis=-1)
        t = F.mul(F.add(evals, nxt), evals)
        ratio = F.add(t[0], nt["one"])
        z = grand_product_sharded(mesh, "shard", ratio)
        return jax.lax.with_sharding_constraint(z, dom1)

    @jax.jit
    def msm_step(points, scalars):
        return msm_bit_serial(mesh, "shard", points, scalars, bits=32)

    with mesh:
        evals = ntt_step(wires, nt)
        z = quotient_step(evals, nt)
        commit = msm_step(points, scalars)
        jax.block_until_ready((z, commit))
    return z, commit
