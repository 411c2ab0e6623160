"""Multi-chip sharding tests on the simulated 8-device CPU mesh
(conftest.py forces xla_force_host_platform_device_count=8) — the tier the
reference lacks entirely (SURVEY.md §4 'Implication for the build')."""

import sys
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles():
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == args[0].shape


def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_msm_bit_serial_matches_host():
    """Compile-lean point-partitioned MSM == host Pippenger (full 256-bit
    scalars)."""
    from dusk_plonk_tpu.parallel.prover_step import msm_bit_serial
    from dusk_plonk_tpu.ops.ec import device_g1
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.curves import bls
    from dusk_plonk_tpu.fields.constants import R_MOD

    G1 = device_g1()
    F = fr_field()
    rng = np.random.default_rng(3)
    n = 16
    pts_host = []
    acc = bls._jac_from_affine(bls.G1_GENERATOR)
    for _ in range(n):
        pts_host.append(bls._jac_to_affine(acc))
        acc = bls._jac_add(acc, bls._jac_from_affine(bls.G1_GENERATOR))
    pts_host[5] = None
    scalars = [int.from_bytes(rng.bytes(32), "little") % R_MOD
               for _ in range(n)]
    scalars[2] = 0

    expected = bls.g1_msm(pts_host, scalars)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("shard",))
    points = G1.pack_points(pts_host)
    limbs = F.pack(scalars, to_mont=False)
    with mesh:
        out = jax.jit(
            lambda p, s: msm_bit_serial(mesh, "shard", p, s)
        )(points, limbs)
    got = G1.unpack_points(out)[0]
    assert got == expected


def test_grand_product_sharded_matches_host():
    """Two-phase distributed prefix product == straight prefix products."""
    from dusk_plonk_tpu.parallel.prover_step import grand_product_sharded
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.fields.constants import R_MOD

    F = fr_field()
    rng = np.random.default_rng(11)
    n = 64
    vals = [int.from_bytes(rng.bytes(32), "little") % R_MOD
            for _ in range(n)]
    expected = []
    acc = 1
    for v in vals:
        acc = acc * v % R_MOD
        expected.append(acc)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("shard",))
    packed = F.pack(vals)
    with mesh:
        out = jax.jit(
            lambda r: grand_product_sharded(mesh, "shard", r))(packed)
    assert F.unpack(out) == expected


def _run_msm_partitioned(n, n_devices, seed, use_jit=True):
    from dusk_plonk_tpu.parallel.prover_step import msm_point_partitioned
    from dusk_plonk_tpu.ops.ec import device_g1
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.curves import bls
    from dusk_plonk_tpu.fields.constants import R_MOD

    G1 = device_g1()
    F = fr_field()
    rng = np.random.default_rng(seed)
    pts_host = []
    acc = bls._jac_from_affine(bls.G1_GENERATOR)
    for _ in range(n):
        pts_host.append(bls._jac_to_affine(acc))
        acc = bls._jac_add(acc, bls._jac_from_affine(bls.G1_GENERATOR))
    scalars = [int.from_bytes(rng.bytes(32), "little") % R_MOD
               for _ in range(n)]

    expected = bls.g1_msm(pts_host, scalars)

    mesh = Mesh(np.array(jax.devices()[:n_devices]), axis_names=("shard",))
    points = G1.pack_points(pts_host)
    limbs = F.pack(scalars, to_mont=False)
    fn = (lambda p, s: msm_point_partitioned(mesh, "shard", p, s))
    if use_jit:
        fn = jax.jit(fn)
    with mesh:
        out = fn(points, limbs)
    got = G1.unpack_points(out)[0]
    assert got == expected


def test_msm_partitioned_matches_host():
    """Point-partitioned MSM == host Pippenger on random input."""
    _run_msm_partitioned(n=32, n_devices=8, seed=7)


def test_msm_local_totals_padded_shard():
    """Regression: shard size where MsmPlan.n_pad != n (96 -> 128 under
    chunk_len=64).  Digits must be computed over the PADDED length or
    negative signed digits gather generator-pad rows instead of the
    (x, -y) table half, silently corrupting the MSM (advisor r3 high).

    Tests the per-shard body (_local_window_totals) DIRECTLY — the
    cross-shard all-gather/reduce/combine is covered by
    test_msm_partitioned_matches_host, and wrapping this second plan
    size in mesh + shard_map + combine cost >30 min of 1-core XLA:CPU
    compile (measured; the whole file timed out)."""
    from dusk_plonk_tpu.utils.config import set_config, get_config
    from dusk_plonk_tpu.parallel.prover_step import (_local_window_totals,
                                                     _scan_reduce)
    from dusk_plonk_tpu.ops.ec import device_g1
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.curves import bls
    from dusk_plonk_tpu.fields.constants import R_MOD

    cfg = get_config()
    old_cl, old_wb = cfg.msm_chunk_len, cfg.msm_window_bits
    # window_bits=5: NB=16 buckets — at the default 13 the bucket phase
    # touches 20*4097 lanes of full EC adds, which the opt-level-0
    # XLA:CPU executables of this host EXECUTE for >30 min (measured);
    # the padding bug under test lives in the digit/table length
    # relationship, which is window-width independent
    set_config(msm_chunk_len=64, msm_window_bits=5)
    try:
        from dusk_plonk_tpu.ops.msm import MsmPlan
        n = 96
        plan = MsmPlan(n)
        assert plan.n_pad != plan.n, "test must exercise the padded path"
        G1 = device_g1()
        F = fr_field()
        rng = np.random.default_rng(13)
        pts_host = []
        acc = bls._jac_from_affine(bls.G1_GENERATOR)
        for _ in range(n):
            acc = bls._jac_double(acc)
            pts_host.append(bls._jac_to_affine(acc))
        # negative signed digits guaranteed: top window digits vary
        scalars = [int.from_bytes(rng.bytes(32), "little") % R_MOD
                   for _ in range(n)]
        expected = bls.g1_msm(pts_host, scalars)

        px, py, _ = G1.pack_points(pts_host)
        limbs = F.pack(scalars, to_mont=False)
        wx, wy, wz = jax.jit(
            lambda a, b, c: _local_window_totals(plan, a, b, c)
        )(px, py, limbs)
        out = jax.jit(
            lambda x, y, z: plan._combine_windows(
                x[::-1], y[::-1], z[::-1]))(wx, wy, wz)
        got = G1.unpack_points(out)[0]
        assert got == expected
    finally:
        set_config(msm_chunk_len=old_cl, msm_window_bits=old_wb)
