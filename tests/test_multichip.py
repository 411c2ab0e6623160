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


def test_msm_partitioned_matches_host():
    """Point-partitioned MSM == host Pippenger on random input."""
    from dusk_plonk_tpu.parallel.prover_step import msm_point_partitioned
    from dusk_plonk_tpu.ops.ec import device_g1
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.curves import bls
    from dusk_plonk_tpu.fields.constants import R_MOD

    G1 = device_g1()
    F = fr_field()
    rng = np.random.default_rng(7)
    n = 32
    pts_host = []
    acc = bls._jac_from_affine(bls.G1_GENERATOR)
    for _ in range(n):
        pts_host.append(bls._jac_to_affine(acc))
        acc = bls._jac_add(acc, bls._jac_from_affine(bls.G1_GENERATOR))
    scalars = [int.from_bytes(rng.bytes(32), "little") % R_MOD
               for _ in range(n)]

    expected = bls.g1_msm(pts_host, scalars)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("shard",))
    points = G1.pack_points(pts_host)
    limbs = F.pack(scalars, to_mont=False)
    with mesh:
        out = jax.jit(
            lambda p, s: msm_point_partitioned(mesh, "shard", p, s)
        )(points, limbs)
    got = G1.unpack_points(out)[0]
    assert got == expected
