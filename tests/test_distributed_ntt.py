"""Four-step distributed NTT vs the host Domain oracle on the simulated
8-device mesh (SURVEY.md §2.3: NTT stage sharding with all-to-all)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dusk_plonk_tpu.ops.limb import fr_field
from dusk_plonk_tpu.poly.domain import Domain
from dusk_plonk_tpu.parallel.ntt import distributed_ntt
from dusk_plonk_tpu.fields.constants import R_MOD


def test_distributed_ntt_all_kinds():
    k = 6
    n = 1 << k
    F = fr_field()
    dom = Domain(k)
    rng = np.random.default_rng(11)
    vals = [int.from_bytes(rng.bytes(32), "little") % R_MOD
            for _ in range(n)]

    # the FULL device set: a proper submesh of the simulated CPU platform
    # stalls ~5 min per collective dispatch (unused devices hold up the
    # rendezvous), measured 2026-08-16
    mesh = Mesh(np.array(jax.devices()), axis_names=("shard",))
    x = jax.device_put(F.pack(vals),
                       NamedSharding(mesh, P(None, "shard")))

    expected = {
        "dft": dom.dft(vals),
        "idft": dom.idft(vals),
        "coset_dft": dom.coset_dft(vals),
        "coset_idft": dom.coset_idft(vals),
    }
    with mesh:
        for kind, exp in expected.items():
            out = distributed_ntt(mesh, "shard", x, k, kind)
            assert F.unpack(out) == exp, f"{kind} mismatch"

    # round trip
    with mesh:
        rt = distributed_ntt(
            mesh, "shard",
            distributed_ntt(mesh, "shard", x, k, "coset_dft"),
            k, "coset_idft")
    assert F.unpack(rt) == vals


def test_distributed_ntt_batched():
    """Batched (B, L, n) variant — the prover's round-1/round-3 shapes."""
    k = 6
    n = 1 << k
    B = 4
    F = fr_field()
    dom = Domain(k)
    rng = np.random.default_rng(5)
    vals = [int.from_bytes(rng.bytes(32), "little") % R_MOD
            for _ in range(B * n)]

    mesh = Mesh(np.array(jax.devices()), axis_names=("shard",))
    x = jax.device_put(F.pack(vals, shape=(B, n)),
                       NamedSharding(mesh, P(None, None, "shard")))
    with mesh:
        out = distributed_ntt(mesh, "shard", x, k, "coset_dft")
    got = F.unpack(out)
    for b in range(B):
        assert got[b * n:(b + 1) * n] == \
            dom.coset_dft(vals[b * n:(b + 1) * n]), f"row {b}"


def test_distributed_ntt_small_domain_fallback():
    """Domains below D^2 route to the single-plan kernel."""
    k = 5  # n = 32 < 64 = D^2
    n = 1 << k
    F = fr_field()
    dom = Domain(k)
    rng = np.random.default_rng(6)
    vals = [int.from_bytes(rng.bytes(32), "little") % R_MOD
            for _ in range(n)]
    mesh = Mesh(np.array(jax.devices()), axis_names=("shard",))
    x = jax.device_put(F.pack(vals),
                       NamedSharding(mesh, P(None, "shard")))
    with mesh:
        out = jax.jit(
            lambda v: distributed_ntt(mesh, "shard", v, k, "idft"))(x)
    assert F.unpack(out) == dom.idft(vals)
