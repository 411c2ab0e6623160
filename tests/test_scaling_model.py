"""Scaling model vs measured collective counters (BASELINE.md >70%
efficiency north star; real multi-chip hardware is unreachable here, so
the model + simulated-mesh traffic accounting is the evidence — see
dusk_plonk_tpu/parallel/model.py and docs/notes-scaling.md)."""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dusk_plonk_tpu.parallel.model import (
    proof_collective_bytes, projected_efficiency, FR_BYTES, MeshModel,
)
from dusk_plonk_tpu.utils.tracing import tracer


def test_ntt_counter_matches_model_term():
    from dusk_plonk_tpu.parallel.ntt import distributed_ntt
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.fields.constants import R_MOD

    d, k = 8, 6
    n = 1 << k
    mesh = Mesh(np.array(jax.devices()[:d]), axis_names=("shard",))
    F = fr_field()
    import random
    rnd = random.Random(0)
    x = F.pack([rnd.randrange(R_MOD) for _ in range(4 * n)], shape=(4, n))
    x = jax.device_put(x, NamedSharding(mesh, P(None, None, "shard")))

    tracer.reset()
    distributed_ntt(mesh, "shard", x, k, "idft")
    got = tracer.counters["collective_bytes"]
    nbytes = 4 * n * FR_BYTES
    expect = nbytes * (d - 1) // d + nbytes * (d - 1)
    assert got == expect
    assert tracer.counters["collective_ops"] == 2


def test_projected_efficiency_north_star():
    # one-host 2^20 and pod-slice 2^24 configs (BASELINE.md)
    e20 = projected_efficiency(20, 8)
    e24 = projected_efficiency(24, 64)
    assert e20["efficiency"] > 0.70
    assert e24["efficiency"] > 0.70
    # traffic model self-consistency: bytes grow linearly in n, and the
    # all-gather term dominates the current four-step schedule
    t = proof_collective_bytes(20, 8)
    t2 = proof_collective_bytes(21, 8)
    assert 1.9 < t2["ntt_all_gather"] / t["ntt_all_gather"] < 2.1
    assert t["ntt_all_gather"] > t["ntt_all_to_all"]


def test_efficiency_degrades_gracefully_with_slow_ici():
    slow = MeshModel(ici_gbps=10.0)
    fast = MeshModel(ici_gbps=400.0)
    es = projected_efficiency(20, 8, slow)
    ef = projected_efficiency(20, 8, fast)
    assert ef["efficiency"] > es["efficiency"]
