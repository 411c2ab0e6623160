"""Driver benchmark: prints ONE JSON line.

Current headline: device Pippenger MSM throughput (G1 points/sec) at
n = 2^16 — the flagship kernel (9 of these per proof; SURVEY.md §3.2 ranks
MSM as hot loop #1).

vs_baseline: the reference proves a 2^16-constraint circuit in 7.871 s on
an Apple M1 (reference README.md:120-122), which contains 9 MSMs of ~n
points = 589,824 point-scalar pairs.  Even attributing 100% of the
reference runtime to MSM gives an upper bound of 74,938 points/sec — the
conservative baseline this number is measured against.

Point CONTENT does not affect MSM timing (branch-free complete addition;
cost is a function of N alone), so the bench broadcasts the generator and
uses uniformly random scalars, skipping a multi-minute SRS setup.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    from dusk_plonk_tpu.ops.msm import msm_plan
    from dusk_plonk_tpu.ops.ec import device_g1
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.fields.constants import R_MOD

    n = int(os.environ.get("BENCH_N", 1 << 16))
    plan = msm_plan(n)
    G1 = device_g1()
    F = fr_field()

    g = (0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
         0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1)
    gx, gy, gz = G1.pack_points([g])
    import jax.numpy as jnp
    points = tuple(jnp.broadcast_to(c, (n,) + c.shape[1:])
                   for c in (gx, gy, gz))

    rng = np.random.default_rng(8349)
    scalars = [int.from_bytes(rng.bytes(32), "little") % R_MOD
               for _ in range(n)]
    limbs = F.pack(scalars, to_mont=False)

    # warmup / compile
    out = plan.msm_device(points, limbs)
    jax.block_until_ready(out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = plan.msm_device(points, limbs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)

    pts_per_sec = n / best
    baseline = 589_824 / 7.871  # reference-implied MSM upper bound (M1)
    print(json.dumps({
        "metric": "msm_g1_points_per_sec_2e16",
        "value": round(pts_per_sec, 1),
        "unit": "points/sec",
        "vs_baseline": round(pts_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
