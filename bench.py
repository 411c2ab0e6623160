"""Driver benchmark: prints ONE JSON line.

Default (BENCH_MODE=proof): end-to-end proof latency for a 2^16-constraint
circuit on the device engine — the reference's headline number is 7.871 s
on an Apple M1 (reference README.md:120-122).  vs_baseline = 7.871 / ours
(>1 means faster than the reference).  The timed path includes witness
re-synthesis, exactly like the reference's create_proof (src/prover.rs:76-78).

BENCH_MODE=msm: device Pippenger throughput (G1 points/sec) at BENCH_N
points.  vs_baseline compares against the reference-implied upper bound of
589,824 points / 7.871 s = 74,938 pts/s (9 n-MSMs per proof even if MSM
were 100% of the runtime).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache: TPU executables for the 2^16 engine
    take minutes each to build remotely; cached across bench runs."""
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _random_points(n, rng):
    """[s_i]G for random 64-bit s_i, built on device: 8 window-table
    gathers + EC tree-reduce (same machinery as PlonkParams.setup_device).
    Distinct points so XLA cannot fold the bucket gathers."""
    import jax
    import jax.numpy as jnp
    from dusk_plonk_tpu.curves import bls
    from dusk_plonk_tpu.ops.ec import device_g1

    G1 = device_g1()
    window, windows = 8, 8  # 64-bit scalars
    tables = []
    cur = bls._jac_from_affine(bls.G1_GENERATOR)
    for _ in range(windows):
        row = [None]
        acc = (1, 1, 0)
        for _ in range(1, 1 << window):
            acc = bls._jac_add(acc, cur)
            row.append(bls._jac_to_affine(acc))
        tables.append(row)
        for _ in range(window):
            cur = bls._jac_double(cur)
    flat = [p for row in tables for p in row]
    tx, ty, tz = G1.pack_points(flat)                    # (24, 2048)

    s = rng.integers(0, 2**63, size=n, dtype=np.uint64)
    digits = np.stack([(s >> (8 * w)) & 0xFF for w in range(windows)])
    idx = digits.astype(np.int64) + np.arange(windows)[:, None] * 256

    # per-window dispatches (the axon allocator does not reuse in-program
    # temps; see kzg/srs.py setup_device)
    @jax.jit
    def gather1(tx, ty, tz, idx1):
        return (tx[:, idx1], ty[:, idx1], tz[:, idx1])   # (24, n)

    @jax.jit
    def addp(p, q):
        return G1.add(p, q)

    winpts = [gather1(tx, ty, tz, jnp.asarray(idx[w]))
              for w in range(windows)]
    while len(winpts) > 1:
        nxt = [addp(winpts[i], winpts[i + 1])
               for i in range(0, len(winpts) - 1, 2)]
        if len(winpts) % 2:
            nxt.append(winpts[-1])
        winpts = nxt
    jax.block_until_ready(winpts[0])
    return winpts[0]


def bench_msm():
    import jax
    from dusk_plonk_tpu.ops.msm import msm_plan
    from dusk_plonk_tpu.ops.limb import fr_field
    from dusk_plonk_tpu.fields.constants import R_MOD

    n = int(os.environ.get("BENCH_N", 1 << 16))
    plan = msm_plan(n)
    F = fr_field()

    rng = np.random.default_rng(8349)
    points = _random_points(n, rng)
    scalars = [int.from_bytes(rng.bytes(32), "little") % R_MOD
               for _ in range(n)]
    limbs = F.pack(scalars, to_mont=False)

    def sync(o):
        # block_until_ready is a NO-OP on the axon tunnel (measured);
        # device_get of the (24, 1) outputs is the only real barrier
        for c in o:
            np.asarray(jax.device_get(c))

    out = plan.msm_device(points, limbs)
    sync(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = plan.msm_device(points, limbs)
        sync(out)
        times.append(time.perf_counter() - t0)
    best = min(times)

    pts_per_sec = n / best
    baseline = 589_824 / 7.871
    print(json.dumps({
        "metric": "msm_g1_points_per_sec_2e16",
        "value": round(pts_per_sec, 1),
        "unit": "points/sec",
        "vs_baseline": round(pts_per_sec / baseline, 3),
    }))


def bench_proof():
    from dusk_plonk_tpu.prelude import (
        PlonkKey, PlonkParams, Circuit, ChaCha12Rng, Constraint,
    )

    k = int(os.environ.get("BENCH_K", 16))
    n_mul_gates = (1 << k) - 700  # leave room for range/logic/setup gates

    class BenchCircuit(Circuit):
        """Arithmetic chain + range + logic gates filling ~2^k constraints
        (the reference's bench uses a gate-filled dummy circuit)."""

        def __init__(self, x=3):
            self.x = x

        def synthesize(self, c):
            w = c.append_witness(self.x)
            acc = c.append_witness(1)
            for _ in range(n_mul_gates):
                acc = c.gate_mul(Constraint().mult(1).a(acc).b(w))
            c.component_range(w, 64)
            c.append_logic_xor(w, acc, 128)
            c.append_logic_and(w, acc, 128)

    rng = ChaCha12Rng.seed_from_u64(8349)
    t0 = time.perf_counter()
    pp = PlonkParams.setup_device(k, rng)
    t1 = time.perf_counter()
    prover, verifier = PlonkKey.compile_device(pp, BenchCircuit)
    t2 = time.perf_counter()
    print(f"setup {t1 - t0:.1f}s, compile {t2 - t1:.1f}s",
          file=sys.stderr)

    # warmup proof (compiles every round kernel)
    proof, pis = prover.create_proof(rng, BenchCircuit(3))
    verifier.verify(proof, pis)

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        proof, pis = prover.create_proof(rng, BenchCircuit(3))
        times.append(time.perf_counter() - t0)
    best = min(times)
    verifier.verify(proof, pis)

    baseline = 7.871  # reference M1 seconds at 2^16
    print(json.dumps({
        "metric": f"proof_seconds_2e{k}",
        "value": round(best, 3),
        "unit": "seconds",
        "vs_baseline": round(baseline / best, 3),
    }))


if __name__ == "__main__":
    _enable_compile_cache()
    mode = os.environ.get("BENCH_MODE", "proof")
    if mode == "msm":
        bench_msm()
    else:
        bench_proof()
