"""Analytic ICI scaling model for the mesh-sharded prover.

Real multi-chip hardware is not reachable from this environment (one
v5e chip over a tunnel), so the >70% MSM/NTT scaling-efficiency north
star (BASELINE.md) is evidenced three ways:

1. per-proof collective TRAFFIC counters measured on the simulated CPU
   mesh (utils/tracing.py `collective_bytes` / `collective_ops`,
   incremented at every shard_map collective call site —
   parallel/ntt.py, parallel/msm.py, parallel/prover_step.py);
2. this closed-form traffic model, validated against those counters
   (tests/test_scaling_model.py);
3. single-chip measured compute throughputs (bench) to convert traffic
   into projected step time on real ICI.

Machine constants default to TPU v5e: ~100 GB/s effective per-device
ICI bandwidth (2D-torus links, conservative), with the measured
single-chip throughputs from BENCH_r05.
"""

from __future__ import annotations

from dataclasses import dataclass

FR_BYTES = 16 * 4          # one Fr element: 16 u32 limb lanes
G1_BYTES = 3 * 24 * 4      # projective Montgomery G1 point


@dataclass(frozen=True)
class MeshModel:
    ici_gbps: float = 100.0        # effective per-device ICI GB/s (v5e)
    msm_pts_per_s: float = 769e3   # measured single-chip (BENCH_r05)
    ntt_elems_per_s: float = 8.0e6 # measured single-chip (BENCH_r05)


def proof_collective_bytes(k: int, d: int) -> dict:
    """Per-proof collective traffic of the ShardedEngine at domain 2^k
    over D devices, from the engine's round structure (proving/engine.py
    create_proof + sharded overrides):

    distributed NTTs: round1 idft (4, n); round2 idft (1, n); round3
    pi idft (1, n), 3 coset-DFT pairs (2, 8n), 1 coset-iDFT (2·... the
    t grid) (1, 8n); each four-step transform does one all-to-all
    ((D-1)/D of the array crosses links) and one all-gather ((D-1)
    copies) — matching the tracer accounting exactly.

    MSM commits: 11 per proof; each all-gathers 3 coordinate planes of
    W window totals per device.  Grand-product scans: all-gather of one
    (L, 1) total per device (negligible, counted for completeness)."""
    n = 1 << k
    n8 = 8 * n
    transforms = [4 * n, 1 * n, 1 * n, 2 * n8, 2 * n8, 2 * n8, 1 * n8]
    a2a = sum(t * FR_BYTES * (d - 1) // d for t in transforms)
    ag = sum(t * FR_BYTES * (d - 1) for t in transforms)
    w = max(2, min(13, n.bit_length() - 1 - 4))          # pick_window_bits
    num_windows = -(-257 // w)
    msm = 11 * 3 * num_windows * 24 * 4 * (d - 1) * d
    scans = 3 * 16 * 4 * (d - 1) * d                      # 3 sharded scans
    return {
        "ntt_all_to_all": a2a,
        "ntt_all_gather": ag,
        "msm_window_gather": msm,
        "scan_gather": scans,
        "total": a2a + ag + msm + scans,
    }


def projected_efficiency(k: int, d: int,
                         m: MeshModel = MeshModel()) -> dict:
    """Projected parallel efficiency of one sharded proof at 2^k over D
    chips: T_compute/D vs collective time at ICI bandwidth.  Compute
    time from the measured single-chip throughputs (the proof is
    ~60% MSM / ~15% NTT / rest elementwise, all of which shard
    perfectly — modeled via the two measured rates over the actual
    op counts)."""
    n = 1 << k
    msm_points = 11 * n                    # 11 n-point commits
    ntt_elems = 6 * n + 7 * 8 * n          # n- and 8n-domain transforms
    t_compute = msm_points / m.msm_pts_per_s + ntt_elems / m.ntt_elems_per_s
    traffic = proof_collective_bytes(k, d)
    t_comm = traffic["total"] / d / (m.ici_gbps * 1e9)
    t_d = t_compute / d + t_comm
    eff = (t_compute / d) / t_d
    return {
        "k": k, "d": d,
        "compute_s_1chip": round(t_compute, 3),
        "comm_s_per_device": round(t_comm, 4),
        "projected_step_s": round(t_d, 3),
        "efficiency": round(eff, 4),
        "collective_gb": round(traffic["total"] / 1e9, 3),
    }
