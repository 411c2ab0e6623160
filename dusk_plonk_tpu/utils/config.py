"""Typed runtime configuration (SURVEY.md §5.6: the reference has only
cargo features; mesh shape, kernel tile sizes and domain chunking are new,
TPU-specific design surface).

One process-global config, read at plan/engine construction time —
changing it after plans are built has no effect on cached executables.
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class TpuPlonkConfig:
    # --- MSM (ops/msm.py) -------------------------------------------------
    msm_window_bits: int | None = None  # Pippenger window width override
                                    # (None = size-adaptive, ops/msm.py)
    msm_chunk_len: int = 256        # sequential depth of the bucket scan
                                    # (halving it doubles the scan lanes;
                                    # 256 beat 512 by ~30% at 2^16 once the
                                    # chunk-offset pass went log-depth)
    msm_group_slots: int = 1 << 22  # point-slot cap per window group
    msm_serial_max: int = 512       # n_pad at or below: bit-serial tier
                                    # (ONE EC-add instantiation; the full
                                    # sort/gather/bucket pipeline costs
                                    # minutes of XLA:CPU compile per size
                                    # on the 1-core test host)

    # --- Pallas kernels (ops/pallas_field.py) ----------------------------
    mul_tile: int = 1024            # Montgomery-mul lane tile
    ec_tile: int = 128              # fused EC-add lane tile (register bound)
    ec_limb14: bool = True          # 14-bit lazy-reduction engine for the
                                    # fused EC scan/sum kernels (~1.5x
                                    # fewer vector ops than 16-bit CIOS)
    ec_limb14_force: bool = False   # run the 14-bit kernels off-TPU too
                                    # (interpret mode; CPU tests)
    ec_scan_steps: int = 8          # scan steps per pallas program (the
                                    # grid machinery costs ~7.4 us per
                                    # program, measured; blocking divides
                                    # that fixed cost by S)
    ec_scan_em: bool = False        # scan emits element-major output
                                    # directly (saves the 41 ms/MSM XLA
                                    # transpose).  Default OFF: the
                                    # in-kernel (72, T) transpose stalled
                                    # the Mosaic compile of msm_device
                                    # >20 min (measured) and round times
                                    # showed no net win; kernel + test
                                    # kept for future Mosaic versions

    # --- quotient grid (proving/engine.py) --------------------------------
    quotient_chunks_large: int = 16  # 8n-domain split when n8 > 2^15

    # --- NTT (ops/ntt.py, ops/pallas_field.py, ops/mxu_ntt.py) -------------
    ntt_tile: int = 1024            # fused-ladder lane tile (s_T = log2)
    # stacked (k, L, n) per-stage twiddle tables replace the per-stage
    # element gather (15 ms/stage at 2^19, measured) with a contiguous
    # dynamic slice; memory is k*L*n*4B per direction, so gate by k
    ntt_stacked_max_k: int = 19     # k=20 would cost 2.7 GB of stacked
                                    # tables the 2^20 single-chip proof's
                                    # HBM budget cannot spare
    # four-step NTT with int8 digit-plane matmuls on the MXU (ops/mxu_ntt)
    # for domains at or above this size; None disables.  Default OFF: on
    # v5e the path is bit-exact but measured slightly SLOWER than the
    # fused butterfly ladder (k=19 pair: 81 ms vs 65 ms — the digit
    # decompose/reduce VPU overhead outweighs the MXU matmul win at these
    # sizes); kept for larger domains and future chips.
    ntt_mxu_min_k: int | None = None
    ntt_mxu_force: bool = False     # route through the MXU path off-TPU
                                    # (interpret-mode Pallas; CPU tests)

    # --- mesh (parallel/) --------------------------------------------------
    mesh_axis: str = "shard"


_config = TpuPlonkConfig()


def get_config() -> TpuPlonkConfig:
    return _config


def set_config(**overrides) -> TpuPlonkConfig:
    """Replace fields of the global config (affects plans built after the
    call).  Returns the new config."""
    global _config
    _config = replace(_config, **overrides)
    return _config
