from .prover_step import msm_point_partitioned, sharded_prover_step

__all__ = ["msm_point_partitioned", "sharded_prover_step"]
