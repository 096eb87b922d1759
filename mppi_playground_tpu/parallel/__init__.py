from mppi_playground_tpu.parallel.mesh import (
    SAMPLE_AXIS,
    SCENARIO_AXIS,
    initialize_distributed,
    make_mesh,
    replicated,
    sample_sharding,
)
from mppi_playground_tpu.parallel.sharded import (
    BatchedFusedSolver,
    BatchedMPPISolver,
    ShardedFusedSolver,
    ShardedMPPISolver,
    make_batched_fused_solver,
    make_batched_solver,
    make_sharded_fused_solver,
    make_sharded_solver,
)

__all__ = [
    "SAMPLE_AXIS",
    "SCENARIO_AXIS",
    "BatchedFusedSolver",
    "BatchedMPPISolver",
    "ShardedFusedSolver",
    "ShardedMPPISolver",
    "initialize_distributed",
    "make_batched_fused_solver",
    "make_batched_solver",
    "make_mesh",
    "make_sharded_fused_solver",
    "make_sharded_solver",
    "replicated",
    "sample_sharding",
]
