"""mppi_playground_tpu — a TPU-native MPPI control framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
PyTorch reference ``kohonda/mppi_playground`` (mounted read-only at
/root/reference): information-theoretic MPC with Gaussian control-
perturbation sampling, fused K x T rollouts, softmin trajectory weighting,
on-device auto-temperature tuning (MPO / LBPS / ESSPS), Savitzky-Golay
smoothing, occupancy-grid cost maps, environments and closed-loop examples —
plus TPU-first capabilities the reference lacks: one fused XLA program per
control tick, Pallas hot-path kernels, sample-axis sharding over device
meshes with psum reductions, explicit checkpointable solver state.
"""

from mppi_playground_tpu.core.closed_loop import PipelinedRunner
from mppi_playground_tpu.core.config import MPPIConfig, MPPIState
from mppi_playground_tpu.core.controller import MPPI
from mppi_playground_tpu.core.solver import (
    MPPISolver,
    SolveAux,
    SolveResult,
    make_solver,
)

__all__ = [
    "MPPI",
    "MPPIConfig",
    "MPPIState",
    "MPPISolver",
    "PipelinedRunner",
    "SolveAux",
    "SolveResult",
    "make_solver",
]

__version__ = "0.7.0"
