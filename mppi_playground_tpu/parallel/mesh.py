"""Device-mesh construction and multi-host initialization.

The reference is strictly single-process, single-GPU (SURVEY.md §2's
parallelism checklist: no torch.distributed anywhere); the only parallel
axis is the sample batch K on one device.  This module provides the
TPU-native scaling substrate the reference lacks:

* a named :class:`jax.sharding.Mesh` over the local (or pod-wide) devices
  with axes ``('scenario', 'samples')`` — scenarios are embarrassingly
  parallel control problems (data parallel), samples shard the K rollouts
  of a single solve (the softmin reduction becomes a psum over ICI),
* ``jax.distributed`` bootstrap for multi-host pods over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"
SAMPLE_AXIS = "samples"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    single_host: bool = False,
) -> None:
    """Initialize multi-host JAX.

    Must be the process's FIRST JAX call: any backend-touching call (even
    ``jax.process_count()``) initializes XLA, after which
    ``jax.distributed.initialize`` refuses to run — so no pre-checks here.
    On TPU pods call with no arguments (everything is auto-detected from
    the pod environment); elsewhere pass the coordinator explicitly.
    Safe to call redundantly: an already-initialized runtime is left as-is.

    Args:
        single_host: explicit no-op escape hatch for scripts that run the
            same code path on single-host dev machines and multi-host
            pods — ``jax.distributed.initialize`` raises on single-host
            non-pod environments, and silently swallowing that would mask
            real bootstrap failures on pods, so opting out must be
            explicit.
    """
    if single_host:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:
        # Tolerate only the documented redundant-call error; anything else
        # (unreachable coordinator, topology mismatch) must propagate —
        # probing jax.process_count() here would itself initialize the
        # backend and could mask a failed bootstrap as a healthy pod.
        if "only be called once" in str(exc):
            return
        raise


def make_mesh(
    mesh_shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = (SCENARIO_AXIS, SAMPLE_AXIS),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2D ``(scenario, samples)`` mesh over the available devices.

    Defaults put every device on the sample axis (the dominant axis for a
    single control problem); pass ``mesh_shape=(s, k)`` to split.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (1, n)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} does not match {n} devices")
    device_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(device_array, axis_names=tuple(axis_names))


def sample_sharding(mesh: Mesh, ndim: int, axis: str = SAMPLE_AXIS) -> NamedSharding:
    """Sharding that splits the leading (sample) axis of an ``ndim`` array."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
