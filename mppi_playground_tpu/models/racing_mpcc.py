"""MPCC-style racing cost + on-device reference-trajectory generation.

Behavioral reference: the racing controller in
``/root/reference/example/racing.py``:

* :func:`make_mpcc_cost` — contouring/lag error vs the per-step reference
  pose, velocity tracking, obstacle+lane map penalty, input and
  delta-input costs with the reference weights Qc=2, Ql=3, Qv=2, Qo=1e4,
  Qin=0.01, Qdin=0.5 (racing.py:41-46, 110-159).
* :func:`calc_ref_trajectory` — nearest-path-index with monotone
  progression ``max(cind, ind)`` (racing.py:193-201), lookahead 3 m at
  0.85 m intervals, target velocity V_MAX until the horizon overruns the
  path end, at which point the whole velocity column zeroes
  (racing.py:206-217 — the reference's in-loop column assignment).

The reference computes the nearest index **on host** with a Python
``min(range(...))`` over ``.cpu().numpy()`` scalars — one device<->host
round trip per control tick.  Here the search is a branchless on-device
argmin + gather, so reference generation fuses into the same jitted program
as the solve (SURVEY.md §7 hard part #4).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

from mppi_playground_tpu.maps.grid_cost import map_query
from mppi_playground_tpu.models.bicycle import V_MAX

# Reference cost weights (racing.py:41-46)
QC = 2.0  # contouring error
QL = 3.0  # lag error
QV = 2.0  # velocity tracking
QO = 10000.0  # obstacle / off-lane
QIN = 0.01  # input magnitude
QDIN = 0.5  # input rate


def make_mpcc_cost(
    obstacle_map,
    lane_map,
    qc: float = QC,
    ql: float = QL,
    qv: float = QV,
    qo: float = QO,
    qin: float = QIN,
    qdin: float = QDIN,
) -> Callable[[jnp.ndarray, jnp.ndarray, dict], jnp.ndarray]:
    """Contouring-control stage cost (racing.py:110-159).

    ``obstacle_map`` / ``lane_map`` accept either a ``GridMapData`` (gather
    query) or a ``FeatureMapData`` (analytic gather-free query — the TPU
    fast path); see ``maps.grid_cost.map_query``.

    Expects ``info['reference_path']`` of shape ``[horizon+1, 4]``
    (x, y, yaw, v_target) and the solver-provided ``info['t']`` /
    ``info['prev_action']``.
    """

    def cost(state: jnp.ndarray, action: jnp.ndarray, info: dict) -> jnp.ndarray:
        reference_path = info["reference_path"]
        prev_action = info["prev_action"]
        t = info["t"]
        ref = jnp.take(reference_path, t, axis=0)  # [4] traced-index row

        dx = state[:, 0] - ref[0]
        dy = state[:, 1] - ref[1]
        sin_yaw = jnp.sin(ref[2])
        cos_yaw = jnp.cos(ref[2])
        ec = sin_yaw * dx - cos_yaw * dy  # contouring error
        el = -cos_yaw * dx - sin_yaw * dy  # lag error
        path_cost = qc * ec**2 + ql * el**2

        velocity_cost = qv * (state[:, 3] - ref[3]) ** 2

        pos = state[:, :2]
        map_cost = map_query(obstacle_map, pos) + map_query(lane_map, pos)
        obstacle_cost = qo * map_cost

        input_cost = qin * jnp.sum(action**2, axis=1)
        input_cost = input_cost + qdin * jnp.sum((action - prev_action) ** 2, axis=1)

        return path_cost + velocity_cost + obstacle_cost + input_cost

    return cost


def make_mpcc_cost_soa(
    qc: float = QC,
    ql: float = QL,
    qv: float = QV,
    qo: float = QO,
    qin: float = QIN,
    qdin: float = QDIN,
) -> Callable:
    """Structure-of-arrays MPCC stage cost for the fused Pallas solve.

    Same arithmetic as :func:`make_mpcc_cost` (racing.py:110-159), but on
    component tuples (full-vreg layout) with the map penalty computed by
    the row-interval query (``ops/row_intervals.py``) instead of a gather.
    Expects in ``ctx``:

    * ``ctx['smem']['xref']`` — ref with rows ``(x, y, sin_yaw, cos_yaw,
      v_target)``, indexed by the static step ``ctx['t']``;
    * ``ctx['vmem']['obstacle_table']`` / ``['lane_table']`` —
      :class:`~mppi_playground_tpu.ops.row_intervals.RowIntervalTable`
      pytrees with their ``lo``/``hi`` leaves materialized in VMEM.
    """
    from mppi_playground_tpu.ops.row_intervals import (
        interval_query,
        interval_query_pair,
        same_geometry,
    )

    def cost_soa(xs, us, ctx):
        x, y, _theta, v = xs
        t = ctx["t"]
        xref = ctx["smem"]["xref"]
        rx = xref[t, 0]
        ry = xref[t, 1]
        sin_yaw = xref[t, 2]
        cos_yaw = xref[t, 3]
        rv = xref[t, 4]

        dx = x - rx
        dy = y - ry
        ec = sin_yaw * dx - cos_yaw * dy
        el = -cos_yaw * dx - sin_yaw * dy
        path_cost = qc * ec * ec + ql * el * el

        velocity_cost = qv * (v - rv) ** 2

        obstacle_table = ctx["vmem"]["obstacle_table"]
        lane_table = ctx["vmem"]["lane_table"]
        if same_geometry(obstacle_table, lane_table):
            # racing's grids share the raster: one shared index
            # computation feeds both tables' slot loops (bit-equal to
            # the two separate queries — tests/test_fused_solve.py)
            map_cost = interval_query_pair(obstacle_table, lane_table, x, y)
        else:
            map_cost = interval_query(obstacle_table, x, y) + interval_query(
                lane_table, x, y
            )
        obstacle_cost = qo * map_cost

        input_cost = sum(qin * u * u for u in us)
        input_cost = input_cost + sum(
            qdin * (u - pu) ** 2 for u, pu in zip(us, ctx["prev_us"])
        )
        return path_cost + velocity_cost + obstacle_cost + input_cost

    return cost_soa


def make_racing_fused_task(
    obstacle_table,
    lane_table,
    x_lim: Tuple[float, float],
    y_lim: Tuple[float, float],
):
    """Bundle the racing model for the fused Pallas solve kernel.

    Args:
        obstacle_table / lane_table: ``RowIntervalTable`` encodings of the
            env's occupancy grids (``ObstacleMap.row_interval_table`` /
            ``LaneMap.row_interval_table``).
        x_lim / y_lim: map bounds for the bicycle position clamp.
    """
    from mppi_playground_tpu.models.bicycle import make_dynamics_soa
    from mppi_playground_tpu.ops.fused_solve import FusedTask

    def smem_builder(info: dict) -> dict:
        return {"xref": extend_reference_path(info["reference_path"])}

    return FusedTask(
        dynamics_soa=make_dynamics_soa(x_lim=x_lim, y_lim=y_lim),
        stage_cost_soa=make_mpcc_cost_soa(),
        vmem_args={"obstacle_table": obstacle_table, "lane_table": lane_table},
        smem_builder=smem_builder,
    )


def make_racing_fused_task_from_env(env):
    """``make_racing_fused_task`` wired from a ``RacingEnv``'s maps/bounds."""
    return make_racing_fused_task(
        env.obstacle_map.row_interval_table,
        env.lane_map.row_interval_table,
        x_lim=tuple(env.obstacle_map.x_lim),
        y_lim=tuple(env.obstacle_map.y_lim),
    )


def extend_reference_path(xref: jnp.ndarray) -> jnp.ndarray:
    """``[T+1, 4]`` (x, y, yaw, v) -> ``[T+1, 5]`` (x, y, sin, cos, v).

    Precomputes the per-row sin/cos outside the kernel so the in-kernel
    reference reads are plain scalar loads.
    """
    return jnp.stack(
        [
            xref[:, 0],
            xref[:, 1],
            jnp.sin(xref[:, 2]),
            jnp.cos(xref[:, 2]),
            xref[:, 3],
        ],
        axis=1,
    )


def calc_ref_trajectory(
    state: jnp.ndarray,
    path: jnp.ndarray,
    cind: jnp.ndarray,
    horizon: int,
    DL: float = 0.1,
    lookahead_distance: float = 3.0,
    reference_path_interval: float = 0.85,
    v_max: float = V_MAX,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference trajectory for the current tick (racing.py:161-218).

    Args:
        state: ``[4]`` current vehicle state.
        path: ``[N, 3]`` resampled center path (x, y, yaw) on device.
        cind: scalar int32, the monotone progress index from last tick.
        horizon: prediction horizon T (static).

    Returns:
        (xref ``[horizon+1, 4]``, new_cind scalar int32).
    """
    ncourse = path.shape[0]

    # Nearest path index (racing.py:193-199) as an on-device argmin.
    # The reference first-mins f32 np.hypot distances; argmin over sqrt
    # (not raw squared distance, whose rounding can order near-equidistant
    # samples differently) keeps the tie-breaking aligned, and jnp.argmin
    # picks the first minimum like list.index(min(...)).
    d = jnp.sqrt(
        (path[:, 0] - state[0]) ** 2 + (path[:, 1] - state[1]) ** 2
    )
    nearest = jnp.argmin(d).astype(jnp.int32)
    ind = jnp.maximum(jnp.asarray(cind, jnp.int32), nearest)

    # Lookahead offsets are static — replicate the reference's host-side
    # float64 ACCUMULATION (racing.py:204-208: travel += interval each row,
    # dind = int(round(travel / DL))).  A closed-form f32 version rounds
    # differently for ~1 in 5 rows at horizon 50 (e.g. f64 5.5499.../0.1 ->
    # 55 vs f32 55.500004 -> 56), shifting the reference pose by one path
    # sample.
    travel = float(lookahead_distance)
    dind_list = []
    for _ in range(horizon + 1):
        travel += float(reference_path_interval)
        dind_list.append(int(round(travel / DL)))
    dinds = jnp.asarray(dind_list, jnp.int32)

    rows = ind + dinds
    valid = rows < ncourse
    rows = jnp.minimum(rows, ncourse - 1)
    xref_pose = jnp.take(path, rows, axis=0)  # [horizon+1, 3]

    # Reference quirk (racing.py:210-217): overruning the path end zeroes
    # the *entire* target-velocity column, not just the overrun rows.
    v_column = jnp.where(
        jnp.all(valid),
        jnp.full((horizon + 1,), v_max, path.dtype),
        jnp.zeros((horizon + 1,), path.dtype),
    )

    xref = jnp.concatenate([xref_pose, v_column[:, None]], axis=1)
    return xref.astype(state.dtype), ind
