"""Sample-axis scaling-efficiency harness (BASELINE.md target: >=85%).

Measures solves/s of the sharded solve at 1, 2, ..., N sample-axis shards
on whatever devices exist and reports efficiency vs linear scaling of the
1-shard throughput.  On a multi-chip TPU slice this produces the real
scaling numbers; on a single chip / CPU it validates the harness and the
sharded program end-to-end on a virtual mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``).

MPPI's cross-shard traffic is one scalar pmax + O(T*m) psums per solve
(see parallel/sharded.py), so efficiency should track the per-shard
kernel-time fraction, not bandwidth.

Run:  python benchmarks/scaling.py [--samples 98304] [--horizon 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

WARMUP = 3
ITERS = 20


def measure_kernel_fraction():
    """Split the flagship tick into kernel vs serial-tail time (TPU).

    The sharded solve's efficiency model is
    ``eff(n) = t_tick(1) / (n * (t_kernel/n + t_serial))`` — the K-sample
    kernel scales linearly over shards while the serial tail (reference
    generation, partials combine, nominal re-roll, dispatch) does not.
    This measures both terms on the real racing workload so the model in
    docs/ARCHITECTURE.md uses hardware numbers.
    """
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.fused_solver import make_fused_solver
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.ops.fused_solve import make_fused_solve

    horizon, k = 50, 100_000
    env = RacingEnv()
    config = MPPIConfig(
        horizon=horizon, num_samples=k, dim_state=4, dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
    )
    task = make_racing_fused_task_from_env(env)
    core = make_fused_solve(config, task)
    solver = make_fused_solver(config, task, env.dynamics, jit=False)
    path = env.racing_center_path
    x0 = env.reset()
    xref, _ = calc_ref_trajectory(x0, path, jnp.asarray(0, jnp.int32), horizon)
    smem = task.smem_builder({"reference_path": xref})
    prev = jnp.zeros((horizon, 2), jnp.float32)

    kernel_only = jax.jit(
        lambda seed: core.run_kernel(x0, prev, jnp.asarray(1.0), seed, smem)
    )

    def tick(st, cind, x):
        ref, new_cind = calc_ref_trajectory(x, path, cind, horizon)
        r = solver.solve(st, x, info={"reference_path": ref})
        return r.action_seq, r.state, new_cind

    tick = jax.jit(tick)

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(50):
            out = fn(*a)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / 50

    t_kernel = timed(kernel_only, jnp.asarray(7, jnp.int32))
    st = solver.init()
    t_tick = timed(tick, st, jnp.asarray(0, jnp.int32), x0)
    print(
        json.dumps(
            {
                "metric": "flagship_kernel_fraction",
                "value": round(t_kernel / t_tick, 4),
                "unit": "fraction",
                "extra": {
                    "kernel_ms": round(1e3 * t_kernel, 3),
                    "tick_ms": round(1e3 * t_tick, 3),
                    "serial_tail_ms": round(1e3 * (t_tick - t_kernel), 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=None)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument(
        "--cpu", type=int, default=0,
        help="run on N virtual CPU devices (harness validation without a "
        "multi-chip slice); the image's sitecustomize force-registers the "
        "TPU plugin, so the platform must be re-overridden here",
    )
    ap.add_argument(
        "--fraction", action="store_true",
        help="measure the flagship kernel/serial-tail split instead "
        "(feeds the analytic scaling model in docs/ARCHITECTURE.md)",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)
    if args.fraction:
        measure_kernel_fraction()
        return

    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.models import bicycle
    from mppi_playground_tpu.ops.fused_solve import TILE, FusedTask, fused_supported
    from mppi_playground_tpu.parallel import make_mesh, make_sharded_fused_solver

    n_devices = jax.device_count()
    shard_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_devices]
    # whole tiles per shard at the largest shard count
    k = args.samples or TILE * 96
    assert k % (TILE * shard_counts[-1]) == 0

    dynamics = bicycle.make_dynamics(x_lim=(-40.0, 40.0), y_lim=(-40.0, 40.0))
    task = FusedTask(
        dynamics_soa=bicycle.make_dynamics_soa(
            x_lim=(-40.0, 40.0), y_lim=(-40.0, 40.0)
        ),
        stage_cost_soa=lambda xs, us, ctx: (xs[3] - 5.0) ** 2
        + 0.1 * (us[0] ** 2 + us[1] ** 2),
        vmem_args={},
        smem_builder=lambda info: {},
    )
    config = MPPIConfig(
        horizon=args.horizon, num_samples=k, dim_state=4, dim_control=2,
        u_min=bicycle.U_MIN, u_max=bicycle.U_MAX, sigmas=(0.5, 0.1),
        lambda_=1.0, store_rollouts=False,
    )

    # injected noise when the in-kernel PRNG is unavailable (CPU interpret)
    noise = None
    if not fused_supported():
        noise = jax.random.normal(
            jax.random.PRNGKey(0), (k, args.horizon, 2), jnp.float32
        ) * jnp.asarray([0.5, 0.1])

    base_rate = None
    for n in shard_counts:
        mesh = make_mesh(mesh_shape=(1, n), devices=jax.devices()[:n])
        solver = make_sharded_fused_solver(config, task, dynamics, mesh)
        st = solver.init()
        x0 = jnp.zeros(4)
        r = None
        for _ in range(WARMUP):
            r = solver.solve(st, x0, noise=noise)
            st = r.state
        jax.block_until_ready(r.action_seq)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = solver.solve(st, x0, noise=noise)
            st = r.state
        jax.block_until_ready(r.action_seq)
        rate = ITERS / (time.perf_counter() - t0)
        if base_rate is None:
            base_rate = rate
        print(
            json.dumps(
                {
                    "metric": f"scaling_solves_per_s_shards{n}",
                    "value": round(rate, 3),
                    "unit": "solves/s",
                    "extra": {
                        "efficiency_vs_linear": round(rate / (base_rate * n), 4)
                        if n > 1
                        else 1.0,
                        "samples": k,
                        "device": str(jax.devices()[0]),
                    },
                }
            )
        )


if __name__ == "__main__":
    main()
