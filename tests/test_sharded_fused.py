"""Sharded fused solve == single-device fused solve (mesh invariance).

Runs the Pallas kernel in interpret mode per shard on the 8-virtual-CPU
mesh (tests/conftest.py).  Noise is injected so the comparison is exact up
to float reduction order; on TPU hardware the in-kernel PRNG is seeded by
global tile index, so the same invariance holds for the native RNG path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mppi_playground_tpu.core.config import MPPIConfig
from mppi_playground_tpu.core.fused_solver import make_fused_solver
from mppi_playground_tpu.parallel import make_mesh
from mppi_playground_tpu.parallel.sharded import make_sharded_fused_solver
from tests.test_fused_solve import _toy_aos, _toy_task

HORIZON = 6
K = 8 * 1024  # one kernel tile per shard on the 8-device mesh


def _config():
    return MPPIConfig(
        horizon=HORIZON,
        num_samples=K,
        dim_state=2,
        dim_control=1,
        u_min=(-1.0,),
        u_max=(1.0,),
        sigmas=(0.7,),
        lambda_=0.5,
        store_rollouts=False,
    )


def _info():
    return {"target": jnp.ones((HORIZON, 1), jnp.float32) * 2.0}


def test_sharded_fused_matches_single_device():
    cfg = _config()
    task = _toy_task()
    dyn, _ = _toy_aos()

    mesh = make_mesh(mesh_shape=(1, 8))
    sharded = make_sharded_fused_solver(cfg, task, dyn, mesh, jit=True)
    single = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)

    x0 = jnp.asarray([0.3, -0.1], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(5), (K, HORIZON, 1), jnp.float32) * 0.7
    )
    rs = sharded.solve(sharded.init(), x0, info=_info(), noise=noise)
    r1 = single.solve(single.init(), x0, info=_info(), noise=noise)

    np.testing.assert_allclose(
        np.asarray(rs.aux.costs), np.asarray(r1.aux.costs), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rs.action_seq), np.asarray(r1.action_seq), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(rs.aux.weights), np.asarray(r1.aux.weights), atol=1e-6
    )
    np.testing.assert_allclose(float(rs.aux.ess), float(r1.aux.ess), rtol=1e-3)


def test_sharded_fused_warm_start_chain():
    """Two chained ticks keep states consistent across the mesh."""
    cfg = _config()
    task = _toy_task()
    dyn, _ = _toy_aos()
    mesh = make_mesh(mesh_shape=(1, 8))
    sharded = make_sharded_fused_solver(cfg, task, dyn, mesh, jit=True)

    x0 = jnp.zeros(2, jnp.float32)
    st = sharded.init()
    noise = (
        jax.random.normal(jax.random.PRNGKey(9), (K, HORIZON, 1), jnp.float32) * 0.7
    )
    for _ in range(2):
        r = sharded.solve(st, x0, info=_info(), noise=noise)
        st = r.state
    a = np.asarray(r.action_seq)
    assert np.isfinite(a).all()
    assert (a >= -1.0).all() and (a <= 1.0).all()


def test_sharded_fused_essps_matches_single_device():
    """Two-phase auto-lambda under sample-axis sharding (GSPMD combine)."""
    import dataclasses

    cfg = dataclasses.replace(_config(), lambda_="ESSPS")
    task = _toy_task()
    dyn, _ = _toy_aos()
    mesh = make_mesh(mesh_shape=(1, 8))
    sharded = make_sharded_fused_solver(cfg, task, dyn, mesh, jit=True)
    single = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)

    x0 = jnp.asarray([0.1, 0.0], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(21), (K, HORIZON, 1), jnp.float32)
        * 0.7
    )
    rs = sharded.solve(sharded.init(), x0, info=_info(), noise=noise)
    r1 = single.solve(single.init(), x0, info=_info(), noise=noise)

    np.testing.assert_allclose(
        np.asarray(rs.aux.costs), np.asarray(r1.aux.costs), rtol=1e-6
    )
    np.testing.assert_allclose(float(rs.aux.lam), float(r1.aux.lam), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(rs.action_seq), np.asarray(r1.action_seq), atol=5e-3
    )


def test_sharded_fused_racing_task():
    """Real racing task (interval map tables in VMEM) under shard_map."""
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )

    env = RacingEnv()
    cfg = MPPIConfig(
        horizon=HORIZON, num_samples=K, dim_state=4, dim_control=2,
        u_min=(-2.0, -0.25), u_max=(2.0, 0.25), sigmas=(0.5, 0.1),
        lambda_=1.0, store_rollouts=False,
    )
    task = make_racing_fused_task_from_env(env)
    mesh = make_mesh(mesh_shape=(1, 8))
    sharded = make_sharded_fused_solver(cfg, task, env.dynamics, mesh)
    single = make_fused_solver(cfg, task, env.dynamics, jit=True,
                               donate_state=False)

    x0 = env.reset()
    xref, _ = calc_ref_trajectory(
        x0, env.racing_center_path, jnp.asarray(0, jnp.int32), HORIZON
    )
    info = {"reference_path": xref}
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (K, HORIZON, 2), jnp.float32
    ) * jnp.asarray([0.5, 0.1])
    rs = sharded.solve(sharded.init(), x0, info=info, noise=noise)
    r1 = single.solve(single.init(), x0, info=info, noise=noise)
    np.testing.assert_allclose(
        np.asarray(rs.aux.costs), np.asarray(r1.aux.costs), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rs.action_seq), np.asarray(r1.action_seq), atol=5e-3
    )


def test_sharded_fused_padded_last_shard_flagship_k():
    """The exact flagship K=100,000 sample-shards over 8 devices.

    100,000 is not a multiple of 1024·8: each shard carries 13 whole
    kernel tiles (106,496 padded samples globally) and the kernel's
    global-index mask pins the padded tail to 1e30 cost.  Costs, weights,
    update and ESS must equal the unsharded solve exactly (same noise)."""
    import dataclasses

    cfg = dataclasses.replace(_config(), num_samples=100_000)
    task = _toy_task()
    dyn, _ = _toy_aos()
    mesh = make_mesh(mesh_shape=(1, 8))
    sharded = make_sharded_fused_solver(cfg, task, dyn, mesh, jit=True)
    single = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)

    x0 = jnp.asarray([0.3, -0.1], jnp.float32)
    noise = (
        jax.random.normal(
            jax.random.PRNGKey(11), (100_000, HORIZON, 1), jnp.float32
        )
        * 0.7
    )
    rs = sharded.solve(sharded.init(), x0, info=_info(), noise=noise)
    r1 = single.solve(single.init(), x0, info=_info(), noise=noise)

    assert rs.aux.costs.shape == (100_000,)
    assert rs.aux.weights.shape == (100_000,)
    np.testing.assert_allclose(
        np.asarray(rs.aux.costs), np.asarray(r1.aux.costs), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rs.aux.weights), np.asarray(r1.aux.weights), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rs.action_seq), np.asarray(r1.action_seq), atol=5e-3
    )
    np.testing.assert_allclose(float(rs.aux.ess), float(r1.aux.ess), rtol=1e-3)


def test_sharded_fused_padded_essps_and_top_samples():
    """Two-phase ESSPS + top-k diagnostics with a padded last shard.

    K=9000 over 8 shards (2 tiles each, 16,384 padded): the lambda search
    must see exactly K costs (LBPS/ESSPS padding exactness), phase 2
    re-shards the padded costs, and regenerated top samples index the
    padded perturbation dump correctly."""
    import dataclasses

    cfg = dataclasses.replace(_config(), num_samples=9000, lambda_="ESSPS")
    task = _toy_task()
    dyn, _ = _toy_aos()
    mesh = make_mesh(mesh_shape=(1, 8))
    sharded = make_sharded_fused_solver(cfg, task, dyn, mesh, jit=True)
    single = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)
    noise = (
        jax.random.normal(jax.random.PRNGKey(13), (9000, HORIZON, 1), jnp.float32)
        * 0.7
    )
    x0 = jnp.asarray([0.2, 0.1], jnp.float32)
    rs = sharded.solve(sharded.init(), x0, info=_info(), noise=noise)
    r1 = single.solve(single.init(), x0, info=_info(), noise=noise)

    np.testing.assert_allclose(
        np.asarray(rs.aux.costs), np.asarray(r1.aux.costs), rtol=1e-6
    )
    np.testing.assert_allclose(float(rs.aux.lam), float(r1.aux.lam), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(rs.action_seq), np.asarray(r1.action_seq), atol=5e-3
    )
    ts, ws = sharded.top_samples(rs.aux, 8, noise=noise)
    t1, w1 = single.top_samples(r1.aux, 8, noise=noise)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(w1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ts), np.asarray(t1), atol=1e-5)


def test_batched_fused_matches_individual_solves():
    """Scenario-batched fused solve == per-scenario fused solves."""
    from mppi_playground_tpu.parallel.sharded import make_batched_fused_solver

    cfg = _config()
    task = _toy_task()
    dyn, _ = _toy_aos()
    mesh = make_mesh(mesh_shape=(4, 2))  # 4 scenario shards x 2 sample
    B = 8
    # states are read again after solve_batch: opt out of donation
    batched = make_batched_fused_solver(
        cfg, task, dyn, mesh, batch_size=B, donate_state=False
    )
    single = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)

    states = batched.init_batch(seed=0)
    x0s = jnp.stack(
        [jnp.asarray([0.1 * i, -0.05 * i], jnp.float32) for i in range(B)]
    )
    noise = (
        jax.random.normal(jax.random.PRNGKey(3), (B, K, HORIZON, 1), jnp.float32)
        * 0.7
    )
    rb = batched.solve_batch(states, x0s, info=_info(), noise=noise)

    for b in [0, 3, 7]:
        st_b = jax.tree_util.tree_map(lambda leaf: leaf[b], states)
        r1 = single.solve(st_b, x0s[b], info=_info(), noise=noise[b])
        np.testing.assert_allclose(
            np.asarray(rb.action_seq[b]), np.asarray(r1.action_seq), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(rb.aux.costs[b]), np.asarray(r1.aux.costs), rtol=1e-6
        )


def test_batched_fused_per_scenario_info():
    """batched_info routes per-scenario SMEM context (e.g. per-episode
    reference trajectories) to each scenario's fused solve."""
    from mppi_playground_tpu.parallel.sharded import make_batched_fused_solver

    cfg = _config()
    task = _toy_task()
    dyn, _ = _toy_aos()
    mesh = make_mesh(mesh_shape=(4, 2))
    B = 4
    batched = make_batched_fused_solver(
        cfg, task, dyn, mesh, batch_size=B, donate_state=False
    )
    single = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)

    states = batched.init_batch(seed=1)
    x0s = jnp.zeros((B, 2), jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(9), (B, K, HORIZON, 1), jnp.float32)
        * 0.7
    )
    targets = jnp.stack(
        [jnp.ones((HORIZON, 1), jnp.float32) * (0.5 * b - 1.0) for b in range(B)]
    )
    rb = batched.solve_batch(
        states, x0s, noise=noise, batched_info={"target": targets}
    )
    for b in range(B):
        st_b = jax.tree_util.tree_map(lambda leaf: leaf[b], states)
        r1 = single.solve(
            st_b, x0s[b], info={"target": targets[b]}, noise=noise[b]
        )
        np.testing.assert_allclose(
            np.asarray(rb.action_seq[b]), np.asarray(r1.action_seq), atol=2e-5
        )


def test_sharded_fused_top_samples_matches_single():
    """ShardedFusedSolver.top_samples == the single-device fused top-k.

    The per-shard run_regen replays each shard's tile streams with its
    global tile offset, so the regenerated top trajectories are identical
    to the unsharded solve's (injected noise on CPU interpret)."""
    cfg = _config()
    task = _toy_task()
    dyn, _ = _toy_aos()
    mesh = make_mesh(mesh_shape=(1, 8))
    sharded = make_sharded_fused_solver(cfg, task, dyn, mesh)
    single = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)
    assert sharded.top_samples is not None

    noise = (
        jax.random.normal(jax.random.PRNGKey(5), (K, HORIZON, 1), jnp.float32)
        * 0.7
    )
    x0 = jnp.asarray([0.4, -0.2], jnp.float32)
    rs = sharded.solve(sharded.init(), x0, info=_info(), noise=noise)
    r1 = single.solve(single.init(), x0, info=_info(), noise=noise)

    ts, ws = sharded.top_samples(rs.aux, 16, noise=noise)
    t1, w1 = single.top_samples(r1.aux, 16, noise=noise)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(w1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ts), np.asarray(t1), atol=1e-5)


def test_batched_fused_2d_mesh_matches_individual():
    """2D fused fleet: scenarios x samples both sharded (VERDICT r3 #8).

    B=2 scenarios over 2 scenario shards; within each scenario K=5000
    samples shard 4-way (2 padded 1024-tiles per shard).  Every scenario's
    costs/weights/update must equal its standalone unsharded fused solve."""
    from mppi_playground_tpu.parallel.sharded import make_batched_fused_solver

    K2 = 5000
    cfg = MPPIConfig(
        horizon=HORIZON, num_samples=K2, dim_state=2, dim_control=1,
        u_min=(-1.0,), u_max=(1.0,), sigmas=(0.7,), lambda_=0.5,
        store_rollouts=False,
    )
    task = _toy_task()
    dyn, _ = _toy_aos()
    mesh = make_mesh(mesh_shape=(2, 4))
    B = 2
    batched = make_batched_fused_solver(
        cfg, task, dyn, mesh, batch_size=B, sample_axis="samples",
        donate_state=False,
    )
    single = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)

    states = batched.init_batch(seed=6)
    x0s = jnp.asarray([[0.2, -0.1], [-0.3, 0.4]], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(7), (B, K2, HORIZON, 1), jnp.float32)
        * 0.7
    )
    rb = batched.solve_batch(states, x0s, info=_info(), noise=noise)

    assert rb.aux.costs.shape == (B, K2)
    assert rb.aux.weights.shape == (B, K2)
    for b in range(B):
        st_b = jax.tree_util.tree_map(lambda leaf: leaf[b], states)
        r1 = single.solve(st_b, x0s[b], info=_info(), noise=noise[b])
        np.testing.assert_allclose(
            np.asarray(rb.aux.costs[b]), np.asarray(r1.aux.costs), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(rb.aux.weights[b]), np.asarray(r1.aux.weights),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(rb.action_seq[b]), np.asarray(r1.action_seq), atol=5e-3
        )


def test_batched_fused_2d_mesh_essps():
    """2D fused fleet with two-phase ESSPS: per-scenario lambda matches."""
    from mppi_playground_tpu.parallel.sharded import make_batched_fused_solver

    K2 = 5000
    cfg = MPPIConfig(
        horizon=HORIZON, num_samples=K2, dim_state=2, dim_control=1,
        u_min=(-1.0,), u_max=(1.0,), sigmas=(0.7,), lambda_="ESSPS",
        store_rollouts=False,
    )
    task = _toy_task()
    dyn, _ = _toy_aos()
    mesh = make_mesh(mesh_shape=(2, 4))
    B = 2
    batched = make_batched_fused_solver(
        cfg, task, dyn, mesh, batch_size=B, sample_axis="samples",
        donate_state=False,
    )
    single = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)

    states = batched.init_batch(seed=8)
    x0s = jnp.asarray([[0.0, 0.0], [0.5, -0.5]], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(15), (B, K2, HORIZON, 1), jnp.float32)
        * 0.7
    )
    rb = batched.solve_batch(states, x0s, info=_info(), noise=noise)
    for b in range(B):
        st_b = jax.tree_util.tree_map(lambda leaf: leaf[b], states)
        r1 = single.solve(st_b, x0s[b], info=_info(), noise=noise[b])
        # The 2D-fleet core solves lambda with the partitionable XLA
        # bisection (flat [K] sums) while the single-scenario kernel path
        # accumulates in [8,128] vreg chunks (ops/lambda_search.py
        # _vreg_chunks) — same arithmetic, different f32 summation order,
        # so lambda* agrees to rounding (measured ~1e-6 relative), not
        # bitwise.
        np.testing.assert_allclose(
            float(rb.aux.lam[b]), float(r1.aux.lam), rtol=1e-5,
            err_msg=f"adapted lambda diverged for scenario {b}",
        )
        np.testing.assert_allclose(
            np.asarray(rb.action_seq[b]), np.asarray(r1.action_seq), atol=5e-3
        )


def test_batched_fused_essps_matches_individual():
    """Scenario-batched fused solve with two-phase ESSPS auto-lambda:
    each scenario's adapted lambda and update equal its standalone solve."""
    from mppi_playground_tpu.parallel.sharded import make_batched_fused_solver

    cfg = MPPIConfig(
        horizon=HORIZON, num_samples=K, dim_state=2, dim_control=1,
        u_min=(-1.0,), u_max=(1.0,), sigmas=(0.7,), lambda_="ESSPS",
        store_rollouts=False,
    )
    task = _toy_task()
    dyn, _ = _toy_aos()
    mesh = make_mesh(mesh_shape=(2, 4))
    B = 2
    batched = make_batched_fused_solver(
        cfg, task, dyn, mesh, batch_size=B, donate_state=False
    )
    single = make_fused_solver(cfg, task, dyn, jit=True, donate_state=False)

    states = batched.init_batch(seed=4)
    x0s = jnp.asarray([[0.0, 0.0], [0.5, -0.5]], jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(2), (B, K, HORIZON, 1), jnp.float32)
        * 0.7
    )
    rb = batched.solve_batch(states, x0s, info=_info(), noise=noise)

    for b in range(B):
        st_b = jax.tree_util.tree_map(lambda leaf: leaf[b], states)
        r1 = single.solve(st_b, x0s[b], info=_info(), noise=noise[b])
        # The 2D-fleet core solves lambda with the partitionable XLA
        # bisection (flat [K] sums) while the single-scenario kernel path
        # accumulates in [8,128] vreg chunks (ops/lambda_search.py
        # _vreg_chunks) — same arithmetic, different f32 summation order,
        # so lambda* agrees to rounding (measured ~1e-6 relative), not
        # bitwise.
        np.testing.assert_allclose(
            float(rb.aux.lam[b]), float(r1.aux.lam), rtol=1e-5,
            err_msg=f"adapted lambda diverged for scenario {b}",
        )
        np.testing.assert_allclose(
            np.asarray(rb.action_seq[b]), np.asarray(r1.action_seq), atol=2e-5
        )
