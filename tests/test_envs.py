"""Environment + closed-loop integration tests (CPU-sized workloads)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mppi_playground_tpu import MPPIConfig, make_solver
from mppi_playground_tpu.envs import (
    GoalInDangerZoneEnv,
    Navigation2DEnv,
    RacingController,
    RacingEnv,
)
from mppi_playground_tpu.models import danger_zone as dz_model


@pytest.fixture(scope="module")
def nav_env():
    return Navigation2DEnv()


@pytest.fixture(scope="module")
def racing_env():
    return RacingEnv()


# ---------------------------------------------------------------------------
# Navigation2DEnv
# ---------------------------------------------------------------------------

def test_nav_env_reset_and_step(nav_env):
    state = nav_env.reset()
    assert state.shape == (3,)
    np.testing.assert_allclose(np.asarray(state[:2]), [-9.0, -9.0])
    new_state, reached = nav_env.step(jnp.asarray([1.0, 0.0]))
    assert not reached
    # moved forward along its heading (toward the goal, i.e. up-right)
    assert float(new_state[0]) > -9.0 and float(new_state[1]) > -9.0


def test_nav_env_collision_check_shape(nav_env):
    traj = jnp.zeros((1, 31, 3))
    out = nav_env.collision_check(traj)
    assert out.shape == (1, 31)


def test_nav_env_closed_loop_progress(nav_env):
    """Small-K solver makes progress toward the goal without collisions."""
    config = MPPIConfig(
        horizon=20,
        num_samples=512,
        dim_state=3,
        dim_control=2,
        u_min=tuple(nav_env.u_min.tolist()),
        u_max=tuple(nav_env.u_max.tolist()),
        sigmas=(0.5, 0.5),
        lambda_="ESSPS",
    )
    solver = make_solver(config, nav_env.dynamics, nav_env.cost_function)
    solver_state = solver.init()
    x = nav_env.reset()
    goal = jnp.asarray([9.0, 9.0])
    d0 = float(jnp.linalg.norm(x[:2] - goal))
    collided = False
    for _ in range(40):
        result = solver.solve(solver_state, x)
        solver_state = result.state
        x, reached = nav_env.step(result.action_seq[0])
        occ = nav_env.collision_check(x[None, None, :])
        collided = collided or bool(occ[0, 0] > 0)
        if reached:
            break
    d1 = float(jnp.linalg.norm(x[:2] - goal))
    assert d1 < d0 - 3.0, f"no progress: {d0} -> {d1}"
    assert not collided


# ---------------------------------------------------------------------------
# RacingEnv + controller
# ---------------------------------------------------------------------------

def test_racing_env_construction(racing_env):
    state = racing_env.reset()
    assert state.shape == (4,)
    assert float(state[3]) == 0.0
    # start on the lane corridor (drivable)
    assert float(racing_env.lane_map.compute_cost(state[None, :2])[0]) == 0.0
    # path resampled at ~dl
    path = np.asarray(racing_env.racing_center_path)
    spacing = np.linalg.norm(np.diff(path[:, :2], axis=0), axis=1)
    assert abs(spacing.mean() - racing_env.dl) < 0.02


def test_racing_controller_closed_loop(racing_env):
    controller = RacingController(
        racing_env, horizon=15, num_samples=512, seed=0
    )
    x = racing_env.reset()
    start = np.asarray(x[:2])
    path_index_history = []
    for _ in range(30):
        action_seq, state_seq = controller.update(x)
        assert np.all(np.isfinite(np.asarray(action_seq)))
        x, reached = racing_env.step(action_seq[0])
        path_index_history.append(int(controller.current_path_index))
        if reached:
            break
    # progress index is monotone (racing.py:201)
    assert all(b >= a for a, b in zip(path_index_history, path_index_history[1:]))
    # the car drove somewhere
    assert float(jnp.linalg.norm(x[:2] - jnp.asarray(start))) > 1.0
    # vehicle accelerated along the track
    assert float(x[3]) > 0.5
    # diagnostics path
    top, weights = controller.get_top_samples(50)
    assert top.shape[0] == 50 and bool(jnp.all(weights[:-1] >= weights[1:]))


def test_racing_reference_trajectory_end_of_path(racing_env):
    from mppi_playground_tpu.models.racing_mpcc import calc_ref_trajectory

    path = racing_env.racing_center_path
    n = path.shape[0]
    # mid-track: full-speed reference
    state = jnp.concatenate([path[n // 2, :2], jnp.zeros(2)])
    xref, ind = calc_ref_trajectory(state, path, jnp.asarray(0, jnp.int32), 10)
    assert xref.shape == (11, 4)
    np.testing.assert_allclose(np.asarray(xref[:, 3]), 8.0)
    assert int(ind) == n // 2
    # near the end: velocity column zeroes entirely (racing.py:210-217)
    state_end = jnp.concatenate([path[-3, :2], jnp.zeros(2)])
    xref_end, _ = calc_ref_trajectory(state_end, path, jnp.asarray(0, jnp.int32), 10)
    np.testing.assert_allclose(np.asarray(xref_end[:, 3]), 0.0)
    np.testing.assert_allclose(np.asarray(xref_end[-1, :3]), np.asarray(path[-1]))


# ---------------------------------------------------------------------------
# GoalInDangerZoneEnv
# ---------------------------------------------------------------------------

def test_danger_zone_env_episode():
    np.random.seed(0)
    env = GoalInDangerZoneEnv(render_mode=None)
    obs, info = env.reset(seed=0)
    assert obs.shape == (7,)
    assert info["cost"] == 0.0
    # goal inside, start outside
    assert env._danger_zone.is_inside(env._goal)
    assert not env._danger_zone.is_inside(env._pos)
    # obs self-consistency: pos + vec_to_goal == goal (obs is float32)
    np.testing.assert_allclose(obs[:2] + obs[3:5], env._goal, atol=1e-5)

    obs2, reward, term, trunc, info = env.step(np.array([1.0, 0.0]))
    assert isinstance(reward, float) and "cost" in info


def test_danger_zone_gym_conformance():
    """gymnasium's official env_checker passes — including the
    step-determinism check the reference fails (its start/goal draws come
    from the global np.random stream; ours honor reset(seed=...))."""
    checker = pytest.importorskip("gymnasium.utils.env_checker")
    env = GoalInDangerZoneEnv(render_mode=None)
    checker.check_env(env, skip_render_check=True)
    # reset(seed=N) is reproducible
    obs_a, _ = env.reset(seed=123)
    obs_b, _ = env.reset(seed=123)
    np.testing.assert_array_equal(obs_a, obs_b)


def test_danger_zone_parallel_model_consistency():
    """Batched dynamics agree with the scalar env step."""
    np.random.seed(1)
    env = GoalInDangerZoneEnv(render_mode=None)
    obs, _ = env.reset(seed=1)
    action = np.array([0.7, -0.4], np.float32)
    obs_batched = env.parallel_step(
        jnp.asarray(obs, jnp.float32)[None], jnp.asarray(action)[None]
    )[0]
    obs_scalar, _, _, _, _ = env.step(action)
    np.testing.assert_allclose(np.asarray(obs_batched), obs_scalar, atol=1e-5)


def test_danger_zone_solver_avoids_zone_entry_cost():
    np.random.seed(2)
    env = GoalInDangerZoneEnv(render_mode=None)
    obs, _ = env.reset(seed=2)
    config = MPPIConfig(
        horizon=15,
        num_samples=256,
        dim_state=7,
        dim_control=2,
        u_min=dz_model.U_MIN,
        u_max=dz_model.U_MAX,
        sigmas=(0.5, 0.5),
        lambda_=1.0,
    )
    solver = make_solver(config, env.parallel_step, env.parallel_cost)
    solver_state = solver.init()
    result = solver.solve(solver_state, jnp.asarray(obs, jnp.float32))
    assert np.all(np.isfinite(np.asarray(result.action_seq)))


def test_calc_ref_trajectory_lookahead_matches_reference_accumulation():
    """Lookahead rows must follow the reference's float64 accumulation
    (racing.py:204-208); a closed-form f32 version rounds ~1 in 5 rows
    differently at horizon 50."""
    import jax.numpy as jnp
    import numpy as np

    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import calc_ref_trajectory

    env = RacingEnv()
    path = np.asarray(env.racing_center_path)
    horizon = 50
    state = env.reset()

    xref, ind = calc_ref_trajectory(
        state, env.racing_center_path, jnp.asarray(0, jnp.int32), horizon
    )
    ind = int(ind)

    # reference accumulation loop (racing.py:200-217)
    travel = 3.0
    expected = np.zeros((horizon + 1, 4), np.float32)
    overrun = False
    for i in range(horizon + 1):
        travel += 0.85
        dind = int(round(travel / 0.1))
        if ind + dind < len(path):
            expected[i, :3] = path[ind + dind]
            expected[i, 3] = 8.0
        else:
            expected[i, :3] = path[-1]
            overrun = True
    if overrun:
        expected[:, 3] = 0.0

    np.testing.assert_allclose(np.asarray(xref), expected, atol=1e-6)


def test_racing_run_episode_matches_per_tick_updates(racing_env):
    """RacingController.run_episode == N update() calls + plant steps.

    The single-dispatch episode mode must evolve the same warm start,
    path index and trajectory as the host-driven loop (same solver, same
    key stream), up to f32 fusion-order differences.
    """
    import jax.numpy as jnp

    from mppi_playground_tpu.envs.racing_controller import RacingController

    env = racing_env
    kw = dict(horizon=6, num_samples=64, solver_backend="xla",
              store_rollouts=False)
    a = RacingController(env, **kw)
    b = RacingController(env, **kw)

    x0 = env.reset()
    xs_ep, us_ep = a.run_episode(x0, 3)

    x = x0
    for t in range(3):
        act, _ = b.update(x)
        np.testing.assert_allclose(
            np.asarray(xs_ep[t]), np.asarray(x), atol=1e-5,
            err_msg=f"visited state diverged at tick {t}",
        )
        np.testing.assert_allclose(
            np.asarray(us_ep[t]), np.asarray(act[0]), atol=1e-5,
            err_msg=f"applied action diverged at tick {t}",
        )
        x = env.dynamics(x[None], act[None, 0])[0]

    # xs[-1] is the true final post-step state
    np.testing.assert_allclose(np.asarray(xs_ep[-1]), np.asarray(x), atol=1e-5)
    assert int(a.current_path_index) == int(b.current_path_index)
    np.testing.assert_allclose(
        np.asarray(a.solver_state.previous_action_seq),
        np.asarray(b.solver_state.previous_action_seq),
        atol=1e-5,
    )


def test_racing_run_episode_invalidates_diagnostics(racing_env):
    """get_top_samples after run_episode must raise, not replay the
    pre-episode solve's trajectories."""
    import pytest as _pytest

    from mppi_playground_tpu.envs.racing_controller import RacingController

    ctrl = RacingController(racing_env, horizon=6, num_samples=64,
                            solver_backend="xla", store_rollouts=True)
    x0 = racing_env.reset()
    ctrl.update(x0)
    ctrl.get_top_samples(5)  # works after a per-tick update
    ctrl.run_episode(x0, 2)
    assert ctrl.reference_path is None
    with _pytest.raises(RuntimeError, match="prior update"):
        ctrl.get_top_samples(5)


def test_racing_run_episode_done_fn(racing_env):
    """done_fn on the racing episode runner: the reference loop's goal
    break (racing.py:233,262-264) — episode freezes once fired and the
    runner reports done + executed ticks."""
    import jax.numpy as jnp

    from mppi_playground_tpu.envs.racing_controller import RacingController

    ctrl = RacingController(racing_env, horizon=6, num_samples=64,
                            solver_backend="xla", store_rollouts=False)
    x0 = racing_env.reset()

    # trivially-true predicate: fires on the very first post-step state
    done_fn = lambda x: jnp.asarray(True)  # noqa: E731
    xs, us, ep = ctrl.run_episode(x0, 4, done_fn=done_fn)
    assert bool(ep["done"]) and int(ep["ticks"]) == 1
    np.testing.assert_array_equal(np.asarray(us[1:]), 0.0)
    # frozen after done: every later row (incl. the final state) is the
    # post-step state the predicate fired on
    for row in np.asarray(xs[2:]):
        np.testing.assert_array_equal(row, np.asarray(xs[1]))

    # never-true predicate: runs the full budget, no third differences
    ctrl2 = RacingController(racing_env, horizon=6, num_samples=64,
                             solver_backend="xla", store_rollouts=False)
    never = lambda x: jnp.asarray(False)  # noqa: E731
    xs2, us2, ep2 = ctrl2.run_episode(x0, 3, done_fn=never)
    assert not bool(ep2["done"]) and int(ep2["ticks"]) == 3
    ctrl3 = RacingController(racing_env, horizon=6, num_samples=64,
                             solver_backend="xla", store_rollouts=False)
    xs3, us3 = ctrl3.run_episode(x0, 3)
    np.testing.assert_allclose(np.asarray(us2), np.asarray(us3), atol=1e-6)


def test_racing_controller_rebuilds_on_map_mutation():
    """Mutating the env's obstacle map must reach the compiled tick.

    The reference controller reads the live map object every tick
    (racing.py:146-152); our tick bakes the map tables in as jit
    constants, so the controller watches ``obstacle_map.version`` and
    rebuilds.  Same solver state + same injected noise, only the map
    changed: the costs must reflect the new obstacle."""
    from mppi_playground_tpu.envs.racing_controller import RacingController

    env = RacingEnv()  # fresh env: this test mutates its map
    ctrl = RacingController(
        env, horizon=6, num_samples=128, solver_backend="xla",
        store_rollouts=False,
    )
    x0 = env.reset()
    st0 = ctrl.solver_state
    noise = (
        jnp.asarray(
            np.random.default_rng(3).normal(size=(128, 6, 2)), jnp.float32
        ) * jnp.asarray([0.5, 0.1])
    )
    ctrl.update(x0, noise=noise)
    c1 = np.asarray(ctrl._last_aux.costs)
    solver_before = ctrl._solver

    v0 = env.obstacle_map.version
    env.obstacle_map.add_circle_obstacle(np.asarray(x0[:2], float), 1.0)
    assert env.obstacle_map.version == v0 + 1

    # identical solver state / noise / start: only the map differs
    ctrl.solver_state = st0
    ctrl.current_path_index = jnp.asarray(0, jnp.int32)
    ctrl.update(x0, noise=noise)
    c2 = np.asarray(ctrl._last_aux.costs)

    assert ctrl._solver is not solver_before  # rebuilt, not stale
    # every rollout starts inside the new obstacle -> Qo penalty on all
    assert (c2 > c1 + 1e3).all()


def test_danger_zone_close_defaults_gif_path(monkeypatch, tmp_path):
    """close() without a path must save accumulated frames to the default
    location like the other envs, not silently drop them."""
    import mppi_playground_tpu.envs.rendering as rendering

    saved = {}

    def fake_save_gif(frames, path, **kw):
        saved["path"] = path
        saved["n"] = len(frames)

    monkeypatch.setattr(rendering, "save_gif", fake_save_gif)
    env = GoalInDangerZoneEnv(render_mode="rgb_array", seed=7)
    env.reset(seed=7)
    env.render()
    env.close()
    assert saved["n"] == 1
    assert saved["path"].endswith(".gif")
