"""Core solver behavior tests (integrator + pendulum tasks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_playground_tpu import MPPI, MPPIConfig, make_solver
from mppi_playground_tpu.models import integrator, pendulum
from mppi_playground_tpu.utils.angles import angle_normalize


def _integrator_config(**overrides):
    base = dict(
        horizon=10,
        num_samples=256,
        dim_state=2,
        dim_control=2,
        u_min=integrator.U_MIN,
        u_max=integrator.U_MAX,
        sigmas=(0.5, 0.5),
        lambda_=1.0,
    )
    base.update(overrides)
    return MPPIConfig(**base)


def test_solve_shapes_and_dtypes():
    config = _integrator_config()
    solver = make_solver(config, integrator.dynamics, integrator.cost)
    state = solver.init()
    result = solver.solve(state, jnp.zeros(2))
    assert result.action_seq.shape == (10, 2)
    assert result.state_seq.shape == (11, 2)
    assert result.aux.costs.shape == (256,)
    assert result.aux.weights.shape == (256,)
    assert result.aux.state_seq_batch.shape == (256, 11, 2)
    assert result.action_seq.dtype == jnp.float32
    np.testing.assert_allclose(float(jnp.sum(result.aux.weights)), 1.0, rtol=1e-5)


def test_solve_deterministic_given_state():
    config = _integrator_config()
    solver = make_solver(config, integrator.dynamics, integrator.cost, donate_state=False)
    state = solver.init(seed=0)
    r1 = solver.solve(state, jnp.zeros(2))
    r2 = solver.solve(state, jnp.zeros(2))
    np.testing.assert_array_equal(np.asarray(r1.action_seq), np.asarray(r2.action_seq))
    # consecutive solves advance the key -> different noise
    r3 = solver.solve(r1.state, jnp.zeros(2))
    assert not np.allclose(np.asarray(r1.action_seq), np.asarray(r3.action_seq))


def test_noise_injection_seam():
    """Externally supplied noise makes the solve fully deterministic."""
    config = _integrator_config()
    solver = make_solver(config, integrator.dynamics, integrator.cost, donate_state=False)
    noise = np.random.default_rng(0).normal(size=(256, 10, 2)).astype(np.float32) * 0.5
    s_a = solver.init(seed=1)
    s_b = solver.init(seed=2)
    r_a = solver.solve(s_a, jnp.zeros(2), noise=jnp.asarray(noise))
    r_b = solver.solve(s_b, jnp.zeros(2), noise=jnp.asarray(noise))
    np.testing.assert_array_equal(np.asarray(r_a.action_seq), np.asarray(r_b.action_seq))


def test_integrator_reaches_goal():
    # MPPI keeps exploring at the equilibrium (the sampled average follows
    # the injected noise once every rollout costs the same), so the robust
    # closed-loop property is *first passage* into a goal ball.
    config = _integrator_config()
    solver = make_solver(config, integrator.dynamics, integrator.cost)
    state = solver.init()
    x = jnp.zeros(2)
    best = np.inf
    for _ in range(30):
        result = solver.solve(state, x)
        state = result.state
        x = integrator.dynamics(x[None], result.action_seq[None, 0])[0]
        best = min(best, float(jnp.linalg.norm(x - jnp.asarray([1.0, 1.0]))))
    assert best < 0.2, f"never reached goal ball, best distance {best}"


def test_actions_respect_bounds():
    config = _integrator_config(sigmas=(5.0, 5.0))
    solver = make_solver(config, integrator.dynamics, integrator.cost)
    result = solver.solve(solver.init(), jnp.zeros(2))
    assert float(jnp.max(result.action_seq)) <= 1.0 + 1e-6
    assert float(jnp.min(result.action_seq)) >= -1.0 - 1e-6


def test_exploration_split():
    """With exploration=1.0 every sample is pure noise (mppi.py:266-270)."""
    config = _integrator_config(exploration=1.0)
    solver = make_solver(config, integrator.dynamics, integrator.cost, donate_state=False)
    state = solver.init()
    # Warm start with a huge previous plan; pure-noise sampling must ignore it.
    state = state.__class__(
        key=state.key,
        previous_action_seq=jnp.full((10, 2), 100.0),
        sg_history=state.sg_history,
        lam=state.lam,
        mpo_log_temperature=state.mpo_log_temperature,
        mpo_opt_state=state.mpo_opt_state,
    )
    result = solver.solve(state, jnp.zeros(2))
    # noise ~ N(0, 0.5), clipped to [-1, 1]: the weighted average cannot be
    # anywhere near the (clipped) warm start of 1.0 in every coordinate.
    assert float(jnp.max(jnp.abs(result.action_seq))) < 1.0


def test_pendulum_swingup_closed_loop():
    config = MPPIConfig(
        horizon=15,
        num_samples=1000,
        dim_state=2,
        dim_control=1,
        u_min=pendulum.U_MIN,
        u_max=pendulum.U_MAX,
        sigmas=(1.0,),
        lambda_="ESSPS",
    )
    solver = make_solver(config, pendulum.dynamics, pendulum.cost)
    state = solver.init()
    x = jnp.asarray([jnp.pi, 0.0])  # hanging down
    for _ in range(120):
        result = solver.solve(state, x)
        state = result.state
        x = pendulum.dynamics(x[None], result.action_seq[None, 0])[0]
    theta = float(angle_normalize(x[0]))
    assert abs(theta) < 0.3, f"pendulum did not swing up, theta={theta}"


def test_controller_class_api():
    controller = MPPI(
        horizon=10,
        num_samples=256,
        dim_state=2,
        dim_control=2,
        dynamics=integrator.dynamics,
        cost_func=integrator.cost,
        u_min=jnp.asarray(integrator.U_MIN),
        u_max=jnp.asarray(integrator.U_MAX),
        sigmas=jnp.asarray([0.5, 0.5]),
        lambda_=1.0,
    )
    action_seq, state_seq = controller(jnp.zeros(2))
    assert action_seq.shape == (10, 2)
    assert state_seq.shape == (11, 2)

    top, weights = controller.get_top_samples(32)
    assert top.shape == (32, 11, 2)
    assert bool(jnp.all(weights[:-1] >= weights[1:]))  # sorted descending

    samples, states = controller.get_samples_from_posterior(
        action_seq, jnp.zeros(2), 16
    )
    assert samples.shape == (16, 10, 2)
    assert states.shape == (16, 11, 2)

    controller.reset()
    np.testing.assert_array_equal(
        np.asarray(controller.solver_state.previous_action_seq), np.zeros((10, 2))
    )


def test_store_rollouts_false():
    config = _integrator_config(store_rollouts=False)
    solver = make_solver(config, integrator.dynamics, integrator.cost)
    result = solver.solve(solver.init(), jnp.zeros(2))
    assert result.aux.state_seq_batch is None
    assert result.action_seq.shape == (10, 2)


def test_invalid_lambda_rejected():
    with pytest.raises(ValueError):
        _integrator_config(lambda_="NOPE")


def test_degenerate_sizes_rejected():
    # the reference crashes obscurely on horizon=0 and solves K=0 silently
    with pytest.raises(ValueError, match="horizon"):
        _integrator_config(horizon=0)
    with pytest.raises(ValueError, match="num_samples"):
        _integrator_config(num_samples=0)


def test_bad_state_shape_rejected():
    """User-facing validation must raise ValueError (not a bare assert
    that python -O strips) when solve() gets a batched/wrong-shape state."""
    from mppi_playground_tpu.core.controller import MPPI

    solver = MPPI(
        horizon=10,
        num_samples=64,
        dim_state=2,
        dim_control=2,
        dynamics=integrator.dynamics,
        cost_func=integrator.cost,
        u_min=(-1.0, -1.0),
        u_max=(1.0, 1.0),
        sigmas=(0.5, 0.5),
        lambda_=1.0,
    )
    with pytest.raises(ValueError, match="dim_state"):
        solver.forward(jnp.zeros((1, 2)))  # batched state, not (dim_state,)
    with pytest.raises(ValueError, match="posterior samples"):
        solver.get_samples_from_posterior(
            jnp.zeros((10, 2)), jnp.zeros(2), num_samples=10**9
        )


def test_sg_filter_config_validation():
    with pytest.raises(ValueError):
        _integrator_config(use_sg_filter=True, sg_window_size=4)


def test_controller_reset_preserves_adapted_lambda():
    """reset() clears only the warm start (mppi.py:212-221); the adapted
    temperature and MPO optimizer state persist across episodes."""
    import jax.numpy as jnp
    import numpy as np

    from mppi_playground_tpu import MPPI
    from mppi_playground_tpu.models import pendulum

    c = MPPI(
        horizon=6, num_samples=128, dim_state=2, dim_control=1,
        dynamics=pendulum.dynamics, cost_func=pendulum.cost,
        u_min=jnp.asarray([-2.0]), u_max=jnp.asarray([2.0]),
        sigmas=jnp.asarray([1.0]), lambda_="MPO",
    )
    for _ in range(3):
        c.forward(jnp.asarray([np.pi, 0.0]))
    lam_before = c.lambda_
    log_t_before = float(c.solver_state.mpo_log_temperature)
    assert lam_before != 1.0  # temperature actually adapted

    c.reset()
    assert float(c.solver_state.lam) == lam_before
    assert float(c.solver_state.mpo_log_temperature) == log_t_before
    assert float(jnp.abs(c.solver_state.previous_action_seq).sum()) == 0.0


def test_controller_reset_clears_diagnostics():
    """get_top_samples after reset() must raise, not replay the previous
    episode's trajectories (stale _last_aux / _last_noise)."""
    import jax.numpy as jnp
    import numpy as np

    from mppi_playground_tpu import MPPI
    from mppi_playground_tpu.models import pendulum

    c = MPPI(
        horizon=6, num_samples=128, dim_state=2, dim_control=1,
        dynamics=pendulum.dynamics, cost_func=pendulum.cost,
        u_min=jnp.asarray([-2.0]), u_max=jnp.asarray([2.0]),
        sigmas=jnp.asarray([1.0]), lambda_=1.0,
    )
    c.forward(jnp.asarray([np.pi, 0.0]))
    c.get_top_samples(5)  # works after a solve
    c.reset()
    with pytest.raises(RuntimeError, match="prior forward"):
        c.get_top_samples(5)


def test_mppi_run_episode_matches_forward_loop():
    """MPPI.run_episode == the host-driven forward/plant loop."""
    import jax.numpy as jnp
    import numpy as np

    from mppi_playground_tpu import MPPI
    from mppi_playground_tpu.models import pendulum

    kw = dict(
        horizon=6, num_samples=128, dim_state=2, dim_control=1,
        dynamics=pendulum.dynamics, cost_func=pendulum.cost,
        u_min=jnp.asarray([-2.0]), u_max=jnp.asarray([2.0]),
        sigmas=jnp.asarray([1.0]), lambda_=1.0, store_rollouts=False,
    )
    a, b = MPPI(**kw), MPPI(**kw)

    def plant(x, u):
        return pendulum.dynamics(x[None], u[None])[0]

    x0 = jnp.asarray([np.pi, 0.0], jnp.float32)
    xs, us = a.run_episode(plant, x0, 4)

    x = x0
    for t in range(4):
        act, _ = b.forward(x)
        np.testing.assert_allclose(np.asarray(xs[t]), np.asarray(x), atol=1e-5)
        np.testing.assert_allclose(np.asarray(us[t]), np.asarray(act[0]), atol=1e-5)
        x = plant(x, act[0])

    # xs[-1] is the true final post-step state
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(a.solver_state.previous_action_seq),
        np.asarray(b.solver_state.previous_action_seq),
        atol=1e-5,
    )
    # diagnostics are per-solve; the scanned episode leaves none behind
    with pytest.raises(RuntimeError, match="prior forward"):
        a.get_top_samples(5)


def test_mppi_run_episode_threads_info_fn_carry():
    """info_fn's carry is seeded from the carry argument and returned."""
    import jax.numpy as jnp
    import numpy as np

    from mppi_playground_tpu import MPPI
    from mppi_playground_tpu.models import pendulum

    c = MPPI(
        horizon=6, num_samples=128, dim_state=2, dim_control=1,
        dynamics=pendulum.dynamics, cost_func=pendulum.cost,
        u_min=jnp.asarray([-2.0]), u_max=jnp.asarray([2.0]),
        sigmas=jnp.asarray([1.0]), lambda_=1.0, store_rollouts=False,
    )

    def info_fn(tick_count, x):
        return {}, tick_count + 1

    def plant(x, u):
        return pendulum.dynamics(x[None], u[None])[0]

    xs, us, carry = c.run_episode(
        plant, jnp.asarray([np.pi, 0.0]), 4, info_fn=info_fn,
        carry=jnp.asarray(10, jnp.int32),
    )
    assert int(carry) == 14  # seeded at 10, incremented once per tick
    assert xs.shape == (5, 2)  # num_ticks visited states + the final state


def test_runner_cache_is_bounded_lru():
    """RunnerCache: hits refresh recency; eviction drops the LRU entry."""
    from mppi_playground_tpu.core.closed_loop import RunnerCache

    built = []

    def builder(k):
        def build():
            built.append(k)
            return f"runner-{k}"
        return build

    cache = RunnerCache(capacity=2)
    assert cache.get_or_build("a", builder("a")) == "runner-a"
    assert cache.get_or_build("b", builder("b")) == "runner-b"
    # hit on 'a' refreshes it, so inserting 'c' evicts 'b', not 'a'
    assert cache.get_or_build("a", builder("a")) == "runner-a"
    cache.get_or_build("c", builder("c"))
    cache.get_or_build("a", builder("a"))
    assert built == ["a", "b", "c"]  # 'a' never rebuilt
    cache.get_or_build("b", builder("b"))
    assert built == ["a", "b", "c", "b"]  # 'b' was the evicted one


def test_runner_cache_failed_build_preserves_entries():
    """A build() that raises must not evict a still-valid cached runner,
    and a degenerate capacity is rejected up front."""
    import pytest

    from mppi_playground_tpu.core.closed_loop import RunnerCache

    cache = RunnerCache(capacity=1)
    assert cache.get_or_build("good", lambda: "runner-good") == "runner-good"

    def bad_build():
        raise RuntimeError("user callable exploded")

    with pytest.raises(RuntimeError, match="exploded"):
        cache.get_or_build("bad", bad_build)
    # the valid entry survived the failed insert: no rebuild on rehit
    assert cache.get_or_build("good", lambda: "REBUILT") == "runner-good"

    with pytest.raises(ValueError, match="capacity"):
        RunnerCache(capacity=0)


def test_pipelined_runner_matches_sequential_schedule():
    """PipelinedRunner returns exactly the sequential solves' plans on the
    documented schedule: fill returns plan_t[0] for the first `depth`
    calls, steady state returns plan_{t-depth}[depth] (delay-compensated
    row).  Warm-start chaining must match a plain sequential loop."""
    from mppi_playground_tpu.core.closed_loop import PipelinedRunner

    config = _integrator_config()
    solver = make_solver(config, integrator.dynamics, integrator.cost)
    depth = 2
    xs = [jnp.asarray([0.1 * t, -0.05 * t], jnp.float32) for t in range(6)]

    # reference: sequential solves with the same state chaining
    st = solver.init()
    plans = []
    for x in xs:
        r = solver.solve(st, x)
        plans.append(np.asarray(r.action_seq))
        st = r.state

    runner = PipelinedRunner(solver, depth=depth)
    for t, x in enumerate(xs):
        a = runner.step(x)
        if t < depth:
            np.testing.assert_allclose(a, plans[t][0], atol=1e-6)
        else:
            np.testing.assert_allclose(
                a, plans[t - depth][depth], atol=1e-6
            )
    leftover = runner.flush()
    assert len(leftover) == depth
    np.testing.assert_allclose(leftover[-1], plans[-1], atol=1e-6)

    runner.reset()
    a0 = runner.step(xs[0])
    np.testing.assert_allclose(a0, plans[0][0], atol=1e-6)


def test_pipelined_runner_uncompensated_row_and_validation():
    from mppi_playground_tpu.core.closed_loop import PipelinedRunner

    config = _integrator_config()
    solver = make_solver(config, integrator.dynamics, integrator.cost)
    with pytest.raises(ValueError):
        PipelinedRunner(solver, depth=0)

    st = solver.init()
    plans = []
    x = jnp.zeros(2, jnp.float32)
    for _ in range(3):
        r = solver.solve(st, x)
        plans.append(np.asarray(r.action_seq))
        st = r.state

    runner = PipelinedRunner(solver, depth=1, compensate=False)
    runner.step(x)
    a = runner.step(x)  # steady state: previous plan, row 0
    np.testing.assert_allclose(a, plans[0][0], atol=1e-6)
