"""Mesh-sharded solve == single-device solve (8 virtual CPU devices).

SURVEY.md §7 hard part #6: the sharded solve must be invariant to mesh
shape.  JAX's partitionable threefry RNG produces identical noise for any
sharding, so results agree up to float32 reduction-order differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_playground_tpu import MPPIConfig, make_solver
from mppi_playground_tpu.models import integrator, pendulum
from mppi_playground_tpu.parallel import (
    make_batched_solver,
    make_mesh,
    make_sharded_solver,
)


def _config(**overrides):
    base = dict(
        horizon=10,
        num_samples=512,
        dim_state=2,
        dim_control=1,
        u_min=pendulum.U_MIN,
        u_max=pendulum.U_MAX,
        sigmas=(1.0,),
        lambda_=1.0,
    )
    base.update(overrides)
    return MPPIConfig(**base)


def test_eight_devices_available():
    assert jax.device_count() >= 8


@pytest.mark.parametrize("lambda_", [1.0, "ESSPS"])
def test_sharded_matches_single_device(lambda_):
    config = _config(lambda_=lambda_)
    single = make_solver(config, pendulum.dynamics, pendulum.cost, donate_state=False)
    mesh = make_mesh(mesh_shape=(1, 8))
    sharded = make_sharded_solver(config, pendulum.dynamics, pendulum.cost, mesh)

    x0 = jnp.asarray([np.pi, 0.0])
    state_a = single.init(seed=3)
    state_b = sharded.init(seed=3)
    for _ in range(3):
        ra = single.solve(state_a, x0)
        rb = sharded.solve(state_b, x0)
        np.testing.assert_allclose(
            np.asarray(ra.action_seq), np.asarray(rb.action_seq), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ra.aux.costs), np.asarray(rb.aux.costs), rtol=1e-5
        )
        state_a, state_b = ra.state, rb.state


def test_mesh_shape_invariance():
    """2-way and 8-way sample sharding give the same answer."""
    config = _config()
    x0 = jnp.asarray([np.pi, 0.0])
    results = []
    for n in (2, 8):
        mesh = make_mesh(mesh_shape=(1, n), devices=jax.devices()[:n])
        solver = make_sharded_solver(config, pendulum.dynamics, pendulum.cost, mesh)
        r = solver.solve(solver.init(seed=5), x0)
        results.append(np.asarray(r.action_seq))
    np.testing.assert_allclose(results[0], results[1], atol=1e-5)


def test_batched_scenarios_shard_and_match():
    config = _config(
        num_samples=256,
        dim_state=2,
        dim_control=2,
        u_min=integrator.U_MIN,
        u_max=integrator.U_MAX,
        sigmas=(0.5, 0.5),
    )
    mesh = make_mesh(mesh_shape=(4, 2))
    batched = make_batched_solver(
        config, integrator.dynamics, integrator.cost, mesh, batch_size=4
    )
    states = batched.init_batch(seed=11)
    x0s = jnp.asarray([[0.0, 0.0], [1.0, -1.0], [-2.0, 0.5], [3.0, 3.0]])
    result = batched.solve_batch(states, x0s)
    assert result.action_seq.shape == (4, 10, 2)
    assert result.state_seq.shape == (4, 11, 2)
    assert np.all(np.isfinite(np.asarray(result.action_seq)))

    # each scenario equals an independent single-device solve with the
    # same per-scenario key
    single = make_solver(config, integrator.dynamics, integrator.cost, donate_state=False)
    key = jax.random.PRNGKey(11)
    keys = jax.random.split(key, 4)
    for b in range(4):
        state_b = single.init(key=keys[b])
        rb = single.solve(state_b, x0s[b])
        np.testing.assert_allclose(
            np.asarray(result.action_seq[b]), np.asarray(rb.action_seq), atol=1e-5
        )


def test_sharded_solve_closed_loop_stays_finite():
    config = _config(lambda_="ESSPS", num_samples=512)
    mesh = make_mesh(mesh_shape=(1, 8))
    solver = make_sharded_solver(config, pendulum.dynamics, pendulum.cost, mesh)
    state = solver.init()
    x = jnp.asarray([np.pi, 0.0])
    for _ in range(5):
        r = solver.solve(state, x)
        state = r.state
        x = pendulum.dynamics(x[None], r.action_seq[None, 0])[0]
        assert np.all(np.isfinite(np.asarray(x)))


def test_fleet_closed_loop_matches_independent_episodes():
    """make_fleet_closed_loop == B independent make_closed_loop runs.

    The simulation-farm mode (B episodes x num_ticks in one program) must
    reproduce each episode exactly: same per-scenario key -> same noise
    stream -> same trajectory.
    """
    from mppi_playground_tpu.core.closed_loop import (
        make_closed_loop,
        make_fleet_closed_loop,
    )

    config = _config(num_samples=256)
    mesh = make_mesh(mesh_shape=(4, 2))
    batched = make_batched_solver(
        config, pendulum.dynamics, pendulum.cost, mesh, batch_size=4,
        jit=False, donate_state=False,
    )

    def plant_batch(xs, us):
        return pendulum.dynamics(xs, us)

    ticks = 4
    fleet = make_fleet_closed_loop(batched, plant_batch, ticks)
    x0s = jnp.asarray(
        [[np.pi, 0.0], [2.0, 0.5], [-1.0, 0.0], [0.3, -0.2]], jnp.float32
    )
    states = batched.init_batch(seed=11)
    _, xf, xs, us, _ = fleet(states, x0s)
    assert xs.shape == (ticks, 4, 2) and us.shape == (ticks, 4, 1)

    single = make_solver(
        config, pendulum.dynamics, pendulum.cost, jit=False, donate_state=False
    )
    loop = make_closed_loop(
        single, lambda x, u: pendulum.dynamics(x[None], u[None])[0], ticks
    )
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    for b in range(4):
        _, xf_b, xs_b, us_b, _ = loop(single.init(key=keys[b]), x0s[b])
        np.testing.assert_allclose(np.asarray(xs[:, b]), np.asarray(xs_b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(us[:, b]), np.asarray(us_b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(xf[b]), np.asarray(xf_b), atol=1e-5)


def test_batched_info_per_scenario_cost_context():
    """batched_info entries reach each scenario's cost with its own row."""
    config = _config(
        num_samples=256,
        dim_state=2,
        dim_control=2,
        u_min=integrator.U_MIN,
        u_max=integrator.U_MAX,
        sigmas=(0.5, 0.5),
    )
    mesh = make_mesh(mesh_shape=(4, 2))

    def cost_with_goal(state, action, info):
        goal = info["goal"]
        return jnp.sum((state - goal) ** 2, axis=1)

    batched = make_batched_solver(
        config, integrator.dynamics, cost_with_goal, mesh, batch_size=4,
        donate_state=False,
    )
    goals = jnp.asarray([[5.0, 5.0], [-5.0, -5.0], [5.0, -5.0], [-5.0, 5.0]])
    states = batched.init_batch(seed=3)
    x0s = jnp.zeros((4, 2))
    result = batched.solve_batch(states, x0s, batched_info={"goal": goals})
    # each scenario's mean control must point toward ITS goal
    first_moves = np.asarray(result.action_seq[:, 0])
    for b in range(4):
        direction = np.asarray(goals[b]) / np.linalg.norm(np.asarray(goals[b]))
        assert float(first_moves[b] @ direction) > 0.1, (b, first_moves[b])


def test_fleet_done_fn_freezes_episodes_independently():
    """Per-episode done masking in the fleet runner: a terminated episode
    freezes (state, actions, tick count) while the rest of the fleet
    keeps running to the tick budget."""
    from mppi_playground_tpu.core.closed_loop import make_fleet_closed_loop

    def dynamics(state, action):
        new_v = 0.9 * state[:, 1] + 0.1 * jnp.clip(action[:, 0], -1.0, 1.0)
        return jnp.stack([state[:, 0] + 0.1 * new_v, new_v], axis=1)

    def cost(state, action, info):
        return (state[:, 0] - 2.0) ** 2 + 0.1 * state[:, 1] ** 2

    config = _config(
        num_samples=256, u_min=(-1.0,), u_max=(1.0,), sigmas=(0.7,)
    )
    mesh = make_mesh(mesh_shape=(2, 4))
    batched = make_batched_solver(
        config, dynamics, cost, mesh, batch_size=2,
        jit=False, donate_state=False,
    )

    ticks = 8
    # episode 0 starts at pos 0.9 with velocity 1.0: it crosses 1.1 by
    # tick 4 under ANY admissible actions; episode 1 starts at -5.0 and
    # cannot reach 1.1 within 8 ticks (|dpos| <= ~0.1/tick)
    done_fn = lambda xs: xs[:, 0] > 1.1  # noqa: E731
    x0s = jnp.asarray([[0.9, 1.0], [-5.0, 0.0]], jnp.float32)

    base = make_fleet_closed_loop(batched, dynamics, ticks)
    _, _, xs_b, us_b, _ = base(batched.init_batch(seed=5), x0s)

    fleet = make_fleet_closed_loop(batched, dynamics, ticks, done_fn=done_fn)
    _, xf, xs, us, _, ep = fleet(batched.init_batch(seed=5), x0s)

    done, nt = np.asarray(ep["done"]), np.asarray(ep["ticks"])
    assert bool(done[0]) and not bool(done[1])
    t0 = int(nt[0])
    assert 1 <= t0 < ticks and int(nt[1]) == ticks

    # episode 0: identical executed prefix, then frozen state + zero actions
    np.testing.assert_allclose(
        np.asarray(us[:t0, 0]), np.asarray(us_b[:t0, 0]), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(us[t0:, 0]), 0.0)
    for t in range(t0, ticks):
        np.testing.assert_array_equal(np.asarray(xs[t, 0]), np.asarray(xf[0]))

    # episode 1 is untouched by episode 0's termination
    np.testing.assert_allclose(np.asarray(xs[:, 1]), np.asarray(xs_b[:, 1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(us[:, 1]), np.asarray(us_b[:, 1]), atol=1e-5)


def test_fleet_done_fn_carry_freeze_is_per_leading_axis():
    """Freeze semantics of the ``info_fn`` carry under ``done_fn``:
    leaves with the episode axis ([B, ...]) freeze per-episode, leaves
    without it (shared, leading dim != B) keep updating for the whole
    fleet (core/closed_loop.py ``_freeze``)."""
    from mppi_playground_tpu.core.closed_loop import make_fleet_closed_loop

    B, ticks = 2, 6

    def dynamics(state, action):
        new_v = 0.9 * state[:, 1] + 0.1 * jnp.clip(action[:, 0], -1.0, 1.0)
        return jnp.stack([state[:, 0] + 0.1 * new_v, new_v], axis=1)

    def cost(state, action, info):
        return (state[:, 0] - 2.0) ** 2 + 0.1 * state[:, 1] ** 2

    config = _config(num_samples=256, u_min=(-1.0,), u_max=(1.0,), sigmas=(0.7,))
    mesh = make_mesh(mesh_shape=(2, 4))
    batched = make_batched_solver(
        config, dynamics, cost, mesh, batch_size=B, jit=False,
        donate_state=False,
    )

    def info_fn(carry, xs):
        # per_ep: [B] tick counters (episode axis) — must freeze;
        # shared: [3] global counter leaf (no episode axis) — must not
        return {}, {
            "per_ep": carry["per_ep"] + 1.0,
            "shared": carry["shared"] + 1.0,
        }

    carry0 = {"per_ep": jnp.zeros(B), "shared": jnp.zeros(3)}
    done_fn = lambda xs: xs[:, 0] > 1.1  # noqa: E731
    x0s = jnp.asarray([[0.9, 1.0], [-5.0, 0.0]], jnp.float32)

    fleet = make_fleet_closed_loop(
        batched, dynamics, ticks, info_fn=info_fn, done_fn=done_fn
    )
    _, _, _, _, carry, ep = fleet(batched.init_batch(seed=5), x0s, carry0)

    t0 = int(np.asarray(ep["ticks"])[0])
    assert bool(np.asarray(ep["done"])[0]) and t0 < ticks
    # per-episode leaf froze at the terminated episode's tick count but
    # kept counting for the running episode
    np.testing.assert_allclose(
        np.asarray(carry["per_ep"]), [float(t0), float(ticks)]
    )
    # shared leaf (leading dim 3 != B) advanced every tick regardless
    np.testing.assert_allclose(np.asarray(carry["shared"]), float(ticks))


def test_fleet_carry_freeze_spec_overrides_shape_heuristic():
    """``carry_freeze`` resolves the B-shaped-but-shared ambiguity: a
    shared leaf whose leading dim coincidentally equals B passes through
    when marked False, and a malformed spec raises."""
    import pytest

    from mppi_playground_tpu.core.closed_loop import make_fleet_closed_loop

    B, ticks = 2, 6

    def dynamics(state, action):
        new_v = 0.9 * state[:, 1] + 0.1 * jnp.clip(action[:, 0], -1.0, 1.0)
        return jnp.stack([state[:, 0] + 0.1 * new_v, new_v], axis=1)

    def cost(state, action, info):
        return (state[:, 0] - 2.0) ** 2 + 0.1 * state[:, 1] ** 2

    config = _config(num_samples=256, u_min=(-1.0,), u_max=(1.0,), sigmas=(0.7,))
    mesh = make_mesh(mesh_shape=(2, 4))
    batched = make_batched_solver(
        config, dynamics, cost, mesh, batch_size=B, jit=False,
        donate_state=False,
    )

    def info_fn(carry, xs):
        # both leaves have leading dim B; only per_ep is per-episode
        return {}, {
            "per_ep": carry["per_ep"] + 1.0,
            "shared_b": carry["shared_b"] + 1.0,
        }

    carry0 = {"per_ep": jnp.zeros(B), "shared_b": jnp.zeros(B)}
    done_fn = lambda xs: xs[:, 0] > 1.1  # noqa: E731
    x0s = jnp.asarray([[0.9, 1.0], [-5.0, 0.0]], jnp.float32)

    fleet = make_fleet_closed_loop(
        batched, dynamics, ticks, info_fn=info_fn, done_fn=done_fn,
        carry_freeze={"per_ep": True, "shared_b": False},
    )
    _, _, _, _, carry, ep = fleet(batched.init_batch(seed=5), x0s, carry0)

    t0 = int(np.asarray(ep["ticks"])[0])
    assert bool(np.asarray(ep["done"])[0]) and t0 < ticks
    np.testing.assert_allclose(
        np.asarray(carry["per_ep"]), [float(t0), float(ticks)]
    )
    # the heuristic would have frozen row 0 at t0; the spec keeps the
    # shared leaf advancing every tick for both rows
    np.testing.assert_allclose(np.asarray(carry["shared_b"]), float(ticks))

    # a spec marking a non-[B] leaf per-episode fails loudly, not silently
    bad = make_fleet_closed_loop(
        batched, dynamics, ticks,
        info_fn=lambda c, xs: ({}, {"w": c["w"] + 1.0}),
        done_fn=done_fn, carry_freeze={"w": True},
    )
    with pytest.raises(ValueError, match="carry_freeze"):
        bad(batched.init_batch(seed=5), x0s, {"w": jnp.zeros(3)})

    # a prefix spec (bool root for a dict carry) is a structure mismatch:
    # clear ValueError at trace time, not an AttributeError inside tree.map
    prefix = make_fleet_closed_loop(
        batched, dynamics, ticks, info_fn=info_fn, done_fn=done_fn,
        carry_freeze=True,
    )
    with pytest.raises(ValueError, match="carry_freeze"):
        prefix(batched.init_batch(seed=5), x0s, carry0)

    # a spec without the pieces it describes is a mis-wiring, not a no-op
    with pytest.raises(ValueError, match="done_fn"):
        make_fleet_closed_loop(
            batched, dynamics, ticks, info_fn=info_fn,
            carry_freeze={"per_ep": True, "shared_b": False},
        )
    with pytest.raises(ValueError, match="info_fn"):
        make_fleet_closed_loop(
            batched, dynamics, ticks, done_fn=done_fn, carry_freeze=True,
        )

    # the new trailing params are keyword-only: positional binding that
    # used to reach ``jit`` cannot silently land on ``carry_freeze``
    with pytest.raises(TypeError):
        make_fleet_closed_loop(
            batched, dynamics, ticks, info_fn, done_fn, False
        )
