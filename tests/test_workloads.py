"""The shared flagship builder drives a closed racing loop end-to-end.

``mppi_playground_tpu.workloads.build_flagship`` is the single
construction point for the BASELINE north-star workload (bench.py, the
driver compile check, and run_all.py all call it), so a regression here
silently breaks every driver-facing artifact at once.
"""

import jax
import jax.numpy as jnp

from mppi_playground_tpu.workloads import (
    FLAGSHIP_HORIZON,
    FLAGSHIP_NUM_SAMPLES,
    build_flagship,
)


def test_flagship_constants_match_baseline():
    # BASELINE.json north star: racing at horizon 50, 100k samples
    assert FLAGSHIP_HORIZON == 50
    assert FLAGSHIP_NUM_SAMPLES == 100_000


def test_build_flagship_closed_loop():
    env, solver, tick = build_flagship(horizon=10, num_samples=128)
    tick = jax.jit(tick)

    st, cind, x = solver.init(), jnp.asarray(0, jnp.int32), env.reset()
    for _ in range(3):
        action_seq, state_seq, st, cind = tick(st, cind, x)
        x = env.dynamics(x[None], action_seq[None, 0])[0]

    assert action_seq.shape == (10, 2)
    assert state_seq.shape == (11, 4)
    assert bool(jnp.isfinite(action_seq).all())
    assert bool(jnp.isfinite(state_seq).all())
    assert bool(jnp.isfinite(x).all())
    # actions respect the env bounds (the solver clamps before rollout)
    assert bool((action_seq >= jnp.asarray(env.u_min) - 1e-6).all())
    assert bool((action_seq <= jnp.asarray(env.u_max) + 1e-6).all())


def test_build_flagship_reuses_env():
    from mppi_playground_tpu.envs.racing_env import RacingEnv

    env = RacingEnv()
    env2, _, _ = build_flagship(horizon=5, num_samples=64, env=env)
    assert env2 is env
