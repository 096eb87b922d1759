"""Checkpoint/resume round-trip of the explicit solver state."""

import jax.numpy as jnp
import numpy as np
import pytest

from mppi_playground_tpu import MPPIConfig, make_solver
from mppi_playground_tpu.models import pendulum
from mppi_playground_tpu.utils.checkpoint import load_state, save_state


def _solver(lambda_):
    config = MPPIConfig(
        horizon=8,
        num_samples=128,
        dim_state=2,
        dim_control=1,
        u_min=pendulum.U_MIN,
        u_max=pendulum.U_MAX,
        sigmas=(1.0,),
        lambda_=lambda_,
    )
    return make_solver(config, pendulum.dynamics, pendulum.cost, donate_state=False)


def test_checkpoint_roundtrip_resumes_identically(tmp_path):
    for lambda_ in (1.0, "MPO", "ESSPS"):
        solver = _solver(lambda_)
        state = solver.init(seed=0)
        x = jnp.asarray([np.pi, 0.0])
        # advance a few ticks so every state leaf is non-trivial
        for _ in range(3):
            state = solver.solve(state, x).state

        path = save_state(str(tmp_path / f"ckpt_{lambda_}"), state)
        restored = load_state(path, solver.init())

        # resumed solve == uninterrupted solve, bit for bit
        r_direct = solver.solve(state, x)
        r_restored = solver.solve(restored, x)
        np.testing.assert_array_equal(
            np.asarray(r_direct.action_seq), np.asarray(r_restored.action_seq)
        )
        np.testing.assert_array_equal(
            np.asarray(r_direct.state.lam), np.asarray(r_restored.state.lam)
        )


def test_checkpoint_leaf_mismatch_rejected(tmp_path):
    solver_a = _solver(1.0)
    solver_b = _solver("MPO")  # MPO adds optimizer leaves
    path = save_state(str(tmp_path / "ckpt"), solver_a.init())
    with pytest.raises(ValueError):
        load_state(path, solver_b.init())


def test_load_rejects_mismatched_shapes(tmp_path):
    """A checkpoint from a different config must fail loudly, not broadcast."""
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.solver import make_init
    from mppi_playground_tpu.utils.checkpoint import load_state, save_state

    def cfg(horizon):
        return MPPIConfig(
            horizon=horizon, num_samples=64, dim_state=2, dim_control=2,
            u_min=(-1.0, -1.0), u_max=(1.0, 1.0), sigmas=(1.0, 1.0),
            lambda_=1.0,
        )

    small = make_init(cfg(4))()
    big_template = make_init(cfg(8))()
    path = save_state(str(tmp_path / "st"), small)
    with pytest.raises(ValueError, match="different solver config"):
        load_state(path, big_template)


# ---------------------------------------------------------------------------
# Orbax backend
# ---------------------------------------------------------------------------

def test_orbax_roundtrip_resumes_identically(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from mppi_playground_tpu.utils.checkpoint import (
        load_state_orbax,
        save_state_orbax,
    )

    solver = _solver("ESSPS")
    state = solver.init(seed=0)
    x = jnp.asarray([np.pi, 0.0])
    for _ in range(3):
        state = solver.solve(state, x).state

    path = save_state_orbax(str(tmp_path / "orbax_ckpt"), state)
    restored = load_state_orbax(path, solver.init())

    r_direct = solver.solve(state, x)
    r_restored = solver.solve(restored, x)
    np.testing.assert_array_equal(
        np.asarray(r_direct.action_seq), np.asarray(r_restored.action_seq)
    )
    np.testing.assert_array_equal(
        np.asarray(r_direct.state.lam), np.asarray(r_restored.state.lam)
    )


def test_orbax_restores_template_sharding(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    """A mesh-sharded fleet/scenario state round-trips WITH its sharding —
    the production serving path (no host gather on restore)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mppi_playground_tpu.utils.checkpoint import (
        load_state_orbax,
        save_state_orbax,
    )

    mesh = Mesh(np.array(jax.devices()[:4]), ("scenario",))
    shard = NamedSharding(mesh, P("scenario"))

    solver = _solver(1.0)
    batched = jax.vmap(lambda _: solver.init(seed=0))(jnp.arange(4))
    batched = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, shard), batched
    )

    path = save_state_orbax(str(tmp_path / "fleet_ckpt"), batched)
    restored = load_state_orbax(path, batched)

    for direct, back in zip(
        jax.tree_util.tree_leaves(batched), jax.tree_util.tree_leaves(restored)
    ):
        assert back.sharding == direct.sharding
        np.testing.assert_array_equal(np.asarray(direct), np.asarray(back))


def test_orbax_mismatched_template_rejected(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.solver import make_init
    from mppi_playground_tpu.utils.checkpoint import (
        load_state_orbax,
        save_state_orbax,
    )

    def cfg(horizon):
        return MPPIConfig(
            horizon=horizon, num_samples=64, dim_state=2, dim_control=2,
            u_min=(-1.0, -1.0), u_max=(1.0, 1.0), sigmas=(1.0, 1.0),
            lambda_=1.0,
        )

    path = save_state_orbax(str(tmp_path / "st"), make_init(cfg(4))())
    with pytest.raises(ValueError, match="solver config"):
        load_state_orbax(path, make_init(cfg(8))())


def test_orbax_async_save_commits_after_wait(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    import jax.numpy as jnp

    from mppi_playground_tpu.utils.checkpoint import (
        load_state_orbax,
        save_state_orbax,
        wait_until_saved,
    )

    state = {"a": jnp.arange(8.0), "b": jnp.full((2, 3), 7.0)}
    path = save_state_orbax(str(tmp_path / "async_ck"), state, wait=False)
    wait_until_saved()  # join the background commit
    restored = load_state_orbax(path, {"a": jnp.zeros(8), "b": jnp.zeros((2, 3))})
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(8.0))
    np.testing.assert_array_equal(np.asarray(restored["b"]), np.full((2, 3), 7.0))
