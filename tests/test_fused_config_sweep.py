"""Fused == XLA across the config envelope, not just the toy shapes.

``tests/test_fused_solve.py`` proves kernel/XLA equivalence on one toy
task; this sweep drives a dimension-generic linear task through varied
(horizon, dims, K incl. tile padding, lambda mode, exploration, SG)
configurations with injected noise over chained warm-started ticks, so a
kernel regression that only bites a particular shape class (odd dims,
padded tiles, SG epilogue, each auto-lambda mode) is caught here.
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_playground_tpu import MPPIConfig, make_solver
from mppi_playground_tpu.core.fused_solver import make_fused_solver
from mppi_playground_tpu.ops.fused_solve import FusedTask


def _make_linear_model(n, m):
    """x_i' = x_i + 0.1*u_{i%m} - 0.05*x_{(i+1)%n}; quadratic cost."""
    goals = [0.5 * i for i in range(n)]

    def dynamics(state, action):
        cols = [
            state[:, i]
            + 0.1 * jnp.clip(action[:, i % m], -1.0, 1.0)
            - 0.05 * state[:, (i + 1) % n]
            for i in range(n)
        ]
        return jnp.stack(cols, axis=1)

    def cost(state, action, info):
        c = sum((state[:, i] - goals[i]) ** 2 for i in range(n))
        prev = info["prev_action"]
        c = c + 0.01 * sum((action[:, j] - prev[:, j]) ** 2 for j in range(m))
        return c

    def dynamics_soa(xs, us):
        return tuple(
            xs[i] + 0.1 * jnp.clip(us[i % m], -1.0, 1.0) - 0.05 * xs[(i + 1) % n]
            for i in range(n)
        )

    def cost_soa(xs, us, ctx):
        c = sum((xs[i] - goals[i]) ** 2 for i in range(n))
        prev = ctx["prev_us"]
        return c + 0.01 * sum((us[j] - prev[j]) ** 2 for j in range(m))

    task = FusedTask(
        dynamics_soa=dynamics_soa,
        stage_cost_soa=cost_soa,
        vmem_args={},
        smem_builder=lambda info: {},
    )
    return dynamics, cost, task


CASES = [
    # (name, T, n, m, K, lambda_, exploration, use_sg)
    ("fixed", 6, 3, 2, 1024, 1.0, 0.0, False),
    ("essps-exploration", 8, 2, 1, 2048, "ESSPS", 0.25, False),
    ("lbps-sg-odd-dims", 5, 4, 3, 1024, "LBPS", 0.0, True),
    ("mpo-padded-k", 10, 2, 2, 1536, "MPO", 0.5, False),
    # d_flat > 128: multi-vreg numer packing with auto-lambda + SG
    ("essps-multi-vreg", 50, 3, 3, 1024, "ESSPS", 0.0, True),
]


@pytest.mark.parametrize(
    "name,T,n,m,K,lambda_,exploration,use_sg",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_fused_matches_xla_across_configs(name, T, n, m, K, lambda_,
                                          exploration, use_sg):
    dynamics, cost, task = _make_linear_model(n, m)
    config = MPPIConfig(
        horizon=T,
        num_samples=K,
        dim_state=n,
        dim_control=m,
        u_min=(-1.0,) * m,
        u_max=(1.0,) * m,
        sigmas=tuple(0.5 + 0.1 * j for j in range(m)),
        lambda_=lambda_,
        exploration=exploration,
        use_sg_filter=use_sg,
        store_rollouts=False,
    )
    fused = make_fused_solver(config, task, dynamics, jit=True, donate_state=False)
    xla = make_solver(config, dynamics, cost, jit=True, donate_state=False)

    # zlib.crc32 is a stable hash — hash() is salted per process,
    # which would make the sweep noise (and any failure) irreproducible
    key = jax.random.PRNGKey(zlib.crc32(name.encode()) % (2**31))
    x0 = jnp.linspace(-0.5, 0.5, n).astype(jnp.float32)
    sf, sx = fused.init(), xla.init()
    sigmas = jnp.asarray(config.sigmas, jnp.float32)

    for tick in range(2):  # chained: warm start + adapted lambda carry over
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, (K, T, m), jnp.float32) * sigmas
        rf = fused.solve(sf, x0, noise=noise)
        rx = xla.solve(sx, x0, noise=noise)
        sf, sx = rf.state, rx.state

        # tick-1 costs inherit tick-0's ~1e-3 f32 action drift; lambda
        # under the auto modes sits on a flat objective, so the same
        # drift moves it ~0.3% with negligible weight effect (same
        # tolerances as test_fused_solve.test_fused_auto_lambda_matches_xla)
        np.testing.assert_allclose(
            np.asarray(rf.aux.costs), np.asarray(rx.aux.costs),
            rtol=2e-5 if tick == 0 else 1e-3,
            err_msg=f"{name} tick {tick}: costs",
        )
        np.testing.assert_allclose(
            float(rf.aux.lam), float(rx.aux.lam), rtol=1e-2,
            err_msg=f"{name} tick {tick}: lambda",
        )
        np.testing.assert_allclose(
            np.asarray(rf.action_seq), np.asarray(rx.action_seq), atol=5e-3,
            err_msg=f"{name} tick {tick}: action_seq",
        )
        np.testing.assert_allclose(
            np.asarray(rf.state_seq), np.asarray(rx.state_seq), atol=5e-3,
            err_msg=f"{name} tick {tick}: state_seq",
        )
        # ess is a direct function of lambda and the costs, so it inherits
        # the ~1% lambda drift allowed above (observed 0.19% on the
        # lbps-sg-odd-dims seed) — same rtol as the lambda check
        np.testing.assert_allclose(
            float(rf.aux.ess), float(rx.aux.ess), rtol=1e-2,
            err_msg=f"{name} tick {tick}: ess",
        )
