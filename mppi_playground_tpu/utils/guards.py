"""Numerical guards: actionable errors instead of silent NaN propagation.

The reference has no failure detection (SURVEY.md §5); its analogue in a
pure-JAX framework is ``jax.experimental.checkify``.  :func:`checked_solve`
wraps a solver's ``solve`` so non-finite costs or actions raise a
``JaxRuntimeError`` naming the failing quantity — useful when bringing up
new dynamics/cost models whose rollouts can overflow.

The guard adds a small overhead (error-state threading through the jit),
so it is opt-in and intended for development, not the serving hot path.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import checkify


def checked_solve(solver):
    """Wrap ``solver.solve`` with non-finite checks.

    Returns ``checked(state, x0, info=None, noise=None) -> SolveResult``;
    raises ``checkify.JaxRuntimeError`` on non-finite costs or actions.
    """

    def solve_with_checks(state, x0, info=None, noise=None):
        # only forward noise= when given: some solve surfaces (e.g. the
        # sharded solver) take no noise parameter
        kwargs = {} if noise is None else {"noise": noise}
        result = solver.solve(state, x0, info=info, **kwargs)
        checkify.check(
            jnp.all(jnp.isfinite(result.aux.costs)),
            "non-finite trajectory costs (dynamics or cost overflow)",
        )
        checkify.check(
            jnp.all(jnp.isfinite(result.action_seq)),
            "non-finite optimal action sequence (softmin weights collapsed)",
        )
        return result

    checked = checkify.checkify(solve_with_checks)

    def solve(state, x0, info=None, noise=None):
        err, result = checked(state, x0, info=info, noise=noise)
        err.throw()
        return result

    return solve
