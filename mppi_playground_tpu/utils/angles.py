"""Angle helpers shared by models and environments.

Behavioral reference: ``angle_normalize`` in the upstream project
(/root/reference/src/envs/navigation_2d.py:18-20 and the copies in the
example scripts): wrap an angle into ``[-pi, pi)`` via modular arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp


def angle_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles into ``[-pi, pi)``."""
    return (x + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
