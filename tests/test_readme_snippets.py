"""Execute every ```python block in README.md — the quickstart a new user
copy-pastes must never rot.

Blocks share one namespace in reading order (later blocks build on earlier
ones); free variables the surrounding prose establishes (`state`,
`dynamics`, `cost_fn`) are pre-seeded with the pendulum model.
"""

import os
import re

import jax.numpy as jnp

from mppi_playground_tpu.models import pendulum

_README = os.path.join(os.path.dirname(__file__), "..", "README.md")


def test_readme_python_blocks_execute():
    with open(_README) as fh:
        blocks = re.findall(r"```python\n(.*?)```", fh.read(), re.S)
    assert blocks, "README.md lost its python examples"

    namespace = {
        "state": jnp.zeros(2),
        "dynamics": pendulum.dynamics,
        "cost_fn": pendulum.cost,
    }
    for i, block in enumerate(blocks):
        exec(compile(block, f"<README block {i}>", "exec"), namespace)
