"""Opt-in persistent XLA compilation cache for benches and drivers.

Flagship programs take ~30-40 s each to compile through the TPU tunnel;
the benches compile several per run (`bench.py`, `benchmarks/fleet.py`,
`benchmarks/run_all.py`).  Enabling JAX's persistent compilation cache
makes repeat runs start in seconds.  Best-effort by design: a read-only
filesystem or an older JAX without the knobs must never kill a recorded
benchmark, so failures are swallowed.

Not enabled at import time anywhere in the library — caching is a
process-level policy the entry point owns.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIRNAME = ".jax_cache"


def enable_compilation_cache(base_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Resolution order: explicit ``base_dir`` argument, then the
    ``JAX_COMPILATION_CACHE_DIR`` environment variable, then
    ``<repo>/.jax_cache`` (git-ignored).  Returns the directory used, or
    ``None`` when the cache could not be enabled.
    """
    path = base_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not path:
        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        path = os.path.join(repo, _DEFAULT_DIRNAME)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        return None
    return path
