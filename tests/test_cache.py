"""utils.cache.enable_compilation_cache resolution order and cleanup.

The cache is a process-level policy owned by entry points (bench.py,
benchmarks/*), so the test restores the config it touches — enabling a
persistent cache mid-suite must not leak into other tests.
"""

import os

import jax
import pytest

from mppi_playground_tpu.utils.cache import enable_compilation_cache


@pytest.fixture
def restore_cache_config():
    before = jax.config.jax_compilation_cache_dir
    before_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", before)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", before_min)


def test_explicit_dir_wins(tmp_path, restore_cache_config, monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env"))
    used = enable_compilation_cache(str(tmp_path / "explicit"))
    assert used == str(tmp_path / "explicit")
    assert jax.config.jax_compilation_cache_dir == used


def test_env_var_fallback(tmp_path, restore_cache_config, monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env"))
    used = enable_compilation_cache()
    assert used == str(tmp_path / "env")


def test_repo_default(restore_cache_config, monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    used = enable_compilation_cache()
    assert used is not None
    assert os.path.basename(used) == ".jax_cache"
