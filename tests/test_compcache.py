"""Persistent compilation cache setup (sympgpr_tpu/compcache.py)."""

import os

import jax
import pytest

from sympgpr_tpu.compcache import enable_compilation_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    prev = jax.config.jax_compilation_cache_dir
    prev_env = os.environ.get("SYMPGPR_COMPILE_CACHE")
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    if prev_env is None:
        os.environ.pop("SYMPGPR_COMPILE_CACHE", None)
    else:
        os.environ["SYMPGPR_COMPILE_CACHE"] = prev_env


def test_enable_creates_and_points_at_dir(tmp_path):
    target = str(tmp_path / "cache")
    got = enable_compilation_cache(target)
    assert got == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target


def test_env_override_and_opt_out(tmp_path):
    target = str(tmp_path / "env_cache")
    os.environ["SYMPGPR_COMPILE_CACHE"] = target
    assert enable_compilation_cache() == target
    assert os.path.isdir(target)

    os.environ["SYMPGPR_COMPILE_CACHE"] = "off"
    assert enable_compilation_cache() is None
