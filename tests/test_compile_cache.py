"""Persistent XLA compilation cache wiring (utils/compile_cache.py).

The cache itself is a jax feature; these tests pin OUR contract: the env
switch disables it, the default populates a directory, and entries persist
so a second enable-and-compile finds them (same-process proxy for the
cross-process cold-start win; the on-chip cross-process measurement is
scripts/probe_compile_latency.py --cache-dir)."""

import os

import jax
import jax.numpy as jnp
import pytest

from rollingdepth_tpu.utils.compile_cache import enable_persistent_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)


def test_env_disable(monkeypatch, tmp_path):
    monkeypatch.setenv("ROLLINGDEPTH_XLA_CACHE", "0")
    assert enable_persistent_cache(str(tmp_path)) is None


def test_env_path_wins(monkeypatch, tmp_path):
    monkeypatch.setenv("ROLLINGDEPTH_XLA_CACHE", str(tmp_path / "fromenv"))
    path = enable_persistent_cache()
    assert path == str(tmp_path / "fromenv")
    assert os.path.isdir(path)


def test_cache_populates(monkeypatch, tmp_path):
    monkeypatch.delenv("ROLLINGDEPTH_XLA_CACHE", raising=False)
    path = enable_persistent_cache(str(tmp_path / "xla"))
    assert path is not None
    assert jax.config.jax_compilation_cache_dir == path

    @jax.jit
    def fn(x):
        return (x * 3.0 + 1.0).sum()

    fn(jnp.arange(7, dtype=jnp.float32)).block_until_ready()
    entries = os.listdir(path)
    assert entries, "compile produced no persistent cache entries"
