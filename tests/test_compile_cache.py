"""Persistent compilation cache wiring (utils/compile_cache.py).

The cache must (a) populate on first compile, (b) be hit on a fresh
trace of the same program, and (c) stay off when unconfigured.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsitu_tpu.utils.compile_cache import enable_compile_cache
from vidsitu_tpu.utils.config import get_cfg_with_overrides


@pytest.fixture
def cache_restore():
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    old_sz = jax.config.jax_persistent_cache_min_entry_size_bytes
    yield
    jax.config.update("jax_compilation_cache_dir", old_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_sz)


def test_disabled_by_default(cache_restore, monkeypatch):
    # a dev shell may export VIDSITU_COMPILE_CACHE; "default" means
    # neither the env var nor the cfg key is set
    monkeypatch.delenv("VIDSITU_COMPILE_CACHE", raising=False)
    cfg = get_cfg_with_overrides("cc_off")
    assert cfg.tpu.compile_cache_dir == ""
    assert enable_compile_cache(cfg) == ""


def test_cache_populates_and_hits(tmp_path, cache_restore, monkeypatch):
    monkeypatch.delenv("VIDSITU_COMPILE_CACHE", raising=False)
    cache_dir = tmp_path / "xla_cache"
    cfg = get_cfg_with_overrides(
        "cc_on", **{"tpu.compile_cache_dir": str(cache_dir)}
    )
    assert enable_compile_cache(cfg) == str(cache_dir)

    # a program unlikely to be in any pre-existing trace cache
    def fn(x):
        return jnp.tanh(x @ x.T) * 3.25 + 0.125

    x = np.arange(42 * 42, dtype=np.float32).reshape(42, 42) / 1e4
    y1 = jax.jit(fn)(x)
    files = [p for p in cache_dir.rglob("*") if p.is_file()]
    assert files, "compilation cache dir is empty after a jit compile"

    # fresh trace of the SAME program: deserializes from the cache
    # (clear_caches drops the in-memory executable, not the disk cache)
    from jax._src import monitoring

    events = []

    def listener(name, **kw):
        events.append(name)

    monitoring.register_event_listener(listener)
    try:
        jax.clear_caches()
        y2 = jax.jit(fn)(x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
        assert any("compilation_cache/cache_hits" in e for e in events), (
            f"no persistent-cache hit recorded (events: {events})"
        )
    finally:
        monitoring.unregister_event_listener(listener)


def test_env_var_overrides_cfg(tmp_path, cache_restore, monkeypatch):
    env_dir = tmp_path / "from_env"
    monkeypatch.setenv("VIDSITU_COMPILE_CACHE", str(env_dir))
    cfg = get_cfg_with_overrides(
        "cc_env", **{"tpu.compile_cache_dir": str(tmp_path / "from_cfg")}
    )
    assert enable_compile_cache(cfg) == str(env_dir)
    assert env_dir.exists()
