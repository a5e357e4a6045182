"""Persistent-compile-cache plumbing (the cross-process 43s -> 0.6s hit
itself is measured on the real chip — docs/PERFORMANCE.md)."""

import jax

from low_light_image_enhancement_tpu.utils.compile_cache import (
    enable_compile_cache,
)


def test_enable_sets_jax_cache_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("LLIE_COMPILE_CACHE", raising=False)
    target = tmp_path / "xla-cache"
    got = enable_compile_cache(target)
    assert got == str(target)
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)


def test_env_var_overrides_default(tmp_path, monkeypatch):
    target = tmp_path / "env-cache"
    monkeypatch.setenv("LLIE_COMPILE_CACHE", str(target))
    assert enable_compile_cache() == str(target)
    assert target.is_dir()


def test_env_var_disables(monkeypatch):
    for off in ("0", "off", ""):
        monkeypatch.setenv("LLIE_COMPILE_CACHE", off)
        assert enable_compile_cache() is None


def test_unwritable_path_logs_and_returns_none(monkeypatch):
    assert enable_compile_cache("/proc/definitely/not/writable") is None
