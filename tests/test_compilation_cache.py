"""Persistent XLA compilation cache: the one-call switch used by the CLIs'
``--compilation-cache-dir`` and ``InferenceEngine(compilation_cache_dir=...)``."""
import glob

import jax
import jax.numpy as jnp

from probnmn_tpu.utils.compilation_cache import enable_compilation_cache


def test_enable_compilation_cache_populates_dir(tmp_path):
    prev = {
        "jax_compilation_cache_dir": jax.config.jax_compilation_cache_dir,
        "jax_persistent_cache_min_compile_time_secs":
            jax.config.jax_persistent_cache_min_compile_time_secs,
        "jax_persistent_cache_min_entry_size_bytes":
            jax.config.jax_persistent_cache_min_entry_size_bytes,
    }
    target = tmp_path / "xla"
    try:
        path = enable_compilation_cache(str(target))
        assert path == str(target)
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == path

        # A fresh compile must land entries in the cache directory. The
        # multiplier is unique per run: an identical computation compiled
        # EARLIER in this process (before the cache was enabled) would be
        # served from JAX's in-memory executable cache and write nothing.
        import os as _os

        c = float(int.from_bytes(_os.urandom(4), "little"))
        float(jax.jit(lambda x: (x * c).sum())(jnp.ones((16, 4))))
        entries = [p for p in glob.glob(str(target / "*")) if p]
        assert entries, "no cache entries written by a jitted computation"
    finally:
        # Global jax.config state must not leak into other tests (and the
        # tmp dir is deleted after the test — later compiles would fail).
        for key, value in prev.items():
            jax.config.update(key, value)
        from jax.experimental.compilation_cache import compilation_cache as cc

        cc.reset_cache()
