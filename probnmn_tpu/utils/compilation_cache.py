r"""
Persistent XLA compilation cache.

Large jitted graphs in this framework (the fused joint-training step, the
serving pipeline) cost tens of seconds to minutes of XLA/Mosaic compile time
on first use. JAX ships a persistent on-disk compilation cache that makes
every later process start-up hit the compiled executable instead; this module
is the one-call switch the CLIs (``--compilation-cache-dir``) and the serving
engine (``InferenceEngine(..., compilation_cache_dir=...)``) expose.

The reference has no equivalent surface (torch eager pays no compile step);
this is TPU-native deployment plumbing.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_DEFAULT_DIR = os.path.join("~", ".cache", "probnmn_tpu", "xla")


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    r"""Enable JAX's persistent compilation cache rooted at ``cache_dir``.

    ``cache_dir`` resolution order: explicit argument, the
    ``PROBNMN_COMPILATION_CACHE`` environment variable, then
    ``~/.cache/probnmn_tpu/xla``. The directory is created if missing and its
    resolved path returned. Thresholds are set so even sub-second compiles are
    cached (the framework's step functions are few and large — cache-size
    pressure is not a concern, restart latency is).
    """
    cache_dir = (
        cache_dir
        or os.environ.get("PROBNMN_COMPILATION_CACHE")
        or _DEFAULT_DIR
    )
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # JAX initializes its on-disk cache singleton lazily ONCE per process; if
    # any compile already ran (with no cache, or rooted elsewhere), the new
    # directory would be silently ignored without this reset.
    from jax.experimental.compilation_cache import compilation_cache as _cc

    _cc.reset_cache()
    return cache_dir
