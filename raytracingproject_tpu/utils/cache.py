"""Persistent XLA compilation cache.

The tunneled TPU backend compiles remotely; big scan/while programs take
minutes. The persistent cache (keyed on HLO) makes every repeat invocation
— across processes and rounds — a cache hit. Call once, early.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything, however small/fast to compile
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass  # older jax without these knobs
