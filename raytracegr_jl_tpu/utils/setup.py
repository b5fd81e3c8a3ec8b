"""Runtime setup helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.jax_cache") -> None:
    """Persistent XLA compilation cache: on this machine TPU compiles go
    through a remote-compile relay at minutes per program, so caching
    compiled executables across processes is essential for iteration."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
