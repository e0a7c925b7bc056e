"""Process-level JAX setup: persistent compilation cache.

TPU compiles in this environment route through a remote-compile relay with
high and variable latency (minutes); the persistent cache makes every
recompilation of an unchanged program near-free across processes and rounds.
Call setup_cache() before the first jit.
"""

from __future__ import annotations

import os


def setup_cache(cache_dir: str | None = None) -> None:
    import jax
    cache_dir = cache_dir or os.environ.get(
        "GFVGN_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
