"""Persistent XLA compile cache, enabled once per entry point.

Full-model programs take minutes to compile cold (through a remote-compile
tunnel); chunk-parallel eval shards and repeated bench runs re-use the
on-disk cache instead. One helper so the cache dir default and threshold
live in exactly one place.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
