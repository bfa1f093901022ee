"""Persistent XLA compilation cache.

The ``JAX_COMPILATION_CACHE_DIR`` env var alone is IGNORED by this jax
version + axon TPU plugin combination (verified: no cache dir is ever
created); the cache only initializes through explicit
``jax.config.update``. Additionally, the locally-measured compile time of
remote-helper (tunnel) compiles is near zero even when the helper spends
minutes, so the default min-compile-time write threshold would skip
exactly the entries worth caching — thresholds are therefore zeroed.
"""

from __future__ import annotations

import os

def _default_dir() -> str:
    """Repo-root `.jax_cache` for in-tree checkouts; `~/.cache` for
    installed copies (where the package's grandparent is site-packages).
    The in-tree sentinel is this repo's own native source file — a
    generic marker like a `native/` directory could collide with an
    unrelated top-level package in site-packages."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.isfile(os.path.join(root, "native", "kern_tools.cpp")):
        return os.path.join(root, ".jax_cache")
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "piano_a2s_tpu", "jax_cache")


_DEFAULT = _default_dir()


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache. Call any time
    after importing jax (before the compiles you want cached)."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
