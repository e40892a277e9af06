"""Persistent XLA compilation cache setup.

On this TPU environment every XLA compile round-trips through a remote
compile helper with ~0.5 s fixed latency, so even trivial one-op programs
(the eager `jnp.asarray`/`concatenate`/random-init dispatches) cost half a
second each on a cold process — a cold inference warm-up used to spend
minutes in tiny compiles alone. Persisting ALL programs (min compile time 0)
makes every run after the first load from disk in milliseconds.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/jax_mdqe")


def enable(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (idempotent, safe pre/post jax
    backend init). Call before the first jitted computation for full effect."""
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: cache is an optimization only
