"""Persistent XLA compilation cache.

TPU compiles through the remote-compile tunnel are expensive (minutes for
kernels with while-loops); caching compiled executables on disk makes
repeated bench/driver runs start hot."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend == "cpu":
        # NEVER cache CPU executables: XLA:CPU AOT results carry exact
        # machine-feature sets (+prefer-no-scatter etc.) and loading an
        # entry compiled for a different feature profile intermittently
        # SIGILL/SIGABRTs the process. CPU compiles are fast anyway.
        return

    path = path or os.environ.get(
        "PPR_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/ppr_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # persist everything: through the remote-compile tunnel the reported
        # client-side compile time can be near zero even for minutes-long
        # terminal-side compiles, so a time threshold would skip exactly the
        # entries that matter
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
