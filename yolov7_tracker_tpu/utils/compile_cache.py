"""Persistent XLA compilation cache for the CLI entries.

The w6 detector graph takes minutes to compile cold on a 1-core host
and ~20-40 s on TPU; every CLI invocation is a fresh process, so
without a persistent cache each run pays full compile. Same scheme as
bench.py:95-105: one cache directory per backend (CPU AOT artifacts
written on one host can SIGILL on another with different CPU features,
and TPU/CPU entries must not mix).

Replaces nothing in the reference — torch eager has no compile step;
this is the TPU-native equivalent of its "load weights and go" UX.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> None:
    """Best-effort: point jax at a backend-scoped on-disk compile cache.

    Call before the first jit compilation. Honors
    JAX_COMPILATION_CACHE_DIR; defaults next to the package so repo
    checkouts self-contain their caches.
    """
    import jax

    # Honor JAX_PLATFORMS even on hosts whose sitecustomize
    # force-registers an accelerator plugin (which makes jax ignore the
    # env var): a CLI run with JAX_PLATFORMS=cpu must NOT grab the
    # exclusive TPU chip lock (tests, soaks, and anything sharing the
    # host with a serving process rely on this).
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        # Keep the host cpu backend reachable when the env var names
        # only accelerator platforms (jax's own default is
        # "<plugin>,cpu"): build_model(init='random') and other
        # host-staging paths use jax.devices("cpu"), and a verbatim
        # "axon" would strip it. "cpu"-only stays cpu-only — that's
        # the pin the soak/test processes rely on.
        names = [p.strip() for p in platforms.split(",") if p.strip()]
        if "cpu" not in names:
            names.append("cpu")
        try:
            jax.config.update("jax_platforms", ",".join(names))
        except Exception:
            pass

    # An env-provided dir is honored verbatim (it may point at an
    # existing, prepopulated cache); only the repo-local default gets
    # the backend suffix that keeps CPU and TPU AOT artifacts apart.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    try:
        if cache_dir is None:
            repo = os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
            cache_dir = os.path.join(
                repo, f".jax_cache-{jax.default_backend()}")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization, never a failure
