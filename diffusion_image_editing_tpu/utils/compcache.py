"""Persistent XLA compilation cache for cold-start latency.

The reference has no equivalent (every torch process re-JITs nothing, but
every JAX process pays 20-40 s of XLA compilation for the big 512px
programs on first dispatch). Enabling jax's persistent compilation cache
makes every *fresh process* — CLI invocations, bench retries, the driver's
end-of-round run — warm-start from disk: a cold 4-phase bench measured
>50 min vs ~20 warm (bench.py history).

Call `enable_persistent_cache()` BEFORE the first jit dispatch (it is a
no-op afterwards for already-compiled programs). Opt out with
DIE_TPU_NO_COMPCACHE=1 (e.g. if a backend mis-serves cached executables);
override the location with JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 5.0) -> bool:
    """Point jax at a persistent on-disk compilation cache.

    Returns True if the cache was enabled, False if opted out or the jax
    build lacks the knobs. Safe to call more than once.
    """
    if os.environ.get("DIE_TPU_NO_COMPCACHE") == "1" or (
            os.environ.get("DIE_BENCH_NO_COMPCACHE") == "1"):
        return False
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                        _DEFAULT_DIR),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:  # older jax without the knobs — cold compiles only
        return False
    return True
