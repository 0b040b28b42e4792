"""Framework runtime knobs — the analog of the reference's HYPRE_Init-time
configuration (memory pools, exec policy; src/main.cpp:82-156).

The one knob that matters on TPU backends is the persistent XLA compilation
cache: remote-compile relays cost ~7 s per new kernel shape, and an AMG
setup + solve compiles a few dozen shapes.  With the cache, repeat shapes
cost ~0.2 s across *processes* — so the second run of any config, and every
hierarchy level sharing a pow2-bucketed layout shape, skips compilation.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = "/tmp/tpusolve_xla_cache"
_enabled = []


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent compilation cache directory (idempotent).

    Resolution order: explicit arg, ``TPUSOLVE_COMPILE_CACHE`` env (empty
    string disables), default ``/tmp/tpusolve_xla_cache``.  Returns the
    directory used, or None when disabled/unavailable.
    """
    if _enabled:
        return _enabled[0]
    if cache_dir is None:
        cache_dir = os.environ.get("TPUSOLVE_COMPILE_CACHE", _DEFAULT_CACHE)
    if not cache_dir:
        return None
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # persist even sub-second compiles: on remote-compile relays every
        # eager op shape costs a round-trip, and setup dispatches hundreds
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - old jax without the knobs
        return None
    _enabled.append(str(cache_dir))
    return _enabled[0]
