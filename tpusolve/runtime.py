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

# HBM speed-of-light per device generation (GB/s) — the calibration key for
# the kernel-selection time models (kernels/bdia.py, matrix/sharded.py) and
# the bench north-star targets.  The reference's analog is the per-vendor
# exec-policy toggles (src/main.cpp:127-156); here the hardware generation
# is detected and the one v5e-measured calibration is rescaled.
HBM_GBPS = {
    "v6e": 1640.0, "v6 lite": 1640.0,
    "v5p": 2765.0,
    "v5e": 819.0, "v5 lite": 819.0,
    "v4": 1228.0,
    "v3": 900.0,
}
_V5E_GBPS = 819.0
_profile_cache: list[tuple[str, float]] = []


def device_profile() -> tuple[str, float]:
    """(device_kind, hbm_gbps) of the attached accelerator.

    ``TPUSOLVE_DEVICE_KIND`` overrides detection (tests / offline planning).
    CPU backends report the v5e profile: CPU runs are correctness mirrors of
    TPU runs and must take the *same* layout-selection decisions.
    """
    ov = os.environ.get("TPUSOLVE_DEVICE_KIND")
    if ov:
        return ov, hbm_gbps_for(ov)
    if _profile_cache:
        return _profile_cache[0]
    kind, bw = "v5e", _V5E_GBPS
    try:
        import jax
        dev = jax.devices()[0]
        if dev.platform != "cpu":
            kind = (getattr(dev, "device_kind", "") or "v5e")
            bw = hbm_gbps_for(kind)
    except Exception:  # pragma: no cover - no backend yet
        return kind, bw   # don't cache a guess made before backend init
    _profile_cache.append((kind, bw))
    return _profile_cache[0]


def hbm_gbps_for(kind: str) -> float:
    kind = kind.lower()
    for key, bw in HBM_GBPS.items():
        if key in kind:
            return bw
    return _V5E_GBPS  # conservative default


def hbm_gbps() -> float:
    return device_profile()[1]


def overhead_scale() -> float:
    """Rescale factor for v5e-measured per-issue kernel overheads.

    Issue costs are scalar-core/clock-bound, NOT bandwidth-bound; TPU core
    clocks vary far less across generations than HBM rates, so the
    conservative default keeps the v5e nanoseconds (scale 1.0) while the
    stream terms use the true per-device HBM rate — on faster-HBM parts the
    model correctly shifts toward overhead-bound rankings.  Re-measured
    generations can pin ``TPUSOLVE_OVERHEAD_SCALE``.
    """
    ov = os.environ.get("TPUSOLVE_OVERHEAD_SCALE")
    return float(ov) if ov else 1.0


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
