"""Runtime/platform helpers for the CLI entry points."""

from __future__ import annotations

import os


def apply_platform_override():
    """Honor TPUDEPTH_PLATFORM=cpu|tpu (the axon TPU plugin ignores the
    plain JAX_PLATFORMS env var, so CLIs route through jax.config)."""
    plat = os.environ.get("TPUDEPTH_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    enable_compilation_cache()


def enable_compilation_cache(path: str = None):
    """Persistent XLA compilation cache — compiles on this environment go
    through a remote helper and cost 1-8 minutes for big train steps, so
    caching across processes matters."""
    import jax

    if path is None:
        base = os.environ.get("TPUDEPTH_CACHE", "/root/.cache/tpudepth_jax")
        # separate caches per platform: CPU AOT artifacts embed machine
        # features and may not be portable across executors
        plat = os.environ.get("TPUDEPTH_PLATFORM", "tpu")
        path = f"{base}_{plat}"
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
