"""Platform selection helper.

Some TPU runtime plugins re-select themselves during backend init even when
``JAX_PLATFORMS`` is set in the environment (observed with the tunneled
"axon" plugin: the env var alone is ignored). Pinning
``jax.config.jax_platforms`` before first backend use is authoritative, so
entry points call :func:`apply_platform_env` to make the env var binding.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Honor ``JAX_PLATFORMS`` by pinning it into jax config, and enable the
    persistent compilation cache.

    Must run before the first jax backend initialization. The platform pin
    is a no-op when the env var is unset (the plugin's default platform is
    used — on TPU machines that is the TPU, which is what benchmarks want).
    """
    value = os.environ.get("JAX_PLATFORMS")
    if value:
        import jax

        jax.config.update("jax_platforms", value)
    enable_compile_cache()


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Turn on jax's persistent compilation cache.

    Some backends (notably remote-compile TPU tunnels) take tens of seconds
    to compile sorts and other large computations; the persistent cache
    makes those one-time costs across processes. Directory:
    ``$IBU_JAX_CACHE_DIR`` or ``/tmp/ibu_jax_cache``.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "IBU_JAX_CACHE_DIR", "/tmp/ibu_jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        # Skip XLA-internal AOT caches: they fingerprint exact CPU features
        # and spam machine-mismatch warnings across processes on the same
        # host; the jit-executable cache is the one that matters here.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except (AttributeError, ValueError):  # older jax without the knob
        pass
