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
    """Honor ``JAX_PLATFORMS`` by pinning it into jax config.

    Must run before the first jax backend initialization. No-op when the
    env var is unset (the plugin's default platform is used — on TPU
    machines that is the TPU, which is what benchmarks want).
    """
    value = os.environ.get("JAX_PLATFORMS")
    if value:
        import jax

        jax.config.update("jax_platforms", value)
