"""Make the JAX_PLATFORMS env var authoritative.

Some hosts register an accelerator plugin from sitecustomize at
interpreter boot and force-select it with
``jax.config.update("jax_platforms", ...)``. An explicit config update
outranks the JAX_PLATFORMS environment variable, so a process launched
with ``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N``
(the virtual-mesh testing recipe, SURVEY.md §4) silently comes up on the
accelerator with one device instead of the N-device CPU mesh.

``honor_jax_platforms_env()`` re-asserts the env var's choice through the
same config API, dropping any backends that were already initialized so
XLA re-reads ``--xla_force_host_platform_device_count``. No-op when the
env var is unset or already in effect.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    if jax.config.jax_platforms == want:
        return
    jax.config.update("jax_platforms", want)
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
