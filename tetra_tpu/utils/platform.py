"""Restore standard JAX_PLATFORMS semantics under the axon TPU plugin.

The axon plugin force-registers the TPU backend during `import jax`,
ignoring the standard `JAX_PLATFORMS` environment variable. CLI entry
points call apply_env_platform() first so `JAX_PLATFORMS=cpu python -m
tetra_tpu.rx ...` behaves like stock JAX (deterministic CPU runs, no
tunnel compiles); without the variable the default backend is kept.
"""
from __future__ import annotations

import os

__all__ = ["apply_env_platform"]


def apply_env_platform() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat.split(",")[0])
    except Exception:
        pass  # unknown platform string: keep the plugin's default
