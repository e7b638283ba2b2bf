"""Platform-selection helper.

The axon TPU plugin's sitecustomize calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start,
which silently overrides a user's ``JAX_PLATFORMS=cpu`` env request. Every
CLI entry point calls :func:`honor_jax_platforms_env` so CPU runs (CI,
verification drives, machines without the tunnel) behave as the env var
says — mirrors the handling in ``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in plat and "axon" not in plat:
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
