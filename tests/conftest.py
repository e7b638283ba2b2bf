"""Test harness: force CPU backend with a virtual 8-device mesh so sharding
tests run anywhere (SURVEY §4 implication (c)).

Note: the axon TPU plugin's sitecustomize calls
``jax.config.update("jax_platforms", "axon,cpu")`` at import, overriding the
JAX_PLATFORMS env var — so we must re-override the config after import.
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
