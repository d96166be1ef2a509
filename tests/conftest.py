"""Test configuration: run everything on a virtual 8-device CPU mesh.

The ambient environment sets JAX_PLATFORMS=axon (one real TPU chip), and
`import pytest` already imports jax (jaxtyping plugin) before this file
runs — so we must use jax.config.update, which works any time before the
backend is initialized, rather than env vars.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
