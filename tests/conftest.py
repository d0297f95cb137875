"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
logic is testable without a TPU (SURVEY.md §4 rebuild strategy).

Note: this image's sitecustomize pins JAX_PLATFORMS to the TPU plugin, so the
env var alone is not enough — jax.config.update is authoritative.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
