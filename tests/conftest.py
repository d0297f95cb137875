"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
logic is testable without a TPU (SURVEY.md §4 rebuild strategy).

Note: this image's sitecustomize pins JAX_PLATFORMS to the TPU plugin, so the
env var alone is not enough — jax.config.update is authoritative.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# --xla_cpu_max_isa=AVX2: cap codegen at the fleet-portable ISA so the
# persistent CPU cache's AOT executables never SIGILL after this VM
# migrates hosts (utils/compilation_cache.cap_cpu_isa rationale).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8 --xla_cpu_max_isa=AVX2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Machine-keyed persistent XLA cache: repeat suite runs load executables
# instead of recompiling (the suite's cost is almost all XLA compiles).
from rovr_tpu.utils.compilation_cache import enable_cpu_cache  # noqa: E402

enable_cpu_cache()


def tiny_model_overrides() -> dict:
    """ModelConfig overrides that slash XLA compile AND execution time for
    tests: the tiny feature-extractor trunk, a 2-stage LPIPS plan, and
    narrow UNet/policy channels (same graphs and math, tiny tensors — this
    box has one CPU core, so test cost is execution-bound; the production
    widths live in config.py and the parity tests pin them separately).
    Shared by each test file's tiny_config."""
    return dict(
        backbone="tiny",
        lpips_stages=((8, 1), (16, 1)),
        local_net_channels=(8, 16, 32, 64),
        pn1_channels=(8, 16, 32, 64),
        pn2_fc_dims=(256, 64),
    )
