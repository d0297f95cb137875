"""Persistent XLA compilation cache.

The flagship graphs (RL train step, 256x256 UNet + LPIPS pretrain step,
ResNet-50 imitation step) take minutes to compile cold; with the persistent
cache a re-run of the same config loads the compiled executable in seconds.
The reference has no analog (eager PyTorch). Enabled by every entry point
(cli, bench, __graft_entry__, train.run drivers); set ROVR_NO_COMPILE_CACHE=1
to disable, ROVR_COMPILE_CACHE_DIR to relocate.
"""

from __future__ import annotations

import os

_enabled = False


def enable(cache_dir: str | None = None) -> None:
    """Idempotently turn on JAX's persistent compilation cache."""
    global _enabled
    if _enabled or os.environ.get("ROVR_NO_COMPILE_CACHE") == "1":
        return
    import jax

    # TPU executables are host-independent; CPU AOT results bake in machine
    # features and can SIGILL when the compiling and executing hosts differ
    # (observed with the axon tunnel), so only cache for accelerators.
    if jax.default_backend() == "cpu":
        return

    path = (
        cache_dir
        or os.environ.get("ROVR_COMPILE_CACHE_DIR")
        or os.path.expanduser("~/.cache/rovr_tpu/xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Cache even executables whose compile was fast but whose trace is hot.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True


def cap_cpu_isa() -> None:
    """Cap XLA:CPU codegen at AVX2 (idempotent; must run before the backend
    initializes). Rationale (r5, observed): this VM migrates between fleet
    hosts whose CPUID differs in ways /proc/cpuinfo does not capture (AMX
    subfeatures, XLA's prefer-no-gather/scatter tuning bits), so AOT
    executables cached by an earlier session can SIGILL/segfault when
    loaded later — two full-suite runs died inside
    `backend_compile_and_load` exactly this way. AVX2 is the fleet-wide
    common denominator; the suite is tiny-shape dominated, so the codegen
    cap costs little and makes every cached executable portable."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_cpu_max_isa=AVX2"


def _machine_key() -> str:
    """Fingerprint of this host's CPU (model name + feature flags), so a CPU
    cache is never shared between hosts with different ISAs. The "avx2cap"
    bit ties the key to the cap_cpu_isa codegen cap: entries compiled
    before the cap existed live under a different key and are never
    loaded."""
    import hashlib
    import platform

    bits = ["avx2cap", platform.machine(), platform.processor()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    bits.append(line.strip())
                    if len(bits) >= 5:
                        break
    except OSError:
        pass
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:12]


def enable_cpu_cache() -> None:
    """Persistent compilation cache for the CPU backend, keyed per machine.

    CPU AOT executables bake in host ISA features (enable() refuses them for
    that reason — the axon tunnel compiles on a different host than it
    executes). Here the key pins the cache to THIS machine's CPU, which is
    safe: the test suite compiles and runs on the same host. Cuts repeat
    suite runs from minutes of XLA compiles to cache loads. Codegen is
    capped at AVX2 (cap_cpu_isa) so entries survive this VM migrating
    between fleet hosts; the cap is baked into the cache key.
    """
    global _enabled
    if _enabled or os.environ.get("ROVR_NO_COMPILE_CACHE") == "1":
        return
    cap_cpu_isa()
    import jax

    path = os.path.join(
        os.path.expanduser("~/.cache/rovr_tpu"), f"xla-cpu-{_machine_key()}"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
