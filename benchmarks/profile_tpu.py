"""Profile ONE full RL train step on the device and attribute its time.

Runs the flagship step (bench.py's workload) under `jax.profiler`, then
prints `utils.profiling.analyze_trace`'s per-source-line device-time table
plus the scan/while inclusive times — the op-level decomposition tool used
for the optimization record in docs/performance.md (reference has no
analog; its only tracing is CUDA memory prints, rovr/test.py:66).

Usage: python benchmarks/profile_tpu.py [batch] [logdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    logdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="rovrprof")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rovr_tpu.utils.compilation_cache import enable as enable_compile_cache

    enable_compile_cache()

    import bench
    from rovr_tpu.data import synthetic
    from rovr_tpu.train import rl
    from rovr_tpu.utils import profiling
    from rovr_tpu.utils.transfer import tunnel_sync as sync

    # bench.build_cfg so the profiled step matches bench.py exactly —
    # including the batch>=20 tap-cache knobs without which batch 24 OOMs.
    cfg = bench.build_cfg("default", batch, 20)
    rng = jax.random.PRNGKey(0)
    mods = rl.make_modules(cfg)
    state = rl.init_state(cfg, mods, rng)
    h, w = cfg.data.frame_size
    clips = [synthetic.synthetic_batch(j, 20, h, w) for j in range(batch)]
    video = jnp.asarray(np.stack([c[0] for c in clips]))
    org = jnp.asarray(np.stack([c[1] for c in clips]))
    keys = jax.random.split(rng, 8)

    state, metrics, _ = rl.train_step_donated(state, mods, cfg, video, org, keys[0])
    sync(metrics)
    t0 = time.perf_counter()
    for i in range(4):
        state, metrics, _ = rl.train_step_donated(
            state, mods, cfg, video, org, keys[i + 1]
        )
    sync(metrics)
    dt = (time.perf_counter() - t0) / 4
    print(f"batch {batch}: {dt:.4f} s/step, {batch * 20 / dt:.1f} frames/s")

    with profiling.trace(logdir):
        state, metrics, _ = rl.train_step_donated(
            state, mods, cfg, video, org, keys[6]
        )
        sync(metrics)
    print(f"trace: {logdir}")
    print(profiling.format_trace_report(profiling.analyze_trace(logdir)))


if __name__ == "__main__":
    main()
