"""Benchmark: full ROVR RL train step throughput on one chip.

Measures the flagship workload — one fully-jitted RL training step
(H2D transfer -> policy rollout -> UNet reconstruct -> LPIPS reward ->
rewards-to-go -> 5 PPO epochs) at the reference's configuration
(20 frames of 3x256x256 per clip, 20 rollout steps; SURVEY.md §6) and
prints ONE JSON line:

  {"metric": "rl_train_frames_per_sec", "value": N, "unit": "frames/sec",
   "vs_baseline": N}

vs_baseline is the ratio against the Torch-CPU twin of the same step
(benchmarks/torch_baseline.py, cached in benchmarks/torch_cpu_baseline.json).
The north-star target is >=5x (BASELINE.json).

Env knobs: BENCH_BATCH (clips per step, default 8 — the reference is pinned
to batch 1, test.py:18; batching clips is a core TPU design win: measured
869 f/s @4, ~990 f/s @8 [MFU 0.46], collapse to 575 @16 when activations
outgrow HBM and XLA starts rematerializing), BENCH_STEPS (timed steps,
default 3), BENCH_VID_LENGTH (default 20).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "3"))
    vid_length = int(os.environ.get("BENCH_VID_LENGTH", "20"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rovr_tpu.utils.compilation_cache import enable as enable_compile_cache

    enable_compile_cache()

    from rovr_tpu.config import Config
    from rovr_tpu.data import synthetic
    from rovr_tpu.train import rl

    import dataclasses

    cfg = Config()
    cfg = cfg.replace(
        rl=dataclasses.replace(
            cfg.rl, vid_length=vid_length, time_steps=vid_length,
            batch_size=batch,
        ),
        data=dataclasses.replace(cfg.data, vid_length=vid_length),
    )

    rng = jax.random.PRNGKey(0)
    mods = rl.make_modules(cfg)
    state = rl.init_state(cfg, mods, rng)

    # a few distinct host batches, cycled through device_put each step so the
    # H2D boundary is inside the timed region
    h, w = cfg.data.frame_size
    host_batches = []
    for i in range(2):
        clips = [
            synthetic.synthetic_batch(i * 97 + j, vid_length, h, w)
            for j in range(batch)
        ]
        video = np.stack([c[0] for c in clips])
        org = np.stack([c[1] for c in clips])
        host_batches.append((video, org))

    def one_step(state, i, key):
        video, org = host_batches[i % len(host_batches)]
        st, metrics, _ = rl.train_step_donated(
            state, mods, cfg, jnp.asarray(video), jnp.asarray(org), key
        )
        jax.block_until_ready(metrics)
        return st

    # warmup / compile
    keys = jax.random.split(rng, steps + 1)
    state = one_step(state, 0, keys[0])

    t0 = time.perf_counter()
    for i in range(steps):
        state = one_step(state, i + 1, keys[i + 1])
    dt = (time.perf_counter() - t0) / steps
    fps = batch * vid_length / dt

    # MFU from XLA's own cost model: flops of the compiled step executable
    # over achieved step time and the chip's peak bf16 throughput.
    flops = mfu = None
    try:
        video0, org0 = host_batches[0]
        compiled = rl.train_step.lower(
            state, mods, cfg, jnp.asarray(video0), jnp.asarray(org0), keys[0]
        ).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
        peak = {
            # dense peak FLOP/s (bf16) per chip
            "TPU v4": 275e12, "TPU v5 lite": 197e12, "TPU v5e": 197e12,
            "TPU v5": 459e12, "TPU v5p": 459e12, "TPU v6e": 918e12,
            "TPU v6 lite": 918e12,
        }.get(jax.devices()[0].device_kind)
        if flops and peak:
            mfu = flops / dt / peak
    except Exception:
        pass

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "torch_cpu_baseline.json",
    )
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            torch_fps = json.load(f)["frames_per_sec"]
        vs = fps / torch_fps

    print(json.dumps({
        "metric": "rl_train_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "detail": {
            "sec_per_step": round(dt, 4),
            "batch": batch,
            "vid_length": vid_length,
            "device": str(jax.devices()[0]).split("(")[0],
            "torch_cpu_frames_per_sec": round(torch_fps, 4) if vs else None,
            "flops_per_step": flops,
            "mfu": round(mfu, 4) if mfu is not None else None,
        },
    }))


if __name__ == "__main__":
    main()
