"""Episode-init overlap experiment (VERDICT r2 "what's weak" #3 / next #4).

The batch-24 step decomposition (docs/performance.md) shows ~0.40 s of
1.19 s is episode init (per-frame LPIPS baseline + canvas encode) — fixed
cost independent of the previous step's PPO. The hypothesis to test:
double-buffering batch i+1's init against batch i's rollout+PPO recovers
some of that time.

Two arms, identical math, honest chained-steps + device_get timing
(bench.py methodology — block_until_ready returns at enqueue over the
axon tunnel):

  baseline  — rl.train_step_donated: one program computes init+rollout+PPO
              for its own batch.
  pipelined — rl.train_step_pipelined: one program consumes batch i's
              precomputed init, runs rollout+PPO, and computes batch i+1's
              init; XLA may schedule the (PPO, next-init) independent
              subgraphs in any order.

Usage: python benchmarks/overlap_bench.py [batch] [steps]
Prints one JSON line with both step times.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    vid_length = int(os.environ.get("BENCH_VID_LENGTH", "20"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rovr_tpu.utils.compilation_cache import enable as enable_compile_cache

    enable_compile_cache()

    from bench import build_cfg

    from rovr_tpu.data import synthetic
    from rovr_tpu.train import rl
    from rovr_tpu.utils.transfer import tunnel_sync as sync

    cfg = build_cfg("default", batch, vid_length)
    rng = jax.random.PRNGKey(0)
    mods = rl.make_modules(cfg)

    h, w = cfg.data.frame_size
    dev_batches = []
    for i in range(2):
        clips = [
            synthetic.synthetic_batch(i * 97 + j, vid_length, h, w)
            for j in range(batch)
        ]
        dev_batches.append((
            jnp.asarray(np.stack([c[0] for c in clips])),
            jnp.asarray(np.stack([c[1] for c in clips])),
        ))
    keys = jax.random.split(rng, 2 * (steps + 1))

    def timed(step_fn, warm_state, *warm_extra):
        """Chained N steps; returns (s/step, final extras)."""
        carry = step_fn(warm_state, 0, keys[0], *warm_extra)
        sync(carry[1])
        t0 = time.perf_counter()
        for i in range(steps):
            carry = step_fn(carry[0], i + 1, keys[i + 1], *carry[2:])
        sync(carry[1])
        return (time.perf_counter() - t0) / steps

    results = {}

    # --- baseline arm ---
    state = rl.init_state(cfg, mods, jax.random.PRNGKey(1))

    def base_step(state, i, key):
        video, org = dev_batches[i % 2]
        new_state, metrics, _ = rl.train_step_donated(
            state, mods, cfg, video, org, key
        )
        return new_state, metrics

    dt = timed(base_step, state)
    results["baseline_s_per_step"] = round(dt, 4)
    results["baseline_frames_per_s"] = round(batch * vid_length / dt, 1)

    # --- pipelined arm ---
    state = rl.init_state(cfg, mods, jax.random.PRNGKey(1))
    try:
        init0 = rl.episode_init_jit(state, mods, cfg, *dev_batches[0])

        def pipe_step(state, i, key, init):
            video, org = dev_batches[i % 2]
            nxt_video, nxt_org = dev_batches[(i + 1) % 2]
            new_state, metrics, _, next_init = rl.train_step_pipelined(
                state, mods, cfg, init, video, org, nxt_video, nxt_org, key
            )
            return new_state, metrics, next_init

        dt = timed(pipe_step, state, init0)
        results["pipelined_s_per_step"] = round(dt, 4)
        results["pipelined_frames_per_s"] = round(batch * vid_length / dt, 1)
    except Exception as e:  # OOM / compile failure is itself the finding
        results["pipelined_error"] = f"{type(e).__name__}: {str(e)[:300]}"

    results.update(batch=batch, vid_length=vid_length, steps=steps,
                   device=str(jax.devices()[0]).split("(")[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
