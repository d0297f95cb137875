"""Executed-FLOPs counter for the RL train step (bench.py's mfu_hand).

XLA's compiled cost analysis counts each lax.scan / lax.map body ONCE
regardless of trip count (verified in docs/performance.md "MFU as a
FLOOR"), so the bench step's 20-iteration rollout scan, 5-epoch PPO scan,
and lax.map-chunked episode init make the cost-model MFU read severalfold
low. This script lowers the IDENTICAL step (bench.build_cfg) with
cfg.rl.unroll_scans=True — every iteration visible in the HLO — on the CPU
backend with abstract (ShapeDtypeStruct) inputs, so nothing executes and
no TPU is touched, and prints one JSON line {"flops": N}.

Usage: python benchmarks/count_flops.py '{"profile": "default",
"batch": 24, "vid_length": 20}'
"""

from __future__ import annotations

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import dataclasses

    import jax.numpy as jnp

    import bench
    from rovr_tpu.train import rl

    args = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    cfg = bench.build_cfg(
        args.get("profile", "default"),
        int(args.get("batch", 24)),
        int(args.get("vid_length", 20)),
    )
    cfg = cfg.replace(rl=dataclasses.replace(cfg.rl, unroll_scans=True))

    mods = rl.make_modules(cfg)
    rng = jax.random.PRNGKey(0)
    # Abstract state: eval_shape runs no compute, so full-scale params cost
    # nothing to "build" here.
    state = jax.eval_shape(lambda k: rl.init_state(cfg, mods, k), rng)
    b, s = cfg.rl.batch_size, cfg.rl.vid_length
    h, w = cfg.data.frame_size
    vid = jax.ShapeDtypeStruct((b, s, h, w, 3), jnp.float32)
    lowered = rl.train_step.lower(state, mods, cfg, vid, vid, rng)
    ca = lowered.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    print(json.dumps({"flops": float(ca["flops"])}))


if __name__ == "__main__":
    main()
