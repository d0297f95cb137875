"""Sustained RL train throughput through the REAL disk data path.

Closes the "inputs device-resident" asterisk on bench.py's headline: drives
the full production pipeline — PNG frame tree on disk -> VideoFolderDataset
(native C++ decode + corruption) -> DevicePrefetcher worker threads ->
uint8 H2D staging -> rl.train_step_donated — for N sustained steps, exactly
the loop rl.run executes (train/rl.py `batches()`), and decomposes where
the time goes. The reference's equivalent path is DataLoader(num_workers=32)
-> .to(device) -> ROVR.train (reference: rovr/test.py:39-76).

Phases measured (each reported separately in the JSON):
  * decode:   host-side items/s through the prefetcher alone (no TPU) —
              this box has ONE CPU core, so decode parallelism is nil and
              this is the environment's binding constraint; the reference
              assumed a 32-process host.
  * h2d:      staging bandwidth of one uint8 batch through the axon tunnel
              (an environment artifact — a PCIe gen4 host moves the same
              bytes in ~6 ms).
  * compute:  device-resident chained-step time (bench.py methodology) for
              the same config, measured in-process for apples-to-apples.
  * sustained: the real loop, prefetcher running WHILE the TPU trains, so
              decode overlaps compute; per-step wall times reported.

The projection field answers the question the measurement is for: with
decode and staging fully overlapped (enough cores + PCIe), the sustained
step time collapses to max(compute, decode/workers, staging) — on any
normal TPU host that is `compute`.

Run:  python benchmarks/sustained_bench.py [--steps 8] [--batch 24]
      [--folders 24] [--tree /tmp/rovr_frame_tree] [--regen]
Writes results/sustained_bench.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tree(root: str, folders: int, frames: int = 50,
               size=(512, 1024)) -> None:
    """Frame tree at reference layout: root/<clip>/<frame>.png, 50 frames
    per clip (video_ds.py:104), 1024x512 source frames. Content is cheap
    structured synthetic (gradients + a moving box) so PNG encode/decode do
    realistic work without an external dataset (no egress)."""
    import cv2

    h, w = size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for c in range(folders):
        d = os.path.join(root, f"clip{c:04d}")
        os.makedirs(d, exist_ok=True)
        base = np.stack(
            [
                (xx / w * 255),
                (yy / h * 255),
                ((xx + yy) / (w + h) * 200 + 27 * (c % 3)),
            ],
            axis=-1,
        )
        rng = np.random.default_rng(c)
        noise = rng.integers(0, 28, (h, w, 3)).astype(np.float32)
        for f in range(frames):
            img = base + noise
            # moving box so consecutive frames differ like video
            bx = int((f / frames) * (w - 160))
            by = int((c % 5) / 5 * (h - 120))
            img[by : by + 120, bx : bx + 160] = (40.0, 200.0, 120.0)
            cv2.imwrite(
                os.path.join(d, f"{f:05d}.png"),
                img.clip(0, 255).astype(np.uint8),
            )


def main() -> None:
    p = argparse.ArgumentParser()
    # >= 16 steady-state steps: the r4 8-step sample swung 5.1-20.3 s
    # per step (tunnel H2D jitter), too coarse for a load-bearing number
    # (VERDICT r4 #7); the headline is now the MEDIAN step with the full
    # spread reported.
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--vid_length", type=int, default=20)
    p.add_argument("--folders", type=int, default=24)
    p.add_argument("--tree", default="/tmp/rovr_frame_tree")
    p.add_argument("--regen", action="store_true")
    p.add_argument("--compute_steps", type=int, default=4)
    args = p.parse_args()

    if args.regen or not os.path.isdir(args.tree) or not os.listdir(args.tree):
        os.makedirs(args.tree, exist_ok=True)
        t0 = time.perf_counter()
        build_tree(args.tree, args.folders)
        print(f"[tree] built {args.folders} clips in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from rovr_tpu.utils.compilation_cache import enable as enable_cc

    enable_cc()

    from bench import build_cfg  # same flagship config as the headline bench
    from rovr_tpu.data.dataset import DevicePrefetcher, VideoFolderDataset
    from rovr_tpu.train import rl
    from rovr_tpu.utils.transfer import tunnel_sync as sync

    cfg = build_cfg("default", args.batch, args.vid_length)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, root_folder=args.tree, stage_uint8=True
        )
    )
    b, s = args.batch, args.vid_length
    dataset = VideoFolderDataset(cfg.data)
    n_items = args.steps * b

    # --- phase 1: host decode throughput (prefetcher alone, device idle)
    pf = DevicePrefetcher(
        dataset, indices=[i % len(dataset) for i in range(n_items)],
        num_workers=cfg.data.num_workers,
        depth=max(2, cfg.data.prefetch_depth * b), to_device=False,
    )
    it = iter(pf)
    first = next(it)  # pipeline warm (thread spin-up, file cache)
    t0 = time.perf_counter()
    items = [next(it) for _ in range(b)]
    decode_s_per_item = (time.perf_counter() - t0) / b
    pf.close()
    decode_fps = s / decode_s_per_item

    # --- phase 2: H2D staging bandwidth of one uint8 batch
    video_np = np.stack([x[0][:s] for x in items])
    org_np = np.stack([x[1][:s] for x in items])
    bytes_per_step = video_np.nbytes + org_np.nbytes
    probe = jax.jit(lambda a, o: jnp.sum(a.astype(jnp.float32))
                    + jnp.sum(o.astype(jnp.float32)))
    float(probe(jax.device_put(video_np), jax.device_put(org_np)))  # warm
    t0 = time.perf_counter()
    float(probe(jax.device_put(video_np), jax.device_put(org_np)))
    h2d_s = time.perf_counter() - t0
    h2d_mb_s = bytes_per_step / h2d_s / 1e6

    # --- phase 3: device-resident compute (bench.py chained methodology)
    mods = rl.make_modules(cfg)
    rng = jax.random.PRNGKey(0)
    state = rl.init_state(cfg, mods, rng)
    video_dev = jnp.asarray(video_np)
    org_dev = jnp.asarray(org_np)
    keys = jax.random.split(rng, args.compute_steps + 1)
    state, metrics, _ = rl.train_step_donated(
        state, mods, cfg, video_dev, org_dev, keys[0]
    )
    sync(metrics)
    t0 = time.perf_counter()
    for i in range(args.compute_steps):
        state, metrics, _ = rl.train_step_donated(
            state, mods, cfg, video_dev, org_dev, keys[i + 1]
        )
    sync(metrics)
    compute_s = (time.perf_counter() - t0) / args.compute_steps

    # --- phase 4: the sustained loop — rl.run's exact batch assembly, with
    # the prefetcher decoding WHILE the device trains
    pf = DevicePrefetcher(
        dataset, indices=[i % len(dataset) for i in range(n_items)],
        num_workers=cfg.data.num_workers,
        depth=max(2, cfg.data.prefetch_depth * b), to_device=False,
    )
    it = iter(pf)
    step_times = []
    keys = jax.random.split(jax.random.PRNGKey(1), args.steps)
    t_start = time.perf_counter()
    for i in range(args.steps):
        t0 = time.perf_counter()
        items = [next(it) for _ in range(b)]
        video = jnp.asarray(np.stack([x[0][:s] for x in items]))
        org = jnp.asarray(np.stack([x[1][:s] for x in items]))
        state, metrics, _ = rl.train_step_donated(
            state, mods, cfg, video, org, keys[i]
        )
        if i == 0:
            sync(metrics)  # exclude any residual compile from steady state
            t_start = time.perf_counter()
        step_times.append(time.perf_counter() - t0)
    sync(metrics)
    pf.close()
    sustained_s = (time.perf_counter() - t_start) / max(1, args.steps - 1)
    # steady-state per-step distribution (step 0 carries residual compile
    # and pipeline warmup; excluded). Median is the headline: robust to the
    # tunnel's run-to-run H2D swings that dominated the r4 8-step sample.
    steady = sorted(step_times[1:]) or step_times
    sustained_s_median = steady[len(steady) // 2]
    sustained_fps = b * s / sustained_s_median

    # what a non-tunnel, multi-core host would sustain: staging at PCIe
    # gen4 (~16 GB/s) and decode spread over the reference's 32 workers
    proj_stage_s = bytes_per_step / 16e9
    proj_decode_s = decode_s_per_item * b / 32
    projected_s = max(compute_s, proj_decode_s, proj_stage_s)

    out = {
        "metric": "rl_sustained_frames_per_sec",
        "value": round(sustained_fps, 3),
        "unit": "frames/sec",
        "detail": {
            "sec_per_step_sustained_median": round(sustained_s_median, 4),
            "sec_per_step_sustained_mean": round(sustained_s, 4),
            "sec_per_step_spread": [
                round(steady[0], 3), round(steady[-1], 3)
            ],
            "sec_per_step_compute_device_resident": round(compute_s, 4),
            "sec_per_step_steady_state_overhead": round(
                sustained_s_median - compute_s, 4
            ),
            "step_times": [round(t, 3) for t in step_times],
            "decode_sec_per_item_1core": round(decode_s_per_item, 4),
            "decode_frames_per_sec_host": round(decode_fps, 2),
            "h2d_mb_per_s_uint8": round(h2d_mb_s, 1),
            "bytes_per_step_uint8": bytes_per_step,
            "batch": b,
            "vid_length": s,
            "steps": args.steps,
            "tree_folders": args.folders,
            "native_decode": bool(cfg.data.use_native_loader),
            "host_cores": os.cpu_count(),
            "projected_sec_per_step_pcie_host_32workers": round(
                projected_s, 4
            ),
            "projected_binding_term": (
                "compute" if projected_s == compute_s
                else ("decode" if projected_s == proj_decode_s else "h2d")
            ),
        },
    }
    os.makedirs(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results"), exist_ok=True,
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "sustained_bench.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
