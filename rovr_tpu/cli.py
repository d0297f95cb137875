"""Command-line entry points for every ROVR-TPU workload.

Replaces the reference's entry scripts (SURVEY.md §2.12): `rovr/test.py`
(the RL training driver, argparse flags --vid_length --time_steps
--n_updates_per_ppo, test.py:12-16), `rovr/train_local_net_unet.py` and
`rovr/imitation_learning.py` (no flags, run top-to-bottom at import), and
the empty `rovr/test_frames.py`. One `python -m rovr_tpu <cmd>` with
subcommands and a full flag surface over the config tree; GPUtil device
selection (test.py:25-32) becomes mesh construction over jax.devices().
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from typing import List, Optional

from rovr_tpu.config import Config


def _base_parser(p: argparse.ArgumentParser) -> None:
    p.add_argument("--root_folder", type=str, default=None,
                   help="frame-folder dataset root (default: synthetic clips)")
    p.add_argument("--run_dir", type=str, default="runs")
    p.add_argument("--restore_from", type=str, default=None,
                   help="checkpoint dir to resume from (replaces the "
                        "reference's hardcoded paths, rovr.py:38-42)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug_short_dataset", action="store_true",
                   help="truncate the dataset to 10 items "
                        "(video_ds_explicit.py:33-34)")


def _apply_base(cfg: Config, args) -> Config:
    data = dataclasses.replace(
        cfg.data,
        root_folder=args.root_folder or cfg.data.root_folder,
        debug_short_dataset=args.debug_short_dataset,
    )
    run = dataclasses.replace(
        cfg.run, run_dir=args.run_dir, restore_from=args.restore_from,
        seed=args.seed,
    )
    return cfg.replace(data=data, run=run)


def _dataset(cfg: Config, args, explicit: bool = True):
    """Folder dataset when --root_folder exists on disk; None otherwise, so
    the workload drivers fall back to the on-device synthetic source
    (data/device_synthetic.py)."""
    import os

    from rovr_tpu.data.dataset import ExplicitVideoDataset, VideoFolderDataset

    if args.root_folder and os.path.isdir(args.root_folder):
        ds = ExplicitVideoDataset if explicit else VideoFolderDataset
        return ds(cfg.data, seed=cfg.run.seed)
    return None


def cmd_rl(argv: List[str]) -> int:
    """RL training (the reference's `python test.py`, test.py:12-16)."""
    p = argparse.ArgumentParser("rovr_tpu rl")
    p.add_argument("--vid_length", type=int, default=20)
    p.add_argument("--time_steps", type=int, default=20)
    p.add_argument("--n_updates_per_ppo", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=1,
                   help="clips per step (reference pinned to 1, test.py:18)")
    p.add_argument("--use_policy1", action="store_true",
                   help="revive the frame-selection policy + LSTM path")
    p.add_argument("--ppo_policy1", action="store_true",
                   help="also TRAIN pi1/V1 with PPO (the MDP the reference "
                        "declares but ships unreachable, rovr.py:282-283); "
                        "implies the Episode/coverage readout")
    p.add_argument("--context_policy", choices=("canvas", "attention"),
                   default="canvas",
                   help="context policy: canvas=PolicyNet2 (reference main "
                        "path), attention=transformer over frame tokens "
                        "(long-clip config 5)")
    p.add_argument("--sequential_baseline", action="store_true",
                   help="also run the no-grad vid2vid baseline per step "
                        "(rovr.py:164-175; observational, costs a second "
                        "UNet pass)")
    p.add_argument("--iterations", type=int, default=400,
                   help="hard stop (test.py:75-76)")
    p.add_argument("--warm_start", type=str, default=None,
                   help="directory written by `rovr_tpu convert` (or "
                        "utils.convert.save_converted); its trees plug into "
                        "init_state, replacing the reference's hardcoded "
                        "warm-start checkpoint loads (rovr.py:37-42)")
    _base_parser(p)
    args = p.parse_args(argv)

    cfg = _apply_base(Config(), args)
    cfg = cfg.replace(
        rl=dataclasses.replace(
            cfg.rl,
            vid_length=args.vid_length,
            time_steps=args.time_steps,
            n_updates_per_ppo=args.n_updates_per_ppo,
            batch_size=args.batch_size,
            use_policy1=args.use_policy1 or args.ppo_policy1,
            ppo_policy1=args.ppo_policy1,
            context_policy=args.context_policy,
            sequential_baseline=args.sequential_baseline,
        ),
        data=dataclasses.replace(cfg.data, vid_length=args.vid_length),
    )

    from rovr_tpu.train import rl

    init_params = None
    if args.warm_start:
        from rovr_tpu.utils import convert

        loaded = convert.load_converted(args.warm_start) or {}
        supported = {
            "local_net_params", "vp_params", "actor2_params", "lpips_params",
            "critic2_params", "actor1_params", "vp_backbone_params",
        }
        init_params = {k: v for k, v in loaded.items() if k in supported}
        for k in sorted(set(loaded) - supported):
            print(f"[warm_start] skipping {k} (no init_state kwarg)")
        print(f"[warm_start] plugging in: {sorted(init_params)}")

    def log(i, m):
        print(f"[rl {i}] " + " ".join(f"{k}={float(v):.4f}" for k, v in m.items()))

    rl.run(cfg, dataset=_dataset(cfg, args), iterations=args.iterations,
           log_cb=log, init_params=init_params)
    return 0


def cmd_pretrain(argv: List[str]) -> int:
    """Local-net UNet pretraining (train_local_net_unet.py)."""
    p = argparse.ArgumentParser("rovr_tpu pretrain")
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--lr", type=float, default=1e-4)
    _base_parser(p)
    args = p.parse_args(argv)
    cfg = _apply_base(Config(), args)
    cfg = cfg.replace(
        pretrain=dataclasses.replace(
            cfg.pretrain, steps=args.steps, batch_size=args.batch_size, lr=args.lr
        )
    )

    from rovr_tpu.train import pretrain_local

    def log(i, m):
        print(f"[pretrain {i}] " + " ".join(f"{k}={float(v):.4f}" for k, v in m.items()))

    pretrain_local.run(cfg, steps=args.steps, log_cb=log)
    return 0


def cmd_imitate(argv: List[str]) -> int:
    """Imitation warm start of π₂ (imitation_learning.py)."""
    p = argparse.ArgumentParser("rovr_tpu imitate")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=2e-4)
    _base_parser(p)
    args = p.parse_args(argv)
    cfg = _apply_base(Config(), args)
    cfg = cfg.replace(
        imitation=dataclasses.replace(cfg.imitation, steps=args.steps, lr=args.lr)
    )

    from rovr_tpu.train import imitation

    def log(i, m):
        print(f"[imitate {i}] " + " ".join(f"{k}={float(v):.4f}" for k, v in m.items()))

    imitation.run(cfg, dataset=_dataset(cfg, args), steps=args.steps, log_cb=log)
    return 0


def cmd_eval(argv: List[str]) -> int:
    """Reconstruction eval: agentic vs sequential flow recovery (the poster's
    headline metric, BASELINE.md)."""
    p = argparse.ArgumentParser("rovr_tpu eval")
    p.add_argument("--num_videos", type=int, default=20,
                   help="rollouts to average (poster uses 20)")
    p.add_argument("--vid_length", type=int, default=20)
    p.add_argument("--flow_size", type=int, default=256)
    p.add_argument("--warm_start", type=str, default=None,
                   help="directory written by `rovr_tpu convert`: its "
                   "lpips_params/raft_params become the metric nets (the "
                   "only way the poster-comparison numbers print without "
                   "--force) and any model trees plug into init_state")
    p.add_argument("--force", action="store_true",
                   help="print the weight-dependent poster-comparison "
                   "metrics (flow_recovery_*, lpips_*) even under random "
                   "metric weights")
    _base_parser(p)
    args = p.parse_args(argv)
    cfg = _apply_base(Config(), args)
    cfg = cfg.replace(
        rl=dataclasses.replace(
            cfg.rl, vid_length=args.vid_length, time_steps=args.vid_length
        ),
        data=dataclasses.replace(cfg.data, vid_length=args.vid_length),
    )

    from rovr_tpu.train import evaluate

    # Metric-weight provenance is DERIVED by evaluate.run from what is
    # actually loaded here — there is no flag to declare it (a declared
    # 'converted' used to clear the honesty mark on random-weight results).
    init_params = raft_params = None
    if args.warm_start:
        from rovr_tpu.utils import convert

        loaded = convert.load_converted(args.warm_start) or {}
        raft_params = loaded.pop("raft_params", None)
        supported = {
            "local_net_params", "vp_params", "actor2_params", "lpips_params",
            "critic2_params", "actor1_params", "vp_backbone_params",
        }
        init_params = {k: v for k, v in loaded.items() if k in supported}
        for k in sorted(set(loaded) - supported):
            print(f"[warm_start] skipping {k} (no init_state kwarg)")
        print(
            "[warm_start] plugging in: "
            + ", ".join(sorted(init_params)
                        + (["raft_params"] if raft_params is not None else []))
        )

    means = evaluate.run(
        cfg, dataset=_dataset(cfg, args), num_videos=args.num_videos,
        flow_size=args.flow_size, init_params=init_params,
        raft_params=raft_params,
    )
    # Refuse to print poster-comparison numbers computed with random metric
    # weights (VGG-LPIPS/RAFT untrained: the values exercise plumbing only
    # and must not masquerade as the poster's 47.8%/65.4%). The programmatic
    # API (evaluate.run) still returns every key; the gate keys off the
    # authoritative self-mark run() derived from what it actually loaded.
    withheld = []
    untrusted = (
        means.get("Eval/metric_weights_random", 1.0) == 1.0 and not args.force
    )
    for k, v in sorted(means.items()):
        if untrusted and ("flow_recovery" in k or "/lpips" in k):
            withheld.append(k)
            continue
        print(f"{k}: {v:.4f}")
    if withheld:
        print(
            f"[rovr_tpu.eval] {len(withheld)} weight-dependent metrics "
            "withheld (random VGG/RAFT weights; not poster-comparable). "
            "Pass --force to print them, or load real converted weights "
            "via --warm_start (rovr_tpu convert --kind vgg_lpips/raft)."
        )
    return 0


def cmd_pipeline(argv: List[str]) -> int:
    """Full learning pipeline: pretrain -> imitate -> RL -> held-out eval
    (the reference's three scripts chained by hand-edited checkpoint paths,
    rovr.py:37-42, as one driver with parameters threaded by argument)."""
    p = argparse.ArgumentParser("rovr_tpu pipeline")
    p.add_argument("--pretrain_steps", type=int, default=2000)
    p.add_argument("--imitation_steps", type=int, default=600,
                   help="teacher accuracy saturates at ~step 400 at the "
                        "default scale; training far past saturation makes "
                        "the warm start MEMORIZE its clips — its greedy "
                        "held-out readout then falls below the random-"
                        "policy control (measured: results/"
                        "probe_imit1500_r4.json vs probe_repro_r4.json)")
    p.add_argument("--rl_iterations", type=int, default=300)
    p.add_argument("--policy1_iterations", type=int, default=0,
                   help="Stage 5: also PPO-train the frame-selection policy "
                        "pi1 for this many iterations (0 = skip); the "
                        "coverage-learning demo of the MDP the reference "
                        "declares but ships unreachable (rovr.py:282-283)")
    p.add_argument("--ppo_from_random_iterations", type=int, default=0,
                   help="Stage 3b: also PPO-train a RANDOM (un-warm-started)"
                        " pi2 for this many iterations and evaluate it — "
                        "with eval_warm_start_only this isolates PPO's own "
                        "contribution (record['ppo_ablation'])")
    p.add_argument("--eval_videos", type=int, default=20)
    p.add_argument("--eval_ci_clips", type=int, default=100,
                   help="Stage 4b: variance-proofed CI eval — per-clip "
                        "metrics over this many held-out clips per arm, "
                        "greedy + K-draw sampled readouts, paired 95%% CIs "
                        "between arms (record['ablation_ci']); 0 disables")
    p.add_argument("--eval_ci_draws", type=int, default=8,
                   help="sampled-readout draws per clip for the CI eval")
    p.add_argument("--vid_length", type=int, default=20)
    p.add_argument("--rl_batch", type=int, default=4)
    p.add_argument("--texture", type=float, default=1.0,
                   help="mid-frequency texture blend for synthetic clips "
                        "(makes context selection learnable; 1.0 = fully "
                        "textured, the pipeline.run default)")
    p.add_argument("--texture_vel", type=float, default=0.0,
                   help="texture drift px/frame (0 = static, exact copy)")
    p.add_argument("--log_spatio", action="store_true",
                   help="compute + log the RAFT flow-recovery 'spatio' "
                        "signal every RL train step (the reference computes "
                        "it every episode, rovr.py:234-243; logged only, "
                        "not added to rewards — see cfg.rl.use_spatio_reward)")
    p.add_argument("--out", type=str, default=None,
                   help="write the full metric record (JSON) here")
    _base_parser(p)
    args = p.parse_args(argv)

    from rovr_tpu.train import pipeline

    cfg = _apply_base(
        pipeline.default_config(args.vid_length, args.rl_batch), args
    )
    pipeline.run(
        cfg,
        pretrain_steps=args.pretrain_steps,
        imitation_steps=args.imitation_steps,
        rl_iterations=args.rl_iterations,
        policy1_iterations=args.policy1_iterations,
        ppo_from_random_iterations=args.ppo_from_random_iterations,
        eval_videos=args.eval_videos,
        eval_ci_clips=args.eval_ci_clips,
        eval_ci_draws=args.eval_ci_draws,
        texture=args.texture,
        texture_vel=args.texture_vel,
        log_spatio=args.log_spatio,
        out_path=args.out,
    )
    return 0


def cmd_reconstruct(argv: List[str]) -> int:
    """Inference: reconstruct corrupted clips with a trained checkpoint and
    write frames in the reference's dataset layout (video_ds.py:104). The
    reference ships no inference entry point at all — its only model
    consumer is the training loop."""
    p = argparse.ArgumentParser("rovr_tpu reconstruct")
    p.add_argument("--num_clips", type=int, default=4)
    p.add_argument("--vid_length", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--context_policy", choices=("canvas", "attention"),
                   default="canvas")
    p.add_argument("--out", type=str, default="reconstructed")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard the clip batch over this many devices "
                        "(0 = single device); batch_size must divide by it")
    _base_parser(p)
    args = p.parse_args(argv)
    cfg = _apply_base(Config(), args)
    cfg = cfg.replace(
        rl=dataclasses.replace(
            cfg.rl, vid_length=args.vid_length, time_steps=args.vid_length,
            batch_size=args.batch_size, context_policy=args.context_policy,
        ),
        data=dataclasses.replace(cfg.data, vid_length=args.vid_length),
    )

    from rovr_tpu import infer

    mesh = None
    if args.data_parallel > 1:
        import jax

        from rovr_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        if args.data_parallel > n:
            p.error(f"--data_parallel {args.data_parallel} > {n} devices")
        if args.batch_size % args.data_parallel:
            p.error(
                f"--batch_size {args.batch_size} not divisible by "
                f"--data_parallel {args.data_parallel}"
            )
        mesh = make_mesh(devices=jax.devices()[: args.data_parallel])

    summary = infer.run(
        cfg, restore_from=args.restore_from,
        dataset=_dataset(cfg, args, explicit=False),
        num_clips=args.num_clips, out_dir=args.out, mesh=mesh,
    )
    for k, v in summary.items():
        print(f"{k}: {v}")
    return 0


def cmd_convert(argv: List[str]) -> int:
    """Migrate reference/torch checkpoints into framework warm starts.

    Kinds map to the reference's checkpoint producers: local_net (UNet
    pretrain, train_local_net_unet.py:120-127), policy2 (imitation,
    imitation_learning.py:102-108), policy1, rovr (the full RL state,
    test.py:88-93), plus the pretrained metric nets the no-egress
    environment can't download (torchvision resnet50 / raft_small, pip
    lpips VGG). Output loads back via `--warm_start` on the rl command or
    utils.convert.load_converted()."""
    from rovr_tpu.utils import convert

    p = argparse.ArgumentParser("rovr_tpu convert")
    p.add_argument("--kind", choices=convert.KINDS, required=True)
    p.add_argument("--ckpt", type=str, required=True,
                   help="torch .pt/.pth checkpoint or state-dict file")
    p.add_argument("--out", type=str, required=True,
                   help="output directory (Orbax checkpoint)")
    args = p.parse_args(argv)

    init_params, report = convert.convert_reference_checkpoint(
        args.kind, args.ckpt
    )
    for name in report["converted"]:
        print(f"[convert] converted: {name}")
    for note in report["skipped"]:
        print(f"[convert] skipped: {note}")
    if not init_params:
        print("[convert] nothing converted — wrong --kind for this file?")
        return 1
    path = convert.save_converted(args.out, init_params)
    print(f"[convert] written to {path}")
    return 0


COMMANDS = {
    "rl": cmd_rl,
    "pretrain": cmd_pretrain,
    "imitate": cmd_imitate,
    "eval": cmd_eval,
    "pipeline": cmd_pipeline,
    "reconstruct": cmd_reconstruct,
    "convert": cmd_convert,
}


def main(argv: Optional[List[str]] = None) -> int:
    from rovr_tpu.utils.compilation_cache import enable as enable_compile_cache

    enable_compile_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m rovr_tpu {" + ",".join(COMMANDS) + "} [flags]")
        print(__doc__)
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd}; choose from {list(COMMANDS)}")
        return 2
    return COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
