"""Workload 2: reconstruction evaluation — agentic vs sequential sampling.

Parity target: the poster's "Global Network Results" headline metric
O = (φ(Γ(X̄)) − φ(X)) / (φ(X̄) − φ(X)) with φ = RAFT flow magnitude —
47.8% for sequential (vid2vid-style) sampling, 65.4% for ROVR agentic
sampling (BASELINE.md). The metric helper in the reference is
rovr/test.py:43-57 (`calculate_preservation`, unused but shipped) and the
flow bookkeeping is rovr/rovr.py:96-97,223-241.

TPU-native: the policy rollout reuses train/rl.rollout (one lax.scan, no
PPO), RAFT is instantiated ONCE (the reference re-instantiates the
pretrained model on every call, rovr.py:341-342), and all S-1 frame pairs of
all videos run as one batched RAFT call. PSNR/SSIM parity numbers ride along
from ops/metrics.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from rovr_tpu.config import Config
from rovr_tpu.models.raft import RAFTSmall, pairwise_flows, total_flow_magnitude
from rovr_tpu.ops.metrics import context_exposure, flow_recovery, psnr, ssim
from rovr_tpu.train import rl


class EvalModules(NamedTuple):
    rovr: rl.ROVRModules
    raft: RAFTSmall


def make_modules(cfg: Config, dtype=None, raft_iters: int = 12) -> EvalModules:
    return EvalModules(
        rovr=rl.make_modules(cfg, dtype=dtype),
        raft=RAFTSmall(iters=raft_iters, dtype=dtype or jnp.bfloat16),
    )


@functools.partial(jax.jit, static_argnums=(0, 2))
def init_raft_params(mods: EvalModules, rng, size: int = 64):
    x = jnp.zeros((1, size, size, 3))
    return mods.raft.init(rng, x, x)["params"]


@functools.partial(jax.jit, static_argnums=(2, 3, 5))
def eval_step(
    state: rl.ROVRState,
    raft_params,
    mods: EvalModules,
    cfg: Config,
    batch,
    flow_size: int = 256,
) -> Dict[str, jnp.ndarray]:
    """One fully-jitted eval pass over a clip batch.

    batch = (corrupted, original[, masks]) (B, S, H, W, 3). Returns the
    flow-recovery metric O for agentic and sequential sampling plus
    PSNR/SSIM/LPIPS; when masks ride along, also PSNR restricted to the
    masked (corrupted-away) region — the sharpest readout of context
    selection, since only a context frame that exposes the region can supply
    its content.
    """
    video, org_video, *rest = batch
    masks = rest[0] if rest else None
    # evaluation always runs the sequential baseline: the poster's headline
    # comparison is agentic vs sequential flow recovery (BASELINE.md)
    import dataclasses

    cfg = cfg.replace(
        rl=dataclasses.replace(
            cfg.rl, sequential_baseline=True, greedy=cfg.rl.eval_greedy
        )
    )
    out = rl.rollout(
        state, mods.rovr, cfg, video, org_video, jax.random.PRNGKey(cfg.run.seed)
    )

    def phi(v):
        flows = pairwise_flows(mods.raft, raft_params, v, size=flow_size)
        total, _ = total_flow_magnitude(flows)
        return total

    f_org = phi(org_video)
    f_bad = phi(video)
    f_agentic = phi(out.reconstructed)
    f_seq = phi(out.experimental)

    lp = rl.per_frame_lpips(
        mods.rovr, state.lpips_params, out.reconstructed, org_video
    )
    extra = {}
    if masks is not None:
        hole = 1.0 - masks  # 1 where the corruption removed content

        def masked_psnr(x):
            se = jnp.sum((x - org_video) ** 2 * hole, axis=(1, 2, 3, 4))
            mse = se / jnp.maximum(jnp.sum(hole, axis=(1, 2, 3, 4)), 1.0)
            return jnp.mean(-10.0 * jnp.log10(jnp.maximum(mse, 1e-10)))

        # Context-exposure rate (ops/metrics.context_exposure): the direct
        # readout of context-selection quality for agentic vs sequential.
        hole1 = hole[..., :1]  # (B, S, H, W, 1)
        s = video.shape[1]
        tgt_idx = out.traj.target_idx  # (T, B)
        seq_pairs = jnp.stack([(tgt_idx - 2) % s, (tgt_idx - 1) % s], axis=-1)
        extra = {
            "Eval/masked_psnr_agentic": masked_psnr(out.reconstructed),
            "Eval/masked_psnr_sequential": masked_psnr(out.experimental),
            "Eval/masked_psnr_corrupted": masked_psnr(video),
            "Eval/exposure_agentic": context_exposure(
                hole1, tgt_idx, out.traj.actions),
            "Eval/exposure_sequential": context_exposure(
                hole1, tgt_idx, seq_pairs),
        }
    return {
        **extra,
        "Eval/flow_recovery_agentic": jnp.mean(flow_recovery(f_agentic, f_org, f_bad)),
        "Eval/flow_recovery_sequential": jnp.mean(flow_recovery(f_seq, f_org, f_bad)),
        "Eval/psnr_agentic": jnp.mean(psnr(out.reconstructed, org_video)),
        "Eval/psnr_sequential": jnp.mean(psnr(out.experimental, org_video)),
        "Eval/psnr_corrupted": jnp.mean(psnr(video, org_video)),
        "Eval/ssim_agentic": jnp.mean(ssim(out.reconstructed, org_video)),
        "Eval/ssim_sequential": jnp.mean(ssim(out.experimental, org_video)),
        "Eval/lpips_agentic": jnp.mean(lp),
    }


def run(
    cfg: Optional[Config] = None,
    dataset=None,
    num_videos: int = 20,
    state: Optional[rl.ROVRState] = None,
    flow_size: int = 256,
    log_cb=None,
    data_texture: float = 0.0,
    data_texture_vel: float = 1.5,
    weights: Optional[str] = None,
    init_params: Optional[Dict[str, Any]] = None,
    raft_params=None,
) -> Dict[str, float]:
    """Evaluation driver: averages eval_step over `num_videos` rollouts
    (the poster averages over 20 rollouts, BASELINE.md).

    Metric-weight provenance is DERIVED from what was actually loaded, not
    declared: the metric nets count as converted only when `raft_params` was
    passed in AND `init_params` carries `lpips_params` (both produced by
    `rovr_tpu convert` / utils.convert.load_converted). Anything else is
    "random" (the no-egress default): the RAFT flow-recovery numbers then
    exercise the full metric plumbing but are NOT comparable to the poster's
    47.8%/65.4% — the result dict self-marks this (Eval/metric_weights_random
    plus the per-net Eval/{lpips,raft}_weights_random) and a warning is
    printed, so the numbers cannot silently masquerade as poster-parity
    (README "Known environment limits"). Passing `weights="converted"` when
    the derivation says random is rejected; `weights` otherwise only
    asserts the expectation.

    `init_params`: kwargs for rl.init_state when `state` is None — the
    warm-start path (local_net_params / vp_params / actor2_params /
    lpips_params / vp_backbone_params, rovr.py:37-42 parity)."""
    import numpy as np

    from rovr_tpu.data.dataset import SyntheticExplicitDataset
    from rovr_tpu.utils.compilation_cache import enable as enable_compile_cache
    from rovr_tpu.utils.logging import MetricsWriter
    from rovr_tpu.utils.checkpoint import run_dir

    enable_compile_cache()
    cfg = cfg or Config()
    rng = jax.random.PRNGKey(cfg.run.seed)
    mods = make_modules(cfg)
    lpips_random = not (init_params and "lpips_params" in init_params)
    raft_random = raft_params is None
    derived = "random" if (lpips_random or raft_random) else "converted"
    if weights == "converted" and derived != "converted":
        missing = [n for n, r in (("lpips", lpips_random),
                                  ("raft", raft_random)) if r]
        raise ValueError(
            "weights='converted' claimed but no converted params were "
            f"actually loaded for: {', '.join(missing)} — pass raft_params "
            "and init_params['lpips_params'] from utils.convert"
        )
    weights = derived
    if state is None:
        state = rl.init_state(cfg, mods.rovr, rng, **(init_params or {}))
    if raft_params is None:
        raft_params = init_raft_params(mods, rng, size=flow_size)

    import os

    device_source = dataset is None and not os.path.isdir(cfg.data.root_folder)
    if not device_source:
        dataset = dataset or SyntheticExplicitDataset(cfg.data, seed=cfg.run.seed)

    path = run_dir(cfg.run.run_dir, "eval")
    writer = MetricsWriter(path)
    totals: Dict[str, float] = {}
    b = cfg.rl.batch_size
    n_steps = max(1, num_videos // b)
    s = cfg.rl.vid_length
    if device_source:
        from rovr_tpu.data.device_synthetic import make_source

        src = make_source(cfg, b, cfg.run.seed, data_texture, data_texture_vel)
    for i in range(n_steps):
        if device_source:
            corrupted, original, masks, _, _ = src.next(i)
            video, org, msk = corrupted[:, :s], original[:, :s], masks[:, :s]
        else:
            items = [dataset[(i * b + j) % len(dataset)] for j in range(b)]
            # slice to the configured horizon (the explicit dataset is pinned
            # to 20 frames, video_ds_explicit.py:18)
            video = jnp.asarray(np.stack([it[0][:s] for it in items]))
            org = jnp.asarray(np.stack([it[1][:s] for it in items]))
            msk = jnp.asarray(np.stack([it[2][:s] for it in items]))
        if video.shape[1] != s:
            raise ValueError(
                f"dataset clips have {video.shape[1]} frames; "
                f"cfg.rl.vid_length={s} requires at least that many"
            )
        metrics = eval_step(
            state, raft_params, mods, cfg, (video, org, msk), flow_size
        )
        for k, v in metrics.items():
            totals[k] = totals.get(k, 0.0) + float(v)
        if log_cb:
            log_cb(i, metrics)
    means = {k: v / n_steps for k, v in totals.items()}
    means["Eval/metric_weights_random"] = 1.0 if weights == "random" else 0.0
    means["Eval/lpips_weights_random"] = 1.0 if lpips_random else 0.0
    means["Eval/raft_weights_random"] = 1.0 if raft_random else 0.0
    if weights == "random":
        print(
            "[rovr_tpu.eval] WARNING: VGG-LPIPS/RAFT weights are RANDOM "
            "(no-egress environment) — flow-recovery and LPIPS values "
            "exercise the metric plumbing only and are not comparable to "
            "the poster's numbers. PSNR/SSIM (weight-free) remain valid."
        )
    writer.scalars(means, 0)
    writer.close()
    return means
