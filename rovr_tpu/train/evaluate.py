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
from rovr_tpu.ops.metrics import (
    context_exposure,
    context_exposure_per_clip,
    flow_recovery,
    psnr,
    ssim,
)
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


@functools.partial(jax.jit, static_argnums=(1, 2, 4))
def eval_ci_step(
    state: rl.ROVRState,
    mods_rovr: rl.ROVRModules,
    cfg: Config,
    batch,
    draws: int,
    rng,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Per-clip weight-free eval metrics under BOTH policy readouts, fully
    jitted (the variance-proofed evaluation core, VERDICT r4 #1).

    batch = (corrupted, original, masks), each (B, S, H, W, 3). Returns
    {"greedy": {...}, "sampled": {...}} where every value is a per-clip (B,)
    array:
      * greedy — one deterministic argmax-top-2 rollout (the r2-r4 flagship
        readout, cfg.rl.eval_greedy semantics); measured to swing masked
        PSNR by dB per a few % exposure, hence the sampled companion.
      * sampled — `draws` Gumbel-sampled rollouts per clip, metric averaged
        over draws (the policy's actual behavioral distribution, rovr.py:141
        sampling semantics). The draws ride as K batch replicas in ONE
        rollout call: gumbel_log_softmax draws noise per batch row, so
        replicas are independent draws; the episode-init artifacts (LPIPS
        baseline, VGG taps, canvas/features — frozen-param functions of the
        clip) are computed once on B and tiled, not recomputed K times.

    The sequential (t-2, t-1) baseline is deterministic, so it runs only in
    the greedy pass; RAFT/LPIPS ride in `eval_step`, not here (weight-random
    in this environment — CI adjudication uses weight-free metrics only).
    """
    import dataclasses

    video, org_video, masks = batch
    s = video.shape[1]
    cfg_g = cfg.replace(rl=dataclasses.replace(
        cfg.rl, greedy=True, sequential_baseline=True))
    cfg_s = cfg.replace(rl=dataclasses.replace(
        cfg.rl, greedy=False, sequential_baseline=False))

    hole = 1.0 - masks
    hole1 = hole[..., :1]

    def masked_psnr(x, org, h):
        se = jnp.sum((x - org) ** 2 * h, axis=(1, 2, 3, 4))
        mse = se / jnp.maximum(jnp.sum(h, axis=(1, 2, 3, 4)), 1.0)
        return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))  # (B,)

    def per_clip(out, org, h, h1):
        seq_pairs = jnp.stack(
            [(out.traj.target_idx - 2) % s, (out.traj.target_idx - 1) % s],
            axis=-1,
        )
        m = {
            "masked_psnr_agentic": masked_psnr(out.reconstructed, org, h),
            "psnr_agentic": jnp.mean(psnr(out.reconstructed, org), axis=-1),
            "exposure_agentic": context_exposure_per_clip(
                h1, out.traj.target_idx, out.traj.actions),
            "exposure_sequential": context_exposure_per_clip(
                h1, out.traj.target_idx, seq_pairs),
        }
        return m

    init = rl.episode_init(state, mods_rovr, cfg, video, org_video)
    out_g = rl.rollout(state, mods_rovr, cfg_g, video, org_video, rng,
                       init=init)
    g = per_clip(out_g, org_video, hole, hole1)
    g["masked_psnr_sequential"] = masked_psnr(
        out_g.experimental, org_video, hole)
    g["psnr_sequential"] = jnp.mean(psnr(out_g.experimental, org_video),
                                    axis=-1)
    g["masked_psnr_corrupted"] = masked_psnr(video, org_video, hole)
    g["psnr_corrupted"] = jnp.mean(psnr(video, org_video), axis=-1)

    def tile(x):
        return jnp.concatenate([x] * draws, axis=0)

    init_t = jax.tree.map(tile, init)
    out_s = rl.rollout(state, mods_rovr, cfg_s, tile(video), tile(org_video),
                       rng, init=init_t)
    s_flat = per_clip(out_s, tile(org_video), tile(hole), tile(hole1))
    # (K*B,) -> (K, B) -> mean over the K draws = the per-clip expected
    # metric under the sampled policy
    b = video.shape[0]
    sampled = {k: jnp.mean(v.reshape(draws, b), axis=0)
               for k, v in s_flat.items()}
    return {"greedy": g, "sampled": sampled}


def _tcrit(df: int) -> float:
    """Two-sided 95% t critical value."""
    try:
        from scipy import stats

        return float(stats.t.ppf(0.975, max(df, 1)))
    except Exception:  # pragma: no cover - scipy is in the image
        return 1.96 if df >= 30 else 2.1


def summarize(vals) -> Dict[str, float]:
    """mean ± 95% CI (t-interval over clips) for a per-clip metric."""
    import numpy as np

    v = np.asarray(vals, np.float64)
    n = v.size
    se = v.std(ddof=1) / np.sqrt(n) if n > 1 else float("inf")
    ci = _tcrit(n - 1) * se
    return {"mean": float(v.mean()), "ci95": float(ci), "n": int(n)}


def paired_delta(a, b) -> Dict[str, float]:
    """Paired per-clip difference a - b with a 95% t-interval and the
    separation verdict |mean| > ci95. Pairing is the variance reducer: the
    arms share clips and rollout seeds, so clip-difficulty variance cancels
    in the difference (VERDICT r4 #1: "state plainly which deltas separate
    outside their CIs")."""
    import numpy as np

    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    out = summarize(d)
    out["separates"] = bool(abs(out["mean"]) > out["ci95"])
    return out


def run_ci(
    cfg: Optional[Config] = None,
    state: Optional[rl.ROVRState] = None,
    num_videos: int = 100,
    sample_draws: int = 8,
    data_texture: float = 0.0,
    data_texture_vel: float = 1.5,
    mods: Optional[EvalModules] = None,
) -> Dict[str, Any]:
    """Variance-proofed held-out evaluation: per-clip weight-free metrics
    over >= `num_videos` device-synthetic clips, greedy AND K-draw sampled
    readouts, mean ± 95% CI per metric (VERDICT r4 #1; the poster's eval
    averages 20 rollouts with no spread, rovr.py:223-241 / BASELINE.md).

    Every arm evaluated with the same cfg sees the SAME clips (the source is
    seeded by cfg.run.seed) and the SAME rollout keys, so per-clip paired
    deltas between arms (`paired_delta`) cancel clip difficulty.

    Returns {"n_clips", "draws", "per_clip": {readout: {metric: [...]}},
    "summary": {readout: {metric: {mean, ci95, n}}}}.
    """
    from rovr_tpu.data.device_synthetic import make_source
    from rovr_tpu.utils.compilation_cache import enable as enable_compile_cache

    enable_compile_cache()
    cfg = cfg or Config()
    rng = jax.random.PRNGKey(cfg.run.seed)
    mods = mods or make_modules(cfg)
    if state is None:
        state = rl.init_state(cfg, mods.rovr, rng)

    b = cfg.rl.batch_size
    s = cfg.rl.vid_length
    n_steps = max(1, -(-num_videos // b))  # ceil: at least num_videos clips
    src = make_source(cfg, b, cfg.run.seed, data_texture, data_texture_vel)
    acc: Dict[str, Dict[str, list]] = {"greedy": {}, "sampled": {}}
    for i in range(n_steps):
        corrupted, original, masks, _, _ = src.next(i)
        batch = (corrupted[:, :s], original[:, :s], masks[:, :s])
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.run.seed + 1), i)
        res = eval_ci_step(state, mods.rovr, cfg, batch, sample_draws, key)
        for readout, ms in res.items():
            for k, v in ms.items():
                acc[readout].setdefault(k, []).extend(
                    float(x) for x in jax.device_get(v))
    return {
        "n_clips": n_steps * b,
        "draws": sample_draws,
        "per_clip": acc,
        "summary": {
            readout: {k: summarize(v) for k, v in ms.items()}
            for readout, ms in acc.items()
        },
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
