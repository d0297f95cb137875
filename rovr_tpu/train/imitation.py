"""Workload 3: imitation-learning warm start of the context policy π₂.

Parity target: rovr/imitation_learning.py — per clip, build the state once
(VideoProcessor over 20 preprocessed frames, imitation_learning.py:72-78),
replicate it x20 (one row per target index, :83), get raw masked logits with
target=arange(20) (:87 -> policy_net_2.py:92-93), then BCE-with-logits
pulled +1.5x toward each positive pair's multi-hot and -1x away from each
negative pair (:88-94). Adam lr=2e-4, checkpoint every 250.

TPU-native: frame preprocessing is an on-device batched resize (no PIL
round-trip); the whole step (encode -> logits -> ±BCE -> backward -> Adam)
is one jitted function.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rovr_tpu.config import Config
from rovr_tpu.models.policy_net_2 import PolicyNet2
from rovr_tpu.models.video_processor import VideoProcessor


class ImitationState(struct.PyTreeNode):
    step: jnp.ndarray
    pn2_params: Any
    vp_params: Any
    opt_state: Any


class ImitationModules(NamedTuple):
    # PolicyNet2 (cfg.rl.context_policy="canvas") or AttentionContextPolicy
    # ("attention") — either exposes masked_logits, so the teacher loss and
    # the PPO warm-start slot (rl.init_state actor2_params) are shared.
    pn2: Any
    vp: VideoProcessor
    tx: optax.GradientTransformation
    # cfg.imitation.loss_mode ("bce" reference parity | "pair_ce") — carried
    # here so the jitted train_step (mods is its static arg) branches at
    # trace time.
    loss_mode: str = "bce"


def _make_policy(cfg: Config, dt):
    if cfg.rl.context_policy == "attention":
        from rovr_tpu.models.policy_attention import AttentionContextPolicy

        m = cfg.model
        return AttentionContextPolicy(
            num_frames=m.pn2_num_frames, feature_dim=m.feature_dim,
            hidden_dim=m.attn_hidden_dim, num_heads=m.attn_heads,
            depth=m.attn_depth, patch_tokens=m.attn_patch_tokens,
            temperature=m.pn2_temperature, dtype=dt,
        )
    return PolicyNet2(
        num_frames=cfg.model.pn2_num_frames,
        fc_dims=cfg.model.pn2_fc_dims,
        temperature=cfg.model.pn2_temperature,
        dtype=dt,
    )


def make_modules(cfg: Config, dtype=None) -> ImitationModules:
    dt = dtype if dtype is not None else jnp.bfloat16
    return ImitationModules(
        pn2=_make_policy(cfg, dt),
        vp=VideoProcessor(
            canvas_size=cfg.model.canvas_size,
            tile=cfg.model.canvas_tile,
            tiles_per_row=cfg.model.canvas_tiles_per_row,
            feature_dim=cfg.model.feature_dim,
            dtype=dt, backbone_name=cfg.model.backbone,
            spatial_pool=cfg.model.backbone_spatial_pool,
        ),
        # One optimizer over {"pn2", "vp"}. Within vp only the projection
        # heads can train (the backbone is frozen by stop_gradient AND
        # labeled "freeze" here so it carries no Adam moments — it is 100x
        # the heads' size); the heads freeze too unless
        # cfg.imitation.train_vp (see ImitationConfig).
        tx=optax.multi_transform(
            {"train": optax.adam(cfg.imitation.lr),
             "freeze": optax.set_to_zero()},
            param_labels=lambda params: {
                "pn2": jax.tree.map(lambda _: "train", params["pn2"]),
                "vp": {
                    k: jax.tree.map(
                        lambda _, k=k: "train"
                        if cfg.imitation.train_vp and k != "backbone"
                        else "freeze",
                        v,
                    )
                    for k, v in params["vp"].items()
                },
            },
        ),
        loss_mode=cfg.imitation.loss_mode,
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def init_state(cfg: Config, mods: ImitationModules, rng) -> ImitationState:
    """Jitted (cfg/mods static) — eager flax init is pathologically slow
    over the axon TPU tunnel (per-op dispatch)."""
    s = cfg.model.pn2_num_frames
    k1, k2, k3 = jax.random.split(rng, 3)
    frames = jnp.zeros((1, s, 224, 224, 3))
    vp_params = mods.vp.init(k1, frames)["params"]
    if cfg.rl.context_policy == "attention":
        feats_seq = jnp.zeros((s, s, cfg.model.feature_dim))
        pn2_params = mods.pn2.init(k2, feats_seq, jnp.arange(s), k3)["params"]
    else:
        canvas = jnp.zeros((s, cfg.model.canvas_size, cfg.model.canvas_size, 1))
        feats = jnp.zeros((s, cfg.model.feature_dim))
        pn2_params = mods.pn2.init(
            k2, canvas, feats, jnp.arange(s), k3
        )["params"]
    # pn2 + (optionally) the VideoProcessor heads train; the ResNet backbone
    # is frozen inside VideoProcessor.encode (stop_gradient), so even with
    # train_vp only the two projection heads receive nonzero grads.
    return ImitationState(
        step=jnp.zeros((), jnp.int32),
        pn2_params=pn2_params,
        vp_params=vp_params,
        opt_state=mods.tx.init({"pn2": pn2_params, "vp": vp_params}),
    )


def preprocess_frames(video: jnp.ndarray) -> jnp.ndarray:
    """(S, H, W, 3) in [0,1] -> (1, S, 224, 224, 3).

    On-device bilinear resize — replaces the reference's per-frame
    ToPILImage/Resize/ToTensor CPU round-trip (resnet_extractor.py:18-23,
    imitation_learning.py:72)."""
    s = video.shape[0]
    resized = jax.image.resize(video, (s, 224, 224, 3), method="bilinear")
    return resized[None]


def multi_hot(pairs: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B, 2) index pairs -> (B, num_classes) multi-hot (sum of one-hots,
    imitation_learning.py:89)."""
    return jax.nn.one_hot(pairs[:, 0], num_classes) + jax.nn.one_hot(
        pairs[:, 1], num_classes
    )


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """mean BCEWithLogits — torch semantics (mean over all elements)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_not_p)


def imitation_loss(
    pn2_params,
    vp_params,
    mods: ImitationModules,
    video: jnp.ndarray,
    positives: jnp.ndarray,
    negatives: jnp.ndarray,
    pos_w: float = 1.5,
    neg_w: float = 1.0,
    masks: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """video (S,H,W,3); positives (S,16,2); negatives (S,3,2); masks
    (S,H,W,C) with 1 = intact (optional, adds the exposure diagnostic)."""
    s = video.shape[0]
    frames = preprocess_frames(video)
    canvas, feats = mods.vp.apply({"params": vp_params}, frames)
    if isinstance(mods.pn2, PolicyNet2):
        canvas20 = jnp.broadcast_to(canvas[0][None], (s,) + canvas.shape[1:])
        logits = mods.pn2.apply(
            {"params": pn2_params},
            canvas20,
            feats[0],
            jnp.arange(s),
            method=PolicyNet2.masked_logits,
        )
    else:
        # AttentionContextPolicy: obs = the per-frame feature sequence
        # itself, one row per target index (mirrors the RL rollout's obs,
        # train/rl.py `obs = (fts,)`).
        feats_seq = jnp.broadcast_to(feats[0][None], (s,) + feats[0].shape)
        logits = mods.pn2.apply(
            {"params": pn2_params}, feats_seq, jnp.arange(s),
            method=type(mods.pn2).masked_logits,
        )
    n = mods.pn2.num_frames
    if mods.loss_mode == "pair_ce":
        # Softmax CE toward ONE canonical teacher pair (positives[:, 0]):
        # the optimum ranks exactly that pair on top (exposure 1.00 measured
        # on overlap-free masks), where the reference's all-pairs BCE below
        # only reaches 0.65 — see ImitationConfig.loss_mode.
        logp = jax.nn.log_softmax(logits, axis=1)       # (S, n)
        can = positives[:, 0]                           # (S, 2)
        rows = jnp.arange(s)
        loss = -jnp.mean(logp[rows, can[:, 0]] + logp[rows, can[:, 1]])
    else:
        # Vectorized over the pair axis: sum_i BCE(logits, multihot(pairs[:, i]))
        # equals one broadcasted elementwise BCE reduced per-pair then summed —
        # the same math as the reference's Python loop
        # (imitation_learning.py:88-94) in a single fused graph.
        log_p = jax.nn.log_sigmoid(logits)          # (S, n)
        log_not_p = jax.nn.log_sigmoid(-logits)     # (S, n)

        def pair_sum_bce(pairs: jnp.ndarray) -> jnp.ndarray:
            """pairs (S, K, 2) -> sum over K of mean-over-(S,n) BCE."""
            t = jax.nn.one_hot(pairs[..., 0], n) + jax.nn.one_hot(
                pairs[..., 1], n
            )
            per_pair = -jnp.mean(
                t * log_p[:, None, :] + (1.0 - t) * log_not_p[:, None, :],
                axis=(0, 2),
            )
            return jnp.sum(per_pair)

        loss = pair_sum_bce(positives) * pos_w - pair_sum_bce(negatives) * neg_w

    # Teacher top-2 accuracy: fraction of frames whose deterministic top-2
    # logits form a pair in the positive solution table (order-insensitive).
    # Pure diagnostic — the reference has no such readout; it makes the
    # warm start's learning visible beyond the signed BCE value.
    _, top2 = jax.lax.top_k(logits, 2)                      # (S, 2)
    pos_table = jnp.zeros((s, n, n), jnp.bool_)
    fr = jnp.arange(s)[:, None]
    pos_table = pos_table.at[fr, positives[..., 0], positives[..., 1]].set(True)
    pos_table = pos_table.at[fr, positives[..., 1], positives[..., 0]].set(True)
    acc = jnp.mean(
        pos_table[jnp.arange(s), top2[:, 0], top2[:, 1]].astype(jnp.float32)
    )
    metrics = {"Loss/expert_loss": loss, "Imitation/top2_acc": acc}
    if masks is not None:
        # Exposure rate of the greedy top-2 pair: fraction of each target's
        # hole pixels visible in >= 1 chosen context. The actionable readout
        # of the warm start — top2_acc demands the EXACT tabled pair, which
        # per-frame marginal logits cannot target (the loss's own optimum
        # scores ~0 on it), while exposure is what reconstruction uses.
        hole = 1.0 - masks[..., :1]          # (S, H, W, 1)
        ha, hb = hole[top2[:, 0]], hole[top2[:, 1]]
        exp = jnp.sum(hole * (1.0 - ha * hb)) / jnp.maximum(jnp.sum(hole), 1.0)
        metrics["Imitation/exposure"] = exp
    return loss, metrics


@functools.partial(jax.jit, static_argnums=(2,))
def train_step(state: ImitationState, batch, mods: ImitationModules):
    """batch = (video, positives, negatives[, masks]) — masks optional,
    diagnostic-only (Imitation/exposure)."""
    video, positives, negatives, *rest = batch
    masks = rest[0] if rest else None
    (_, metrics), (g_pn2, g_vp) = jax.value_and_grad(
        imitation_loss, argnums=(0, 1), has_aux=True
    )(state.pn2_params, state.vp_params, mods, video, positives, negatives,
      masks=masks)
    params = {"pn2": state.pn2_params, "vp": state.vp_params}
    updates, opt_state = mods.tx.update(
        {"pn2": g_pn2, "vp": g_vp}, state.opt_state, params
    )
    params = optax.apply_updates(params, updates)
    return (
        state.replace(
            step=state.step + 1, pn2_params=params["pn2"],
            vp_params=params["vp"], opt_state=opt_state,
        ),
        metrics,
    )


def run(cfg: Optional[Config] = None, dataset=None, steps: Optional[int] = None,
        log_cb=None, data_texture: float = 0.0,
        data_texture_vel: float = 1.5) -> ImitationState:
    """Driver: cycles the explicit dataset (synthetic fallback), jitted step,
    Orbax checkpoints every cfg.imitation.checkpoint_every."""
    from rovr_tpu.data.dataset import SyntheticExplicitDataset
    from rovr_tpu.utils.checkpoint import CheckpointManager, run_dir
    from rovr_tpu.utils.compilation_cache import enable as enable_compile_cache
    from rovr_tpu.utils.logging import MetricsWriter

    enable_compile_cache()
    cfg = cfg or Config()
    steps = steps if steps is not None else cfg.imitation.steps
    rng = jax.random.PRNGKey(cfg.run.seed)
    mods = make_modules(cfg)
    state = init_state(cfg, mods, rng)

    import os

    if dataset is None and not os.path.isdir(cfg.data.root_folder):
        # device-resident synthetic clips (see train/rl.py rationale)
        from rovr_tpu.data.device_synthetic import make_source

        h, w = cfg.data.frame_size
        src = make_source(cfg, 1, cfg.run.seed, data_texture,
                          data_texture_vel)
        raster_tables = None
        if cfg.data.synthetic_scheme == "raster":
            # Analytic teacher tables for the raster scheme: fully-exposing
            # positive pairs / lowest-exposure negatives from the box
            # geometry — the same paradigm as the explicit dataset's
            # solution tables (video_ds_explicit.py:133-191), derived from
            # the standard corruption instead.
            from rovr_tpu.data.device_synthetic import (
                raster_negative_pairs, raster_positive_pairs,
            )

            s = cfg.model.pn2_num_frames
            raster_tables = (
                raster_positive_pairs(s, h, w, per_frame=16,
                                      seed=cfg.run.seed),
                raster_negative_pairs(s, h, w, per_frame=3,
                                      seed=cfg.run.seed),
            )

        class _DeviceItems:
            def __len__(self):
                return 64

            def __getitem__(self, i):
                corrupted, _, masks, pos, neg = src.next(i)
                if raster_tables is not None:
                    pos, neg = raster_tables[0][None], raster_tables[1][None]
                return corrupted[0], None, masks[0], pos[0], neg[0]

        dataset = _DeviceItems()
    else:
        dataset = dataset or SyntheticExplicitDataset(cfg.data, seed=cfg.run.seed)

    path = run_dir(cfg.run.run_dir, "warm_start_pn2")
    writer = MetricsWriter(path)
    ckpt = CheckpointManager(
        f"{path}/checkpoints", every=cfg.imitation.checkpoint_every
    )

    for i in range(steps):
        corrupted, _, masks, positives, negatives = dataset[i % len(dataset)]
        batch = (
            jnp.asarray(corrupted), jnp.asarray(positives),
            jnp.asarray(negatives),
        )
        if masks is not None:
            batch = batch + (jnp.asarray(masks),)
        state, metrics = train_step(state, batch, mods)
        if i % cfg.run.log_every == 0:
            writer.scalars({k: float(v) for k, v in metrics.items()}, i)
            if log_cb:
                log_cb(i, metrics)
        ckpt.save(i, state)
    ckpt.wait()
    writer.close()
    return state
