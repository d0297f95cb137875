"""Workload 1: supervised pretraining of the local inpainting UNet.

Parity target: rovr/train_local_net_unet.py — MSE+LPIPS loss with the
exponential MSE->LPIPS anneal gamma = 0.1 + 0.9 * 0.9993^step
(train_local_net_unet.py:109), sampling (target=f, contexts f-1, f-2) from
loaded clips (train_local_net_unet.py:44-52), Adam lr=1e-4, viz every 200,
checkpoint every 2000.

TPU-native design: the whole step — batch gather from HBM-resident clips,
forward, LPIPS, loss, backward, Adam — is ONE jitted function; batch
sampling uses explicit PRNG keys and dynamic gathers instead of a host-side
Dataset; clips live on device once (the reference loads the entire dataset
into host RAM and re-ships every batch, train_local_net_unet.py:67-68).

Documented deviation: the reference supervises against frame f-1 instead of
f (train_local_net_unet.py:44-52 target=orig[m] where m=f-1). We default to
the evidently intended target=f; cfg.pretrain.legacy_target_offset=True
reproduces the reference bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rovr_tpu.config import Config
from rovr_tpu.models.local_net import LocalNetUNet
from rovr_tpu.models.vgg_lpips import LPIPS


class PretrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    lpips_params: Any = struct.field(pytree_node=True)


class PretrainModules(NamedTuple):
    local_net: LocalNetUNet
    lpips: LPIPS
    tx: optax.GradientTransformation


def make_modules(cfg: Config, dtype=None) -> PretrainModules:
    import jax.numpy as jnp  # local for clarity

    dt = dtype if dtype is not None else jnp.bfloat16
    return PretrainModules(
        local_net=LocalNetUNet(channels=cfg.model.local_net_channels, dtype=dt),
        lpips=LPIPS(dtype=dt, **(dict(stages=cfg.model.lpips_stages) if cfg.model.lpips_stages else {})),
        tx=optax.adam(cfg.pretrain.lr),
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def init_state(cfg: Config, mods: PretrainModules, rng) -> PretrainState:
    """Jitted (cfg/mods static) — eager flax init is pathologically slow
    over the axon TPU tunnel (per-op dispatch)."""
    h, w = cfg.data.frame_size
    k1, k2 = jax.random.split(rng)
    target = jnp.zeros((1, h, w, 3))
    context = jnp.zeros((1, 2, h, w, 3))
    params = mods.local_net.init(k1, target, context)["params"]
    lpips_params = mods.lpips.init(k2, target, target)["params"]
    return PretrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=mods.tx.init(params),
        lpips_params=lpips_params,
    )


def sample_batch(
    rng,
    video: jnp.ndarray,
    orig_video: jnp.ndarray,
    batch_size: int,
    legacy_target_offset: bool = False,
    positives: jnp.ndarray = None,
    positive_prob: float = 0.5,
):
    """Gather (image, context1, context2, target) like ImageDataset
    (train_local_net_unet.py:26-57) but on device with explicit keys.

    video/orig_video: (L, S, H, W, 3). f ~ U[2, S-1]; contexts f-1, f-2.

    `positives` (L, S, P, 2) int32 — the explicit teacher's positive context
    pairs (video_ds_explicit.py:133-163). When given, each sample uses a
    random positive pair as its contexts with probability `positive_prob`
    (sequential f-1/f-2 otherwise). The reference's random-mask dataset
    gives sequential contexts partial hole exposure for free (its raster
    mask tracks frame_index, video_ds.py:62-87); under the explicit
    group-mask scheme sequential contexts rarely expose the target's holes,
    so mixing in exposing pairs is what lets the UNet learn copy-from-
    context at all — the capability agentic selection exploits.
    """
    l_count, s_count = video.shape[0], video.shape[1]
    kl, kf, kp, km = jax.random.split(rng, 4)
    ls = jax.random.randint(kl, (batch_size,), 0, l_count)
    fs = jax.random.randint(kf, (batch_size,), 2, s_count)
    c1_idx, c2_idx = fs - 2, fs - 1
    if positives is not None:
        pi = jax.random.randint(kp, (batch_size,), 0, positives.shape[2])
        pair = positives[ls, fs, pi]  # (B, 2)
        use_pos = jax.random.uniform(km, (batch_size,)) < positive_prob
        c1_idx = jnp.where(use_pos, jnp.minimum(pair[:, 0], s_count - 1), c1_idx)
        c2_idx = jnp.where(use_pos, jnp.minimum(pair[:, 1], s_count - 1), c2_idx)
    image = video[ls, fs]
    context1 = video[ls, c1_idx]
    context2 = video[ls, c2_idx]
    target = orig_video[ls, fs - 1] if legacy_target_offset else orig_video[ls, fs]
    return image, jnp.stack([context1, context2], axis=1), target


def loss_fn(
    params, lpips_params, mods: PretrainModules, batch, step
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    image, context, target = batch
    y_hat = mods.local_net.apply({"params": params}, image, context)
    mse = jnp.mean((y_hat - target) ** 2)
    lpips_val = jnp.mean(
        mods.lpips.apply({"params": lpips_params}, y_hat, target)
    )
    gamma = 0.1 + 0.9 * jnp.power(0.9993, step.astype(jnp.float32))
    total = mse * gamma + lpips_val * (1.0 - gamma)
    return total, {
        "Loss/mse_loss": mse,
        "Loss/lpips_loss": lpips_val,
        "Loss/gamma": gamma,
        "Loss/total_loss": total,
    }


@functools.partial(jax.jit, static_argnums=(2, 4))
def train_step(
    state: PretrainState,
    rng,
    mods: PretrainModules,
    data: Tuple[jnp.ndarray, jnp.ndarray],
    batch_size: int,
):
    """One fully-fused step: sample -> forward -> LPIPS -> backward -> Adam."""
    video, orig_video, *rest = data
    batch = sample_batch(
        rng, video, orig_video, batch_size,
        positives=rest[0] if rest else None,
    )
    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.lpips_params, mods, batch, state.step
    )
    updates, opt_state = mods.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return (
        state.replace(step=state.step + 1, params=params, opt_state=opt_state),
        metrics,
    )


@functools.partial(jax.jit, static_argnums=(2,))
def viz_batch(state: PretrainState, rng, mods: PretrainModules, data):
    """(input | ctx1 | ctx2 | target | output) strip for TensorBoard — the
    reference's every-200-steps image grid (train_local_net_unet.py:117-119).
    Returns (H, 5*W, 3) in [0, 1] for one sampled example."""
    video, orig_video, *rest = data
    image, context, target = sample_batch(
        rng, video, orig_video, 1, positives=rest[0] if rest else None
    )
    y_hat = mods.local_net.apply({"params": state.params}, image, context)
    strip = jnp.concatenate(
        [image[0], context[0, 0], context[0, 1], target[0],
         y_hat[0].astype(jnp.float32)], axis=1,
    )
    return jnp.clip(strip, 0.0, 1.0)


def run(cfg: Optional[Config] = None, data=None, steps: Optional[int] = None,
        log_cb=None) -> PretrainState:
    """Training driver. `data` = (video, orig_video) arrays (L,S,H,W,3);
    defaults to synthetic clips when none given (no RealVSR tree on disk)."""
    import numpy as np

    from rovr_tpu.data import synthetic
    from rovr_tpu.utils.checkpoint import CheckpointManager, run_dir
    from rovr_tpu.utils.compilation_cache import enable as enable_compile_cache
    from rovr_tpu.utils.logging import MetricsWriter

    enable_compile_cache()
    cfg = cfg or Config()
    steps = steps if steps is not None else cfg.pretrain.steps
    rng = jax.random.PRNGKey(cfg.run.seed)
    mods = make_modules(cfg)
    state = init_state(cfg, mods, rng)

    if data is None:
        clips = [
            synthetic.synthetic_batch(s, cfg.data.vid_length, *cfg.data.frame_size)
            for s in range(4)
        ]
        video = jnp.asarray(np.stack([c[0] for c in clips]))
        orig = jnp.asarray(np.stack([c[1] for c in clips]))
        data = (video, orig)
    data = jax.device_put(data)

    path = run_dir(cfg.run.run_dir, "local_net_pretrain")
    writer = MetricsWriter(path)
    ckpt = CheckpointManager(
        f"{path}/checkpoints", every=cfg.pretrain.checkpoint_every
    )
    if cfg.run.restore_from:
        restored = CheckpointManager(cfg.run.restore_from).restore(template=state)
        if restored is not None:
            state = restored

    for i in range(steps):
        rng, step_key = jax.random.split(rng)
        state, metrics = train_step(
            state, step_key, mods, data, cfg.pretrain.batch_size
        )
        if i % cfg.run.log_every == 0:
            writer.scalars({k: float(v) for k, v in metrics.items()}, i)
            if log_cb:
                log_cb(i, metrics)
        if cfg.pretrain.viz_every and i % cfg.pretrain.viz_every == 0:
            writer.image(
                "Pretrain/input_ctx_target_output",
                viz_batch(state, step_key, mods, data), i,
            )
        ckpt.save(i, state)
    ckpt.wait()
    writer.close()
    return state
