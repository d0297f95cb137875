"""Inference: reconstruct corrupted clips with a trained policy + UNet.

The reference has no inference entry point at all — its only consumer of a
trained model is the training loop itself (rovr/test.py trains and
checkpoints, nothing loads a checkpoint to reconstruct unseen clips). A
user of the framework needs one: this module runs the agentic rollout
(deterministic greedy context selection, cfg.rl.eval_greedy) over input
clips and returns / writes the reconstructed videos.

No original (ground-truth) video is needed: the rollout's LPIPS reward
terms are dead code under inference (XLA eliminates them when the caller
only keeps `reconstructed`), so the corrupted clip stands in for both
inputs. Frames are written in the reference's dataset layout
(out/<clip>/<frame>.png, video_ds.py:104) so reconstructions can be
re-consumed by the data pipeline.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rovr_tpu.config import Config


def reconstruct_clips(
    cfg: Config,
    state,
    mods,
    videos: Iterable[jnp.ndarray],
    mesh=None,
) -> Iterable[Tuple[np.ndarray, np.ndarray]]:
    """Yield (reconstructed uint8, actions) per (B, S, H, W, 3) corrupted
    batch.

    Greedy deterministic rollout: cfg.rl.greedy is forced on (the standard
    policy readout — the stochastic Gumbel path is for training,
    rovr.py:141); the sequential baseline pass is forced off.

    `mesh`: a jax.sharding.Mesh for data-parallel serving — the clip batch
    shards over the mesh's data axis, parameters replicate, and GSPMD runs
    the rollout per shard (clips are independent, so no collectives are
    needed; outputs match the single-device path to within 1 uint8 LSB of
    quantization wobble — parity-tested). B must divide by the data-axis
    size.

    The reconstruction leaves the device as uint8 pixels: serving output is
    image files, and shipping float32 quadruples D2H bytes — which is THE
    serving bottleneck here (a single jax fetch of the ~31 MB float batch
    collapses to <1 MB/s over the axon tunnel, 9.1 s/batch vs ~0.2 s of
    rollout compute; docs/performance.md). uint8 + chunked parallel fetch
    (utils/transfer.py) recover most of it.
    """
    from rovr_tpu.train import rl

    cfg = cfg.replace(
        rl=dataclasses.replace(
            cfg.rl, greedy=True, sequential_baseline=False
        )
    )

    def _run(state, video):
        # uint8 input (a deployment's natural frame format) converts on
        # device — 4x fewer H2D bytes than shipping float32
        if video.dtype == jnp.uint8:
            video = video.astype(jnp.float32) / 255.0
        out = rl.rollout(
            state, mods, cfg, video, video, jax.random.PRNGKey(cfg.run.seed)
        )
        recon_u8 = jnp.clip(
            out.reconstructed.astype(jnp.float32) * 255.0 + 0.5, 0.0, 255.0
        ).astype(jnp.uint8)
        return recon_u8, out.traj.actions

    if mesh is None:
        # commit the state once (a restored checkpoint can be host numpy —
        # without this the serving loop would re-upload the weights per batch)
        state = jax.device_put(state)
        run = jax.jit(_run)
        put = jnp.asarray
    else:
        from rovr_tpu.parallel.mesh import batch_sharded, replicate, replicated

        state = replicate(mesh, state)
        run = jax.jit(
            _run, in_shardings=(replicated(mesh), batch_sharded(mesh))
        )
        sh = batch_sharded(mesh)
        # device_put shards straight from host — no default-device detour
        put = lambda v: jax.device_put(v, sh)  # noqa: E731

    from rovr_tpu.utils.transfer import chunked_device_get

    for video in videos:
        recon, actions = run(state, put(video))
        recon, actions = chunked_device_get((recon, actions))
        yield np.asarray(recon), np.asarray(actions)


def write_frames(recon: np.ndarray, out_dir: str, clip_offset: int = 0) -> int:
    """Write (B, S, H, W, 3) frames — uint8, or float in [0,1] — as
    out_dir/<clip>/<frame>.png (the reference's folder layout,
    video_ds.py:104). Returns frames written. Uses cv2 when available, else
    PNG via pure-python fallback."""
    n = 0
    recon = np.asarray(recon)
    if recon.dtype == np.uint8:
        u8 = recon
    else:
        u8 = np.clip(
            recon.astype(np.float32) * 255.0 + 0.5, 0, 255
        ).astype(np.uint8)
    try:
        import cv2

        def _write(path, img):
            cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    except Exception:  # pragma: no cover - cv2 is in the image
        from rovr_tpu.utils.png import write_png as _write

    for b in range(u8.shape[0]):
        d = os.path.join(out_dir, f"{clip_offset + b:05d}")
        os.makedirs(d, exist_ok=True)
        for s in range(u8.shape[1]):
            _write(os.path.join(d, f"{s:05d}.png"), u8[b, s])
            n += 1
    return n


def run(
    cfg: Optional[Config] = None,
    restore_from: Optional[str] = None,
    dataset=None,
    num_clips: int = 4,
    out_dir: str = "reconstructed",
    data_texture: float = 1.0,
    data_texture_vel: float = 0.0,
    mesh=None,
) -> dict:
    """CLI driver: restore a trained RL state (or random init when no
    checkpoint is given), reconstruct `num_clips` clips, write frames.

    dataset=None falls back to the on-device synthetic source
    (cfg.data.synthetic_scheme), mirroring the training drivers.
    """
    from rovr_tpu.train import rl
    from rovr_tpu.utils.checkpoint import CheckpointManager
    from rovr_tpu.utils.compilation_cache import enable as enable_compile_cache

    enable_compile_cache()
    cfg = cfg or Config()
    mods = rl.make_modules(cfg)
    state = rl.init_state(cfg, mods, jax.random.PRNGKey(cfg.run.seed))
    restored = False
    if restore_from:
        mgr = CheckpointManager(restore_from)
        got = mgr.restore(template=state)
        if got is not None:
            state, restored = got, True

    b = cfg.rl.batch_size
    s = cfg.rl.vid_length

    def batches():
        if dataset is not None:
            for i in range(0, num_clips, b):
                items = [dataset[(i + j) % len(dataset)] for j in range(b)]
                yield jnp.asarray(np.stack([it[0][:s] for it in items]))
        else:
            from rovr_tpu.data.device_synthetic import make_source

            src = make_source(cfg, b, cfg.run.seed, data_texture,
                              data_texture_vel)
            for i in range(-(-num_clips // b)):  # ceil: cover num_clips
                corrupted, *_ = src.next(i)
                yield corrupted[:, :s]

    written = 0
    clips = 0
    for recon, actions in reconstruct_clips(cfg, state, mods, batches(),
                                            mesh=mesh):
        # batches are fixed size b (one jit shape); trim the tail so exactly
        # num_clips clips are written even when b does not divide it
        take = min(recon.shape[0], num_clips - clips)
        written += write_frames(recon[:take], out_dir, clip_offset=clips)
        clips += take
        if clips >= num_clips:
            break
    return {
        "clips": clips,
        "frames_written": written,
        "out_dir": out_dir,
        "restored": restored,
    }
