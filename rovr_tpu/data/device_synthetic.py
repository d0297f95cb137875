"""On-device synthetic explicit batches: clip + corruption generated on TPU.

The host-side synthetic path (data/synthetic.py) is numpy ufunc-bound and
Python threads cannot parallelize it (the GIL is held through ufunc inner
loops) — measured ~4 clips/s/core vs ~40 clips/s consumed by the batched RL
step. Here everything pixel-sized runs inside ONE jitted graph on the
accelerator: moving-gradient clip synthesis, the structured jittered box
masks of the explicit dataset (video_ds_explicit.py:36-71 geometry), and the
corrupt/mask application. The host contributes only the tiny combinatorial
teacher assignment (7 locations, 6 groups, pair tables — microseconds, from
data/teacher.py), which rides in as small int arrays.

Same tensor contract as SyntheticExplicitDataset.__getitem__, plus a leading
batch axis: (corrupted, original, masks, positives, negatives).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rovr_tpu.data import corruption, teacher


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def synthetic_clips(key, batch: int, height: int, width: int,
                    num_frames: int = teacher.NUM_FRAMES,
                    texture: float = 0.0,
                    texture_vel: float = 1.5) -> jnp.ndarray:
    """(B, S, H, W, 3) float32 in [0,1]: moving gradients + drifting blobs.

    Device twin of synthetic.synthetic_clip (same structure, jax RNG).

    `texture` > 0 blends in a per-clip mid-frequency random pattern (a
    bilinear-upsampled 8-px random grid, rigidly drifting up to
    `texture_vel` px/frame). Smooth gradients alone are interpolatable from
    a masked box's surroundings, so an inpainting UNet never needs the
    context frames and context *selection* becomes unlearnable;
    mid-frequency texture is unpredictable across a 50-100 px box yet
    copyable from any frame where that region is exposed — the regime the
    explicit teacher scheme (video_ds_explicit.py:114-191) is built around.
    `texture_vel=0` makes the texture static: copying from an exposing
    context is then exact, the cleanest setting for demonstrating that
    context selection (not motion compensation) drives reconstruction.
    """
    ks = jax.random.split(key, 7)
    phase = jax.random.uniform(ks[0], (batch, 3), minval=0.0, maxval=2 * np.pi)
    speed = jax.random.uniform(ks[1], (batch, 3), minval=0.5, maxval=2.0)
    blob_xy = jax.random.uniform(ks[2], (batch, 4, 2), minval=0.2, maxval=0.8)
    blob_v = jax.random.uniform(ks[3], (batch, 4, 2), minval=-0.02, maxval=0.02)
    blob_col = jax.random.uniform(ks[4], (batch, 4, 3), minval=0.3, maxval=1.0)

    ys = (jnp.arange(height, dtype=jnp.float32) / height)[:, None]
    xs = (jnp.arange(width, dtype=jnp.float32) / width)[None, :]
    t = jnp.arange(num_frames, dtype=jnp.float32)

    def one(ph, sp, bxy, bv, bcol):
        # (S,1,1,3) broadcast against (H,W) grids
        tt = t[:, None, None, None]
        img = 0.5 + 0.4 * jnp.sin(
            2 * np.pi * (xs[None, :, :, None] + 0.01 * sp * tt) + ph
        ) * jnp.cos(2 * np.pi * (ys[None, :, :, None] - 0.013 * sp * tt))
        for b in range(4):
            cx = bxy[b, 0] + bv[b, 0] * t  # (S,)
            cy = bxy[b, 1] + bv[b, 1] * t
            d2 = (xs[None] - cx[:, None, None]) ** 2 + (
                ys[None] - cy[:, None, None]
            ) ** 2
            img = img + jnp.exp(d2 / -0.01)[..., None] * bcol[b]
        img = img / jnp.max(img, axis=(1, 2, 3), keepdims=True)
        return jnp.clip(img, 0.0, 1.0)

    clips = jax.vmap(one)(phase, speed, blob_xy, blob_v, blob_col)

    if texture > 0.0:
        cell = 8
        margin = int(np.ceil(texture_vel * max(1, num_frames - 1))) + cell
        gh = (height + 2 * margin) // cell + 2
        gw = (width + 2 * margin) // cell + 2
        grid = jax.random.uniform(ks[5], (batch, gh, gw, 3))
        tex = jax.image.resize(
            grid, (batch, gh * cell, gw * cell, 3), method="bilinear"
        )
        # rigid integer drift: frame s shows the texture shifted by
        # round(v * s) pixels — exactly copyable between frames
        vel = jax.random.uniform(
            ks[6], (batch, 2), minval=-texture_vel, maxval=texture_vel
        )
        t = jnp.arange(num_frames, dtype=jnp.float32)
        dy = jnp.clip(jnp.round(vel[:, 0:1] * t[None]), -margin, margin
                      ).astype(jnp.int32)  # (B, S)
        dx = jnp.clip(jnp.round(vel[:, 1:2] * t[None]), -margin, margin
                      ).astype(jnp.int32)

        def shift_one(tex_b, dy_b, dx_b):
            def crop(d):
                dyi, dxi = d
                return jax.lax.dynamic_slice(
                    tex_b, (margin + dyi, margin + dxi, 0), (height, width, 3)
                )
            return jax.vmap(crop)((dy_b, dx_b))

        tex_frames = jax.vmap(shift_one)(tex, dy, dx)  # (B, S, H, W, 3)
        clips = jnp.clip(
            clips * (1.0 - texture) + tex_frames * texture, 0.0, 1.0
        )
    return clips


def _explicit_masks(key, frame_masks: jnp.ndarray, height: int, width: int,
                    overlap_free: bool = False):
    """Jittered box masks for the explicit scheme, fully broadcast.

    frame_masks: (B, S, 4) int mask locations. Returns (B, S, H, W, 1)
    float32, 1 = intact. Geometry parity: corruption.corrupt_mask_explicit
    (video_ds_explicit.py:36-60) with jax-drawn jitter.

    `overlap_free=True` replaces the reference's 100x50 jittered boxes with
    the full raster CELL of each location (no jitter). The reference
    geometry makes boxes at *different* locations overlap heavily (box width
    100 px spans ~3 of the 32 px slice columns), so "this pair exposes every
    masked region" is only ~85% true at pixel level even for teacher pairs —
    which compresses the context-selection reward. Cell-aligned boxes make
    the group-exposure property pixel-exact (teacher pairs expose 100%),
    the cleanest setting for demonstrating learned context selection.
    Default False = reference parity.
    """
    b, s, k = frame_masks.shape
    section_height = height // 3
    slice_width = width // 8
    section_idx = frame_masks // 8
    slice_idx = frame_masks % 8
    if overlap_free:
        x0 = slice_idx * slice_width
        x1 = x0 + slice_width
        y0 = section_idx * section_height
        y1 = y0 + section_height
        x0, x1, y0, y1 = (jnp.asarray(v) for v in (x0, x1, y0, y1))
    else:
        cx = slice_idx * slice_width + slice_width // 2
        cy = section_idx * section_height + section_height // 2
        kx, ky = jax.random.split(key)
        cx = cx + jax.random.randint(
            kx, (b, s, k), corruption.EXPLICIT_JITTER_X_LO,
            corruption.EXPLICIT_JITTER_X_HI + 1,
        )
        cy = cy + jax.random.randint(
            ky, (b, s, k), corruption.EXPLICIT_JITTER_Y_LO,
            corruption.EXPLICIT_JITTER_Y_HI + 1,
        )
        x0 = jnp.maximum(0, cx - corruption.EXPLICIT_BOX_W // 2)
        x1 = jnp.minimum(width, x0 + corruption.EXPLICIT_BOX_W)
        y0 = jnp.maximum(0, cy - corruption.EXPLICIT_BOX_H // 2)
        y1 = jnp.minimum(height, y0 + corruption.EXPLICIT_BOX_H)
    ys = jnp.arange(height)[:, None]   # (H, 1)
    xs = jnp.arange(width)[None, :]    # (1, W)
    # (B, S, K, H, W) box membership via broadcasted comparisons
    in_box = (
        (ys >= y0[..., None, None]) & (ys < y1[..., None, None])
        & (xs >= x0[..., None, None]) & (xs < x1[..., None, None])
    )
    return (~jnp.any(in_box, axis=2)).astype(jnp.float32)[..., None]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def explicit_batch_device(key, frame_masks, height: int, width: int,
                          texture: float = 0.0, texture_vel: float = 1.5,
                          overlap_free: bool = False):
    """(corrupted, original, masks) on device, given host teacher masks.

    frame_masks: (B, S, 4) int32. All (B, S, H, W, 3) float32.
    """
    b, s = frame_masks.shape[:2]
    k_clip, k_mask = jax.random.split(key)
    clips = synthetic_clips(k_clip, b, height, width, s, texture, texture_vel)
    masks = _explicit_masks(k_mask, frame_masks, height, width, overlap_free)
    return clips * masks, clips, jnp.broadcast_to(masks, clips.shape)


class DeviceSyntheticExplicit:
    """Batched device-resident source with the explicit-dataset contract.

    next(i) -> (corrupted, original, masks, positives, negatives) for batch
    index i: pixels live on device (never touch the host); positives /
    negatives are small host int arrays (consumed host-side by the imitation
    loss builder). Deterministic per (seed, i).
    """

    def __init__(self, batch: int, height: int = 256, width: int = 256,
                 seed: int = 0, texture: float = 0.0,
                 texture_vel: float = 1.5, overlap_free: bool = False):
        self.batch = batch
        self.height = height
        self.width = width
        self.seed = seed
        self.texture = texture
        self.texture_vel = texture_vel
        self.overlap_free = overlap_free

    def next(self, i: int):
        rng = np.random.default_rng((self.seed, i))
        assigns = [teacher.sample_assignment(rng) for _ in range(self.batch)]
        frame_masks = jnp.asarray(
            np.stack([a.frame_masks for a in assigns]), jnp.int32
        )
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), i)
        corrupted, original, masks = explicit_batch_device(
            key, frame_masks, self.height, self.width, self.texture,
            self.texture_vel, self.overlap_free,
        )
        positives = np.stack([a.positives for a in assigns])
        negatives = np.stack([a.negatives for a in assigns])
        return corrupted, original, masks, positives, negatives
