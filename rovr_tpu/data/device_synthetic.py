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


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def raster_batch_device(key, batch: int, height: int, width: int,
                        num_frames: int = teacher.NUM_FRAMES,
                        texture: float = 0.0, texture_vel: float = 1.5):
    """(corrupted, original, masks) under the STANDARD corruption scheme:
    the deterministic raster box tracking frame index (video_ds.py:62-87,
    corruption.raster_box_masks_jax — frame s carries original index 2*s,
    matching the reference's every-2nd-frame subsampling, video_ds.py:106).

    This is the scheme behind the poster's agentic-vs-sequential headline:
    adjacent frames' boxes overlap ~80% (box width 150 px vs 32 px slice
    stride), so SEQUENTIAL contexts (t-1, t-2) expose only 0.47 of the
    target's hole while any far frame exposes all of it — a per-frame
    (marginal) selection criterion the reference's top-2-of-one-softmax
    policy class can actually represent. The explicit teacher scheme, by
    contrast, requires JOINT pair coverage: its marginal-policy ceiling is
    0.75 exposure vs 0.67 random (measured, benchmarks/policy_ceiling.py),
    so no factorized policy — the reference's included — can beat random
    there by much. RL and evaluation therefore run on this scheme.
    """
    clips = synthetic_clips(key, batch, height, width, num_frames, texture,
                            texture_vel)
    masks = corruption.raster_box_masks_jax(
        2 * jnp.arange(num_frames), height, width
    )  # (S, H, W, 1), identical for every video by construction
    masks = jnp.broadcast_to(masks[None], (batch,) + masks.shape)
    return clips * masks, clips, jnp.broadcast_to(masks, clips.shape)


def raster_positive_pairs(num_frames: int, height: int, width: int,
                          per_frame: int = 8, seed: int = 0) -> np.ndarray:
    """(S, P, 2) int32 context pairs that JOINTLY expose the target's whole
    raster box — exposure-1.0 pairs for the standard scheme, the analog of
    the explicit teacher's positive tables (used to mix exposing contexts
    into UNet pretraining, pretrain_local.sample_batch).

    A pixel of target box T is exposed by pair (i, j) iff it is intact in i
    OR j, so the pair is fully exposing iff T ∩ box_i ∩ box_j = ∅ (at small
    frame sizes a single non-overlapping frame may not exist — e.g. 160 px:
    middle-section boxes overlap every other frame vertically — but a
    (top-section, bottom-section) pair still covers jointly)."""
    # raster_box takes the post-subsampling index; frame s maps to it
    # directly (raster_box_masks_jax(2 * s) halves back internally).
    boxes = [corruption.raster_box(s, height, width) for s in range(num_frames)]

    def inter(a, b):
        return (max(a[0], b[0]), min(a[1], b[1]),
                max(a[2], b[2]), min(a[3], b[3]))

    def empty(a):
        return a[0] >= a[1] or a[2] >= a[3]

    rng = np.random.default_rng(seed)
    out = np.empty((num_frames, per_frame, 2), np.int32)
    for t in range(num_frames):
        cand = [j for j in range(num_frames) if j != t]
        pairs = [(a, b) for ai, a in enumerate(cand) for b in cand[ai + 1:]
                 if empty(inter(inter(boxes[t], boxes[a]), boxes[b]))]
        if not pairs:
            raise ValueError(
                f"no fully-exposing pair for target {t} at "
                f"{height}x{width} — frame too small for the 150x100 box grid"
            )
        picks = rng.choice(len(pairs), per_frame, replace=len(pairs) < per_frame)
        out[t] = np.asarray([pairs[p] for p in picks], np.int32)
    return out


class DeviceSyntheticRaster:
    """Device-resident source under the standard raster-box corruption.

    next(i) -> (corrupted, original, masks, None, None): same 5-tuple shape
    as DeviceSyntheticExplicit so train/eval loops consume either; there are
    no teacher tables in this scheme (imitation uses the explicit source).
    """

    def __init__(self, batch: int, height: int = 256, width: int = 256,
                 seed: int = 0, texture: float = 0.0,
                 texture_vel: float = 1.5):
        self.batch = batch
        self.height = height
        self.width = width
        self.seed = seed
        self.texture = texture
        self.texture_vel = texture_vel

    def next(self, i: int):
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), i)
        corrupted, original, masks = raster_batch_device(
            key, self.batch, self.height, self.width, teacher.NUM_FRAMES,
            self.texture, self.texture_vel,
        )
        return corrupted, original, masks, None, None


def raster_negative_pairs(num_frames: int, height: int, width: int,
                          per_frame: int = 3, seed: int = 0) -> np.ndarray:
    """(S, P, 2) int32 context pairs with the LOWEST joint exposure of the
    target's raster box — the analog of the explicit teacher's same-group
    negative pairs (video_ds_explicit.py:165-191): useless contexts the
    imitation BCE pushes away from."""
    masks = np.asarray(
        corruption.raster_box_masks_jax(2 * np.arange(num_frames),
                                        height, width)
    )[..., 0]
    hole = 1.0 - masks
    rng = np.random.default_rng(seed)
    out = np.empty((num_frames, per_frame, 2), np.int32)
    for t in range(num_frames):
        cand = [j for j in range(num_frames) if j != t]
        scored = sorted(
            ((float((hole[t] * (1 - (1 - masks[a]) * (1 - masks[b]))).sum()),
              a, b)
             for ai, a in enumerate(cand) for b in cand[ai + 1:]),
        )
        worst = scored[: max(per_frame * 3, per_frame)]
        picks = rng.choice(len(worst), per_frame, replace=False)
        out[t] = np.asarray([(worst[p][1], worst[p][2]) for p in picks],
                            np.int32)
    return out


def make_source(cfg, batch: int, seed: int, texture: float,
                texture_vel: float):
    """Synthetic device source per cfg.data.synthetic_scheme (see
    DataConfig.synthetic_scheme): "explicit" teacher masks or the standard
    "raster" boxes. Both return the same next(i) 5-tuple contract."""
    h, w = cfg.data.frame_size
    if cfg.data.synthetic_scheme == "raster":
        return DeviceSyntheticRaster(batch, h, w, seed=seed, texture=texture,
                                     texture_vel=texture_vel)
    return DeviceSyntheticExplicit(
        batch, h, w, seed=seed, texture=texture, texture_vel=texture_vel,
        overlap_free=cfg.data.synthetic_overlap_free,
    )


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
