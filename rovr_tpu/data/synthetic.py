"""Synthetic clip generator with the same tensor contract as the folder
datasets — used by tests and benchmarks when no RealVSR-style frame tree is
on disk (the reference hardcodes `out/LQ`, reference: rovr/test.py:60).

Frames are smooth moving gradients plus drifting blobs, so optical flow and
inpainting are meaningful (not pure noise), generated deterministically from
a seed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from rovr_tpu.data import corruption, teacher


def synthetic_clip(
    rng: np.random.Generator,
    num_frames: int = 20,
    height: int = 256,
    width: int = 256,
) -> np.ndarray:
    """uint8 (S, H, W, 3) clip: moving gradients + drifting gaussian blobs."""
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    ys, xs = ys / height, xs / width
    phase = rng.uniform(0, 2 * np.pi, size=3)
    speed = rng.uniform(0.5, 2.0, size=3)
    blob_xy = rng.uniform(0.2, 0.8, size=(4, 2)).astype(np.float32)
    blob_v = rng.uniform(-0.02, 0.02, size=(4, 2)).astype(np.float32)
    blob_col = rng.uniform(0.3, 1.0, size=(4, 3)).astype(np.float32)

    frames = np.empty((num_frames, height, width, 3), dtype=np.uint8)
    for t in range(num_frames):
        base = np.stack(
            [
                0.5 + 0.4 * np.sin(2 * np.pi * (xs + 0.01 * speed[c] * t) + phase[c])
                * np.cos(2 * np.pi * (ys - 0.013 * speed[c] * t))
                for c in range(3)
            ],
            axis=-1,
        )
        img = base
        for b in range(4):
            cx, cy = blob_xy[b] + blob_v[b] * t
            d2 = (xs - cx) ** 2 + (ys - cy) ** 2
            img = img + np.exp(-d2 / 0.01)[..., None] * blob_col[b][None, None]
        img = np.clip(img / img.max(), 0.0, 1.0)
        frames[t] = (img * 255).astype(np.uint8)
    return frames


def synthetic_batch(
    seed: int,
    num_frames: int = 20,
    height: int = 256,
    width: int = 256,
    difficulty: int = 2,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(corrupted, original, masks) float32 (S, H, W, 3) in [0, 1].

    Same contract as the random-mask dataset (video_ds.py:135), NHWC.
    """
    rng = np.random.default_rng(seed)
    clip = synthetic_clip(rng, num_frames, height, width)
    corrupted = np.empty_like(clip)
    masks = np.empty_like(clip)
    for s in range(num_frames):
        # reference indexes corruption by the pre-subsample frame id (2*s)
        corrupted[s], masks[s] = corruption.corrupt_frame(
            clip[s], 2 * s, rng, difficulty=difficulty
        )
    f = np.float32(1.0 / 255.0)
    return corrupted * f, clip * f, masks.astype(np.float32)


def synthetic_explicit_batch(
    seed: int,
    height: int = 256,
    width: int = 256,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(corrupted, original, masks, positives, negatives) — teacher-labeled.

    Same contract as the explicit dataset (video_ds_explicit.py:112), NHWC:
    20 frames with structured masks, (20,16,2) positive and (20,3,2) negative
    context pairs.
    """
    rng = np.random.default_rng(seed)
    assign = teacher.sample_assignment(rng)
    clip = synthetic_clip(rng, teacher.NUM_FRAMES, height, width)
    # explicit dataset shuffles frame order by the permutation (video_ds_explicit.py:90)
    clip = clip[assign.frame_order]
    corrupted = np.empty_like(clip)
    masks = np.empty_like(clip)
    for s in range(teacher.NUM_FRAMES):
        corrupted[s], masks[s] = corruption.corrupt_frame_explicit(
            clip[s], assign.frame_masks[s], rng
        )
    f = np.float32(1.0 / 255.0)
    return (
        corrupted * f,
        clip * f,
        masks.astype(np.float32),
        assign.positives,
        assign.negatives,
    )
