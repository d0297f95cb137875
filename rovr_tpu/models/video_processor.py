"""VideoProcessor: per-frame features + the composite "state canvas".

This component is MISSING from the reference repository (imported at
rovr/rovr.py:16 and rovr/imitation_learning.py:19 but absent from the file
tree). Its interface is pinned by the call sites (SURVEY.md §2.13):

  vp(stacked_224_frames) -> (encoded_frames, flattened_frames)
      encoded_frames:  the single-channel (160,160) state canvas consumed by
                       policy-2's video_conv (shape comment policy_net_2.py:40)
      flattened_frames[:, t, :]: a 1024-d per-frame feature used as policy-2's
                       `context` input (rovr.py:131-133 -> policy_net_2.py:88,91)
  vp.insert_encoded_frame_batch(indices, frame, encoded) -> encoded
      re-encode a reconstructed frame and overwrite its tile (rovr.py:200)

Re-specification: a frozen ResNet-50 encodes each frame to 2048-d; a linear
head projects to the 1024-d feature; a second linear head projects to a 32x32
tile laid out row-major, 5 tiles per row, on a 160x160 canvas (room for 25
frames — the behavioral evolution of ResnetFeatureExtractor's 3x80x80 canvas
of 16x16 tiles, resnet_extractor.py:25-40).

TPU-native: frames are encoded as ONE batched ResNet call (B*S on the MXU),
not the reference's Python double loop (resnet_extractor.py:29-33); tile
insertion is a lax.dynamic_update_slice (scan-safe for traced indices).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rovr_tpu.models.resnet import ResNet50, TinyBackbone


class VideoProcessor(nn.Module):
    canvas_size: int = 160
    tile: int = 32
    tiles_per_row: int = 5
    feature_dim: int = 1024
    dtype: Any = jnp.bfloat16
    # "resnet50" (reference parity, resnet_extractor.py:8-14) or "tiny"
    # (small trunk for fast test compiles; see resnet.TinyBackbone).
    backbone_name: str = "resnet50"
    # backbone pooling grid: 1 = reference's global pool; g > 1 keeps a
    # (g, g) spatial grid (see resnet.ResNet50.spatial_pool). With g > 1 the
    # projection heads are SHARED per cell (Dense C -> dim/g^2, concatenated
    # in cell order): position information rides the concatenation, and the
    # heads stay ~130k params instead of the g^2*C x dim dense (33M at g=4)
    # — which also keeps optimizer moments + checkpoints small.
    spatial_pool: int = 1

    def setup(self):
        self.backbone = (
            TinyBackbone(dtype=self.dtype, spatial_pool=self.spatial_pool)
            if self.backbone_name == "tiny"
            else ResNet50(dtype=self.dtype, spatial_pool=self.spatial_pool)
        )
        g2 = self.spatial_pool ** 2
        if g2 > 1:
            if self.feature_dim % g2 or self.tile % self.spatial_pool:
                raise ValueError(
                    "feature_dim must divide by spatial_pool^2 and tile by "
                    f"spatial_pool (got {self.feature_dim}, {self.tile}, "
                    f"g={self.spatial_pool})"
                )
            self.feat_head = nn.Dense(
                self.feature_dim // g2, param_dtype=jnp.float32
            )
            self.tile_head = nn.Dense(
                (self.tile // self.spatial_pool) ** 2, param_dtype=jnp.float32
            )
        else:
            self.feat_head = nn.Dense(self.feature_dim, param_dtype=jnp.float32)
            self.tile_head = nn.Dense(
                self.tile * self.tile, param_dtype=jnp.float32
            )

    def encode(self, frames: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """frames (N, 224, 224, 3) -> (tiles (N, tile, tile), feats (N, D)).

        The backbone is frozen (resnet_extractor.py:12-14); only the two
        linear heads are learnable, matching the reference's learnable
        projection (resnet_extractor.py:9).
        """
        pooled = jax.lax.stop_gradient(self.backbone(frames))
        g = self.spatial_pool
        if g > 1:
            # (N, g*g*C) -> (N, g*g, C); shared per-cell heads; cell order
            # (row-major) carries the position information.
            n = pooled.shape[0]
            cells = pooled.reshape(n, g * g, -1)
            feats = self.feat_head(cells).reshape(n, self.feature_dim)
            t = self.tile // g
            # per-cell (t, t) patches assembled into the (tile, tile) grid at
            # their cell's position — tiles stay spatially faithful
            tiles = self.tile_head(cells).reshape(n, g, g, t, t)
            tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(
                n, self.tile, self.tile
            )
            return tiles, feats
        feats = self.feat_head(pooled)
        tiles = self.tile_head(pooled).reshape(-1, self.tile, self.tile)
        return tiles, feats

    def _tile_origin(self, idx):
        row = idx // self.tiles_per_row
        col = idx % self.tiles_per_row
        return row * self.tile, col * self.tile

    def __call__(self, frames: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """frames (B, S, 224, 224, 3) -> (canvas (B,160,160,1), feats (B,S,D))."""
        b, s = frames.shape[:2]
        tiles, feats = self.encode(frames.reshape((b * s,) + frames.shape[2:]))
        tiles = tiles.reshape(b, s, self.tile, self.tile)
        feats = feats.reshape(b, s, self.feature_dim)
        # Lay tiles row-major: (b, rows, cols, tile, tile) -> (b, H, W). Static
        # layout = one transpose+reshape, no scatter.
        rows = -(-s // self.tiles_per_row)
        pad = rows * self.tiles_per_row - s
        if pad:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((b, pad, self.tile, self.tile), tiles.dtype)], axis=1
            )
        grid = tiles.reshape(b, rows, self.tiles_per_row, self.tile, self.tile)
        grid = grid.transpose(0, 1, 3, 2, 4).reshape(
            b, rows * self.tile, self.tiles_per_row * self.tile
        )
        canvas = jnp.zeros((b, self.canvas_size, self.canvas_size), grid.dtype)
        canvas = jax.lax.dynamic_update_slice(canvas, grid, (0, 0, 0))
        return canvas[..., None], feats

    def insert_encoded_frame_batch(
        self, indices: jnp.ndarray, frames: jnp.ndarray, canvas: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Re-encode reconstructed frames and overwrite their tiles.

        indices (B,) int; frames (B, H, W, 3) at any resolution (resized to
        224 on device); canvas (B, 160, 160, 1). Returns (canvas, feats (B,D)).
        Parity: resnet_extractor.py:49-55 / rovr.py:200, but with on-device
        bilinear resize instead of the reference's PIL round-trip
        (resnet_extractor.py:18-23).
        """
        b = frames.shape[0]
        resized = jax.image.resize(frames, (b, 224, 224, 3), method="bilinear")
        tiles, feats = self.encode(resized)

        def put(cv, tile, idx):
            y, x = self._tile_origin(idx)
            return jax.lax.dynamic_update_slice(cv, tile[..., None], (y, x, 0))

        canvas = jax.vmap(put)(canvas, tiles.astype(canvas.dtype), indices)
        return canvas, feats

    def extract_patch(self, indices: jnp.ndarray, canvas: jnp.ndarray) -> jnp.ndarray:
        """Gather tiles by index for the LSTM history path.

        indices (B, K) -> (B, K, tile, tile). Parity: resnet_extractor.py:57-67.
        """
        def one(cv, idx):
            y, x = self._tile_origin(idx)
            return jax.lax.dynamic_slice(cv[..., 0], (y, x), (self.tile, self.tile))

        return jax.vmap(
            lambda cv, idxs: jax.vmap(lambda i: one(cv, i))(idxs)
        )(canvas, indices)
