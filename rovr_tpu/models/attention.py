"""Transformer building blocks — the revived seed of the sub-quadratic
attention path.

Parity: rovr/common_layers.py:7-118 (ImagePositionalEncoding,
ContextPositionalEncoding, Self/CrossAttentionBlock, FeedForwardBlock,
Encoder/DecoderBlock). In the reference these are imported by both policy
nets but never instantiated — remnants of the pre-UNet ViT policy version
(SURVEY.md §2.7). Here they are live: the attention-based state encoder for
long (64-frame) clips uses them, with the inner attention dispatched to a
blockwise Pallas flash kernel on TPU (ops/pallas/attention.py) and a plain
jnp reference path elsewhere.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _attend(q, k, v, impl: str = "auto", mesh=None, seq_axis: Optional[str] = None,
            initializing: bool = False):
    """Dispatch the inner attention product.

    q,k,v: (B, H, L, D).
      * "auto"/"pallas": the blockwise Pallas flash kernel
        (ops/pallas/attention.py) — any L/D via padding+masking; "auto"
        engages it inside its profitable envelope on TPU.
      * "ring": sequence-parallel ring attention across `seq_axis` of `mesh`
        (parallel/ring_attention.py) — q/k/v are resharded to
        sequence-sharded at the shard_map boundary, k/v shards rotate over
        ICI via ppermute. Requires mesh + seq_axis; L must divide the axis.
        Indivisible batch/sequence is an ERROR at apply time (silently
        running the O(L²) jnp path would change complexity class under a
        misconfiguration); only the flax init trace (`initializing=True`,
        batch-1 dummy shapes) may fall through to the identical-math jnp
        path.
      * anything else: the plain jnp reference path.
    """
    if impl == "ring":
        if mesh is None or seq_axis is None:
            raise ValueError("attn_impl='ring' needs mesh and seq_axis")
        from jax.sharding import PartitionSpec as P

        from rovr_tpu.parallel.ring_attention import ring_attention

        # Keep the batch sharded over the remaining mesh axes at the
        # shard_map boundary (it already is, under the data-parallel train
        # step) — a batch spec of None would make GSPMD all-gather the clip
        # batch onto every device just to enter the ring.
        batch_axes = tuple(a for a in mesh.axis_names if a != seq_axis)
        n_batch = 1
        for a in batch_axes:
            n_batch *= mesh.shape[a]
        if q.shape[0] % max(n_batch, 1) == 0 and q.shape[2] % mesh.shape[seq_axis] == 0:
            spec = P(batch_axes or None, None, seq_axis, None)
            fn = jax.shard_map(
                functools.partial(ring_attention, axis_name=seq_axis),
                mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            )
            return fn(q, k, v)
        if not initializing:
            raise ValueError(
                f"attn_impl='ring': batch {q.shape[0]} must divide the "
                f"non-sequence mesh axes ({max(n_batch, 1)}) and sequence "
                f"{q.shape[2]} must divide mesh['{seq_axis}']="
                f"{mesh.shape[seq_axis]}; refusing to silently fall back "
                "to the O(L²) jnp path at apply time"
            )
        # the batch-1 flax init trace: fall through to the jnp path —
        # identical math, no resharding
    if impl in ("pallas", "auto"):
        try:
            from rovr_tpu.ops.pallas.attention import flash_attention, supported

            if impl == "pallas" or supported(q.shape, k.shape):
                return flash_attention(q, k, v)
        except ImportError:
            if impl == "pallas":
                raise
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


class MultiHeadAttention(nn.Module):
    hidden_dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    mesh: Any = None
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, q_in, kv_in):
        b, lq, _ = q_in.shape
        lk = kv_in.shape[1]
        h, d = self.num_heads, self.hidden_dim // self.num_heads
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (h, d), dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("q")(q_in).transpose(0, 2, 1, 3)
        k = dense("k")(kv_in).transpose(0, 2, 1, 3)
        v = dense("v")(kv_in).transpose(0, 2, 1, 3)
        o = _attend(
            q, k, v, self.attn_impl, self.mesh, self.seq_axis,
            initializing=self.is_initializing(),
        ).transpose(0, 2, 1, 3)
        return nn.DenseGeneral(
            self.hidden_dim, axis=(-2, -1), dtype=self.dtype,
            param_dtype=jnp.float32, name="out",
        )(o)


class SelfAttentionBlock(nn.Module):
    """Pre-LN residual self-attention (common_layers.py:54-64)."""

    hidden_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    mesh: Any = None
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(param_dtype=jnp.float32)(x)
        return y + MultiHeadAttention(
            self.hidden_dim, self.num_heads, self.dtype, self.attn_impl,
            self.mesh, self.seq_axis,
        )(y, y)


class CrossAttentionBlock(nn.Module):
    """Pre-LN residual cross-attention (common_layers.py:66-78)."""

    hidden_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    mesh: Any = None
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, encoder_output):
        y = nn.LayerNorm(param_dtype=jnp.float32)(x)
        enc = nn.LayerNorm(param_dtype=jnp.float32)(encoder_output)
        return y + MultiHeadAttention(
            self.hidden_dim, self.num_heads, self.dtype, self.attn_impl,
            self.mesh, self.seq_axis,
        )(y, enc)


class FeedForwardBlock(nn.Module):
    """LN -> fc -> GELU -> dropout -> fc (common_layers.py:80-92)."""

    hidden_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(param_dtype=jnp.float32)(x)
        y = nn.Dense(self.hidden_dim // 4, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.gelu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(y)


class EncoderBlock(nn.Module):
    """x + SA(x); x + FF(x) (common_layers.py:94-105).

    moe_experts > 0 swaps the dense FFN for a switch-routed
    mixture-of-experts (models/moe.py) whose expert axis shards over
    `moe_axis` of `mesh` — the expert-parallel (EP) option."""

    hidden_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    mesh: Any = None
    seq_axis: Optional[str] = None
    moe_experts: int = 0
    moe_capacity: float = 1.25
    moe_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x + SelfAttentionBlock(
            self.hidden_dim, self.num_heads, self.dropout, self.dtype,
            self.attn_impl, self.mesh, self.seq_axis,
        )(x)
        if self.moe_experts > 0:
            from rovr_tpu.models.moe import MoEFeedForward

            x = x + MoEFeedForward(
                self.hidden_dim, self.moe_experts, self.moe_capacity,
                self.dtype, self.mesh, self.moe_axis, name="moe_ff",
            )(x, deterministic)
        else:
            x = x + FeedForwardBlock(
                self.hidden_dim, self.dropout, self.dtype
            )(x, deterministic)
        return x


class DecoderBlock(nn.Module):
    """x + SA(x); x + CA(x, enc); x + FF(x) (common_layers.py:107-118)."""

    hidden_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    mesh: Any = None
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, encoder_output, deterministic: bool = True):
        x = x + SelfAttentionBlock(
            self.hidden_dim, self.num_heads, self.dropout, self.dtype,
            self.attn_impl, self.mesh, self.seq_axis,
        )(x)
        x = x + CrossAttentionBlock(
            self.hidden_dim, self.num_heads, self.dropout, self.dtype,
            self.attn_impl, self.mesh, self.seq_axis,
        )(x, encoder_output)
        x = x + FeedForwardBlock(self.hidden_dim, self.dropout, self.dtype)(
            x, deterministic
        )
        return x


class ImagePositionalEncoding(nn.Module):
    """Learned linear positional encoding over patch index
    (common_layers.py:7-25)."""

    num_image_patches: int
    patch_size: int
    num_channels: int

    @nn.compact
    def __call__(self, x):
        n = self.num_image_patches ** 2
        dim = self.patch_size ** 2 * self.num_channels
        pos = nn.Dense(dim, param_dtype=jnp.float32, name="positional_encoder")(
            jnp.arange(n, dtype=jnp.float32)[:, None]
        )
        return x + pos[None]


class ContextPositionalEncoding(nn.Module):
    """Learned per-patch + per-context-frame encodings (common_layers.py:27-52)."""

    num_context_patches: int
    patch_size: int
    num_channels: int
    num_context: int

    @nn.compact
    def __call__(self, x):
        """x: (B, num_context, P, dim) -> (B, num_context * P, dim)."""
        p = self.num_context_patches ** 2
        dim = self.patch_size ** 2 * self.num_channels
        patch_pos = nn.Dense(
            dim, param_dtype=jnp.float32, name="patch_positional_encoder"
        )(jnp.arange(p, dtype=jnp.float32)[:, None])
        ctx_pos = nn.Dense(
            dim, param_dtype=jnp.float32, name="context_positional_encoder"
        )(jnp.arange(self.num_context, dtype=jnp.float32)[:, None])
        pos = patch_pos[None, None] + ctx_pos[None, :, None]
        y = x + pos
        b = x.shape[0]
        return y.reshape(b, self.num_context * p, dim)
