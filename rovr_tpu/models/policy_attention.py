"""Attention-based context policy for long clips — the revived ViT policy.

The reference's transformer blocks are imported-but-dead remnants of a
pre-UNet ViT policy (reference: rovr/common_layers.py:7-118, imported at
policy_net_1.py:5 / policy_net_2.py:5 but never instantiated — SURVEY.md
§2.7). This module revives them as a first-class alternative to the
canvas-based PolicyNet2 for the long-horizon configuration (BASELINE.json
config 5: 64-frame clips): per-frame features become tokens, optionally
expanded to PATCH tokens (frame x patch sequence), contextualized by
EncoderBlocks whose inner attention dispatches to the blockwise Pallas flash
kernel (ops/pallas/attention.py) on TPU — and to ring attention across the
mesh when the sequence outgrows one chip (parallel/ring_attention.py).

Interface mirrors PolicyNet2's RL surface (act / logprob / value) with obs =
the per-frame feature sequence instead of the canvas: actor samples the
top-2 context frames with Gumbel-softmax and the same joint-logprob form
(log p_a + log p_b)/2 + ln 2 (policy_net_2.py:98-102), so PPO code is shared.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rovr_tpu.models.attention import EncoderBlock
from rovr_tpu.models.layers import standardize
from rovr_tpu.models.policy_net_1 import gumbel_log_softmax
from rovr_tpu.models.policy_net_2 import LN2


class AttentionContextPolicy(nn.Module):
    """π₂-compatible actor/critic over per-frame feature tokens.

    obs: feats (B, S, feature_dim). The target frame is marked by adding a
    learned embedding at its token (replaces pn2's concat-target-feature
    trick) before the encoder stack.
    """

    num_frames: int = 64
    feature_dim: int = 1024
    hidden_dim: int = 256
    num_heads: int = 4
    depth: int = 2
    patch_tokens: int = 1   # tokens per frame (>1 expands to patch level)
    temperature: float = 0.7
    is_critic: bool = False
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # ring attention (attn_impl="ring"): mesh + the axis the frame-patch
    # sequence is sharded over (parallel/ring_attention.py)
    mesh: Any = None
    seq_axis: Any = None
    # pipeline parallelism (parallel/pp.py): > 0 pipelines the encoder
    # stack over the mesh's model axis — `depth` blocks split into
    # mesh.shape[model] stages, this many microbatches streamed through.
    # Requires mesh; depth must divide by the model-axis size.
    pp_microbatches: int = 0
    # expert parallelism (models/moe.py): > 0 swaps each block's dense FFN
    # for this many switch-routed experts, sharded over the mesh's model
    # axis when a mesh is bound.
    moe_experts: int = 0
    moe_capacity: float = 1.25

    def setup(self):
        p = self.patch_tokens
        self.tokenize = nn.DenseGeneral(
            (p, self.hidden_dim), param_dtype=jnp.float32, name="tokenize"
        )
        self.frame_pos = self.param(
            "frame_pos", nn.initializers.normal(0.02),
            (self.num_frames, 1, self.hidden_dim), jnp.float32,
        )
        self.patch_pos = self.param(
            "patch_pos", nn.initializers.normal(0.02),
            (1, p, self.hidden_dim), jnp.float32,
        )
        self.target_emb = self.param(
            "target_emb", nn.initializers.normal(0.02),
            (self.hidden_dim,), jnp.float32,
        )
        moe_axis = None
        if self.moe_experts > 0 and self.mesh is not None:
            from rovr_tpu.parallel.mesh import MODEL_AXIS

            moe_axis = MODEL_AXIS
        self.blocks = [
            EncoderBlock(
                self.hidden_dim, self.num_heads, dtype=self.dtype,
                attn_impl=self.attn_impl, mesh=self.mesh,
                seq_axis=self.seq_axis, name=f"block{i}",
                moe_experts=self.moe_experts,
                moe_capacity=self.moe_capacity, moe_axis=moe_axis,
            )
            for i in range(self.depth)
        ]
        self.head = nn.Dense(1, param_dtype=jnp.float32, name="head")
        self.value_head = nn.Dense(1, param_dtype=jnp.float32, name="value_head")

    def _use_pp(self) -> bool:
        """Pipeline the encoder stack? Only when configured, bound to a mesh
        whose model axis is >1, and not during init (the sequential path must
        run once to create the block params the pipeline then reads)."""
        if self.pp_microbatches <= 0 or self.mesh is None or self.is_initializing():
            return False
        from rovr_tpu.parallel.mesh import MODEL_AXIS

        return MODEL_AXIS in self.mesh.shape and self.mesh.shape[MODEL_AXIS] > 1

    def _apply_blocks_pipelined(self, x: jnp.ndarray) -> jnp.ndarray:
        """GPipe the EncoderBlock stack over the mesh's model axis
        (parallel/pp.py): each device owns depth/S blocks; microbatches of
        the clip batch stream through, activations rotating via ppermute."""
        from rovr_tpu.models.attention import EncoderBlock
        from rovr_tpu.parallel.mesh import MODEL_AXIS
        from rovr_tpu.parallel.pp import pipeline_layers

        # Unbound single-block template: same hyperparams as self.blocks but
        # never ring (the sequence stays whole inside a pipeline stage), and
        # MoE without the mesh constraint (each stage's experts live on its
        # own device under shard_map).
        template = EncoderBlock(
            self.hidden_dim, self.num_heads, dtype=self.dtype,
            attn_impl="jnp" if self.attn_impl == "ring" else self.attn_impl,
            moe_experts=self.moe_experts, moe_capacity=self.moe_capacity,
            parent=None,  # detached template, applied with explicit params
        )
        layer_params = [blk.variables["params"] for blk in self.blocks]
        return pipeline_layers(
            lambda p, a: template.apply({"params": p}, a),
            layer_params, x, self.mesh, axis=MODEL_AXIS,
            microbatches=self.pp_microbatches,
        )

    def _encode(self, feats: jnp.ndarray, target_idx: jnp.ndarray) -> jnp.ndarray:
        """feats (B, S, feature_dim), target_idx (B,) -> frame embeddings
        (B, S, hidden)."""
        b, s, _ = feats.shape
        p = self.patch_tokens
        tok = self.tokenize(feats.astype(jnp.float32))  # (B, S, P, H)
        tok = tok + self.frame_pos[:s] + self.patch_pos
        mark = jax.nn.one_hot(target_idx, s, dtype=jnp.float32)  # (B, S)
        tok = tok + mark[:, :, None, None] * self.target_emb
        x = tok.reshape(b, s * p, self.hidden_dim).astype(self.dtype)
        if self._use_pp():
            x = self._apply_blocks_pipelined(x)
        else:
            for blk in self.blocks:
                x = blk(x)
        # pool patch tokens back to frames
        x = x.reshape(b, s, p, self.hidden_dim).mean(axis=2)
        return x.astype(jnp.float32)

    def masked_logits(self, feats, target_idx) -> jnp.ndarray:
        """Per-frame logits with the target's own logit zeroed then
        standardized — pn2's get_masked_logits semantics
        (policy_net_2.py:110-124)."""
        x = self._encode(feats, target_idx)
        logits = self.head(x)[..., 0]  # (B, S)
        onehot = jax.nn.one_hot(target_idx, logits.shape[1], dtype=logits.dtype)
        logits = logits * (1.0 - onehot)
        return standardize(logits, axis=1, eps=0.1)

    def __call__(self, feats, target_idx, rng, greedy=False):
        return self.act(feats, target_idx, rng, greedy)

    def act(self, feats, target_idx, rng, greedy=False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-2 context frames + joint logprob (policy_net_2.py:94-102).
        `greedy=True` (static) drops the Gumbel noise — deterministic top-2,
        the policy-evaluation readout (see PolicyNet2.act)."""
        logits = self.masked_logits(feats, target_idx)
        if greedy:
            logp = jax.nn.log_softmax(logits / self.temperature, axis=1)
        else:
            logp = gumbel_log_softmax(logits, rng, self.temperature)
        top = jax.lax.top_k(logp, 2)
        logprob = jnp.sum(top[0], axis=1) / 2 + LN2
        return jax.lax.stop_gradient(top[1]), jax.lax.stop_gradient(logprob)

    def logprob(self, feats, target_idx, action, rng) -> jnp.ndarray:
        """PPO logprob with fresh Gumbel noise; marginals treated as
        independent (policy_net_2.py:127-142)."""
        x = self._encode(feats, target_idx)
        logits = self.head(x)[..., 0]
        onehot = jax.nn.one_hot(target_idx, logits.shape[1], dtype=logits.dtype)
        logits = logits * (1.0 - onehot)
        logp = gumbel_log_softmax(logits, rng, self.temperature)
        lpa = jnp.take_along_axis(logp, action[:, 0:1], axis=1)[:, 0]
        lpb = jnp.take_along_axis(logp, action[:, 1:2], axis=1)[:, 0]
        return (lpa + lpb) / 2 + LN2

    def value(self, feats, target_idx) -> jnp.ndarray:
        """Critic: mean-pooled frame embeddings -> scalar."""
        x = self._encode(feats, target_idx)
        return self.value_head(jnp.mean(x, axis=1))[:, 0]
