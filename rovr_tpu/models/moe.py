"""Mixture-of-experts feed-forward with expert parallelism (EP).

The reference has no MoE / expert parallelism anywhere (SURVEY.md §2.14:
every distributed strategy absent) — this is a beyond-parity system feature
completing the parallelism matrix (DP/TP/PP/SP + EP) for the revived
attention context policy: `cfg.model.attn_moe_experts > 0` replaces each
EncoderBlock's dense FFN (common_layers.py:80-92 shape: LN -> fc(d/4) ->
GELU -> fc(d)) with E switch-routed expert copies of that same MLP.

TPU-native formulation (GShard/Switch style, dense dispatch):
  * top-1 routing with a per-expert capacity C = ceil(tokens/E * factor);
    overflowing tokens are dropped (their FFN delta is 0 — the residual
    stream carries them through unchanged, the standard Switch behavior).
  * dispatch/combine are one-hot einsums — MXU work with static shapes, no
    scatter/gather, XLA-fusable.
  * expert parallelism rides GSPMD: the (E, C, d) expert batches carry a
    sharding constraint on the expert axis over the mesh's model axis, so
    XLA inserts the all-to-alls; expert kernels (E, ...) shard the same way
    (see parallel/tp.py moe rules). No manual collectives.

The router's load-balance auxiliary (Switch eq. 4: E * sum_e f_e * P_e) is
sown under ("intermediates", "moe_aux") for callers that want to regularize
routing; the PPO losses do not consume it by default (documented deviation:
a policy net this small demonstrates the EP mechanics, not MoE scaling).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MoEFeedForward(nn.Module):
    """Switch-routed drop-in for attention.FeedForwardBlock.

    With num_experts=1 (capacity covering all tokens) the gate probability
    is exactly 1.0 and this reduces to the dense FFN with the same weights
    — tested in tests/test_ep.py.
    """

    hidden_dim: int
    num_experts: int = 4
    capacity_factor: float = 1.25
    dtype: Any = jnp.bfloat16
    # Expert-parallel placement: shard the expert axis of the dispatched
    # activations over `mesh`'s `expert_axis` (GSPMD inserts all-to-alls).
    # None = single-device semantics (identical math).
    mesh: Any = None
    expert_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, l, d = x.shape
        e = self.num_experts
        f = self.hidden_dim // 4  # FFN width parity (common_layers.py:86)
        y = nn.LayerNorm(param_dtype=jnp.float32)(x)
        tokens = y.reshape(b * l, d)
        n = b * l

        # --- route (float32: router logits are tiny but precision-critical)
        logits = nn.Dense(e, param_dtype=jnp.float32, dtype=jnp.float32,
                          name="router")(tokens.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)          # (N, E)
        expert = jnp.argmax(probs, axis=-1)              # (N,)
        gate = jnp.max(probs, axis=-1)                   # (N,)

        # load-balance auxiliary (Switch Transformer eq. 4)
        onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)   # (N, E)
        frac_tokens = jnp.mean(onehot, axis=0)
        frac_probs = jnp.mean(probs, axis=0)
        self.sow("intermediates", "moe_aux",
                 e * jnp.sum(frac_tokens * frac_probs))

        # --- capacity + dispatch/combine one-hots, all static shapes
        cap = max(1, int(n / e * self.capacity_factor + 0.999))
        # slot: this token's queue position within its expert (flat order).
        # (cumsum - 1) counts earlier tokens routed to the same expert; the
        # *onehot zeroes every non-routed column BEFORE the row-sum (a
        # cumsum*onehot - 1 form would leak -1 from all E-1 unrouted
        # columns and shift every slot by -(E-1), dropping each expert's
        # first E-1 tokens — regression-tested in tests/test_ep.py).
        pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot        # (N, E)
        slot = jnp.sum(pos, axis=-1).astype(jnp.int32)           # (N,)
        # top-1 routing assigns every token to exactly one expert, so
        # slot >= 0 always; only capacity can drop a token
        keep = slot < cap
        # (N, E, C): one-hot at (expert, slot) for kept tokens, all-zero for
        # dropped ones (slot pushed to the discarded cap+1-th column)
        dispatch = (
            onehot[:, :, None]
            * jax.nn.one_hot(jnp.where(keep, slot, cap), cap + 1,
                             dtype=jnp.float32)[:, None, :cap]
        )

        tok_c = tokens.astype(self.dtype)
        xe = jnp.einsum("nec,nd->ecd", dispatch.astype(self.dtype), tok_c)
        xe = self._constrain(xe)

        # --- per-expert MLP (leading expert axis on every kernel)
        w1 = self.param("w1", nn.initializers.lecun_normal(batch_axis=(0,)),
                        (e, d, f), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (e, f), jnp.float32)
        w2 = self.param("w2", nn.initializers.lecun_normal(batch_axis=(0,)),
                        (e, f, d), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (e, d), jnp.float32)
        h = jnp.einsum("ecd,edf->ecf", xe, w1.astype(self.dtype))
        h = nn.gelu(h + b1[:, None].astype(self.dtype))
        out = jnp.einsum("ecf,efd->ecd", h, w2.astype(self.dtype))
        out = out + b2[:, None].astype(self.dtype)
        out = self._constrain(out)

        # --- combine: dropped tokens get 0 (residual passthrough upstream)
        y_out = jnp.einsum("nec,ecd->nd", dispatch.astype(self.dtype), out)
        y_out = y_out * gate[:, None].astype(self.dtype)
        return y_out.reshape(b, l, d)

    def _constrain(self, t: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is None or self.expert_axis is None:
            return t
        if self.expert_axis not in self.mesh.shape:
            return t
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            t, NamedSharding(self.mesh, P(self.expert_axis, None, None))
        )
