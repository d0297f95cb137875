"""Policy network π₂ / V₂: pick the TWO context frames for inpainting the
current target. The only policy trained by PPO in the reference's main path
(reference: rovr/rovr.py:74).

Parity: PolicyNetwork2UNet (reference: rovr/policy_net_2.py:11-142):
  * `video_conv` branch: 4x [conv3x3 -> BN -> relu -> maxpool] over the
    (160,160,1) state canvas with aggressive pooling (8x, 4x, 1x, 2x(2,1),
    2x(2,2)) -> 1024-d flatten (policy_net_2.py:41-60).
  * target-frame branch: the per-frame 1024-d feature is used directly
    (the conv context branch is bypassed, policy_net_2.py:87-88).
  * concat -> 2048 -> final_fc chain of bare Linears 2048->1024->512->256->
    64->20 (policy_net_2.py:63-69) — kept factored for checkpoint parity.
  * masked logits: the target's own logit is set to 0 via scatter, then
    standardized with eps 0.1 (policy_net_2.py:110-124).
  * actor: Gumbel-softmax tau=0.7, top-2; joint logprob
    (log p_a + log p_b)/2 + ln 2 (policy_net_2.py:98-102).
  * PPO logprob: 20x20 outer product of marginals, gather the flattened pair
    index (policy_net_2.py:127-142) — the two picks treated as independent.

Deviations: keepdims standardization (see policy_net_1.py note) and explicit
PRNG keys for Gumbel noise.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rovr_tpu.models.layers import (
    BatchStatNorm, CanvasConv3x3, MLP, max_pool, standardize,
)
from rovr_tpu.models.policy_net_1 import gumbel_log_softmax

LN2 = 0.69314  # the reference's literal constant (policy_net_2.py:101)


class PolicyNet2(nn.Module):
    num_frames: int = 20
    fc_dims: Sequence[int] = (1024, 512, 256, 64)
    temperature: float = 0.7
    is_critic: bool = False
    dtype: Any = jnp.bfloat16
    # Stage-1 compute layout. "s2d" computes the 1-channel 160² conv+pool
    # in space-to-depth-8 form (exact same math, CanvasConv3x3 docstring);
    # MEASURED NEGATIVE at the flagship point — the assembled kernel's 64x
    # FLOP amplification outweighs any layout win (batch-24 RL step 1.455
    # vs 1.230 s/step; XLA already lowers C_in=1 convs onto the MXU well),
    # so "auto" resolves to the plain layout and "s2d" stays as the
    # parity-tested escape hatch for future shapes.
    canvas_impl: str = "auto"   # "auto"(= plain) | "plain" | "s2d"
    # Per-sample trunk-norm statistics (deterministic serving): a clip's
    # context selection no longer depends on its batchmates. Default False =
    # the reference's train-mode-forever batch stats (cfg.model.
    # per_sample_stats; docs/migration.md). Same params either way. Note the
    # critic's axis-0 feature standardization (value(), policy_net_2.py:
    # 103-108 parity) keeps batch coupling regardless — the critic never
    # acts in serving.
    per_sample_stats: bool = False

    def setup(self):
        # Every trunk conv feeds a BatchStatNorm, so each bias is
        # mathematically cancelled by the norm's mean subtraction —
        # fold_bias_into_norm skips the add (a separate bandwidth pass on
        # TPU; +3.7% on the whole RL step) while keeping the param declared
        # for checkpoint structure (CanvasConv3x3 docstring).
        conv = lambda f: CanvasConv3x3(  # noqa: E731
            f, dtype=self.dtype, fold_bias_into_norm=True
        )
        self.convs = [conv(64), conv(128), conv(256), conv(512)]
        self.norms = [
            BatchStatNorm(dtype=self.dtype, per_sample=self.per_sample_stats)
            for _ in range(4)
        ]
        out = 1 if self.is_critic else self.num_frames
        self.final_fc = MLP(tuple(self.fc_dims) + (out,))

    def _stage1_packed(self) -> bool:
        return self.canvas_impl == "s2d"

    def _video_conv(self, canvas: jnp.ndarray) -> jnp.ndarray:
        """(B,160,160,1) -> (B,1024). Parity: policy_net_2.py:41-60."""
        x = canvas.astype(self.dtype)
        if self._stage1_packed():
            # (B,20,20,8,8,64): BN stats see the same value multiset as the
            # plain layout; max over the block axes IS the 8x8/stride-8 pool
            y = nn.relu(self.norms[0](self.convs[0](x, packed=True)))
            x = jnp.max(y, axis=(3, 4))                                  # 20x20x64
        else:
            x = max_pool(nn.relu(self.norms[0](self.convs[0](x))), (8, 8))  # 20x20x64
        x = max_pool(nn.relu(self.norms[1](self.convs[1](x))), (4, 4))   # 5x5x128
        x = nn.relu(self.norms[2](self.convs[2](x)))                      # 5x5x256 (1x pool)
        x = nn.relu(self.norms[3](self.convs[3](x)))                      # 5x5x512
        x = max_pool(x, (2, 2), (2, 1))                                   # 2x4x512
        x = max_pool(x, (2, 2), (2, 2))                                   # 1x2x512
        return x.reshape(x.shape[0], -1).astype(jnp.float32)              # 1024

    def _stacked(self, canvas: jnp.ndarray, target_feat: jnp.ndarray) -> jnp.ndarray:
        vector_out = self._video_conv(canvas)
        return jnp.concatenate(
            [vector_out, target_feat.astype(jnp.float32)], axis=1
        )  # (B, 2048)

    def masked_logits(self, canvas, target_feat, target_idx) -> jnp.ndarray:
        """Raw standardized logits with the target's own logit zeroed
        (policy_net_2.py:110-124). target_idx: int (B,) or (B,1)."""
        if self.is_critic:
            raise ValueError("masked_logits() is for the actor head")
        stacked = self._stacked(canvas, target_feat)
        logits = self.final_fc(stacked)
        idx = target_idx.reshape(-1).astype(jnp.int32)
        onehot = jax.nn.one_hot(idx, self.num_frames, dtype=logits.dtype)
        logits = logits * (1.0 - onehot)  # scatter_(1, target, 0)
        return standardize(logits, axis=1, eps=0.1)

    def __call__(self, canvas, target_feat, target_idx, rng, greedy=False):
        return self.act(canvas, target_feat, target_idx, rng, greedy)

    def act(self, canvas, target_feat, target_idx, rng, greedy=False):
        """Sample top-2 context frames. Returns (actions (B,2), logprob (B,)).
        Parity: policy_net_2.py:94-102. `greedy=True` (static) drops the
        Gumbel noise — deterministic top-2 of the policy marginals, the
        standard policy-evaluation readout (documented deviation: the
        reference samples everywhere, rovr.py:141); training never uses it."""
        logits = self.masked_logits(canvas, target_feat, target_idx)
        if greedy:
            logp = jax.nn.log_softmax(logits / self.temperature, axis=1)
        else:
            logp = gumbel_log_softmax(logits, rng, self.temperature)
        top = jax.lax.top_k(logp, 2)
        logprob = jnp.sum(top[0], axis=1) / 2 + LN2
        return (
            jax.lax.stop_gradient(top[1]),
            jax.lax.stop_gradient(logprob),
        )

    def logprob(self, canvas, target_feat, target_idx, action, rng) -> jnp.ndarray:
        """PPO logprob of a stored context pair with fresh Gumbel noise,
        via the outer product of marginals (policy_net_2.py:127-142)."""
        if self.is_critic:
            raise ValueError("logprob() is for the actor head")
        stacked = self._stacked(canvas, target_feat)
        logits = self.final_fc(stacked)
        idx = target_idx.reshape(-1).astype(jnp.int32)
        onehot = jax.nn.one_hot(idx, self.num_frames, dtype=logits.dtype)
        logits = logits * (1.0 - onehot)
        # NOTE: the reference's PPO path does NOT re-standardize after masking
        # (policy_net_2.py:138-140), unlike the rollout path — kept faithful.
        logp = gumbel_log_softmax(logits, rng, self.temperature)
        lpa = jnp.take_along_axis(logp, action[:, 0:1], axis=1)[:, 0]
        lpb = jnp.take_along_axis(logp, action[:, 1:2], axis=1)[:, 0]
        return (lpa + lpb) / 2 + LN2

    def value(self, canvas, target_feat) -> jnp.ndarray:
        """Critic: batch-standardize the 2048-d feature then final_fc -> 1
        (policy_net_2.py:103-108)."""
        if not self.is_critic:
            raise ValueError("value() is for the critic head")
        stacked = self._stacked(canvas, target_feat)
        stacked = standardize(stacked, axis=0, eps=0.001)
        return self.final_fc(stacked)[:, 0]


def convert_torch_state_dict(state_dict) -> dict:
    """Map a reference PolicyNetwork2UNet checkpoint (policy_net_2.py:41-69)
    to this param pytree. video_conv Sequential indices 0/4/8/12 are convs,
    1/5/9/13 BatchNorms, final_fc 0..4 bare Linears.

    Layout note: torch flattens the conv trunk (B, 512, 1, 2) channel-major
    while this module flattens NHWC (B, 1, 2, 512) spatial-major, so the
    first 1024 input rows of final_fc's Dense_0 are permuted accordingly
    (rows 1024..2047 — the target feature half — map through unchanged)."""
    import numpy as np

    params = {}
    for j, seq in enumerate((0, 4, 8, 12)):
        w = np.asarray(state_dict[f"video_conv.{seq}.weight"])
        params[f"convs_{j}"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": np.asarray(state_dict[f"video_conv.{seq}.bias"]),
        }
        params[f"norms_{j}"] = {
            "scale": np.asarray(state_dict[f"video_conv.{seq + 1}.weight"]),
            "bias": np.asarray(state_dict[f"video_conv.{seq + 1}.bias"]),
        }
    fc = {}
    for j in range(5):
        k = np.asarray(state_dict[f"final_fc.{j}.weight"]).T  # (in, out)
        b = np.asarray(state_dict[f"final_fc.{j}.bias"])
        if j == 0:
            # torch row index for conv-half input (C=512, H=1, W=2):
            # c*2 + w; ours: w*512 + c.
            c_count, h_count, w_count = 512, 1, 2
            perm = np.empty(c_count * h_count * w_count, np.int64)
            for w_i in range(w_count):
                for c_i in range(c_count):
                    perm[w_i * c_count + c_i] = c_i * w_count + w_i
            k = np.concatenate([k[:1024][perm], k[1024:]], axis=0)
        fc[f"Dense_{j}"] = {"kernel": k, "bias": b}
    params["final_fc"] = fc
    return params
