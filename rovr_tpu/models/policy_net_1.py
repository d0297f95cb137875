"""Policy network π₁ / V₁: pick WHICH frame to reconstruct next from the
composite state canvas.

Parity: PolicyNetwork1UNet (reference: rovr/policy_net_1.py:11-114) — a
3-level UNet over the (80,80) canvas + LSTM history token (6 input channels),
head convs + maxpools to a 400-d flatten, per-sample standardization, then a
400->25 actor head (Gumbel-softmax, tau=0.5) or 400->1 critic head.

Dead in the reference's shipped main path (usage commented out,
rovr/rovr.py:118-128) but part of the declared MDP; first-class here.

Functional deviations (documented per SURVEY.md §7):
  * Standardizations use keepdims means. The reference's
    `logits - logits.mean(dim=1)` (policy_net_1.py:99) only broadcasts for
    batch size 1; the keepdims form is the evident intent.
  * Gumbel sampling takes an explicit PRNG key (reference uses torch global
    RNG, policy_net_1.py:101).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rovr_tpu.models.layers import BatchStatNorm, ConvBlock, UpConvBlock, max_pool, standardize


class PolicyNet1(nn.Module):
    num_frames: int = 25
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    temperature: float = 0.5
    is_critic: bool = False
    dtype: Any = jnp.bfloat16
    # Restrict sampling to the first `valid_frames` logits. The reference's
    # head is a fixed 400->25 (policy_net_1.py:13) while clips carry
    # vid_length (default 20) frames — harmless there because π₁ is dead
    # code (rovr.py:118-128), but a TRAINED π₁ sampling index >= vid_length
    # would select an empty canvas tile and hit clamped gathers downstream.
    # None = no masking (pure reference parity).
    valid_frames: Any = None
    # Noise-free logprobs for PPO (the cfg.rl.ppo_policy1 training path).
    # The reference recomputes logprobs with FRESH Gumbel noise
    # (policy_net_1.py:107-114), which makes the PPO ratio
    # exp(lp_new - lp_old) noise-dominated — measured: 300 iterations of
    # π₁ PPO left coverage flat (results/pipeline_tpu.json policy1 curve).
    # Gumbel-max sampling draws EXACTLY from softmax(logits), so the true
    # action log-probability is log_softmax(logits)[action], available
    # without noise; exact mode uses it in both act() and logprob().
    # False = the reference's noisy form (parity; π₁ is dead code there).
    exact_logprob: bool = False
    # Per-sample norm statistics (deterministic serving; see PolicyNet2 /
    # cfg.model.per_sample_stats). False = reference batch stats.
    per_sample_stats: bool = False

    def setup(self):
        c1, c2, c3, c4 = self.channels
        ps = self.per_sample_stats
        self.enc = [
            ConvBlock(c, dtype=self.dtype, per_sample_stats=ps)
            for c in (c1, c2, c3, c4)
        ]
        self.up = [
            UpConvBlock(c, dtype=self.dtype, per_sample_stats=ps)
            for c in (c3, c2, c1)
        ]
        self.dec = [
            ConvBlock(c, dtype=self.dtype, per_sample_stats=ps)
            for c in (c3, c2, c1)
        ]
        self.head1 = nn.Conv(3, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)
        self.head1_norm = BatchStatNorm(dtype=self.dtype, per_sample=ps)
        self.head2 = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)
        self.head2_norm = BatchStatNorm(dtype=self.dtype, per_sample=ps)
        self.fc_final = nn.Dense(
            1 if self.is_critic else self.num_frames, param_dtype=jnp.float32
        )

    def _unet(self, x: jnp.ndarray) -> jnp.ndarray:
        # encoder (policy_net_1.py:61-65)
        x1 = self.enc[0](x)
        x2 = self.enc[1](max_pool(x1, (2, 2)))
        x3 = self.enc[2](max_pool(x2, (2, 2)))
        x4 = self.enc[3](max_pool(x3, (2, 2)))
        # decoder with skips (policy_net_1.py:69-79)
        y = self.up[0](x4)
        y = self.dec[0](jnp.concatenate([y, x3], axis=-1))
        y = self.up[1](y)
        y = self.dec[1](jnp.concatenate([y, x2], axis=-1))
        y = self.up[2](y)
        y = self.dec[2](jnp.concatenate([y, x1], axis=-1))
        # head (policy_net_1.py:81-84)
        y = nn.relu(self.head1_norm(self.head1(y)))
        y = nn.relu(self.head2_norm(self.head2(max_pool(y, (2, 2)))))
        return max_pool(y, (2, 2))

    def logits(self, image: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        """image (B,80,80,3) canvas, context (B,80,80,3) history token."""
        x = jnp.concatenate([image, context], axis=-1).astype(self.dtype)
        feat = self._unet(x).reshape(x.shape[0], -1).astype(jnp.float32)
        # per-sample standardization (policy_net_1.py:91-93; unbiased std, no eps)
        feat = standardize(feat, axis=1, eps=0.0)
        return self.fc_final(feat)

    def _mask_invalid(self, logits: jnp.ndarray) -> jnp.ndarray:
        """-1e9 on logits beyond valid_frames so softmax support is exactly
        the frames that exist (no-op when valid_frames is None or covers the
        whole head)."""
        if self.valid_frames is None or self.valid_frames >= self.num_frames:
            return logits
        ok = jnp.arange(self.num_frames) < self.valid_frames
        return jnp.where(ok, logits, jnp.float32(-1e9))

    def __call__(self, image, context, rng):
        return self.act(image, context, rng)

    def act(self, image, context, rng) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample a frame index. Returns (action (B,), logprob (B,))."""
        if self.is_critic:
            raise ValueError("act() is for the actor head")
        logits = self.logits(image, context)
        logits = standardize(logits, axis=1, eps=0.1)  # policy_net_1.py:99
        masked = self._mask_invalid(logits)
        logp = gumbel_log_softmax(masked, rng, self.temperature)
        action = jnp.argmax(logp, axis=1)
        if self.exact_logprob:
            # argmax(logits + g) samples from softmax(logits) (Gumbel-max);
            # the true behavior logprob is noise-free.
            exact = jax.nn.log_softmax(masked.astype(jnp.float32), axis=1)
            logprob = jnp.take_along_axis(exact, action[:, None], axis=1)[:, 0]
        else:
            logprob = jnp.max(logp, axis=1)
        return jax.lax.stop_gradient(action), jax.lax.stop_gradient(logprob)

    def logprob(self, image, context, action, rng) -> jnp.ndarray:
        """Recompute log-prob of `action`: noise-free log_softmax in exact
        mode (see exact_logprob), else with fresh Gumbel noise
        (policy_net_1.py:107-114)."""
        logits = self.logits(image, context)
        if self.exact_logprob:
            # same standardized+masked form as act() so the PPO ratio is 1
            # at unchanged parameters
            logits = standardize(logits, axis=1, eps=0.1)
            logp = jax.nn.log_softmax(
                self._mask_invalid(logits).astype(jnp.float32), axis=1
            )
        else:
            logp = gumbel_log_softmax(self._mask_invalid(logits), rng,
                                      self.temperature)
        return jnp.take_along_axis(logp, action[:, None], axis=1)[:, 0]

    def value(self, image, context) -> jnp.ndarray:
        if not self.is_critic:
            raise ValueError("value() is for the critic head")
        return self.logits(image, context)[:, 0]


def convert_torch_state_dict(state_dict) -> dict:
    """Map a reference PolicyNetwork1UNet checkpoint (policy_net_1.py:20-57)
    to this param pytree: conv1-4 -> enc_0-3, upconv1-3 -> up_0-2,
    conv5-7 -> dec_0-2, conv8/bn8 -> head1, conv9/bn9 -> head2, fc_final.
    Conv2d OIHW -> HWIO; ConvTranspose2d IOHW -> flipped HWIO; BatchNorm2d
    weight/bias -> BatchStatNorm scale/bias (running stats dropped — the
    reference never leaves train mode, see layers.BatchStatNorm)."""
    import numpy as np

    def conv(name):
        w = np.asarray(state_dict[f"{name}.weight"])
        return {"kernel": w.transpose(2, 3, 1, 0),
                "bias": np.asarray(state_dict[f"{name}.bias"])}

    def bn(name):
        return {"scale": np.asarray(state_dict[f"{name}.weight"]),
                "bias": np.asarray(state_dict[f"{name}.bias"])}

    def upconv(name):
        w = np.asarray(state_dict[f"{name}.weight"])  # (in, out, kh, kw)
        return {"kernel": np.ascontiguousarray(
                    w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)),
                "bias": np.asarray(state_dict[f"{name}.bias"])}

    params = {}
    for i in range(4):
        params[f"enc_{i}"] = {"Conv_0": conv(f"conv{i + 1}"),
                              "BatchStatNorm_0": bn(f"bn{i + 1}")}
    for i in range(3):
        params[f"up_{i}"] = {"ConvTranspose_0": upconv(f"upconv{i + 1}"),
                             "BatchStatNorm_0": bn(f"bn_up{i + 1}")}
        params[f"dec_{i}"] = {"Conv_0": conv(f"conv{i + 5}"),
                              "BatchStatNorm_0": bn(f"bn{i + 5}")}
    params["head1"] = conv("conv8")
    params["head1_norm"] = bn("bn8")
    params["head2"] = conv("conv9")
    params["head2_norm"] = bn("bn9")
    import numpy as np

    params["fc_final"] = {
        "kernel": np.asarray(state_dict["fc_final.weight"]).T,
        "bias": np.asarray(state_dict["fc_final.bias"]),
    }
    return params


def gumbel_softmax(logits: jnp.ndarray, rng, temperature: float) -> jnp.ndarray:
    """softmax((logits + Gumbel noise) / tau) — torch F.gumbel_softmax(hard=False)."""
    g = jax.random.gumbel(rng, logits.shape, dtype=logits.dtype)
    return jax.nn.softmax((logits + g) / temperature, axis=-1)


def gumbel_log_softmax(
    logits: jnp.ndarray, rng, temperature: float
) -> jnp.ndarray:
    """log_softmax((logits + Gumbel noise) / tau), float32.

    The numerically stable twin of log(gumbel_softmax(...)): with unbounded
    logits (the PPO logprob path skips re-standardization, faithful to
    policy_net_2.py:138-140) softmax probabilities underflow to exact 0 and
    log() yields -inf — which surfaced as actor_loss=NaN one PPO update into
    real training. log_softmax never produces -inf for finite logits.
    """
    logits = logits.astype(jnp.float32)
    g = jax.random.gumbel(rng, logits.shape, jnp.float32)
    return jax.nn.log_softmax((logits + g) / temperature, axis=-1)
