"""Deterministic serving: cfg.model.per_sample_stats (VERDICT r2 weak #8).

The reference runs every module in torch train mode forever, so its
BatchNorms normalize by CURRENT batch statistics (reference:
rovr/policy_net_2.py:41-60 used train-mode-only in rovr/rovr.py) — a clip's
context selection, and therefore its reconstruction, changes with the other
clips in its serving batch. `per_sample_stats=True` computes the same norms
per sample (identical params), making a clip's serving output independent
of its batchmates; default False keeps reference parity
(docs/migration.md).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_model_overrides
from rovr_tpu.config import Config
from rovr_tpu.models.policy_net_2 import PolicyNet2

DT = jnp.float32


def _stack_with_strangers(x0, n, key):
    strangers = jax.random.uniform(key, (n - 1,) + x0.shape[1:], x0.dtype)
    return jnp.concatenate([x0, strangers], axis=0)


class TestPolicyNet2PerSampleStats:
    def _logits(self, per_sample, batch_canvas, batch_feat):
        model = PolicyNet2(dtype=DT, per_sample_stats=per_sample)
        rng = jax.random.PRNGKey(0)
        target = jnp.zeros((batch_canvas.shape[0],), jnp.int32)
        # identical params for both modes: per_sample only changes the
        # reduction axes, not the param tree
        params = PolicyNet2(dtype=DT).init(
            rng, batch_canvas[:1], batch_feat[:1], target[:1], rng
        )
        return model.apply(
            params, batch_canvas, batch_feat, target,
            method=PolicyNet2.masked_logits,
        )

    def test_logits_batch_invariant_per_sample(self):
        """With per_sample_stats the clip's logits are identical alone vs in
        a batch of 8; with batch stats (reference semantics) they differ."""
        k = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(k, 3)
        canvas0 = jax.random.uniform(k1, (1, 160, 160, 1), DT)
        feat0 = jax.random.normal(k2, (1, 1024), DT)
        canvas8 = _stack_with_strangers(canvas0, 8, k3)
        feat8 = _stack_with_strangers(feat0, 8, jax.random.fold_in(k3, 1))

        alone = self._logits(True, canvas0, feat0)
        batched = self._logits(True, canvas8, feat8)
        np.testing.assert_allclose(
            np.asarray(alone[0]), np.asarray(batched[0]), atol=1e-5
        )

        alone_b = self._logits(False, canvas0, feat0)
        batched_b = self._logits(False, canvas8, feat8)
        assert not np.allclose(
            np.asarray(alone_b[0]), np.asarray(batched_b[0]), atol=1e-5
        ), "batch-stat mode unexpectedly batch-invariant"

    def test_critic_stays_batch_coupled_by_design(self):
        """The determinism contract's explicit boundary: PolicyNet2.value's
        axis-0 feature standardization keeps reference parity
        (policy_net_2.py:103-108) and therefore stays batch-coupled EVEN
        with per_sample_stats=True — documented at policy_net_2.py (value
        docstring); acceptable because serving never calls the critic
        (infer.reconstruct_clips uses actors only). If this assertion ever
        fails, the critic was silently decoupled — update the docs and the
        PPO parity story together."""
        k = jax.random.PRNGKey(5)
        k1, k2, k3 = jax.random.split(k, 3)
        canvas0 = jax.random.uniform(k1, (1, 160, 160, 1), DT)
        feat0 = jax.random.normal(k2, (1, 1024), DT)
        canvas8 = _stack_with_strangers(canvas0, 8, k3)
        feat8 = _stack_with_strangers(feat0, 8, jax.random.fold_in(k3, 1))

        model = PolicyNet2(dtype=DT, per_sample_stats=True, is_critic=True)
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, canvas8, feat8, method=PolicyNet2.value)
        alone = model.apply(params, canvas0, feat0, method=PolicyNet2.value)
        batched = model.apply(params, canvas8, feat8, method=PolicyNet2.value)
        assert not np.allclose(
            np.asarray(alone[0]), np.asarray(batched[0]), atol=1e-5
        ), "critic became batch-invariant; the documented boundary moved"


class TestAttentionPolicyBatchInvariance:
    def test_logits_batch_invariant_without_flag(self):
        """The attention context policy is LayerNorm-only (per-token stats)
        so it is batch-invariant WITHOUT per_sample_stats — the other half
        of the determinism contract (docs/migration.md). float32 so the
        comparison is exact-math, not bf16-rounding-limited."""
        from rovr_tpu.models.policy_attention import AttentionContextPolicy

        k = jax.random.PRNGKey(7)
        k1, k2 = jax.random.split(k)
        feats0 = jax.random.normal(k1, (1, 6, 64), DT)
        feats8 = _stack_with_strangers(feats0, 8, k2)
        tgt0 = jnp.zeros((1,), jnp.int32)
        tgt8 = jnp.zeros((8,), jnp.int32)

        model = AttentionContextPolicy(
            num_frames=6, feature_dim=64, hidden_dim=32, num_heads=2,
            depth=2, dtype=DT,
        )
        params = model.init(
            jax.random.PRNGKey(0), feats0, tgt0,
            method=AttentionContextPolicy.masked_logits,
        )
        alone = model.apply(
            params, feats0, tgt0, method=AttentionContextPolicy.masked_logits
        )
        batched = model.apply(
            params, feats8, tgt8, method=AttentionContextPolicy.masked_logits
        )
        np.testing.assert_allclose(
            np.asarray(alone[0]), np.asarray(batched[0]), atol=1e-5
        )


class TestServingBatchInvariance:
    @pytest.mark.slow
    def test_reconstruction_identical_alone_vs_batch(self):
        """End-to-end serving guarantee: with per_sample_stats=True the
        uint8 reconstruction of a clip is BIT-IDENTICAL served alone and
        inside a batch of 4 strangers (infer.reconstruct_clips)."""
        from rovr_tpu import infer
        from rovr_tpu.train import rl

        c = Config()
        # The CANVAS context policy is the one with batch-stat trunk norms
        # (the attention policy is LayerNorm-only and already per-sample),
        # so keep the reference 160^2 canvas geometry its pooling pyramid
        # requires and shrink everything else.
        cfg = c.replace(
            model=dataclasses.replace(
                c.model, **tiny_model_overrides(),
                pn2_num_frames=4, pn1_num_frames=4,
                lstm_hidden_dim=32, per_sample_stats=True,
            ),
            data=dataclasses.replace(
                c.data, frame_size=(32, 32), vid_length=4
            ),
            rl=dataclasses.replace(
                c.rl, vid_length=4, time_steps=4, batch_size=1,
                context_policy="canvas",
            ),
        )
        mods = rl.make_modules(cfg)
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))

        key = jax.random.PRNGKey(11)
        clip = jax.random.uniform(key, (1, 4, 32, 32, 3))
        strangers = jax.random.uniform(
            jax.random.fold_in(key, 1), (3, 4, 32, 32, 3)
        )
        batch = jnp.concatenate([clip, strangers], axis=0)

        (alone, alone_acts), = infer.reconstruct_clips(cfg, state, mods, [clip])
        (batched, batched_acts), = infer.reconstruct_clips(
            cfg, state, mods, [batch]
        )
        np.testing.assert_array_equal(alone[0], batched[0])
        np.testing.assert_array_equal(alone_acts[:, 0], batched_acts[:, 0])
