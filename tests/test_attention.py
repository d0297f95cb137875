"""Attention path tests: Pallas flash kernel (interpret mode), ring
attention over the CPU mesh, the revived transformer blocks, and the
attention context policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rovr_tpu.ops.pallas.attention import (
    _reference_attention,
    flash_attention,
    supported,
)


class TestFlashAttention:
    def test_matches_reference(self):
        k = jax.random.PRNGKey(0)
        q, kk, v = [
            jax.random.normal(key, (1, 2, 256, 128), jnp.float32)
            for key in jax.random.split(k, 3)
        ]
        out = flash_attention(q, kk, v, 128, 128, True)
        ref = _reference_attention(q, kk, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gradients_match_reference(self):
        k = jax.random.PRNGKey(1)
        q, kk, v = [
            jax.random.normal(key, (1, 1, 128, 128), jnp.float32)
            for key in jax.random.split(k, 3)
        ]
        g = jax.grad(lambda q: flash_attention(q, kk, v, 64, 64, True).sum())(q)
        gr = jax.grad(lambda q: _reference_attention(q, kk, v).sum())(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-4)

    def test_supported_gating(self):
        # CPU backend -> kernel not selected by the auto dispatcher
        assert not supported((1, 2, 256, 128))
        assert not supported((1, 2, 250, 128))  # unaligned L
        assert not supported((1, 2, 256, 64))   # unaligned D


class TestRingAttention:
    def test_matches_full_attention_on_mesh(self):
        from jax.sharding import Mesh

        from rovr_tpu.parallel.ring_attention import ring_self_attention_sharded

        devices = np.asarray(jax.devices())
        mesh = Mesh(devices, ("seq",))
        k = jax.random.PRNGKey(2)
        # L = 64 split across 8 devices -> 8 tokens per shard
        q, kk, v = [
            jax.random.normal(key, (2, 2, 64, 32), jnp.float32)
            for key in jax.random.split(k, 3)
        ]
        out = ring_self_attention_sharded(mesh, q, kk, v, "seq")
        ref = _reference_attention(q, kk, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )


class TestTransformerBlocks:
    def test_encoder_decoder_shapes(self):
        from rovr_tpu.models.attention import DecoderBlock, EncoderBlock

        k = jax.random.PRNGKey(3)
        x = jax.random.normal(k, (2, 16, 64))
        enc = EncoderBlock(64, 4, dtype=jnp.float32)
        p = enc.init(k, x)
        y = enc.apply(p, x)
        assert y.shape == x.shape
        dec = DecoderBlock(64, 4, dtype=jnp.float32)
        pd = dec.init(k, x, y)
        z = dec.apply(pd, x, y)
        assert z.shape == x.shape


class TestAttentionContextPolicy:
    @pytest.fixture(scope="class")
    def policy(self):
        from rovr_tpu.models.policy_attention import AttentionContextPolicy

        m = AttentionContextPolicy(
            num_frames=8, feature_dim=64, hidden_dim=32, num_heads=2,
            depth=1, patch_tokens=2, dtype=jnp.float32,
        )
        k = jax.random.PRNGKey(4)
        feats = jax.random.normal(k, (3, 8, 64))
        tgt = jnp.array([0, 3, 7])
        params = m.init(k, feats, tgt, k)["params"]
        return m, params, feats, tgt

    def test_act(self, policy):
        m, params, feats, tgt = policy
        acs, logp = m.apply({"params": params}, feats, tgt, jax.random.PRNGKey(5))
        assert acs.shape == (3, 2) and logp.shape == (3,)
        assert np.all(np.asarray(acs) >= 0) and np.all(np.asarray(acs) < 8)

    def test_logprob_and_value(self, policy):
        from rovr_tpu.models.policy_attention import AttentionContextPolicy

        m, params, feats, tgt = policy
        acs = jnp.tile(jnp.array([[1, 2]]), (3, 1))
        lp = m.apply(
            {"params": params}, feats, tgt, acs, jax.random.PRNGKey(6),
            method=AttentionContextPolicy.logprob,
        )
        assert lp.shape == (3,)
        critic = AttentionContextPolicy(
            num_frames=8, feature_dim=64, hidden_dim=32, num_heads=2,
            depth=1, patch_tokens=2, dtype=jnp.float32, is_critic=True,
        )
        cp = critic.init(
            jax.random.PRNGKey(7), feats, tgt,
            method=AttentionContextPolicy.value,
        )["params"]
        v = critic.apply(
            {"params": cp}, feats, tgt, method=AttentionContextPolicy.value
        )
        assert v.shape == (3,)

    def test_target_logit_zeroed_before_standardize(self, policy):
        from rovr_tpu.models.policy_attention import AttentionContextPolicy

        m, params, feats, tgt = policy
        logits = m.apply(
            {"params": params}, feats, tgt,
            method=AttentionContextPolicy.masked_logits,
        )
        assert logits.shape == (3, 8)
        assert np.all(np.isfinite(np.asarray(logits)))
