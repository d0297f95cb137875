"""Expert parallelism (models/moe.py): switch-routed MoE FFN for the
attention context policy, experts sharded over the mesh's model axis.

The reference has no MoE or any distributed strategy (SURVEY.md §2.14);
this is the rebuild's EP leg of the parallelism matrix."""

import pytest

pytestmark = pytest.mark.slow  # full-tier only; fast tier: -m 'not slow'

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from rovr_tpu.models.attention import FeedForwardBlock
from rovr_tpu.models.moe import MoEFeedForward
from rovr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

DT = jnp.float32


def _x(b=2, l=8, d=32, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, l, d), DT)


class TestMoEMath:
    def test_single_expert_equals_dense_ffn(self):
        """E=1 with full capacity: the gate prob is softmax over one expert
        (=1.0), so MoE with transplanted weights must EXACTLY reproduce the
        dense FFN (common_layers.py:80-92 shape)."""
        x = _x()
        d, f = 32, 8
        dense = FeedForwardBlock(hidden_dim=d, dtype=DT)
        dp = dense.init(jax.random.PRNGKey(1), x)["params"]

        moe = MoEFeedForward(hidden_dim=d, num_experts=1,
                             capacity_factor=1.0, dtype=DT)
        mp = moe.init(jax.random.PRNGKey(2), x)["params"]
        mp = dict(
            mp,
            LayerNorm_0=dp["LayerNorm_0"],
            w1=dp["Dense_0"]["kernel"][None],
            b1=dp["Dense_0"]["bias"][None],
            w2=dp["Dense_1"]["kernel"][None],
            b2=dp["Dense_1"]["bias"][None],
        )
        y_dense = dense.apply({"params": dp}, x)
        y_moe = moe.apply({"params": mp}, x)
        np.testing.assert_allclose(
            np.asarray(y_moe), np.asarray(y_dense), rtol=2e-5, atol=2e-6
        )

    def test_ample_capacity_keeps_every_token(self):
        """Regression: the dispatch slot formula must count only tokens
        routed to the SAME expert (a cumsum*onehot - 1 form leaked -1 from
        the E-1 unrouted columns, silently dropping each expert's first
        E-1 tokens). With capacity >= tokens, every token's output must
        match a capacity-free dense re-computation of its routed expert."""
        x = _x(b=1, l=16, d=32, seed=3)
        e, d, f = 4, 32, 8
        moe = MoEFeedForward(hidden_dim=d, num_experts=e,
                             capacity_factor=float(e), dtype=DT)
        p = moe.init(jax.random.PRNGKey(0), x)["params"]
        y = np.asarray(moe.apply({"params": p}, x))[0]          # (16, d)

        # capacity-free reference: route each token, apply its expert's MLP
        from flax import linen as nn

        ln = nn.LayerNorm(param_dtype=jnp.float32)
        tok = np.asarray(
            ln.apply({"params": p["LayerNorm_0"]}, x)
        )[0]                                                     # (16, d)
        logits = tok @ np.asarray(p["router"]["kernel"]) + np.asarray(
            p["router"]["bias"]
        )
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        expert = probs.argmax(-1)
        gate = probs.max(-1)
        w1, b1 = np.asarray(p["w1"]), np.asarray(p["b1"])
        w2, b2 = np.asarray(p["w2"]), np.asarray(p["b2"])
        for i in range(16):
            ei = expert[i]
            h = np.asarray(jax.nn.gelu(jnp.asarray(tok[i] @ w1[ei] + b1[ei])))
            ref = gate[i] * (h @ w2[ei] + b2[ei])
            assert not np.all(y[i] == 0.0), f"token {i} dropped"
            np.testing.assert_allclose(y[i], ref, rtol=2e-4, atol=2e-5)

    def test_capacity_drops_give_zero_delta(self):
        """Tokens overflowing an expert's capacity contribute exactly 0
        (the residual stream carries them through — Switch semantics)."""
        x = _x(b=1, l=16, d=32)
        # capacity_factor tiny -> cap = 1 slot/expert -> most tokens dropped
        moe = MoEFeedForward(hidden_dim=32, num_experts=2,
                             capacity_factor=0.01, dtype=DT)
        p = moe.init(jax.random.PRNGKey(0), x)["params"]
        y = np.asarray(moe.apply({"params": p}, x))
        zero_rows = np.all(y[0] == 0.0, axis=-1)
        assert zero_rows.sum() >= 14  # 16 tokens, <=1 kept per expert
        assert np.all(np.isfinite(y))

    def test_router_aux_sown(self):
        x = _x()
        moe = MoEFeedForward(hidden_dim=32, num_experts=4, dtype=DT)
        p = moe.init(jax.random.PRNGKey(0), x)["params"]
        _, inter = moe.apply(
            {"params": p}, x, mutable=["intermediates"]
        )
        (aux,) = inter["intermediates"]["moe_aux"]
        # Switch aux is >= 1 with equality at perfect balance
        assert float(aux) >= 0.99

    def test_gradients_flow_to_experts(self):
        x = _x()
        moe = MoEFeedForward(hidden_dim=32, num_experts=2, dtype=DT)
        p = moe.init(jax.random.PRNGKey(0), x)["params"]
        g = jax.grad(lambda p: jnp.sum(moe.apply({"params": p}, x) ** 2))(p)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))
        assert float(jnp.sum(jnp.abs(g["w1"]))) > 0.0


class TestExpertParallelMesh:
    def test_sharded_matches_single_device(self):
        """EP is a layout change, not a math change: the mesh-constrained
        forward (experts over the model axis, GSPMD all-to-alls) matches the
        meshless result."""
        devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devices, (DATA_AXIS, MODEL_AXIS))
        x = _x(b=4, l=8, d=32)

        plain = MoEFeedForward(hidden_dim=32, num_experts=4, dtype=DT)
        p = plain.init(jax.random.PRNGKey(0), x)["params"]
        y_ref = plain.apply({"params": p}, x)

        sharded = MoEFeedForward(hidden_dim=32, num_experts=4, dtype=DT,
                                 mesh=mesh, expert_axis=MODEL_AXIS)
        y_ep = jax.jit(lambda p, x: sharded.apply({"params": p}, x))(p, x)
        np.testing.assert_allclose(
            np.asarray(y_ep), np.asarray(y_ref), rtol=2e-5, atol=2e-6
        )


class TestPolicyWithMoE:
    def test_act_logprob_value(self):
        from rovr_tpu.models.policy_attention import AttentionContextPolicy

        pol = AttentionContextPolicy(
            num_frames=4, feature_dim=16, hidden_dim=32, num_heads=2,
            depth=1, patch_tokens=1, dtype=DT, attn_impl="jnp",
            moe_experts=2,
        )
        feats = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16), DT)
        tgt = jnp.array([0, 1])
        rng = jax.random.PRNGKey(1)
        p = pol.init(rng, feats, tgt, rng)["params"]
        assert "moe_ff" in p["block0"]
        acs, lp = pol.apply({"params": p}, feats, tgt, rng)
        assert acs.shape == (2, 2) and lp.shape == (2,)
        assert np.all(np.isfinite(np.asarray(lp)))
        lp2 = pol.apply(
            {"params": p}, feats, tgt, acs, rng,
            method=AttentionContextPolicy.logprob,
        )
        assert np.all(np.isfinite(np.asarray(lp2)))
