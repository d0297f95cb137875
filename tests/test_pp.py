"""Pipeline parallelism (parallel/pp.py): GPipe over the mesh's model axis
matches sequential layer application, forward and backward, and the
attention context policy's pp path produces the sequential result."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier only; fast tier: -m 'not slow'
from jax.sharding import Mesh

from conftest import tiny_model_overrides
from rovr_tpu.config import Config
from rovr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from rovr_tpu.parallel.pp import pipeline_layers, stack_layers


def dense_layer(key, d):
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.normal(k1, (d, d)) * 0.3,
        "b": jax.random.normal(k2, (d,)) * 0.1,
    }


def apply_dense(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


class TestPipelineLayers:
    def test_matches_sequential(self, mesh):
        d, b = 16, 8
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        layers = [dense_layer(k, d) for k in keys]
        x = jax.random.normal(jax.random.PRNGKey(1), (b, 6, d))

        want = x
        for p in layers:
            want = apply_dense(p, want)
        got = pipeline_layers(apply_dense, layers, x, mesh, microbatches=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_microbatch_default_and_nondivisible(self, mesh):
        """microbatches=0 picks the stage count; a local batch that does not
        divide by the request falls back to the largest divisor."""
        d = 8
        layers = [dense_layer(k, d) for k in jax.random.split(jax.random.PRNGKey(2), 4)]
        x = jax.random.normal(jax.random.PRNGKey(3), (6, d))
        want = x
        for p in layers:
            want = apply_dense(p, want)
        for mb in (0, 5):
            got = pipeline_layers(apply_dense, layers, x, mesh, microbatches=mb)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)

    def test_gradients_match(self, mesh):
        d, b = 8, 8
        layers = [dense_layer(k, d) for k in jax.random.split(jax.random.PRNGKey(4), 4)]
        x = jax.random.normal(jax.random.PRNGKey(5), (b, d))

        def loss_seq(ls):
            y = x
            for p in ls:
                y = apply_dense(p, y)
            return jnp.sum(y ** 2)

        def loss_pp(ls):
            return jnp.sum(pipeline_layers(apply_dense, ls, x, mesh) ** 2)

        g_seq = jax.grad(loss_seq)(layers)
        g_pp = jax.grad(loss_pp)(layers)
        for a, b_ in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_pp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=5e-5, atol=5e-5)

    def test_mixed_precision_stage_widens(self, mesh):
        """A stage that takes bf16 activations but returns f32 (the
        mixed-precision EncoderBlock pattern) must not break the scan carry
        type: inter-stage activations are rounded back to the input dtype at
        each stage boundary (pipeline send-buffer precision)."""
        d = 8
        layers = [dense_layer(k, d) for k in jax.random.split(jax.random.PRNGKey(8), 4)]

        def apply_mixed(p, x):
            y = x.astype(jnp.bfloat16) @ p["w"].astype(jnp.bfloat16)
            return jnp.tanh(y.astype(jnp.float32) + p["b"])

        x = jax.random.normal(jax.random.PRNGKey(9), (8, d)).astype(jnp.bfloat16)
        # sequential twin WITH the boundary rounding (1 layer per stage here)
        want = x
        for p in layers:
            want = apply_mixed(p, want).astype(x.dtype)
        got = pipeline_layers(apply_mixed, layers, x, mesh, microbatches=2)
        assert got.dtype == x.dtype
        np.testing.assert_allclose(
            np.asarray(want, np.float32), np.asarray(got, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_stack_layers_validates(self):
        layers = [dense_layer(jax.random.PRNGKey(i), 4) for i in range(3)]
        with pytest.raises(ValueError):
            stack_layers(layers, 2)


class TestPolicyPP:
    def test_policy_pp_matches_sequential(self, mesh):
        """AttentionContextPolicy with attn_pp_microbatches pipelines its
        encoder stack and reproduces the sequential masked_logits."""
        from rovr_tpu.models.policy_attention import AttentionContextPolicy

        s, d = 4, 16
        kwargs = dict(num_frames=s, feature_dim=d, hidden_dim=16, num_heads=2,
                      depth=4, patch_tokens=1, dtype=jnp.float32)
        seqpol = AttentionContextPolicy(**kwargs)
        pppol = AttentionContextPolicy(**kwargs, mesh=mesh, pp_microbatches=2)
        feats = jax.random.normal(jax.random.PRNGKey(6), (s, s, d))
        tgt = jnp.arange(s)
        params = seqpol.init(jax.random.PRNGKey(7), feats, tgt,
                             jax.random.PRNGKey(0))["params"]
        want = seqpol.apply({"params": params}, feats, tgt,
                            method=AttentionContextPolicy.masked_logits)
        got = pppol.apply({"params": params}, feats, tgt,
                          method=AttentionContextPolicy.masked_logits)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
