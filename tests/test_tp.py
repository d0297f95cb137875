"""Tensor parallelism for the attention context policy (parallel/tp.py):
spec rules, and a 2x2 (data x model) mesh train step matching the
single-device result."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier only; fast tier: -m 'not slow'
from jax.sharding import Mesh, PartitionSpec as P

from conftest import tiny_model_overrides
from rovr_tpu.config import Config
from rovr_tpu.parallel import tp
from rovr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from rovr_tpu.train import rl

DT = jnp.float32


def tiny_cfg() -> Config:
    c = Config()
    return c.replace(
        data=dataclasses.replace(c.data, frame_size=(32, 32), vid_length=4),
        model=dataclasses.replace(
            c.model,
            **dict(tiny_model_overrides(), local_net_channels=(4, 8, 16, 32),
                   pn2_fc_dims=(64, 32)),
            pn2_num_frames=4, pn1_num_frames=4,
            canvas_size=64, canvas_tile=32, canvas_tiles_per_row=2,
            feature_dim=64, lstm_hidden_dim=32,
            attn_hidden_dim=32, attn_heads=2, attn_depth=1, attn_patch_tokens=1,
        ),
        rl=dataclasses.replace(
            c.rl, vid_length=4, time_steps=2, n_updates_per_ppo=1,
            batch_size=2, context_policy="attention",
        ),
    )


class TestSpecs:
    def test_attention_kernels_sharded_heads(self):
        cfg = tiny_cfg()
        mods = rl.make_modules(cfg, dtype=DT)
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        specs = tp.param_specs(state.actor2_params)
        blk = specs["block0"]["SelfAttentionBlock_0"]["MultiHeadAttention_0"]
        assert blk["q"]["kernel"] == P(None, MODEL_AXIS, None)
        assert blk["out"]["kernel"] == P(MODEL_AXIS, None, None)
        ff = specs["block0"]["FeedForwardBlock_0"]
        assert ff["Dense_0"]["kernel"] == P(None, MODEL_AXIS)
        assert ff["Dense_1"]["kernel"] == P(MODEL_AXIS, None)
        # non-attention tensors replicate
        assert specs["tokenize"]["kernel"] == P()

    def test_optimizer_mirrors_get_same_specs(self):
        cfg = tiny_cfg()
        mods = rl.make_modules(cfg, dtype=DT)
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        specs = tp.param_specs(state.actor2_opt)
        flat = jax.tree_util.tree_leaves_with_path(specs)
        sharded = [
            s for path, s in flat
            if s != P()
        ]
        assert sharded, "Adam mu/nu of attention kernels must be sharded"


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
class TestTPStep:
    def test_matches_replicated_step(self):
        cfg = tiny_cfg()
        mods = rl.make_modules(cfg, dtype=DT)
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        org = jax.random.uniform(key, (2, 4, 32, 32, 3))
        video = jnp.clip(org + 0.1 * jax.random.normal(key, org.shape), 0, 1)
        rng = jax.random.PRNGKey(2)

        ref_state, ref_metrics, _ = rl.train_step(
            state, mods, cfg, video, org, rng
        )

        devices = np.asarray(jax.devices()[:4]).reshape(2, 2)
        mesh = Mesh(devices, (DATA_AXIS, MODEL_AXIS))
        step = tp.make_tp_train_step(mesh, mods, cfg)
        tp_state, tp_metrics, _ = step(state, video, org, rng)

        for k in ref_metrics:
            np.testing.assert_allclose(
                float(tp_metrics[k]), float(ref_metrics[k]),
                rtol=2e-2, atol=2e-3, err_msg=k,
            )
        # sharded actor params updated identically (up to reduction order)
        ra = jax.tree.leaves(ref_state.actor2_params)
        ta = jax.tree.leaves(jax.device_get(tp_state.actor2_params))
        for a, b in zip(ra, ta):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3
            )
