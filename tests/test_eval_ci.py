"""Variance-proofed held-out evaluation (train/evaluate.run_ci, VERDICT r4
#1): per-clip metrics, greedy + K-draw sampled readouts, t-interval CIs, and
the paired-delta adjudication the flagship learning claim now rides on.

The reference's eval is 20 rollouts averaged with no spread reported
(reference: rovr/rovr.py:223-241, poster "Global Network Results"); these
tests pin the statistics the rebuild adds on top.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_model_overrides
from rovr_tpu.config import Config
from rovr_tpu.train import evaluate, rl


def tiny_config(context_policy: str = "attention") -> Config:
    c = Config()
    return c.replace(
        data=dataclasses.replace(
            c.data, frame_size=(32, 32), vid_length=4,
            synthetic_scheme="raster", synthetic_overlap_free=True,
        ),
        model=dataclasses.replace(
            c.model,
            **tiny_model_overrides(),
            pn2_num_frames=4,
            pn1_num_frames=4,
            canvas_size=64,
            canvas_tile=32,
            canvas_tiles_per_row=2,
            lstm_hidden_dim=32,
            attn_hidden_dim=32,
            attn_heads=2,
            attn_depth=1,
            attn_patch_tokens=2,
        ),
        rl=dataclasses.replace(
            c.rl, vid_length=4, time_steps=3, n_updates_per_ppo=1,
            batch_size=2, context_policy=context_policy,
        ),
    )


class TestStats:
    def test_summarize_matches_t_interval(self):
        vals = [1.0, 2.0, 4.0, 3.0, 5.0]
        s = evaluate.summarize(vals)
        v = np.asarray(vals)
        from scipy import stats

        want_ci = stats.t.ppf(0.975, 4) * v.std(ddof=1) / math.sqrt(5)
        assert s["n"] == 5
        assert s["mean"] == pytest.approx(3.0)
        assert s["ci95"] == pytest.approx(want_ci)

    def test_paired_delta_separation_verdict(self):
        # constant shift: zero variance in the differences -> separates
        a = [10.0, 12.0, 11.0, 13.0]
        b = [x - 1.0 for x in a]
        d = evaluate.paired_delta(a, b)
        assert d["mean"] == pytest.approx(1.0)
        assert d["separates"] is True
        # pure noise around zero: must NOT separate
        rng = np.random.default_rng(0)
        x = rng.normal(size=200)
        d0 = evaluate.paired_delta(x, np.zeros_like(x))
        assert abs(d0["mean"]) < d0["ci95"]
        assert d0["separates"] is False

    def test_pairing_beats_pooled_variance(self):
        # shared per-clip difficulty dominates both arms; the paired CI must
        # come out far tighter than the pooled (unpaired) spread
        rng = np.random.default_rng(1)
        difficulty = rng.normal(scale=5.0, size=100)
        a = 20.0 + difficulty + rng.normal(scale=0.1, size=100)
        b = 19.0 + difficulty + rng.normal(scale=0.1, size=100)
        d = evaluate.paired_delta(a, b)
        assert d["separates"] is True
        assert d["ci95"] < 0.1  # pooled se would be ~1.0
        assert evaluate.summarize(a)["ci95"] > 0.5


class TestEvalCiStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config()
        mods = rl.make_modules(cfg, dtype=jnp.float32)
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        h, w = cfg.data.frame_size
        s = cfg.rl.vid_length
        key = jax.random.PRNGKey(1)
        org = jax.random.uniform(key, (2, s, h, w, 3))
        masks = (jax.random.uniform(
            jax.random.PRNGKey(2), (2, s, h, w, 1)) > 0.2
        ).astype(jnp.float32)
        masks = jnp.broadcast_to(masks, org.shape)
        video = org * masks
        return cfg, mods, state, (video, org, masks)

    def test_shapes_and_determinism(self, setup):
        cfg, mods, state, batch = setup
        key = jax.random.PRNGKey(3)
        r1 = evaluate.eval_ci_step(state, mods, cfg, batch, 4, key)
        r2 = evaluate.eval_ci_step(state, mods, cfg, batch, 4, key)
        for readout in ("greedy", "sampled"):
            for k, v in r1[readout].items():
                assert v.shape == (2,), (readout, k)
                np.testing.assert_array_equal(
                    np.asarray(v), np.asarray(r2[readout][k]),
                    err_msg=f"{readout}/{k} not deterministic")
        # greedy extras exist only in the greedy readout
        assert "masked_psnr_sequential" in r1["greedy"]
        assert "masked_psnr_corrupted" in r1["greedy"]
        assert "masked_psnr_sequential" not in r1["sampled"]

    def test_sampled_draws_are_distinct(self, setup):
        """The K tiled replicas must be INDEPENDENT Gumbel draws: with 1
        draw vs 8 draws the per-clip sampled exposure should differ (a
        broken tile that repeats one draw would make them equal)."""
        cfg, mods, state, batch = setup
        key = jax.random.PRNGKey(3)
        r1 = evaluate.eval_ci_step(state, mods, cfg, batch, 1, key)
        r8 = evaluate.eval_ci_step(state, mods, cfg, batch, 8, key)
        assert not np.allclose(
            np.asarray(r1["sampled"]["exposure_agentic"]),
            np.asarray(r8["sampled"]["exposure_agentic"]),
        )

    def test_greedy_is_noise_free(self, setup):
        """Greedy readout must not depend on the rollout key."""
        cfg, mods, state, batch = setup
        ra = evaluate.eval_ci_step(
            state, mods, cfg, batch, 1, jax.random.PRNGKey(3))
        rb = evaluate.eval_ci_step(
            state, mods, cfg, batch, 1, jax.random.PRNGKey(4))
        for k, v in ra["greedy"].items():
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(rb["greedy"][k]), err_msg=k)


class TestRunCi:
    def test_arms_share_clips_and_report_cis(self):
        """Two arms (different param inits) evaluated with the same cfg must
        see identical clips — their per-clip corrupted-PSNR lists match
        exactly — while their policy metrics differ; summary carries
        mean/ci95/n for every metric."""
        cfg = tiny_config()
        mods = evaluate.make_modules(cfg, dtype=jnp.float32)
        s1 = rl.init_state(cfg, mods.rovr, jax.random.PRNGKey(0))
        s2 = rl.init_state(cfg, mods.rovr, jax.random.PRNGKey(9))
        r1 = evaluate.run_ci(cfg, state=s1, num_videos=4, sample_draws=2,
                             mods=mods)
        r2 = evaluate.run_ci(cfg, state=s2, num_videos=4, sample_draws=2,
                             mods=mods)
        assert r1["n_clips"] >= 4 and r1["draws"] == 2
        np.testing.assert_array_equal(
            r1["per_clip"]["greedy"]["masked_psnr_corrupted"],
            r2["per_clip"]["greedy"]["masked_psnr_corrupted"],
        )
        for readout in ("greedy", "sampled"):
            for k, s in r1["summary"][readout].items():
                assert set(s) == {"mean", "ci95", "n"}, (readout, k)
                assert s["n"] == r1["n_clips"]
                assert np.isfinite(s["mean"]), (readout, k)
        # paired adjudication runs end-to-end on the real output
        d = evaluate.paired_delta(
            r1["per_clip"]["greedy"]["masked_psnr_agentic"],
            r2["per_clip"]["greedy"]["masked_psnr_agentic"],
        )
        assert set(d) == {"mean", "ci95", "n", "separates"}
