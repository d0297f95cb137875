"""RL orchestrator tests: rollout semantics, PPO update, full jitted step.

The reference has no tests (SURVEY.md §4); these pin the rebuilt semantics of
ROVR.forward/ppo (reference: rovr/rovr.py:81-337) on tiny shapes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_model_overrides
from rovr_tpu.config import Config
from rovr_tpu.ops.rewards import rewards_to_go
from rovr_tpu.train import rl

DT = jnp.float32


def tiny_config(use_policy1: bool = False, context_policy: str = "canvas") -> Config:
    c = Config()
    return c.replace(
        data=dataclasses.replace(c.data, frame_size=(32, 32), vid_length=4),
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
            c.rl, vid_length=4, time_steps=3, n_updates_per_ppo=2,
            batch_size=2, use_policy1=use_policy1,
            context_policy=context_policy,
        ),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    mods = rl.make_modules(cfg, dtype=DT)
    state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
    h, w = cfg.data.frame_size
    s = cfg.rl.vid_length
    key = jax.random.PRNGKey(1)
    org = jax.random.uniform(key, (2, s, h, w, 3))
    video = jnp.clip(org + 0.1 * jax.random.normal(key, org.shape), 0, 1)
    return cfg, mods, state, video, org


class TestRollout:
    def test_write_frame(self):
        """_write_frame: per-sample scatter writes exactly the indexed frame
        and leaves every other frame untouched (incl. duplicate-free batch
        rows with DIFFERENT indices — the pi1/attention path)."""
        video = jnp.stack(
            [jnp.full((5, 4, 4, 3), float(b)) for b in range(3)]
        )
        frame = jnp.stack([jnp.full((4, 4, 3), 10.0 + b) for b in range(3)])
        idx = jnp.array([0, 3, 4])
        out = np.asarray(rl._write_frame(video, idx, frame))
        for b in range(3):
            for s in range(5):
                want = 10.0 + b if s == int(idx[b]) else float(b)
                assert (out[b, s] == want).all(), (b, s)

    def test_shapes(self, setup):
        cfg, mods, state, video, org = setup
        out = rl.rollout(state, mods, cfg, video, org, jax.random.PRNGKey(2))
        t, b, s = cfg.rl.time_steps, 2, cfg.rl.vid_length
        canvas, target_feat = out.traj.obs
        assert canvas.shape == (t, b, 64, 64, 1)
        assert target_feat.shape == (t, b, 1024)
        assert out.traj.actions.shape == (t, b, 2)
        assert out.traj.logprobs.shape == (t, b)
        assert out.traj.rtgs.shape == (t, b)
        assert out.reconstructed.shape == video.shape
        assert out.experimental.shape == video.shape

    def test_sequential_targets(self, setup):
        """Shipped main path: target_frame_index = t (rovr.py:129)."""
        cfg, mods, state, video, org = setup
        out = rl.rollout(state, mods, cfg, video, org, jax.random.PRNGKey(2))
        expect = np.arange(cfg.rl.time_steps) % cfg.rl.vid_length
        np.testing.assert_array_equal(
            np.asarray(out.traj.target_idx), np.tile(expect[:, None], (1, 2))
        )

    def test_context_actions_in_range(self, setup):
        """π₂ actions are valid frame indices. (The reference's mask only
        ZEROES the target's logit before standardization, policy_net_2.py:
        110-124 — a soft deterrent, not a hard ban, so self-selection is
        possible and we don't assert against it.)"""
        cfg, mods, state, video, org = setup
        out = rl.rollout(state, mods, cfg, video, org, jax.random.PRNGKey(3))
        acs = np.asarray(out.traj.actions)
        assert np.all(acs >= 0) and np.all(acs < cfg.model.pn2_num_frames)

    def test_reconstruction_written_back(self, setup):
        """Each visited frame is replaced by the UNet output (rovr.py:196)."""
        cfg, mods, state, video, org = setup
        out = rl.rollout(state, mods, cfg, video, org, jax.random.PRNGKey(4))
        recon = np.asarray(out.reconstructed)
        # visited frames 0..t-1 differ from the corrupted input
        for t in range(cfg.rl.time_steps):
            assert not np.allclose(recon[:, t], np.asarray(video)[:, t])
        # unvisited frame (index 3) untouched
        np.testing.assert_allclose(recon[:, 3], np.asarray(video)[:, 3])

    def test_rewards_to_go_matches_reference_math(self):
        """Reverse discounted sum, gamma=1 (rovr.py:268-278)."""
        r = jnp.asarray([[1.0], [2.0], [3.0]])
        np.testing.assert_allclose(
            np.asarray(rewards_to_go(r, 1.0)), [[6.0], [5.0], [3.0]]
        )

    def test_lpips_cache_knobs_equivalent(self, setup):
        """lpips_cache_from_stage / lpips_init_chunk are HBM-layout levers
        only: the recomputed early-stage org taps are a bit-identical trunk
        prefix and the chunked init is the same math per frame, so rewards
        and episode metrics must not move."""
        cfg, mods, state, video, org = setup
        outs = {}
        # (cache all, one pass) = the original layout; (1, 0) = recompute
        # stage 0; (1, 2) = + chunked init; (2, 2) = cache nothing.
        for cache_from, chunk in ((0, 0), (1, 0), (1, 2), (2, 2)):
            c = cfg.replace(model=dataclasses.replace(
                cfg.model, lpips_cache_from_stage=cache_from,
                lpips_init_chunk=chunk,
            ))
            outs[(cache_from, chunk)] = rl.rollout(
                state, mods, c, video, org, jax.random.PRNGKey(7)
            )
        base = outs[(0, 0)]
        for key, out in outs.items():
            np.testing.assert_allclose(
                np.asarray(out.traj.rtgs), np.asarray(base.traj.rtgs),
                rtol=2e-5, atol=2e-5, err_msg=str(key),
            )
            np.testing.assert_allclose(
                float(out.metrics["Episode/lpips_loss"]),
                float(base.metrics["Episode/lpips_loss"]),
                rtol=2e-5, err_msg=str(key),
            )

    def test_precomputed_episode_init_equivalent(self, setup):
        """rollout(init=episode_init(...)) is bit-identical to the fused
        rollout — the factoring behind train_step_pipelined must be a pure
        staging change, never a numeric one."""
        cfg, mods, state, video, org = setup
        key = jax.random.PRNGKey(11)
        base = rl.rollout(state, mods, cfg, video, org, key)
        init = rl.episode_init(state, mods, cfg, video, org)
        piped = rl.rollout(state, mods, cfg, video, org, key, init=init)
        np.testing.assert_array_equal(
            np.asarray(base.traj.rtgs), np.asarray(piped.traj.rtgs)
        )
        np.testing.assert_array_equal(
            np.asarray(base.reconstructed), np.asarray(piped.reconstructed)
        )

    def test_attention_policy_path(self):
        """Config-5 attention context policy: rollout + PPO end to end."""
        cfg = tiny_config(context_policy="attention")
        mods = rl.make_modules(cfg, dtype=DT)
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        h, w = cfg.data.frame_size
        key = jax.random.PRNGKey(11)
        org = jax.random.uniform(key, (2, 4, h, w, 3))
        video = jnp.clip(org + 0.1, 0, 1)
        out = rl.rollout(state, mods, cfg, video, org, key)
        (feats,) = out.traj.obs
        assert feats.shape == (cfg.rl.time_steps, 2, 4, 1024)
        new_state, metrics = rl.ppo_update(
            state, mods, cfg, out.traj, jax.random.PRNGKey(12)
        )
        for v in metrics.values():
            assert np.isfinite(float(v))

    @pytest.mark.slow
    def test_spatio_reward_wiring(self):
        """use_spatio_reward / log_spatio (rovr.py:234-243): RAFT flow
        recovery is computed per episode and logged (Episode/spatio); with
        use_spatio_reward it is added to the FINAL step's reward, so under
        gamma=1 every rewards-to-go entry shifts by exactly the per-sample
        spatio bonus vs the log-only rollout."""
        cfg = tiny_config()
        cfg = cfg.replace(rl=dataclasses.replace(
            cfg.rl, use_spatio_reward=True, spatio_flow_size=32))
        mods = rl.make_modules(cfg, dtype=DT)
        assert mods.raft is not None
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        h, w = cfg.data.frame_size
        key = jax.random.PRNGKey(13)
        org = jax.random.uniform(key, (2, 4, h, w, 3))
        video = jnp.clip(org + 0.1, 0, 1)
        out = rl.rollout(state, mods, cfg, video, org, key)
        assert np.isfinite(float(out.metrics["Episode/spatio"]))

        cfg_log = cfg.replace(rl=dataclasses.replace(
            cfg.rl, use_spatio_reward=False, log_spatio=True))
        out_log = rl.rollout(state, mods, cfg_log, video, org, key)
        # same params/key -> same actions/rewards; only the terminal bonus
        # differs. gamma=1 rtg is a suffix sum, so the shift is constant
        # over time and equals the spatio bonus per sample.
        diff = np.asarray(out.traj.rtgs) - np.asarray(out_log.traj.rtgs)
        np.testing.assert_allclose(diff, np.broadcast_to(diff[:1], diff.shape),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            diff[0].mean(), float(out.metrics["Episode/spatio"]),
            rtol=1e-4, atol=1e-6,
        )
        assert "Episode/spatio" in out_log.metrics

    def test_policy1_path(self):
        """Revived π₁+LSTM path traces and returns valid frame indices."""
        cfg = tiny_config(use_policy1=True)
        mods = rl.make_modules(cfg, dtype=DT)
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        h, w = cfg.data.frame_size
        key = jax.random.PRNGKey(5)
        org = jax.random.uniform(key, (1, 4, h, w, 3))
        out = rl.rollout(state, mods, cfg, org, org, key)
        tgt = np.asarray(out.traj.target_idx)
        assert np.all(tgt >= 0) and np.all(tgt < 4)
        # π₁ trajectory recorded for the PPO-on-π₁ path
        assert out.traj.obs1 is not None and out.traj.logprobs1 is not None

    @pytest.mark.slow
    def test_policy1_ppo_trains_actor1(self):
        """cfg.rl.ppo_policy1: PPO updates π₁/V₁ from the shared reward
        stream (the MDP the reference declares but ships unreachable —
        ppo(1, ...) raises, rovr.py:282-283) and reports finite losses plus
        the Episode/coverage readout."""
        cfg = tiny_config(use_policy1=True)
        cfg = cfg.replace(rl=dataclasses.replace(cfg.rl, ppo_policy1=True))
        mods = rl.make_modules(cfg, dtype=DT)
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        h, w = cfg.data.frame_size
        org = jax.random.uniform(jax.random.PRNGKey(5), (2, 4, h, w, 3))
        video = jnp.clip(org + 0.1, 0, 1)
        new_state, metrics, _ = rl._train_step(
            state, mods, cfg, video, org, jax.random.PRNGKey(7)
        )
        assert "PPO/actor1_loss" in metrics and "PPO/critic1_loss" in metrics
        assert "Episode/coverage" in metrics
        assert 0.0 < float(metrics["Episode/coverage"]) <= 1.0
        for v in metrics.values():
            assert np.isfinite(float(v))
        for old, new, name in (
            (state.actor1_params, new_state.actor1_params, "actor1"),
            (state.critic1_params, new_state.critic1_params, "critic1"),
        ):
            d = jax.tree.map(
                lambda a, b: float(jnp.sum(jnp.abs(a - b))), old, new
            )
            assert sum(jax.tree_util.tree_leaves(d)) > 0.0, name


class TestPPO:
    def test_update_changes_params_and_returns_losses(self, setup):
        cfg, mods, state, video, org = setup
        out = rl.rollout(state, mods, cfg, video, org, jax.random.PRNGKey(6))
        new_state, metrics = rl.ppo_update(
            state, mods, cfg, out.traj, jax.random.PRNGKey(7)
        )
        assert "PPO/actor_loss" in metrics and "PPO/critic_loss" in metrics
        # some actor2 leaf must have moved (a conv bias preceding a
        # BatchStatNorm legitimately has zero gradient, so check globally)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.sum(jnp.abs(a - b))),
            state.actor2_params, new_state.actor2_params,
        )
        assert sum(jax.tree_util.tree_leaves(diffs)) > 0.0
        # frozen components untouched
        l0 = jax.tree_util.tree_leaves(state.local_net_params)[0]
        l1 = jax.tree_util.tree_leaves(new_state.local_net_params)[0]
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    def test_full_train_step_jits(self, setup):
        cfg, mods, state, video, org = setup
        new_state, metrics, recon = rl.train_step(
            state, mods, cfg, video, org, jax.random.PRNGKey(8)
        )
        assert int(new_state.step) == int(state.step) + 1
        assert recon.shape == video.shape
        for v in metrics.values():
            assert np.isfinite(float(v))

    def test_pipelined_step_matches_plain(self, setup):
        """train_step_pipelined(state, init_i, batch_i, batch_{i+1}) produces
        the same update + metrics as train_step on batch_i, and hands back
        batch_{i+1}'s episode_init (the double-buffer contract,
        docs/performance.md "Episode-init overlap")."""
        cfg, mods, state, video, org = setup
        key = jax.random.PRNGKey(12)
        nxt_v = jnp.roll(video, 1, axis=0)
        nxt_o = jnp.roll(org, 1, axis=0)
        want_state, want_metrics, want_recon = rl.train_step(
            state, mods, cfg, video, org, key
        )
        want_next = rl.episode_init(state, mods, cfg, nxt_v, nxt_o)
        init = rl.episode_init(state, mods, cfg, video, org)
        # args 0/3 are donated — hand the step private copies so the
        # module-scoped fixture state survives on donation-honoring backends
        state_in, init_in = jax.tree.map(jnp.array, (state, init))
        got_state, got_metrics, got_recon, got_next = rl.train_step_pipelined(
            state_in, mods, cfg, init_in, video, org, nxt_v, nxt_o, key
        )
        np.testing.assert_array_equal(
            np.asarray(want_recon), np.asarray(got_recon)
        )
        for k, v in want_metrics.items():
            np.testing.assert_allclose(
                float(v), float(got_metrics[k]), rtol=1e-5, err_msg=k
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            want_state.actor2_params, got_state.actor2_params,
        )
        np.testing.assert_allclose(
            np.asarray(want_next.curr_loss), np.asarray(got_next.curr_loss),
            rtol=1e-6,
        )


class TestShardedStep:
    @pytest.mark.slow
    def test_data_parallel_mesh(self, setup):
        """The same step jits over an 8-device CPU mesh with the clip batch
        sharded on `data` (SURVEY.md §2.14 rebuild column)."""
        from rovr_tpu.parallel.mesh import make_mesh

        cfg, mods, state, video, org = setup
        mesh = make_mesh()
        assert mesh.devices.size == 8
        step = rl.make_sharded_train_step(mesh, mods, cfg)
        # batch of 8 clips, one per device
        v8 = jnp.tile(video[:1], (8, 1, 1, 1, 1))
        o8 = jnp.tile(org[:1], (8, 1, 1, 1, 1))
        new_state, metrics, _ = step(state, v8, o8, jax.random.PRNGKey(9))
        assert int(new_state.step) == 1
        for v in metrics.values():
            assert np.isfinite(float(v))
