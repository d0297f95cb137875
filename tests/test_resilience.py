"""Failure recovery: prefetcher exception propagation + crash-resume driver.

The reference has no failure handling at all (SURVEY.md §5): a crash loses
the process and recovery means hand-editing hardcoded checkpoint paths.
These tests pin the rebuilt subsystem: worker errors surface instead of
hanging the pipeline, and rl.run_resilient restores the newest checkpoint
and continues.
"""

import dataclasses

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier only; fast tier: -m 'not slow'

from conftest import tiny_model_overrides
from rovr_tpu.config import Config
from rovr_tpu.data.dataset import DevicePrefetcher


def tiny_cfg(tmp_path):
    c = Config()
    # even smaller than the shared overrides: these tests step many times
    overrides = dict(
        tiny_model_overrides(),
        local_net_channels=(4, 8, 16, 32), pn2_fc_dims=(64, 32),
    )
    return c.replace(
        data=dataclasses.replace(c.data, frame_size=(32, 32), vid_length=4),
        model=dataclasses.replace(
            c.model,
            **overrides,
            pn2_num_frames=4, pn1_num_frames=4,
            canvas_size=64, canvas_tile=32, canvas_tiles_per_row=2,
            feature_dim=64, lstm_hidden_dim=32,
        ),
        rl=dataclasses.replace(
            c.rl, vid_length=4, time_steps=2, n_updates_per_ppo=1,
            batch_size=1,
        ),
        run=dataclasses.replace(
            c.run, run_dir=str(tmp_path), checkpoint_every=1, log_every=100,
        ),
    )


class FlakyDataset:
    """Explicit-contract dataset that raises exactly once, on the second
    item of the first pass."""

    def __init__(self, n=8, s=4, hw=32):
        self.n, self.s, self.hw = n, s, hw
        self.crashes_left = 1
        self.accesses = 0

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        self.accesses += 1
        if self.accesses == 2 and self.crashes_left:
            self.crashes_left -= 1
            raise RuntimeError("injected data failure")
        rng = np.random.default_rng(idx)
        clip = rng.random((self.s, self.hw, self.hw, 3), np.float32)
        corrupted = clip * 0.9
        masks = np.ones_like(clip)
        pos = rng.integers(0, self.s, (self.s, 2, 2))
        neg = rng.integers(0, self.s, (self.s, 1, 2))
        return corrupted, clip, masks, pos, neg


class TestPrefetcherErrors:
    def test_worker_exception_propagates(self):
        ds = FlakyDataset()
        pf = DevicePrefetcher(ds, num_workers=2, depth=2, to_device=False)
        with pytest.raises(RuntimeError, match="injected data failure"):
            for _ in pf:
                pass
        pf.close()


class TestRunResilient:
    def test_crash_resume_completes(self, tmp_path):
        from rovr_tpu.train import rl

        cfg = tiny_cfg(tmp_path)
        ds = FlakyDataset()
        state = rl.run_resilient(cfg, dataset=ds, iterations=3)
        # first attempt crashed partway; the relaunch restored the newest
        # checkpoint and ran its own 3 iterations
        assert int(state.step) >= 3
        from rovr_tpu.utils.checkpoint import latest_checkpoint_dir

        assert latest_checkpoint_dir(str(tmp_path), "rovr_rl") is not None

    def test_sharded_restore_resumes_on_mesh(self, tmp_path):
        """Kill/resume with SHARDED state on the 8-device CPU mesh: save a
        mesh-trained state, restore it directly to NamedShardings (no
        host-replicated detour), and continue stepping on the mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rovr_tpu.parallel.mesh import make_mesh
        from rovr_tpu.train import rl
        from rovr_tpu.utils.checkpoint import CheckpointManager

        cfg = tiny_cfg(tmp_path)
        cfg = cfg.replace(rl=dataclasses.replace(cfg.rl, batch_size=8))
        mesh = make_mesh()
        mods = rl.make_modules(cfg, dtype=jax.numpy.float32)
        state = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        rep = NamedSharding(mesh, P())
        state = jax.device_put(state, rep)
        step_fn = rl.make_sharded_train_step(mesh, mods, cfg)
        h, w = cfg.data.frame_size
        video = jax.random.uniform(jax.random.PRNGKey(1), (8, 4, h, w, 3))
        state, _, _ = step_fn(state, video, video, jax.random.PRNGKey(2))

        ckpt = CheckpointManager(str(tmp_path / "sharded_ckpt"))
        ckpt.save(0, state, force=True)
        ckpt.wait()
        # simulate a fresh process: template from a re-init, restore sharded
        template = rl.init_state(cfg, mods, jax.random.PRNGKey(0))
        restored = ckpt.restore(template=template, shardings=rep)
        assert restored is not None
        leaf = jax.tree_util.tree_leaves(restored.actor2_params)[0]
        assert leaf.sharding == rep
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(jax.tree_util.tree_leaves(
                state.actor2_params)[0]), rtol=0, atol=0,
        )
        # the restored state steps on the mesh without re-layout
        state2, metrics, _ = step_fn(
            restored, video, video, jax.random.PRNGKey(3)
        )
        assert int(state2.step) == int(state.step) + 1
        assert all(np.isfinite(float(v)) for v in metrics.values())

    def test_gives_up_after_max_restarts(self, tmp_path):
        from rovr_tpu.train import rl

        class AlwaysCrash(FlakyDataset):
            def __getitem__(self, idx):
                raise RuntimeError("permanent failure")

        cfg = tiny_cfg(tmp_path)
        with pytest.raises(RuntimeError, match="permanent failure"):
            rl.run_resilient(
                cfg, dataset=AlwaysCrash(), iterations=2, max_restarts=1
            )
