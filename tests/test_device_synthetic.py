"""On-device synthetic explicit data source (data/device_synthetic.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from rovr_tpu.data import corruption, teacher
from rovr_tpu.data.device_synthetic import (
    DeviceSyntheticExplicit,
    explicit_batch_device,
    synthetic_clips,
)


class TestSyntheticClips:
    def test_contract_and_motion(self):
        clips = synthetic_clips(jax.random.PRNGKey(0), 2, 64, 64, 8)
        assert clips.shape == (2, 8, 64, 64, 3)
        c = np.asarray(clips)
        assert np.all(c >= 0.0) and np.all(c <= 1.0)
        # frames move: consecutive frames differ
        assert np.abs(c[:, 1:] - c[:, :-1]).mean() > 1e-3
        # batch elements differ
        assert not np.allclose(c[0], c[1])

    def test_deterministic(self):
        a = synthetic_clips(jax.random.PRNGKey(7), 1, 32, 32, 4)
        b = synthetic_clips(jax.random.PRNGKey(7), 1, 32, 32, 4)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestExplicitBatchDevice:
    def test_masks_zero_corrupted_pixels(self):
        rng = np.random.default_rng(0)
        assign = teacher.sample_assignment(rng)
        fm = jnp.asarray(assign.frame_masks[None], jnp.int32)
        corrupted, original, masks = explicit_batch_device(
            jax.random.PRNGKey(0), fm, 256, 256
        )
        c, o, m = map(np.asarray, (corrupted, original, masks))
        assert c.shape == o.shape == m.shape == (1, 20, 256, 256, 3)
        # corrupted == original * mask exactly
        np.testing.assert_allclose(c, o * m, atol=1e-6)
        # each frame has some masked region (4 boxes of 50x100 minus overlap)
        frac = 1.0 - m.mean(axis=(0, 2, 3, 4))
        assert np.all(frac > 0.005), frac
        max_frac = 4 * corruption.EXPLICIT_BOX_H * corruption.EXPLICIT_BOX_W / (
            256 * 256
        )
        assert np.all(frac <= max_frac + 1e-6), frac

    def test_box_geometry_matches_host(self):
        """Without jitter noise the box centers follow the host raster grid;
        with jitter, every masked pixel stays within the jitter-expanded
        raster cell of one of the frame's assigned locations."""
        rng = np.random.default_rng(1)
        assign = teacher.sample_assignment(rng)
        fm = jnp.asarray(assign.frame_masks[None], jnp.int32)
        h = w = 256
        _, _, masks = explicit_batch_device(jax.random.PRNGKey(1), fm, h, w)
        m = np.asarray(masks)[0, :, :, :, 0]  # (20, H, W)
        sec_h, sl_w = h // 3, w // 8
        for f in range(20):
            holes = np.argwhere(m[f] == 0)
            if holes.size == 0:
                continue
            ok = np.zeros(len(holes), bool)
            for loc in assign.frame_masks[f]:
                cy = int(loc) // 8 * sec_h + sec_h // 2
                cx = int(loc) % 8 * sl_w + sl_w // 2
                y_lo = cy + corruption.EXPLICIT_JITTER_Y_LO - corruption.EXPLICIT_BOX_H
                y_hi = cy + corruption.EXPLICIT_JITTER_Y_HI + corruption.EXPLICIT_BOX_H
                x_lo = cx + corruption.EXPLICIT_JITTER_X_LO - corruption.EXPLICIT_BOX_W
                x_hi = cx + corruption.EXPLICIT_JITTER_X_HI + corruption.EXPLICIT_BOX_W
                ok |= (
                    (holes[:, 0] >= y_lo) & (holes[:, 0] <= y_hi)
                    & (holes[:, 1] >= x_lo) & (holes[:, 1] <= x_hi)
                )
            assert ok.all(), f"frame {f}: masked pixels outside assigned cells"


class TestDeviceSource:
    def test_contract_and_determinism(self):
        src = DeviceSyntheticExplicit(2, 64, 64, seed=3)
        c1, o1, m1, p1, n1 = src.next(0)
        assert c1.shape == (2, 20, 64, 64, 3)
        assert p1.shape == (2, 20, 16, 2) and n1.shape == (2, 20, 3, 2)
        c2, *_ = DeviceSyntheticExplicit(2, 64, 64, seed=3).next(0)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        c3, *_ = src.next(1)
        assert not np.allclose(np.asarray(c1), np.asarray(c3))
