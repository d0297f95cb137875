"""On-device synthetic explicit data source (data/device_synthetic.py)."""

import pytest

pytestmark = pytest.mark.slow  # full-tier only; fast tier: -m 'not slow'

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


class TestRasterSource:
    def test_masks_match_reference_geometry(self):
        """Raster masks equal corruption.raster_box boxes per frame
        (video_ds.py:62-87 geometry via raster_box_masks_jax)."""
        from rovr_tpu.data.device_synthetic import DeviceSyntheticRaster

        h = w = 160
        src = DeviceSyntheticRaster(2, h, w, seed=5)
        corrupted, original, masks, pos, neg = src.next(0)
        assert pos is None and neg is None
        assert corrupted.shape == (2, 20, h, w, 3)
        m = np.asarray(masks)[0, :, :, :, 0]
        for s in range(20):
            y0, y1, x0, x1 = corruption.raster_box(s, h, w)
            expect = np.ones((h, w))
            expect[y0:y1, x0:x1] = 0.0
            np.testing.assert_array_equal(m[s], expect)
        # corrupted = original * mask
        np.testing.assert_allclose(
            np.asarray(corrupted), np.asarray(original) * np.asarray(masks),
            atol=1e-6,
        )

    def test_positive_pairs_expose_fully(self):
        """raster_positive_pairs: every target-hole pixel is intact in at
        least one pair member — pixel-checked exposure of exactly 1.0."""
        from rovr_tpu.data.device_synthetic import raster_positive_pairs

        h = w = 160
        pairs = raster_positive_pairs(20, h, w, per_frame=4, seed=0)
        assert pairs.shape == (20, 4, 2)
        masks = np.asarray(
            corruption.raster_box_masks_jax(2 * np.arange(20), h, w)
        )[..., 0]  # (20, H, W), 1 = intact
        hole = 1.0 - masks
        for t in range(20):
            for a, b in pairs[t]:
                assert a != t and b != t and a != b
                exposed = hole[t] * (1.0 - hole[a] * hole[b])
                np.testing.assert_array_equal(exposed, hole[t])

    def test_make_source_scheme_switch(self):
        import dataclasses

        from rovr_tpu.config import Config
        from rovr_tpu.data.device_synthetic import (
            DeviceSyntheticRaster, make_source,
        )

        cfg = Config()
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, frame_size=(64, 64), synthetic_scheme="raster"))
        assert isinstance(make_source(cfg, 1, 0, 0.5, 0.0),
                          DeviceSyntheticRaster)
        cfg2 = cfg.replace(data=dataclasses.replace(
            cfg.data, synthetic_scheme="explicit"))
        assert isinstance(make_source(cfg2, 1, 0, 0.5, 0.0),
                          DeviceSyntheticExplicit)

    def test_negative_pairs_low_exposure(self):
        """raster_negative_pairs pick pairs whose joint exposure of the
        target's box is minimal — below any fully-exposing positive."""
        from rovr_tpu.data.device_synthetic import (
            raster_negative_pairs, raster_positive_pairs,
        )

        h = w = 160
        neg = raster_negative_pairs(20, h, w, per_frame=3, seed=0)
        assert neg.shape == (20, 3, 2)
        masks = np.asarray(
            corruption.raster_box_masks_jax(2 * np.arange(20), h, w)
        )[..., 0]
        hole = 1.0 - masks
        for t in range(20):
            for a, b in neg[t]:
                assert a != t and b != t
                exp = (hole[t] * (1 - hole[a] * hole[b])).sum() / hole[t].sum()
                assert exp < 0.75, (t, a, b, exp)
