"""Fused conv3x3 Pallas kernel (ops/pallas/conv.py) — interpreter-mode
correctness vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rovr_tpu.ops.pallas import conv as pconv


def _ref(x, k, b, relu=True):
    return pconv._reference(x, k, b, relu)


class TestFusedConv:
    @pytest.mark.parametrize("h,w,cin,cout", [
        (16, 16, 8, 16),    # single row block
        (32, 16, 8, 8),     # multiple row blocks (exercises halo DMA)
    ])
    def test_matches_reference(self, h, w, cin, cout):
        key = jax.random.PRNGKey(0)
        kx, kk, kb = jax.random.split(key, 3)
        x = jax.random.normal(kx, (2, h, w, cin), jnp.float32)
        k = jax.random.normal(kk, (3, 3, cin, cout), jnp.float32) * 0.1
        b = jax.random.normal(kb, (cout,), jnp.float32)
        y = pconv.fused_conv3x3(x, k, b, True, True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(_ref(x, k, b)), atol=1e-4, rtol=1e-4
        )

    def test_halo_rows_multiblock(self):
        """Force tiny row blocks so interior/edge DMA branches all run."""
        old = pconv._VMEM_TILE_BUDGET
        pconv._VMEM_TILE_BUDGET = 16 * 18 * 8 * 4 + 1  # ~1-2 rows per block
        try:
            x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 16, 8))
            k = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 8)) * 0.1
            b = jnp.zeros((8,))
            y = pconv.fused_conv3x3(x, k, b, True, True)
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(_ref(x, k, b)), atol=1e-4, rtol=1e-4
            )
        finally:
            pconv._VMEM_TILE_BUDGET = old

    def test_no_relu(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4))
        k = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 4, 4)) * 0.1
        b = jnp.ones((4,))
        y = pconv.fused_conv3x3(x, k, b, False, True)
        ref = _ref(x, k, b, relu=False)
        assert np.asarray(ref).min() < 0  # relu genuinely off
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    def test_gradients_match_reference(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 8, 4))
        k = jax.random.normal(jax.random.PRNGKey(6), (3, 3, 4, 4)) * 0.1
        b = jnp.zeros((4,))

        def loss_pallas(x, k, b):
            return jnp.sum(pconv.fused_conv3x3(x, k, b, True, True) ** 2)

        def loss_ref(x, k, b):
            return jnp.sum(_ref(x, k, b) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
        for a, c in zip(gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), atol=1e-3, rtol=1e-3
            )

    def test_row_block_picker(self):
        assert pconv._pick_row_block(256, 256, 64, 64) in {256, 128, 64, 32, 16, 8, 4, 2, 1}
        th = pconv._pick_row_block(256, 256, 128, 64)
        assert 256 % th == 0
        assert th * 258 * 128 * 2 <= pconv._VMEM_TILE_BUDGET
        assert th * 256 * 64 * 4 <= pconv._VMEM_ACC_BUDGET
