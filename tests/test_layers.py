"""Fast-tier, jax-only pins for the shared layers — above all max_pool
(models/layers.py), which has two lowerings for non-overlapping pools:
"reduce_window" (the default — measured winner at the flagship bench point,
single-winner backward like torch) and "reshape" (opt-in — forward
identical, backward splits cotangents at EXACT ties; both documented in the
max_pool docstring). Reference pooling semantics: rovr/policy_net_2.py:44-59,
rovr/local_net.py:12-21, rovr/policy_net_1.py:20-29.

Every (window, strides, padding) combination the model zoo uses is listed in
POOL_SHAPES; a new pool shape added to a model should be added here too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from rovr_tpu.models import layers
from rovr_tpu.models.layers import max_pool

# (window, strides, padding, input spatial) — every combo in the repo:
#   pn2 canvas trunk 8x8, 4x4, 2x2/s(2,1), 2x2 (policy_net_2.py:93-98)
#   UNets + VGG 2x2 (local_net.py:63-65, policy_net_1.py:84-97, vgg_lpips.py:64)
#   frozen ResNet stem 3x3/s2 padded 1 (resnet.py:116)
POOL_SHAPES = [
    ((8, 8), (8, 8), None, (160, 160)),
    ((4, 4), (4, 4), None, (20, 20)),
    ((2, 2), (2, 2), None, (5, 5)),       # non-divisible: VALID trims to 2x2
    ((2, 2), (2, 1), None, (5, 5)),
    ((2, 2), (2, 2), None, (64, 64)),
    ((3, 3), (2, 2), ((1, 1), (1, 1)), (56, 56)),
    ((2, 2), (2, 2), None, (7, 9)),       # odd dims both axes
]


def _reference_pool(x, window, strides, padding):
    return nn.max_pool(
        x, window_shape=window, strides=strides,
        padding="VALID" if padding is None else padding,
    )


def test_default_impl_is_reduce_window():
    """The measured-winner default (max_pool docstring A/B); flips only via
    the ROVR_MAXPOOL_FAST env opt-in."""
    assert layers._DEFAULT_POOL_IMPL == "reduce_window"


@pytest.mark.parametrize("impl", ["reduce_window", "reshape"])
@pytest.mark.parametrize("window,strides,padding,hw", POOL_SHAPES)
def test_forward_matches_reduce_window_random(impl, window, strides, padding, hw):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, *hw, 3), jnp.float32)
    got = max_pool(x, window, strides, padding, impl=impl)
    want = _reference_pool(x, window, strides, padding)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("impl", ["reduce_window", "reshape"])
@pytest.mark.parametrize("window,strides,padding,hw", POOL_SHAPES)
def test_forward_matches_reduce_window_tie_heavy(impl, window, strides, padding, hw):
    """Post-relu-style inputs: mostly exact zeros, plus quantized positives
    so in-window ties are common. Forward max is tie-invariant."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, *hw, 3), jnp.float32)
    x = jnp.round(nn.relu(x) * 4) / 4  # ~40% zeros, coarse value grid
    got = max_pool(x, window, strides, padding, impl=impl)
    want = _reference_pool(x, window, strides, padding)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("window,strides,padding,hw", POOL_SHAPES)
def test_backward_matches_reduce_window_away_from_ties(
    window, strides, padding, hw
):
    """With all-distinct window entries there is one winner; both lowerings
    must route each output cotangent to exactly that input element."""
    n = 2 * hw[0] * hw[1] * 3
    # a permutation of distinct values -> no ties anywhere
    x = jnp.asarray(
        np.random.default_rng(2).permutation(n).astype(np.float32)
    ).reshape(2, *hw, 3)

    def fast(a):
        return jnp.sum(max_pool(a, window, strides, padding, impl="reshape") ** 2)

    def ref(a):
        return jnp.sum(_reference_pool(a, window, strides, padding) ** 2)

    g_fast = jax.grad(fast)(x)
    g_ref = jax.grad(ref)(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-6, atol=0)


def test_backward_tie_semantics_pinned():
    """At EXACT ties the reshape impl splits the cotangent evenly across
    tied positions (jnp.max VJP) while reduce_window credits a single
    winner — both valid subgradients, both documented in the max_pool
    docstring; pin each so neither silently changes."""
    # one 2x2 window, all four entries tied
    x = jnp.ones((1, 2, 2, 1), jnp.float32)
    g_fast = jax.grad(
        lambda a: jnp.sum(max_pool(a, (2, 2), impl="reshape"))
    )(x)
    np.testing.assert_allclose(np.asarray(g_fast)[0, :, :, 0],
                               np.full((2, 2), 0.25), rtol=0, atol=0)
    g_ref = jax.grad(
        lambda a: jnp.sum(max_pool(a, (2, 2), impl="reduce_window"))
    )(x)
    assert float(jnp.sum(g_ref)) == 1.0  # single winner gets it all
    assert float(jnp.max(g_ref)) == 1.0

    # partial tie: two of four tied at the max -> 0.5 each, others 0
    x2 = jnp.asarray([[[[3.0], [3.0]], [[1.0], [2.0]]]])
    g2 = jax.grad(lambda a: jnp.sum(max_pool(a, (2, 2), impl="reshape")))(x2)
    np.testing.assert_allclose(
        np.asarray(g2)[0, :, :, 0], np.array([[0.5, 0.5], [0.0, 0.0]])
    )


def test_impl_dispatch_lowerings():
    """Structural guard: impl="reshape" must not lower its backward to
    select-and-scatter; the default must use reduce_window forward."""
    def f(a):
        return jnp.sum(max_pool(a, (2, 2), impl="reshape"))

    hlo = jax.jit(jax.grad(f)).lower(
        jnp.zeros((1, 8, 8, 2), jnp.float32)
    ).as_text()
    assert "select_and_scatter" not in hlo and "select-and-scatter" not in hlo

    def f_default(a):
        return jnp.sum(max_pool(a, (2, 2)))

    hlo_fwd = jax.jit(f_default).lower(
        jnp.zeros((1, 8, 8, 2), jnp.float32)
    ).as_text()
    assert "reduce_window" in hlo_fwd or "reduce-window" in hlo_fwd
