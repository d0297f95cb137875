"""Reward bookkeeping: rewards-to-go and normalized advantages.

Parity: ROVR.compute_rewards_to_go (reference: rovr/rovr.py:268-278, reverse
discounted sum with gamma=1) and the advantage normalization inside ppo
(rovr.py:302-303). Both are pure jittable functions; the reverse Python loop
becomes `lax.scan(..., reverse=True)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rewards_to_go(rewards: jnp.ndarray, gamma: float = 1.0) -> jnp.ndarray:
    """Reverse discounted cumulative sum along axis 0.

    rewards: (T,) or (T, B). Returns same shape.
    """
    def step(carry, r):
        rtg = r + gamma * carry
        return rtg, rtg

    _, rtg = jax.lax.scan(step, jnp.zeros_like(rewards[0]), rewards, reverse=True)
    return rtg


def normalized_advantage(
    rtgs: jnp.ndarray, values: jnp.ndarray, eps: float = 1e-10
) -> jnp.ndarray:
    """A_k = rtg - stop_grad(V), standardized (rovr.py:302-303).

    Uses torch-style unbiased std for parity.
    """
    a = rtgs - jax.lax.stop_gradient(values)
    std = jnp.std(a, ddof=1) if a.size > 1 else jnp.float32(0.0)
    return (a - jnp.mean(a)) / (std + eps)
