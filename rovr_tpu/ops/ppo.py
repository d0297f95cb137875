"""PPO-clip objective.

Parity: ROVR.ppo (reference: rovr/rovr.py:281-337): ratio =
exp(curr_logprob - old_logprob); surrogate = min(ratio * A,
clip(ratio, 1±clip) * A); actor_loss = -mean(surrogate); critic_loss =
MSE(V, rtg). The reference's 5-epoch loop with separate Adam steps lives in
the trainer (train/rl.py) as a `lax.scan` over optimizer updates.
"""

from __future__ import annotations

import jax.numpy as jnp


def ppo_clip_actor_loss(
    curr_logprob: jnp.ndarray,
    old_logprob: jnp.ndarray,
    advantages: jnp.ndarray,
    clip: float = 0.2,
) -> jnp.ndarray:
    """-mean(min(r*A, clip(r)*A)) (rovr.py:314-324).

    The log-ratio is bounded at ±20 before exponentiation: fresh-Gumbel
    logprobs far from the behavior sample can be hundreds of nats apart,
    and exp() of that is inf (NaN through the surrogate). e^±20 is already
    far outside the clip interval, so the bound never changes the objective
    in the trust region.
    """
    ratio = jnp.exp(jnp.clip(curr_logprob - old_logprob, -20.0, 20.0))
    l1 = ratio * advantages
    l2 = jnp.clip(ratio, 1.0 - clip, 1.0 + clip) * advantages
    return -jnp.mean(jnp.minimum(l1, l2))


def critic_loss(values: jnp.ndarray, rtgs: jnp.ndarray) -> jnp.ndarray:
    """MSE(V, rtg) (rovr.py:325)."""
    return jnp.mean((values - rtgs) ** 2)
