"""Ring attention: sequence-parallel attention over a named mesh axis.

The sub-quadratic long-clip path named in the north star (BASELINE.json
config 5: 64-frame clips). The reference has no system-level sequence
parallelism — its answer to sequence length is algorithmic frame selection
(SURVEY.md §5 "Long-context") and its transformer blocks are dead code
(reference: rovr/common_layers.py:54-118). Here the revived attention
encoder scales past one chip: the frame-patch sequence is sharded across the
mesh, each device computes blockwise attention of its local queries against
the resident key/value shard, and the k/v shards rotate around the ring via
`lax.ppermute` over ICI while the online-softmax (max, sum, accumulator)
triple merges partial results — O(L/n) memory per chip, compute overlapped
with neighbor transfers by XLA's async collective scheduling.

Use `ring_attention` inside shard_map (it takes the mesh axis name), or
`ring_self_attention_sharded` for a ready-made pjit'ed call.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG_INF = -1e30


def _block_merge(m_prev, s_prev, acc, q, k, v, scale):
    """Merge one k/v block into the running online-softmax state.

    q (B,H,Lq,D); k,v (B,H,Lk,D); m/s (B,H,Lq,1); acc (B,H,Lq,D).
    """
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    s_new = s_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return m_new, s_new, acc_new


def ring_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, axis_name: str
) -> jnp.ndarray:
    """Full (non-causal) attention with k/v ring-rotated along `axis_name`.

    Call inside shard_map. q,k,v: the LOCAL sequence shards (B, H, L/n, D).
    Returns the local output shard (B, H, L/n, D).
    """
    n = jax.lax.axis_size(axis_name)
    scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, carry):
        m, s, acc, kk, vv = carry
        m, s, acc = _block_merge(m, s, acc, qf, kk, vv, scale)
        # rotate k/v to the next device; skipped after the last block
        kk = jax.lax.ppermute(kk, axis_name, perm)
        vv = jax.lax.ppermute(vv, axis_name, perm)
        return m, s, acc, kk, vv

    # Derive the initial carry from the local q shard so it inherits q's
    # device-varying axes exactly (shard_map vma typing): under a
    # multi-axis mesh the batch varies on the data axis and the sequence on
    # the ring axis, and the loop carry must match the body output's type.
    m0 = jnp.full_like(qf[..., :1], _NEG_INF)
    s0 = jnp.zeros_like(qf[..., :1])
    acc0 = jnp.zeros_like(qf)
    m, s, acc, _, _ = jax.lax.fori_loop(0, n, body, (m0, s0, acc0, k, v))
    return (acc / s).astype(q.dtype)


def ring_self_attention_sharded(
    mesh: Mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    seq_axis: str,
) -> jnp.ndarray:
    """pjit wrapper: shard (B, H, L, D) q/k/v on L across `seq_axis` and run
    ring attention; output sharded the same way."""
    spec = P(None, None, seq_axis, None)
    fn = jax.shard_map(
        functools.partial(ring_attention, axis_name=seq_axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return jax.jit(fn)(q, k, v)
