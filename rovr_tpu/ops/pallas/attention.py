"""Blockwise (flash-style) attention kernel in Pallas for TPU.

This is the sub-quadratic attention component named in the north star
(BASELINE.json config 5): the reference's transformer blocks are dead code
(reference: rovr/common_layers.py:54-118, imported by both policy nets but
never instantiated — SURVEY.md §2.7); here they are revived
(models/attention.py) with the inner product dispatched to this kernel.

Design: online-softmax tiling. Grid = (batch*heads, Lq/BQ); each program
holds one query block in VMEM and streams key/value blocks, maintaining the
running (max, sum, weighted-accumulator) triple so the full (Lq x Lk) logits
matrix never materializes — O(L) memory instead of O(L^2). The two matmuls
per block ride the MXU in bfloat16/float32-accumulate.

Backward: gradients recompute attention with the plain jnp path via
custom_vjp — correct everywhere; a fused Pallas backward is a follow-up.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BQ = 256
DEFAULT_BK = 256
_NEG_INF = -1e30


def supported(shape: Tuple[int, ...], bq: int = DEFAULT_BQ, bk: int = DEFAULT_BK) -> bool:
    """True when (B, H, L, D) q/k/v shapes fit this kernel's tiling and a TPU
    backend is present."""
    if len(shape) != 4:
        return False
    _, _, l, d = shape
    if d % 128 != 0 or l % bq != 0 or l % bk != 0:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, bk: int, scale: float):
    """One query block vs all key/value blocks with online softmax.

    q_ref: (BQ, D); k_ref/v_ref: (L, D); o_ref: (BQ, D).
    """
    q = q_ref[:].astype(jnp.float32) * scale
    bq, d = q.shape
    l = k_ref.shape[0]
    num_kb = l // bk

    def body(i, carry):
        m_prev, s_prev, acc = carry
        k = k_ref[pl.ds(i * bk, bk), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * bk, bk), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        m_cur = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        s_new = s_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, s_new, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    s0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, s, acc = jax.lax.fori_loop(0, num_kb, body, (m0, s0, acc0))
    o_ref[:] = (acc / s).astype(o_ref.dtype)


def _flash_forward(q, k, v, bq: int, bk: int, interpret: bool = False):
    b, h, l, d = q.shape
    scale = d**-0.5
    qf = q.reshape(b * h, l, d)
    kf = k.reshape(b * h, l, d)
    vf = v.reshape(b * h, l, d)

    kernel = functools.partial(_flash_kernel, bk=bk, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, l // bq),
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, l, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, l, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bq, d), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l * l * d,
            bytes_accessed=(3 * b * h * l * d + b * h * l * d) * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, l, d)


def _reference_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, bq: int = DEFAULT_BQ, bk: int = DEFAULT_BK,
                    interpret: bool = False):
    """softmax(q k^T / sqrt(d)) v with O(L) memory. q,k,v: (B, H, L, D).

    `interpret=True` runs the kernel in the Pallas interpreter (CPU tests)."""
    return _flash_forward(q, k, v, bq, bk, interpret)


def _fwd(q, k, v, bq, bk, interpret):
    return _flash_forward(q, k, v, bq, bk, interpret), (q, k, v)


def _bwd(bq, bk, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
