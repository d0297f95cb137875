"""Blockwise (flash-style) attention in Pallas for TPU — fused fwd + bwd.

This is the sub-quadratic attention component named in the north star
(BASELINE.json config 5): the reference's transformer blocks are dead code
(reference: rovr/common_layers.py:54-118, imported by both policy nets but
never instantiated — SURVEY.md §2.7); here they are revived
(models/attention.py) with the inner product dispatched to this kernel.

Design: online-softmax tiling. Forward grid = (batch*heads, Lq/BQ); each
program holds one query block in VMEM and streams key/value blocks,
maintaining the running (max, sum, weighted-accumulator) triple so the full
(Lq x Lk) logits matrix never materializes — O(L) memory instead of O(L^2).
The two matmuls per block ride the MXU in bfloat16/float32-accumulate.

Shape generality (so the FLAGSHIP config's head_dim-64 path actually fires,
VERDICT r1 item 3): inputs are zero-padded on the XLA side — D up to a lane
multiple (128) and Lq/Lk up to a block multiple. Zero-padded D is exact
(padded lanes contribute nothing to q.k or p.v — and XLA itself lane-pads a
64-wide matmul to 128, so the padding costs nothing extra); padded KEYS are
masked to -inf inside the forward kernel so softmax normalization is exact;
padded QUERY rows are sliced off. The backward needs no masking at all:
padded k/v rows are zero, so their dq contribution vanishes, and padded
query rows carry zero cotangent.

Backward (fused, VERDICT r1 item 6): the forward saves per-query
LSE = m + log s (stored lane-broadcast as (BH, Lq, 128), the layout the TPU
vector unit wants). delta = rowsum(dO * O) is one cheap XLA reduction.
  dq kernel (grid over query blocks): recompute p = exp(s - lse) per k/v
    block, ds = p (dp - delta), accumulate dq += ds k.
  dkv kernel (grid over key blocks): stream query blocks, accumulate
    dv += p^T dO and dk += ds^T q.
Both are O(L) memory like the forward; nothing O(L^2) materializes when
training the attention policy at frame-patch sequence lengths.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BQ = 256
DEFAULT_BK = 256
LANES = 128
_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _blocks(lq: int, lk: int, bq: int, bk: int) -> Tuple[int, int, int, int]:
    """Block sizes clamped to the (lane-rounded) sequence lengths, and the
    padded lengths they induce."""
    bq = min(bq, _round_up(lq, LANES))
    bk = min(bk, _round_up(lk, LANES))
    return bq, bk, _round_up(lq, bq), _round_up(lk, bk)


def supported(q_shape: Tuple[int, ...],
              k_shape: Optional[Tuple[int, ...]] = None,
              bq: int = DEFAULT_BQ, bk: int = DEFAULT_BK) -> bool:
    """True when the kernel profitably handles these (B, H, L, D) shapes on a
    TPU backend. Any D and L compile correctly (padding + masking); the
    envelope check only skips tiny sequences where one XLA-fused softmax
    matmul is already optimal and kernel launch overhead dominates."""
    if len(q_shape) != 4:
        return False
    lq = q_shape[2]
    lk = lq if k_shape is None else k_shape[2]
    if lq * lk < LANES * LANES:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def _pad(x, l_pad: int, d_pad: int):
    b, h, l, d = x.shape
    if l == l_pad and d == d_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, l_pad - l), (0, d_pad - d)))


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                bk: int, scale: float, lk: int):
    """One query block vs all key/value blocks with online softmax.

    q_ref: (BQ, D); k_ref/v_ref: (LK, D); o_ref: (BQ, D);
    lse_ref: (BQ, LANES) lane-broadcast logsumexp.
    """
    q = q_ref[:].astype(jnp.float32) * scale
    bq, d = q.shape
    lk_pad = k_ref.shape[0]
    num_kb = lk_pad // bk
    masked = lk_pad != lk

    def body(i, carry):
        m_prev, s_prev, acc = carry
        k = k_ref[pl.ds(i * bk, bk), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * bk, bk), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + i * bk
            logits = jnp.where(col < lk, logits, _NEG_INF)
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
    m, s, acc = jax.lax.fori_loop(0, num_kb, body, (m0, s0, acc0))
    o_ref[:] = (acc / s).astype(o_ref.dtype)
    lse_ref[:] = jnp.broadcast_to(m + jnp.log(s), (bq, LANES))


def _flash_forward(q, k, v, bq: int, bk: int, interpret: bool = False):
    """Returns (out (B,H,Lq,D), lse (B*H, Lq_pad, LANES))."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = d**-0.5
    d_pad = _round_up(d, LANES)
    bq, bk, lq_pad, lk_pad = _blocks(lq, lk, bq, bk)

    qf = _pad(q, lq_pad, d_pad).reshape(b * h, lq_pad, d_pad)
    kf = _pad(k, lk_pad, d_pad).reshape(b * h, lk_pad, d_pad)
    vf = _pad(v, lk_pad, d_pad).reshape(b * h, lk_pad, d_pad)

    kernel = functools.partial(_fwd_kernel, bk=bk, scale=scale, lk=lk)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, lq_pad // bq),
        in_specs=[
            pl.BlockSpec((None, bq, d_pad), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lk_pad, d_pad), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lk_pad, d_pad), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, bq, d_pad), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, LANES), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, lq_pad, LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_pad * lk_pad * d_pad,
            bytes_accessed=(b * h * (lq_pad + 2 * lk_pad + lq_pad) * d_pad)
            * q.dtype.itemsize,
            transcendentals=b * h * lq_pad * lk_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, lq_pad, d_pad)[:, :, :lq, :d], lse


# ---------------------------------------------------------------------------
# backward


def _dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dq_ref, *,
               bk: int, scale: float):
    """dq for one query block: stream k/v blocks, recompute p from lse.

    q/do/dq: (BQ, D); lse/delta: (BQ, LANES); k/v: (LK, D).
    """
    q = q_ref[:].astype(jnp.float32) * scale
    do = do_ref[:].astype(jnp.float32)
    lse = lse_ref[:, :1]      # (BQ, 1)
    delta = delta_ref[:, :1]  # (BQ, 1)
    bq, d = q.shape
    num_kb = k_ref.shape[0] // bk

    def body(i, acc):
        k = k_ref[pl.ds(i * bk, bk), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * bk, bk), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(logits - lse)  # exact softmax weights (no masking needed:
        # padded keys have k = v = 0, so ds k contributes nothing to dq)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[:] = (acc * scale).astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, bq: int, scale: float):
    """dk/dv for one key/value block: stream query blocks.

    k/v/dk/dv: (BK, D); q/do: (LQ, D); lse/delta: (LQ, LANES).
    """
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    bk, d = k.shape
    num_qb = q_ref.shape[0] // bq

    def body(j, carry):
        dk_acc, dv_acc = carry
        q = q_ref[pl.ds(j * bq, bq), :].astype(jnp.float32) * scale
        do = do_ref[pl.ds(j * bq, bq), :].astype(jnp.float32)
        lse_t = lse_ref[pl.ds(j * bq, bq), :1].reshape(1, bq)
        delta_t = delta_ref[pl.ds(j * bq, bq), :1].reshape(1, bq)
        logits_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BK, BQ) = s^T
        p_t = jnp.exp(logits_t - lse_t)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_t, do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BK, BQ)
        ds_t = p_t * (dp_t - delta_t)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds_t, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    z = jnp.zeros((bk, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_qb, body, (z, z))
    # q was pre-scaled, so dk_acc already carries the 1/sqrt(d) factor
    dk_ref[:] = dk_acc.astype(dk_ref.dtype)
    dv_ref[:] = dv_acc.astype(dv_ref.dtype)


def _flash_backward(res, g, bq: int, bk: int, interpret: bool):
    q, k, v, o, lse = res
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = d**-0.5
    d_pad = _round_up(d, LANES)
    bq, bk, lq_pad, lk_pad = _blocks(lq, lk, bq, bk)

    qf = _pad(q, lq_pad, d_pad).reshape(b * h, lq_pad, d_pad)
    kf = _pad(k, lk_pad, d_pad).reshape(b * h, lk_pad, d_pad)
    vf = _pad(v, lk_pad, d_pad).reshape(b * h, lk_pad, d_pad)
    dof = _pad(g, lq_pad, d_pad).reshape(b * h, lq_pad, d_pad)

    # delta_i = rowsum(dO_i * O_i) — one fused XLA reduction, lane-broadcast
    # to the kernels' (L, LANES) layout. Padded query rows are zero.
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lq_pad - lq)))
    delta = jnp.broadcast_to(
        delta.reshape(b * h, lq_pad, 1), (b * h, lq_pad, LANES)
    )

    row_spec = lambda blk: pl.BlockSpec(  # noqa: E731
        (None, blk, d_pad), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
    )
    full_spec = lambda length: pl.BlockSpec(  # noqa: E731
        (None, length, d_pad), lambda bh, i: (bh, 0, 0),
        memory_space=pltpu.VMEM,
    )
    stat_blk = lambda blk: pl.BlockSpec(  # noqa: E731
        (None, blk, LANES), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
    )
    stat_full = pl.BlockSpec(
        (None, lq_pad, LANES), lambda bh, i: (bh, 0, 0),
        memory_space=pltpu.VMEM,
    )

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, bk=bk, scale=scale),
        grid=(b * h, lq_pad // bq),
        in_specs=[row_spec(bq), row_spec(bq), stat_blk(bq), stat_blk(bq),
                  full_spec(lk_pad), full_spec(lk_pad)],
        out_specs=row_spec(bq),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qf, dof, lse, delta, kf, vf)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, bq=bq, scale=scale),
        grid=(b * h, lk_pad // bk),
        in_specs=[row_spec(bk), row_spec(bk), full_spec(lq_pad),
                  full_spec(lq_pad), stat_full, stat_full],
        out_specs=[row_spec(bk), row_spec(bk)],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lk_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b * h, lk_pad, d_pad), v.dtype),
        ],
        interpret=interpret,
    )(kf, vf, qf, dof, lse, delta)

    dq = dq.reshape(b, h, lq_pad, d_pad)[:, :, :lq, :d]
    dk = dk.reshape(b, h, lk_pad, d_pad)[:, :, :lk, :d]
    dv = dv.reshape(b, h, lk_pad, d_pad)[:, :, :lk, :d]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, bq: int = DEFAULT_BQ, bk: int = DEFAULT_BK,
                    interpret: bool = False):
    """softmax(q k^T / sqrt(d)) v with O(L) memory, any (B, H, L, D)
    (self- or cross-attention; D and L need not be tile-aligned).

    `interpret=True` runs the kernels in the Pallas interpreter (CPU tests)."""
    out, _ = _flash_forward(q, k, v, bq, bk, interpret)
    return out


def _fwd(q, k, v, bq, bk, interpret):
    out, lse = _flash_forward(q, k, v, bq, bk, interpret)
    return out, (q, k, v, out, lse)


def _bwd(bq, bk, interpret, res, g):
    return _flash_backward(res, g, bq, bk, interpret)


flash_attention.defvjp(_fwd, _bwd)
