"""Pipeline parallelism: GPipe-style layer pipelining over a mesh axis.

The reference is single-device and has no pipeline parallelism (SURVEY.md
§2.14 — the strategy row is "Absent"); this module is the rebuild's
TPU-native answer for models whose layer stack outgrows one chip or whose
batch can hide the pipeline bubble. It targets the one homogeneous layer
stack in the framework — the attention context policy's EncoderBlocks
(models/policy_attention.py, the revival of the reference's dead
common_layers.py:94-105 blocks) — but is generic over any
`stage_fn(params, x) -> x` whose input/output shapes match.

Design (the standard TPU pipelining recipe — SPMD collective-permute, not
point-to-point sends): the L layers are stacked into S = mesh.shape[axis]
stages (leading pytree axis, sharded over `axis` so each device holds its
stage's parameters only). The batch is split into M microbatches. All
devices run the same program for M + S - 1 ticks; at each tick a device

    1. takes its input — stage 0 injects microbatch t from the (replicated)
       input stream, later stages use the activation received from their
       neighbor on the previous tick,
    2. applies its stage (a lax.scan over the layers it owns),
    3. rotates the result one step around the ring via lax.ppermute (rides
       ICI; XLA overlaps the permute with the next tick's compute).

The last stage's outputs from ticks S-1 .. M+S-2 are the pipelined result;
a masked psum replicates them to every device. The bubble is the usual
GPipe (S-1)/(M+S-1) fraction — raise `microbatches` to amortize it.

Backward: every op here (scan, ppermute, where, psum) is differentiable, so
`jax.grad` through `pipeline_apply` yields the reverse pipeline (reversed
ring, reverse scan) automatically — no hand-written schedule.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rovr_tpu.parallel.mesh import MODEL_AXIS


def stack_layers(layer_params: Sequence[Any], stages: int) -> Any:
    """Stack per-layer param pytrees into a (stages, layers_per_stage, ...)
    pytree. Layer i goes to stage i // (L // stages) — contiguous blocks of
    layers per stage, preserving application order."""
    n = len(layer_params)
    if stages <= 0 or n % stages:
        raise ValueError(f"{n} layers do not split into {stages} stages")
    per = n // stages
    return jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape((stages, per) + jnp.shape(xs[0])),
        *layer_params,
    )


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    microbatches: int = 0,
) -> jnp.ndarray:
    """Run `x` through the pipelined layer stack.

    stage_fn: (per-stage params with leading layers-per-stage axis, activation
      (mb, ...)) -> activation (mb, ...).
    stacked_params: pytree with leading axis S = mesh.shape[axis]
      (`stack_layers`); sharded so each device keeps only its stage.
    x: (B, ...) — batch must divide by `microbatches`.
    microbatches: 0 picks S (the minimum that fills the pipeline).
    """
    s = mesh.shape[axis]
    if s == 1:  # degenerate: no pipelining, avoid the shard_map round-trip
        return stage_fn(jax.tree.map(lambda p: p[0], stacked_params), x)

    batch_axes = tuple(a for a in mesh.axis_names if a != axis)

    def per_device(params, xs):
        # params: (1, per_stage, ...) local slice; xs: the local batch shard —
        # replicated over `axis`, sharded over the batch axes.
        params = jax.tree.map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        # microbatch the LOCAL batch: the largest divisor <= the request
        # (default S, the minimum that fills the pipeline).
        local_b = xs.shape[0]
        m = min(microbatches or s, local_b)
        while local_b % m:
            m -= 1
        mb = local_b // m
        stream = xs.reshape((m, mb) + xs.shape[1:])
        fwd = [(i, (i + 1) % s) for i in range(s)]

        def tick(recv, t):
            inject = stream[jnp.minimum(t, m - 1)]
            act = jnp.where(stage == 0, inject, recv)
            # Inter-stage activations ride the ring in the INPUT dtype:
            # mixed-precision stages that widen internally (bf16 in, f32
            # residual out) are rounded back at the stage boundary — the
            # standard pipeline send-buffer precision, which also keeps the
            # scan carry type fixed and halves ppermute bytes under bf16.
            out = stage_fn(params, act).astype(xs.dtype)
            return jax.lax.ppermute(out, axis, fwd), out

        # ppermute output varies over `axis`, so the initial carry must be
        # marked varying over it too (shard_map's vma type check).
        init = jax.lax.pcast(jnp.zeros_like(stream[0]), axis, to="varying")
        _, outs = jax.lax.scan(tick, init, jnp.arange(m + s - 1))
        # ticks s-1 .. m+s-2 of the LAST stage hold the results, in order
        result = outs[s - 1:].reshape(xs.shape)
        keep = (stage == s - 1).astype(result.dtype)
        return jax.lax.psum(keep * result, axis)

    bspec = P(batch_axes if batch_axes else None)
    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), bspec),
        out_specs=bspec,
    )(stacked_params, x)


def pipeline_layers(
    apply_layer: Callable[[Any, jnp.ndarray], jnp.ndarray],
    layer_params: List[Any],
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    microbatches: int = 0,
) -> jnp.ndarray:
    """Convenience wrapper: pipeline a list of per-layer params through
    `apply_layer(params_i, x) -> x`, S stages = mesh.shape[axis]."""
    stacked = stack_layers(layer_params, mesh.shape[axis])

    def stage_fn(stage_params, act):
        def body(carry, p):
            # fixed carry dtype across the layer scan (see pipeline_apply's
            # tick: widening layers are rounded back between applications)
            return apply_layer(p, carry).astype(carry.dtype), None

        out, _ = jax.lax.scan(body, act, stage_params)
        return out

    return pipeline_apply(
        stage_fn, stacked, x, mesh, axis=axis, microbatches=microbatches
    )
