"""Fused 3x3 conv + bias + ReLU Pallas kernel for TPU (NHWC, stride 1,
same padding).

The fused conv+activation block named for the UNet hot path (SURVEY.md §7.8;
reference UNet forward: rovr/local_net.py:52-71). The 3x3 convolution is
decomposed into 9 shifted (TH*W, Cin) x (Cin, Cout) matmuls accumulated in
float32 on the MXU, with the bias + ReLU epilogue fused into the same VMEM
residency.

Halo handling without manual DMA (the axon remote-compile path rejects
in-kernel `make_async_copy`): the input is zero-padded to (H+2, W+2) once on
the XLA side, and THREE phase-shifted row views (rows 0..H, 1..H+1, 2..H+2)
are passed as separate operands. A row block j of view dy is exactly the
rows the dy-th tap needs for output block j — so every tap patch is a plain
static slice of a standard VMEM BlockSpec block, and Pallas's automatic
pipelining streams the tiles.

Backward runs through the XLA conv reference via custom_vjp (same pattern as
ops/pallas/attention.py) — the UNet is gradient-free in the RL rollout, and
pretrain backward stays on the XLA path.

Measured on 1x v5e (serialized scan over distinct inputs, bf16;
docs/performance.md methodology). Batch 4:

  128x128x64 -> 128 : pallas 17 TF/s   xla 19 TF/s   (0.90x)
   64x64x128 -> 256 : pallas 24 TF/s   xla 23 TF/s   (1.03x)
   64x64x512 -> 256 : pallas 60 TF/s   xla 59 TF/s   (1.02x)
  128x128x256-> 128 : pallas 33 TF/s   xla 49 TF/s   (0.68x)
  256x256x128->  64 : pallas 17 TF/s   xla 27 TF/s   (0.63x)

and batch widens the envelope out from under the kernel (batch 24, the
flagship training point):

   64x64x128 -> 256 : pallas 59 TF/s   xla  75 TF/s  (0.79x)
   32x32x256 -> 512 : pallas 68 TF/s   xla  77 TF/s  (0.89x)
   64x64x512 -> 256 : pallas 76 TF/s   xla 138 TF/s  (0.55x)

These convs are HBM-bandwidth-bound; the nine materialized shift views
amplify input bytes, so the kernel only wins where compute dominates
(small spatial, wide aligned channels). `supported()` encodes exactly that
envelope, and the default model path keeps XLA's conv elsewhere — the
honest TPU-first call is to hand XLA what it already schedules optimally.
Unaligned Cin (e.g. the UNet's 9-channel input layer) is rejected: lane
padding 9->128 makes the Mosaic kernel strictly worse.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_TILE_BUDGET = 1 * 1024 * 1024  # per-view input tile budget
_VMEM_ACC_BUDGET = 4 * 1024 * 1024   # f32 accumulator budget


def _pick_row_block(h: int, w: int, cin: int, cout: int,
                    itemsize: int = 2) -> int:
    """Largest divisor TH of H fitting both the (TH, W+2, Cin) view tiles
    (x3, double-buffered) and the (TH*W, Cout) f32 accumulator in VMEM."""
    for k in range(1, h + 1):
        if h % k:
            continue
        th = h // k
        if (th * (w + 2) * cin * itemsize <= _VMEM_TILE_BUDGET
                and th * w * cout * 4 <= _VMEM_ACC_BUDGET):
            return th
    return 1


def supported(shape: Tuple[int, ...]) -> bool:
    """(B, H, W, Cin) profitable for the kernel on a TPU backend.

    Measured envelope (v5e, see module docstring): the kernel ties or beats
    XLA's conv on compute-dominated shapes (small spatial extent, lane-
    aligned channels) and loses on bandwidth-dominated ones (the nine shift
    views amplify input traffic), so auto-dispatch only opts in where the
    measurements support it.
    """
    if len(shape) != 4:
        return False
    b, h, w, cin = shape
    if cin % 128 != 0 or h * w > 64 * 64:
        return False
    # Batch widens the envelope out from under the kernel: re-measured with
    # chained in-jit timing on the v5e (conv3/4/5 of the flagship UNet),
    # the kernel wins only up to ~16k output pixels and cin <= 256 —
    # b4@64^2: 531 vs 581 us, b4@32^2: 550 vs 628 — and loses beyond
    # (b8@64^2: 614 vs 583; b24@64^2x512in: 3039 vs 1676 us, XLA hits
    # 138 TF/s there). The nine materialized shift views amplify input
    # traffic 9x, which batch turns from latency filler into the bound.
    if b * h * w > 16384 or cin > 256:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _conv_kernel(*refs, th: int, w: int, cin: int, cout: int, relu: bool):
    view_refs, w_ref, b_ref, o_ref, acc_ref = refs[:9], refs[9], refs[10], \
        refs[11], refs[12]
    # Explicit VMEM accumulator with in-place updates — an SSA `acc = acc +`
    # chain keeps several (TH*W, Cout) f32 copies live and blows the 16 MB
    # scoped-vmem limit. Each tap patch is a WHOLE view block (the 9 shifts
    # are materialized XLA-side), so the reshape is layout-free and no
    # in-kernel slicing (which Mosaic requires 8-aligned) happens.
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for t in range(9):
        # rank-3 contraction straight off the VMEM block — a reshape to
        # (TH*W, Cin) materializes a relayout copy per tap and overflows the
        # scoped-vmem stack
        acc_ref[...] += jax.lax.dot_general(
            view_refs[t][0], w_ref[t // 3, t % 3, :, :],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc_ref[...] + b_ref[0, :].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[...] = acc.reshape(1, th, w, cout).astype(o_ref.dtype)


def _forward(x, kernel, bias, relu: bool, interpret: bool = False):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    th = _pick_row_block(h, w, cin, cout, jnp.dtype(x.dtype).itemsize)
    nrb = h // th

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # nine (B, H, W, Cin) shift views, one per tap
    views = [
        xp[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)
    ]

    view_spec = pl.BlockSpec(
        (1, th, w, cin), lambda i, j: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    fn = functools.partial(
        _conv_kernel, th=th, w=w, cin=cin, cout=cout, relu=relu
    )
    return pl.pallas_call(
        fn,
        grid=(b, nrb),
        in_specs=[view_spec] * 9 + [
            pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((th, w, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=(b * h * w * (3 * cin + cout)) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*views, kernel.astype(x.dtype), bias.reshape(1, -1))


def _reference(x, kernel, bias, relu: bool):
    # Dtype-uniform on purpose: with preferred_element_type=f32 and bf16
    # operands the conv's TRANSPOSE rule receives an f32 cotangent (the
    # output astype transposes to a cast-to-f32) and builds a mixed-dtype
    # conv, which lax rejects — breaking any backward through this path
    # (the UNet pretrain step in bf16). TPU conv on bf16 operands still
    # accumulates in f32 on the MXU; only the bias+ReLU epilogue rounds
    # through bf16, matching the Pallas kernel within bf16 resolution.
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn,
    )
    y = y + bias.astype(y.dtype)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_conv3x3(x, kernel, bias, relu: bool = True, interpret: bool = False):
    """y = relu(conv3x3_same(x, kernel) + bias), NHWC/HWIO, fused on TPU.

    x (B,H,W,Cin); kernel (3,3,Cin,Cout) float32; bias (Cout,).
    `interpret=True` runs in the Pallas interpreter (CPU tests).
    """
    return _forward(x, kernel, bias, relu, interpret)


def _fwd(x, kernel, bias, relu, interpret):
    return _forward(x, kernel, bias, relu, interpret), (x, kernel, bias)


def _bwd(relu, interpret, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(lambda a, k, c: _reference(a, k, c, relu), x, kernel, bias)
    return vjp(g)


fused_conv3x3.defvjp(_fwd, _bwd)
