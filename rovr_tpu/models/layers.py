"""Shared building blocks for the ROVR-TPU model zoo.

Notable design decision — BatchStatNorm: the reference runs every module in
torch train mode forever (no .eval() on the policy nets), so its BatchNorm
layers always normalize by CURRENT batch statistics and the running stats are
never consumed (reference: rovr/policy_net_2.py:41-60 used train-mode-only in
rovr/rovr.py). We reproduce exactly that semantics as a stateless, jit-pure
layer: normalize by batch stats, learn scale/bias, keep no running state.
This sidesteps BatchNorm-mutable-state-under-scan entirely (SURVEY.md §7
"hard parts") while matching the reference's actual numerics.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Default lowering for non-overlapping max pools (see max_pool docstring
# for the measurement history). ROVR_MAXPOOL_FAST=1 opts into the
# reshape+jnp.max path globally; default is lax.reduce_window, the measured
# winner at the flagship bench point.
_DEFAULT_POOL_IMPL = (
    "reshape" if os.environ.get("ROVR_MAXPOOL_FAST", "0") == "1"
    else "reduce_window"
)


class BatchStatNorm(nn.Module):
    """Normalize by current batch statistics over all axes but the last.

    Equivalent to torch BatchNorm2d in train mode (biased variance), NHWC.

    `per_sample=True` excludes the batch axis from the statistics (instance-
    norm-style, same scale/bias params): a sample's output then no longer
    depends on its batchmates — the deterministic-serving mode
    (cfg.model.per_sample_stats; docs/migration.md). Default False is the
    reference's train-mode-forever semantics, where a clip's reconstruction
    CAN change with the composition of its serving batch.
    """

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    per_sample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.per_sample and x.ndim < 3:
            raise ValueError(
                "per_sample stats need at least one non-batch reduction axis"
            )
        axes = tuple(range(1 if self.per_sample else 0, x.ndim - 1))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x32), axis=axes, keepdims=True) - jnp.square(mean)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype if self.dtype is None else self.dtype)


def max_pool(
    x: jnp.ndarray,
    window: Tuple[int, int],
    strides: Optional[Tuple[int, int]] = None,
    padding: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """NHWC max pool; VALID over the (optionally -inf-padded) input —
    `padding=((1,1),(1,1))` matches torch MaxPool2d(padding=1) semantics.

    `impl` picks the lowering for non-overlapping pools (strides == window):
      * "reduce_window" (the default): `lax.reduce_window`, whose backward
        is XLA's select-and-scatter. Gradient routes each cotangent to a
        single winning input, like torch.
      * "reshape": reshape-to-blocks + `jnp.max` over the block axes.
        Forward identical; backward lowers to masked elementwise adds and
        at EXACT ties (e.g. post-relu zeros) splits the cotangent evenly
        across tied positions instead of crediting one winner — both are
        valid subgradients (pinned by tests/test_layers.py).
      * None: _DEFAULT_POOL_IMPL (env ROVR_MAXPOOL_FAST=1 opts into
        "reshape" globally).

    Measurement history (flagship RL step, batch 24, TPU v5e over the axon
    tunnel): a per-op trace attributed ~54 ms/step to select-and-scatter in
    the PPO pool backwards, motivating the reshape path (r3, commit
    8ddb721) — but the whole-step A/B shows reshape LOSES ~120 ms/step net
    (1.301 s/step reshape vs 1.182 reduce_window, BENCH_STEPS=8; it was the
    r3 404->368 frames/s driver-bench regression): the reshape backward's
    broadcast-compare-mask adds cost more than the select-and-scatter they
    replace once XLA fuses them into the surrounding graph. Hence
    reduce_window is the default and reshape stays as an opt-in escape
    hatch for future shapes. NOTE strided-slice `jnp.maximum` chains were
    also tried and are far worse still (stride-2 slices materialize as
    copies: 2.46 s/step) — don't resurrect that variant.

    Overlapping pools (the frozen ResNet stem's 3x3/s2, and 2x2/s(2,1))
    always use reduce_window.
    """
    strides = strides or window
    if (impl or _DEFAULT_POOL_IMPL) == "reshape" and strides == tuple(window):
        wh, ww = window
        b, h, w, c = x.shape
        oh, ow = (h - wh) // wh + 1, (w - ww) // ww + 1
        if padding is None or not any(p for hw in padding for p in hw):
            y = x[:, : oh * wh, : ow * ww, :]  # VALID trim (contiguous slice)
            y = y.reshape(b, oh, wh, ow, ww, c)
            return jnp.max(y, axis=(2, 4))
    return nn.max_pool(
        x, window_shape=window, strides=strides,
        padding="VALID" if padding is None else padding,
    )


def _s2d_conv_assembly(block: int = 8) -> "jnp.ndarray":
    """0/1 assembly tensor T[a,b,di,dj,uv,pq] mapping a 3x3 conv kernel on a
    1-channel map to its space-to-depth-`block` form.

    Output pixel (block*bi+p, block*bj+q) of the original conv reads input
    pixel (block*bi+p+a-1, block*bj+q+b-1); in s2d coordinates that is
    block (bi+di-1, bj+dj-1) at in-block offset (u, v). T records exactly
    that correspondence, so K'[di,dj,(u,v),((p,q),f)] = sum_ab K[a,b,0,f] *
    T[a,b,di,dj,uv,pq] turns the lane-starved (C_in=1) conv into ONE dense
    3x3 conv over block**2-channel tiles. Zero padding commutes: offsets
    that fall outside the map land in the s2d conv's zero-padded border
    blocks, matching the original SAME padding.
    """
    import numpy as np

    bk = block
    t = np.zeros((3, 3, 3, 3, bk * bk, bk * bk), np.float32)
    for a in range(3):
        for b in range(3):
            for p in range(bk):
                for q in range(bk):
                    y, x = p + a - 1, q + b - 1
                    di, dj = (y + bk) // bk, (x + bk) // bk
                    t[a, b, di, dj, (y % bk) * bk + (x % bk), p * bk + q] = 1.0
    return jnp.asarray(t)


class CanvasConv3x3(nn.Module):
    """3x3 SAME conv on a 1-channel canvas, param-compatible with nn.Conv
    ("kernel" (3,3,1,F) HWIO + "bias"), with an exact space-to-depth
    compute path for TPU.

    The π₂ canvas trunk's first stage (conv 1→64 at 160², then BN/relu/
    maxpool-8) keeps C=1 in the 128-lane minor dim — on-chip profiling
    attributed ~8% of the whole RL train step to it (docs/performance.md).
    `packed=True` computes the identical conv as one (H/8, W/8) conv over
    64-channel s2d tiles (kernel assembled via `_s2d_conv_assembly`) and
    returns (B, H/8, W/8, 8, 8, F) — the caller runs BN/relu packed and
    max-pools by reducing the two block axes, which IS the stage's 8×8
    pool. Same multiset of values through BN, so numerics match the plain
    path to dtype rounding.
    """

    features: int
    block: int = 8
    dtype: Optional[Dtype] = None
    # A conv bias feeding a batch-stat norm is mathematically a no-op: the
    # norm subtracts the per-channel batch mean, so BN(x + b) == BN(x)
    # exactly (and d/db is exactly zero, so training never moves it
    # either). On TPU the conv is a custom call that takes no epilogue
    # fusion, making the += bias a SEPARATE full read+write pass over the
    # activation — skipping it was measured +3.7% on the whole RL step
    # (1.231 -> 1.187 s at batch 24, docs/performance.md). The param stays
    # DECLARED so checkpoints (incl. converted torch ones, whose biases
    # are nonzero but still cancelled by their BN) keep their structure.
    fold_bias_into_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, packed: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        cdt = x.dtype if self.dtype is None else self.dtype
        x = x.astype(cdt)
        if not packed:
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(cdt), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y if self.fold_bias_into_norm else y + bias.astype(cdt)
        if cin != 1:
            raise ValueError("packed path requires a 1-channel input")
        bk, f = self.block, self.features
        bsz, h, w = x.shape[:3]
        hb, wb = h // bk, w // bk
        xs = x.reshape(bsz, hb, bk, wb, bk).transpose(0, 1, 3, 2, 4)
        xs = xs.reshape(bsz, hb, wb, bk * bk)
        kp = jnp.einsum(
            "abf,abdeup->deupf", kernel[:, :, 0, :], _s2d_conv_assembly(bk)
        ).reshape(3, 3, bk * bk, bk * bk * f)
        y = jax.lax.conv_general_dilated(
            xs, kp.astype(cdt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y.reshape(bsz, hb, wb, bk, bk, f)
        return y if self.fold_bias_into_norm else y + bias.astype(cdt)


class ConvBlock(nn.Module):
    """conv3x3 -> (optional batch-stat norm) -> relu, NHWC."""

    features: int
    use_norm: bool = True
    dtype: Optional[Dtype] = None
    per_sample_stats: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=1,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_norm:
            x = BatchStatNorm(dtype=self.dtype, per_sample=self.per_sample_stats)(x)
        return nn.relu(x)


class UpConvBlock(nn.Module):
    """2x2 stride-2 transposed conv -> (optional norm) -> relu, NHWC.

    Matches torch ConvTranspose2d(k=2, s=2) exactly: output spatial = 2x input.
    """

    features: int
    use_norm: bool = True
    dtype: Optional[Dtype] = None
    per_sample_stats: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(
            self.features,
            (2, 2),
            strides=(2, 2),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_norm:
            x = BatchStatNorm(dtype=self.dtype, per_sample=self.per_sample_stats)(x)
        return nn.relu(x)


class FusedConv3x3(nn.Module):
    """conv3x3(same) + bias + ReLU with auto-dispatch to the Pallas fused
    kernel (ops/pallas/conv.py) inside its measured profitable envelope,
    XLA conv elsewhere. Param names/shapes match nn.Conv ("kernel" HWIO,
    "bias"), so checkpoints are interchangeable with ConvBlock-style convs.
    """

    features: int
    relu: bool = True
    dtype: Optional[Dtype] = None
    impl: str = "auto"   # "auto" | "pallas" | "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        xd = x.astype(self.dtype) if self.dtype is not None else x
        from rovr_tpu.ops.pallas import conv as pconv

        if self.impl == "pallas" or (
            self.impl == "auto" and pconv.supported(xd.shape)
        ):
            return pconv.fused_conv3x3(xd, kernel, bias, self.relu)
        return pconv._reference(xd, kernel, bias, self.relu)


class MLP(nn.Module):
    """Stack of Dense layers with NO activations between them — faithful to the
    reference's final_fc Sequential of bare Linears (policy_net_2.py:63-69).
    A chain of bare linears is mathematically one linear map; we keep the
    factored form for checkpoint-shape parity with the reference."""

    dims: Sequence[int]
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for d in self.dims:
            x = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x


def standardize(x: jnp.ndarray, axis, eps: float, keepdims: bool = True):
    """(x - mean) / (std + eps) with torch-style unbiased std.

    sqrt carries a tiny epsilon INSIDE: d/dx sqrt(var) is infinite at
    var=0, and a constant column (e.g. a ReLU-dead feature across the PPO
    batch in PolicyNet2.value's axis-0 standardization) then produces
    0*inf = NaN gradients that NaN the critic parameters one Adam step
    later. sqrt(var + 1e-12) shifts std by <=1e-6 absolute — far below
    bf16 resolution — and makes the gradient of a constant column exactly
    0. (The reference's torch .std() has the same infinite gradient at 0;
    its PPO critic path would NaN identically, it just never runs long
    enough on the canvas policy to show it.)"""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axis, keepdims=keepdims)
    var = jnp.var(x32, axis=axis, keepdims=keepdims, ddof=1)
    return ((x32 - mean) / (jnp.sqrt(var + 1e-12) + eps)).astype(x.dtype)
