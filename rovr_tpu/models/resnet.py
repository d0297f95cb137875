"""Frozen ResNet-50 backbone φ for per-frame feature extraction.

Parity: torchvision resnet50 minus the FC layer, used frozen/eval
(reference: rovr/resnet_extractor.py:8-16). Rebuilt NHWC for TPU with
bfloat16 conv compute.

Because the backbone is frozen and eval-only in the reference, BatchNorm here
is a pure affine transform using stored statistics (`FrozenBatchNorm`) — no
mutable state, fully jit/scan-safe.

Pretrained torchvision weights can be converted with
`convert_torch_state_dict` when a checkpoint file is available (this
environment has no network egress, so tests/benchmarks run with the
deterministic random init — throughput and shape parity don't depend on
weight values).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rovr_tpu.models.layers import max_pool

STAGE_SIZES = (3, 4, 6, 3)  # resnet50


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm: y = scale * (x - mean) / sqrt(var + eps) + bias,
    with statistics stored as (frozen) parameters."""

    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = scale / np.sqrt(1.0) / jnp.sqrt(var + self.epsilon)
        y = x.astype(jnp.float32) * inv + (bias - mean * inv)
        return y.astype(x.dtype if self.dtype is None else self.dtype)


def _pool_spatial(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C) for g=1 (global mean) or (B, g*g*C) for g>1
    (adaptive average pool to a (g, g) grid, torch AdaptiveAvgPool2d(g)
    semantics: unequal bins when H % g != 0)."""
    if g <= 1:
        return jnp.mean(x, axis=(1, 2))
    b, h, w, c = x.shape
    he = np.linspace(0, h, g + 1).round().astype(int)
    we = np.linspace(0, w, g + 1).round().astype(int)
    cells = [
        jnp.mean(x[:, he[i]:he[i + 1], we[j]:we[j + 1], :], axis=(1, 2))
        for i in range(g) for j in range(g)
    ]
    return jnp.concatenate(cells, axis=-1)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=k // 2, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        residual = x
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(
            conv(self.features, 1, 1, "conv1")(x)))
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(
            conv(self.features, 3, self.strides, "conv2")(y)))
        y = FrozenBatchNorm(dtype=self.dtype, name="bn3")(
            conv(self.features * 4, 1, 1, "conv3")(y))
        if residual.shape != y.shape:
            residual = FrozenBatchNorm(dtype=self.dtype, name="bn_down")(
                conv(self.features * 4, 1, self.strides, "conv_down")(residual))
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """NHWC ResNet-50 trunk -> pooled features.

    `spatial_pool=1` (default) is the reference's global average pool
    (resnet_extractor.py:13 AdaptiveAvgPool2d(1)) -> (B, 2048).
    `spatial_pool=g>1` average-pools the final 7x7 map to a (g, g) grid and
    flattens -> (B, g*g*2048). Rationale: with PRETRAINED weights global
    pooling keeps enough semantic signal for the policies, but this
    environment has no egress (random init), and globally pooled RANDOM
    features are nearly position-invariant — mask locations, which the
    teacher task is about, become linearly undecodable (probe: R^2 ~ 0).
    Coarse spatial pooling restores position information regardless of
    weight provenance."""

    dtype: Any = jnp.bfloat16
    spatial_pool: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, 224, 224, 3) in [0, 1] -> (B, 2048*spatial_pool^2)."""
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(x)
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(x))
        x = max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        features = 64
        for stage, num_blocks in enumerate(STAGE_SIZES):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = Bottleneck(
                    features, strides, dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x)
            features *= 2
        # global average pool (torchvision AdaptiveAvgPool2d(1)), or a
        # coarse (g, g) spatial pool (see class docstring)
        return _pool_spatial(x.astype(jnp.float32), self.spatial_pool)


class TinyBackbone(nn.Module):
    """Small frozen conv trunk with the ResNet50 interface ((B,H,W,3) ->
    pooled (B, features*4) float32). Exists for fast tests: the full
    ResNet-50 graph dominates XLA compile time at tiny shapes
    (ModelConfig.backbone="tiny" selects it; never used in shipped configs).
    """

    features: int = 32
    dtype: Any = jnp.bfloat16
    spatial_pool: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i, stride in enumerate((4, 2, 2)):
            x = nn.Conv(
                self.features * (2 ** i), (3, 3), strides=(stride, stride),
                padding=1, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
        return _pool_spatial(x.astype(jnp.float32), self.spatial_pool)


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"]) -> Dict:
    """Map a torchvision resnet50 state_dict to this module's param pytree.

    Conv kernels transpose OIHW -> HWIO; BN running stats land in the
    FrozenBatchNorm mean/var params.
    """
    def conv(k):
        return np.asarray(state_dict[k]).transpose(2, 3, 1, 0)

    def bn(prefix):
        return {
            "scale": np.asarray(state_dict[f"{prefix}.weight"]),
            "bias": np.asarray(state_dict[f"{prefix}.bias"]),
            "mean": np.asarray(state_dict[f"{prefix}.running_mean"]),
            "var": np.asarray(state_dict[f"{prefix}.running_var"]),
        }

    params: Dict[str, Any] = {
        "conv1": {"kernel": conv("conv1.weight")},
        "bn1": bn("bn1"),
    }
    for stage, num_blocks in enumerate(STAGE_SIZES):
        for block in range(num_blocks):
            t = f"layer{stage + 1}.{block}"
            entry = {
                "conv1": {"kernel": conv(f"{t}.conv1.weight")},
                "bn1": bn(f"{t}.bn1"),
                "conv2": {"kernel": conv(f"{t}.conv2.weight")},
                "bn2": bn(f"{t}.bn2"),
                "conv3": {"kernel": conv(f"{t}.conv3.weight")},
                "bn3": bn(f"{t}.bn3"),
            }
            if f"{t}.downsample.0.weight" in state_dict:
                entry["conv_down"] = {"kernel": conv(f"{t}.downsample.0.weight")}
                entry["bn_down"] = bn(f"{t}.downsample.1")
            params[f"layer{stage + 1}_{block}"] = entry
    return params
