"""LPIPS perceptual distance (VGG-16 backbone) in JAX.

Parity: the `lpips.LPIPS(net='vgg')` loss used for rewards and pretraining
(reference: rovr/rovr.py:54-55, rovr/train_local_net_unet.py:91): VGG16
features tapped at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel-unit-
normalized, squared difference, per-layer learned 1x1 linear weights,
spatial mean, summed over layers. `normalize=True` semantics: inputs in
[0,1] are mapped to [-1,1] then shifted/scaled by the LPIPS constants.

The backbone + linear weights are frozen (it's a metric). This environment
has no network egress, so the default init is deterministic-random —
distances are still a smooth perceptual-ish metric (random VGG features are
a known decent perceptual basis), and `convert_lpips_weights` maps the
official `lpips` package tensors when a checkpoint is available on disk.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# lpips.ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (features, num_convs) per stage; taps after each stage.
_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16Features(nn.Module):
    """VGG16 trunk returning the 5 LPIPS feature taps, NHWC."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        x = x.astype(self.dtype)
        for s, (feats, n_convs) in enumerate(_STAGES):
            for c in range(n_convs):
                x = nn.Conv(
                    feats, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"conv{s + 1}_{c + 1}",
                )(x)
                x = nn.relu(x)
            taps.append(x)
            if s < len(_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg') twin. __call__(x, y) with x,y (B,H,W,3)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, y: jnp.ndarray, normalize: bool = True
    ) -> jnp.ndarray:
        if normalize:  # [0,1] -> [-1,1] (lpips normalize=True)
            x = 2.0 * x - 1.0
            y = 2.0 * y - 1.0
        x = (x - _SHIFT) / _SCALE
        y = (y - _SHIFT) / _SCALE
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        # One batched trunk call for both inputs — halves compile/launch cost.
        taps = vgg(jnp.concatenate([x, y], axis=0))
        b = x.shape[0]
        total = jnp.zeros((b,), jnp.float32)
        for i, tap in enumerate(taps):
            fx, fy = tap[:b].astype(jnp.float32), tap[b:].astype(jnp.float32)
            fx = fx * jax.lax.rsqrt(jnp.sum(fx * fx, -1, keepdims=True) + 1e-10)
            fy = fy * jax.lax.rsqrt(jnp.sum(fy * fy, -1, keepdims=True) + 1e-10)
            diff = (fx - fy) ** 2
            w = self.param(
                f"lin{i}", nn.initializers.uniform(scale=0.1),
                (tap.shape[-1],), jnp.float32,
            )
            # lpips lin layers are 1x1 convs with non-negative weights
            total = total + jnp.mean(diff @ jnp.abs(w), axis=(1, 2))
        return total


def convert_lpips_weights(
    vgg_state: Dict[str, np.ndarray], lin_state: Dict[str, np.ndarray]
) -> Dict:
    """Convert torchvision vgg16.features + lpips lin weights to this pytree.

    vgg_state keys like 'features.0.weight' (OIHW); lin_state keys like
    'lin0.model.1.weight' with shape (1, C, 1, 1).
    """
    # torchvision vgg16.features conv indices per stage
    conv_idx = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    params: Dict[str, Any] = {"vgg": {}}
    for s, idxs in enumerate(conv_idx):
        for c, i in enumerate(idxs):
            params["vgg"][f"conv{s + 1}_{c + 1}"] = {
                "kernel": np.asarray(vgg_state[f"features.{i}.weight"]).transpose(
                    2, 3, 1, 0
                ),
                "bias": np.asarray(vgg_state[f"features.{i}.bias"]),
            }
    for i in range(5):
        params[f"lin{i}"] = np.asarray(
            lin_state[f"lin{i}.model.1.weight"]
        ).reshape(-1)
    return params
