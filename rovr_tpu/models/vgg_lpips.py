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

from rovr_tpu.models.layers import max_pool

# lpips.ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (features, num_convs) per stage; taps after each stage.
_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16Features(nn.Module):
    """VGG16 trunk returning the per-stage LPIPS feature taps, NHWC.

    `stages` defaults to the real VGG16 plan; tests shrink it (fewer/narrower
    stages) to cut XLA compile time by an order of magnitude while keeping
    the exact tap/normalize/lin math.
    """

    dtype: Any = jnp.bfloat16
    stages: Tuple[Tuple[int, int], ...] = _STAGES

    @nn.compact
    def __call__(self, x: jnp.ndarray, limit: int | None = None) -> List[jnp.ndarray]:
        """`limit` runs only the first `limit` stages (a prefix of the trunk):
        tap i is identical to the full trunk's tap i — pooling between stages
        never feeds back into an earlier tap."""
        stages = self.stages if limit is None else self.stages[:limit]
        taps = []
        x = x.astype(self.dtype)
        for s, (feats, n_convs) in enumerate(stages):
            for c in range(n_convs):
                x = nn.Conv(
                    feats, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"conv{s + 1}_{c + 1}",
                )(x)
                x = nn.relu(x)
            taps.append(x)
            if s < len(stages) - 1:
                x = max_pool(x, (2, 2))
        return taps


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg') twin. __call__(x, y) with x,y (B,H,W,3).

    Also exposes the split API `taps(x)` / `distance_from_taps(fx, fy)` so a
    consumer can cache the unit-normalized feature taps of a FIXED image set
    (e.g. the original frames inside the RL rollout, train/rl.py) and pay the
    VGG trunk only for the changing side — the trunk is ~half the LPIPS FLOPs
    per distance."""

    dtype: Any = jnp.bfloat16
    stages: Tuple[Tuple[int, int], ...] = _STAGES

    def setup(self):
        self.vgg = VGG16Features(dtype=self.dtype, stages=self.stages, name="vgg")
        self.lins = [
            self.param(
                f"lin{i}", nn.initializers.uniform(scale=0.1),
                (feats,), jnp.float32,
            )
            for i, (feats, _) in enumerate(self.stages)
        ]

    def taps(
        self, x: jnp.ndarray, normalize: bool = True, limit: int | None = None
    ) -> List[jnp.ndarray]:
        """Unit-normalized VGG feature taps of x (B,H,W,3), each bf16.

        `limit` computes only the first `limit` stages (bit-identical to the
        corresponding prefix of the full list) — the RL rollout caches the
        org-side taps of the deep stages and recomputes the cheap-but-huge
        early stage(s) per step (train/rl.py, lpips_cache_from_stage)."""
        if normalize:  # [0,1] -> [-1,1] (lpips normalize=True)
            x = 2.0 * x - 1.0
        x = (x - _SHIFT) / _SCALE
        out = []
        for tap in self.vgg(x, limit=limit):
            t32 = tap.astype(jnp.float32)
            t32 = t32 * jax.lax.rsqrt(jnp.sum(t32 * t32, -1, keepdims=True) + 1e-10)
            out.append(t32.astype(self.dtype))
        return out

    def distance_from_taps(
        self, fx: List[jnp.ndarray], fy: List[jnp.ndarray]
    ) -> jnp.ndarray:
        """LPIPS distance from two unit-normalized tap lists."""
        total = jnp.zeros((fx[0].shape[0],), jnp.float32)
        for i, (tx, ty) in enumerate(zip(fx, fy)):
            diff = (tx.astype(jnp.float32) - ty.astype(jnp.float32)) ** 2
            # lpips lin layers are 1x1 convs with non-negative weights
            total = total + jnp.mean(diff @ jnp.abs(self.lins[i]), axis=(1, 2))
        return total

    def __call__(
        self, x: jnp.ndarray, y: jnp.ndarray, normalize: bool = True
    ) -> jnp.ndarray:
        # One batched trunk call for both inputs — halves compile/launch cost.
        b = x.shape[0]
        both = self.taps(jnp.concatenate([x, y], axis=0), normalize=normalize)
        return self.distance_from_taps(
            [t[:b] for t in both], [t[b:] for t in both]
        )


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
