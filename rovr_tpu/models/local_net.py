"""Local inpainting network Γ: reconstruct a target frame from two context
frames. 4-level UNet, sigmoid output.

Parity: LocalNetworkUNetNorm (reference: rovr/local_net.py:8-71). The
reference constructs BatchNorm layers but never applies them in forward
(activations are relu(conv(x)), local_net.py:52-71) — we match the ACTUAL
forward semantics and omit the dead norm parameters entirely.

TPU-native choices: NHWC layout, bfloat16 conv compute with float32 params,
channel concat on the last (lane) axis so XLA fuses the skip connections.
Input is the target frame plus 2 context frames stacked on channels:
(B, 256, 256, 9) — the NHWC twin of local_net.py:46-49.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rovr_tpu.models.layers import FusedConv3x3, max_pool


class LocalNetUNet(nn.Module):
    channels: Tuple[int, ...] = (64, 128, 256, 512)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, target: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        """target (B,H,W,3), context (B,2,H,W,3) -> (B,H,W,3) in [0,1]."""
        b, h, w, _ = target.shape
        x = jnp.concatenate(
            [target, context[:, 0], context[:, 1]], axis=-1
        ).astype(self.dtype)

        conv = lambda f, k, name: nn.Conv(  # noqa: E731
            f, (k, k), padding=k // 2, dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        # The interior levels (conv3: 64^2 x 128, conv4: 32^2 x 256, conv5:
        # 64^2 x 512 at the flagship 256^2 frames) go through FusedConv3x3,
        # which auto-dispatches to the Pallas fused kernel only inside its
        # measured win envelope — small batch (<= ~16k output pixels) and
        # cin <= 256 (ops/pallas/conv.py `supported`) — and to the XLA conv
        # everywhere else (large batch, cin 512, unaligned channels,
        # bandwidth-bound exterior levels, CPU). At the batch-24 flagship
        # point all three fall to XLA: re-measured 2026-08, XLA is 1.3-1.8x
        # faster there (chained in-jit timing; batch-4 eval/serving shapes
        # still dispatch to the kernel, where it is ~1.1x).
        # Param names/shapes match nn.Conv, so checkpoints interop.
        fconv = lambda f, name: FusedConv3x3(  # noqa: E731
            f, relu=True, dtype=self.dtype, name=name,
        )
        upconv = lambda f, name: nn.ConvTranspose(  # noqa: E731
            f, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        c1, c2, c3, c4 = self.channels

        # Contracting path (local_net.py:52-55)
        x1 = nn.relu(conv(c1, 3, "conv1")(x))
        x2 = nn.relu(conv(c2, 3, "conv2")(max_pool(x1, (2, 2))))
        x3 = fconv(c3, "conv3")(max_pool(x2, (2, 2)))
        x4 = fconv(c4, "conv4")(max_pool(x3, (2, 2)))

        # Expanding path with skip concat (local_net.py:58-68)
        y = nn.relu(upconv(c3, "upconv1")(x4))
        y = fconv(c3, "conv5")(jnp.concatenate([y, x3], axis=-1))
        y = nn.relu(upconv(c2, "upconv2")(y))
        y = nn.relu(conv(c2, 3, "conv6")(jnp.concatenate([y, x2], axis=-1)))
        y = nn.relu(upconv(c1, "upconv3")(y))
        y = nn.relu(conv(c1, 3, "conv7")(jnp.concatenate([y, x1], axis=-1)))

        # 1x1 head + sigmoid (local_net.py:71)
        out = conv(3, 1, "conv8")(y)
        return nn.sigmoid(out.astype(jnp.float32))


def convert_torch_state_dict(state_dict: Dict[str, "object"]) -> Dict:
    """Map a reference LocalNetworkUNetNorm checkpoint to this param pytree.

    The reference's module names (conv1..conv8, upconv1..3,
    local_net.py:12-39) are kept verbatim here, so migration is a key-for-key
    transpose: Conv2d OIHW -> HWIO; ConvTranspose2d IOHW -> HWIO with a
    spatial flip (flax ConvTranspose correlates the un-flipped kernel).
    The reference's BatchNorm parameters are dead (never applied in forward,
    local_net.py:52-71) and are dropped.
    """
    import numpy as np

    params: Dict[str, Any] = {}
    for i in range(1, 9):
        w = np.asarray(state_dict[f"conv{i}.weight"])
        params[f"conv{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": np.asarray(state_dict[f"conv{i}.bias"]),
        }
    for i in range(1, 4):
        w = np.asarray(state_dict[f"upconv{i}.weight"])  # (in, out, kh, kw)
        params[f"upconv{i}"] = {
            "kernel": np.ascontiguousarray(
                w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            ),
            "bias": np.asarray(state_dict[f"upconv{i}.bias"]),
        }
    return params
