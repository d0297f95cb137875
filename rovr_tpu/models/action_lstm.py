"""ActionLSTM: encodes the running (target, context, context) action history
into a canvas-shaped token for the frame-selection policy π₁.

Parity: rovr/action_lstm.py:6-42 — an LSTMCell over concat(action indices/48,
flattened feature patches of the 3 chosen frames), with a linear head
reshaped to the state-canvas footprint. Dead in the reference's shipped main
path (rovr/rovr.py:190-192 commented; zero token used at rovr.py:101) but
part of the declared MDP — first-class here.

TPU-native deviation: the reference holds hx/cx as mutable module attributes
with a manual reset (action_lstm.py:16-17,40-42); here the LSTM state is an
explicit carry threaded through `lax.scan` — `init_carry` replaces
`reset_hidden_states`. Token geometry follows the VideoProcessor canvas
(160x160x1 of 32x32 tiles) rather than the legacy 80x80x3 layout.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


class ActionLSTM(nn.Module):
    hidden_dim: int = 1024
    token_size: int = 160
    tile: int = 32
    dtype: Any = jnp.float32

    def setup(self):
        self.cell = nn.OptimizedLSTMCell(self.hidden_dim, param_dtype=jnp.float32)
        self.fc = nn.Dense(self.token_size * self.token_size, param_dtype=jnp.float32)

    def init_carry(self, batch_size: int):
        """Zero (hx, cx) — replaces reset_hidden_states (action_lstm.py:40-42)."""
        shape = (batch_size, self.hidden_dim)
        return (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))

    def __call__(
        self, carry, actions: jnp.ndarray, patches: jnp.ndarray
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        """carry (hx, cx); actions (B, 3) int indices; patches (B, 3, t, t).

        Returns (new_carry, token (B, token_size, token_size, 1)).
        Parity: action_lstm.py:19-38 (indices scaled by /48, patches
        flattened, concatenated into the LSTM input).
        """
        b = actions.shape[0]
        a = actions.astype(jnp.float32) / 48.0
        p = patches.reshape(b, -1).astype(jnp.float32)
        x = jnp.concatenate([a, p], axis=1)
        carry, h = self.cell(carry, x)
        token = self.fc(h).reshape(b, self.token_size, self.token_size, 1)
        return carry, token


def convert_torch_lstm_cell(state_dict, prefix: str = "lstm") -> dict:
    """Map a torch nn.LSTMCell state dict (the reference's recurrence,
    action_lstm.py:13) to flax OptimizedLSTMCell params.

    torch packs gates row-wise as [i, f, g, o] in weight_ih (4H, In) /
    weight_hh (4H, H) with two bias vectors; flax splits them into per-gate
    Dense layers (input kernels bias-free, hidden kernels carrying the sum
    of both torch biases). Gate activations/order agree (sigmoid i/f/o,
    tanh g). Only the cell converts 1:1 — the surrounding token geometry
    deviates by design (see module docstring)."""
    import numpy as np

    w_ih = np.asarray(state_dict[f"{prefix}.weight_ih"])
    w_hh = np.asarray(state_dict[f"{prefix}.weight_hh"])
    b_ih = np.asarray(state_dict[f"{prefix}.bias_ih"])
    b_hh = np.asarray(state_dict[f"{prefix}.bias_hh"])
    hidden = w_hh.shape[1]
    gates = {"i": 0, "f": 1, "g": 2, "o": 3}
    params = {}
    for g, j in gates.items():
        sl = slice(j * hidden, (j + 1) * hidden)
        params[f"i{g}"] = {"kernel": w_ih[sl].T}
        params[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b_ih[sl] + b_hh[sl]}
    return params
