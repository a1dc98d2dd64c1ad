"""EF_LSTM: early fusion — concat frame-aligned modalities + LSTM.

Reference behavior (``MER2024/toolkit/models/ef_lstm.py:11-56``): concat the
three aligned sequences on the feature axis, run a (possibly multi-layer)
LSTM, take the final hidden state of the last layer, dropout -> Dense+ReLU ->
dropout -> heads. Requires frame-aligned inputs.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .modules import SimpleClassifierHeads


@registry.register_model("ef_lstm")
class EF_LSTM(FromArgsMixin, nn.Module):
    hidden_dim: int = 128
    dropout: float = 0.3
    num_layers: int = 1
    output_dim1: int = 6
    output_dim2: int = 1
    feat_type: str = "frm_align"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        x = jnp.concatenate([batch["texts"], batch["audios"], batch["videos"]], axis=-1)
        h = None
        for layer in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden_dim)
            carry, x = nn.RNN(cell, return_carry=True, name=f"lstm_{layer}")(x)
            h = carry[1]
            if layer + 1 < self.num_layers and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.relu(nn.Dense(self.hidden_dim, name="linear")(h))
        features = nn.Dropout(self.dropout, deterministic=not train)(h)

        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)
        return features, emos_out, vals_out, jnp.float32(0.0)
