"""Shared fusion-model building blocks (Flax).

Reference counterparts in ``MERBench/toolkit/models/modules/encoder.py:9-72``:
  * :class:`MLPEncoder`  — dropout, then three Dense+ReLU layers.
  * :class:`LSTMEncoder` — single-layer LSTM; the *final hidden state* is the
    encoding (so inputs must be **front**-padded), then dropout + Dense.

New (not translated) Flax implementations honoring those dataflow contracts.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MLPEncoder(nn.Module):
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(3):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"dense_{i + 1}")(x))
        return x


class LSTMEncoder(nn.Module):
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, T, D) front-padded -> (B, hidden_dim) from the final step."""
        cell = nn.OptimizedLSTMCell(self.hidden_dim)
        carry, _ = nn.RNN(cell, return_carry=True)(x)
        h_final = carry[1]  # LSTMCell carry = (c, h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h_final)
        return nn.Dense(self.hidden_dim)(h)


class SimpleClassifierHeads(nn.Module):
    """The (emotion, valence) output-head pair every fusion model ends with."""

    output_dim1: int  # number of emotion classes (0 = head absent)
    output_dim2: int  # valence regression dims (0 = head absent)

    @nn.compact
    def __call__(self, features: jnp.ndarray):
        emos_out = (nn.Dense(self.output_dim1, name="fc_out_1")(features)
                    if self.output_dim1 > 0 else jnp.zeros(features.shape[:1] + (0,)))
        vals_out = (nn.Dense(self.output_dim2, name="fc_out_2")(features)
                    if self.output_dim2 > 0 else jnp.zeros(features.shape[:1] + (0,)))
        return emos_out, vals_out
