"""Attention fusion: per-modality encoders + learned modality weights.

Reference: ``MERBench/toolkit/models/attention.py:8-57`` — MLP (utt) or LSTM
(frm) encoders per modality; concat -> MLP -> 3 modality scores (NO softmax,
by reference design) -> weighted sum of the modality encodings -> heads.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .modules import LSTMEncoder, MLPEncoder, SimpleClassifierHeads


@registry.register_model("attention")
class Attention(FromArgsMixin, nn.Module):
    hidden_dim: int = 128
    dropout: float = 0.3
    output_dim1: int = 6
    output_dim2: int = 1
    feat_type: str = "utt"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        enc = MLPEncoder if self.feat_type == "utt" else LSTMEncoder
        audio_h = enc(self.hidden_dim, self.dropout, name="audio_encoder")(batch["audios"], train)
        text_h = enc(self.hidden_dim, self.dropout, name="text_encoder")(batch["texts"], train)
        video_h = enc(self.hidden_dim, self.dropout, name="video_encoder")(batch["videos"], train)

        concat = jnp.concatenate([audio_h, text_h, video_h], axis=1)  # (B, 3H)
        att = MLPEncoder(self.hidden_dim, self.dropout, name="attention_mlp")(concat, train)
        att = nn.Dense(3, name="fc_att")(att)  # (B, 3) — unnormalized by design

        stacked = jnp.stack([audio_h, text_h, video_h], axis=2)  # (B, H, 3)
        features = jnp.einsum("bhm,bm->bh", stacked, att)

        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)
        return features, emos_out, vals_out, jnp.float32(0.0)
