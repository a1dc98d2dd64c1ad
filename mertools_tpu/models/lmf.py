"""LMF: Low-rank Multimodal Fusion.

Reference behavior (``MERBench/toolkit/models/lmf.py:11-92``): per-modality
encoders -> append constant 1 -> per-modality rank-R factor projections ->
elementwise product across modalities -> weighted sum over rank -> heads.
Output feature dim is hidden_dim // 2.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .modules import LSTMEncoder, MLPEncoder, SimpleClassifierHeads


@registry.register_model("lmf")
class LMF(FromArgsMixin, nn.Module):
    hidden_dim: int = 64
    dropout: float = 0.3
    rank: int = 4
    output_dim1: int = 6
    output_dim2: int = 1
    feat_type: str = "utt"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        enc = MLPEncoder if self.feat_type == "utt" else LSTMEncoder
        audio_h = enc(self.hidden_dim, self.dropout, name="audio_encoder")(batch["audios"], train)
        text_h = enc(self.hidden_dim, self.dropout, name="text_encoder")(batch["texts"], train)
        video_h = enc(self.hidden_dim, self.dropout, name="video_encoder")(batch["videos"], train)

        out_dim = self.hidden_dim // 2
        ones = jnp.ones(audio_h.shape[:1] + (1,), audio_h.dtype)

        def factor(name, h):
            w = self.param(name, nn.initializers.xavier_normal(),
                           (self.rank, self.hidden_dim + 1, out_dim))
            h1 = jnp.concatenate([ones, h], axis=1)  # (B, H+1)
            return jnp.einsum("bh,rho->rbo", h1, w)  # (R, B, out)

        fz = (factor("audio_factor", audio_h)
              * factor("video_factor", video_h)
              * factor("text_factor", text_h))  # (R, B, out)

        fusion_weights = self.param("fusion_weights", nn.initializers.xavier_normal(), (1, self.rank))
        fusion_bias = self.param("fusion_bias", nn.initializers.zeros, (1, out_dim))
        features = jnp.einsum("r,rbo->bo", fusion_weights[0], fz) + fusion_bias

        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)
        return features, emos_out, vals_out, jnp.float32(0.0)
