"""LF_DNN: late fusion — unimodal encoders + concat + MLP.

Reference behavior: ``MER2024/toolkit/models/lf_dnn.py:12-30``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .modules import LSTMEncoder, MLPEncoder, SimpleClassifierHeads


@registry.register_model("lf_dnn")
class LF_DNN(FromArgsMixin, nn.Module):
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

        x = jnp.concatenate([audio_h, video_h, text_h], axis=-1)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.hidden_dim, name="post_fusion_layer_1")(x))
        features = nn.relu(nn.Dense(self.hidden_dim, name="post_fusion_layer_2")(x))

        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)
        return features, emos_out, vals_out, jnp.float32(0.0)
