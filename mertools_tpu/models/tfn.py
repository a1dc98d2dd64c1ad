"""TFN: Tensor Fusion Network (outer-product fusion).

Reference behavior (``MERBench/toolkit/models/tfn.py:11-82``): per-modality
MLP/LSTM encoders -> append a constant 1 to each hidden vector -> 3-way outer
product flattened to (H+1)^3 -> dropout -> two Dense+ReLU -> heads.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .modules import LSTMEncoder, MLPEncoder, SimpleClassifierHeads


@registry.register_model("tfn")
class TFN(FromArgsMixin, nn.Module):
    hidden_dim: int = 64
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

        ones = jnp.ones(audio_h.shape[:1] + (1,), audio_h.dtype)
        a = jnp.concatenate([ones, audio_h], axis=1)  # (B, H+1)
        v = jnp.concatenate([ones, video_h], axis=1)
        t = jnp.concatenate([ones, text_h], axis=1)
        # 3-way outer product, flattened — (B, (H+1)^3)
        fusion = jnp.einsum("bi,bj,bk->bijk", a, v, t).reshape(a.shape[0], -1)

        x = nn.Dropout(self.dropout, deterministic=not train)(fusion)
        x = nn.relu(nn.Dense(self.hidden_dim, name="post_fusion_layer_1")(x))
        features = nn.relu(nn.Dense(self.hidden_dim, name="post_fusion_layer_2")(x))

        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)
        return features, emos_out, vals_out, jnp.float32(0.0)
