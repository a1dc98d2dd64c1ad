"""MISA: modality-invariant and -specific representations.

Reference behavior (``MERBench/toolkit/models/misa.py:99-271``):
  * per-modality encoders -> project (Dense+ReLU+LayerNorm),
  * private (per-modality Dense+Sigmoid) and shared (one Dense+Sigmoid,
    weight-tied across modalities) spaces,
  * reconstruction: Dense(private+shared) vs the projected input (MSE/3),
  * diff loss: squared Frobenius norm of cross-correlation between
    column-centered, row-normalized pairs (norms are DETACHED -> here
    ``stop_gradient``), over 6 pairs,
  * CMD loss with 5 moments over the 3 shared pairs, /3,
  * fusion: stack 6 tokens -> 1 torch-style post-LN transformer layer
    (nhead=2, ffn 2048) -> concat -> Dense stack -> heads,
  * interloss = diff_weight*diff + sim_weight*cmd + recon_weight*recon.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .modules import LSTMEncoder, MLPEncoder, SimpleClassifierHeads


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


def diff_loss(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Orthogonality penalty with detached L2 norms (misa.py:37-62)."""
    x1 = x1 - x1.mean(axis=0, keepdims=True)
    x2 = x2 - x2.mean(axis=0, keepdims=True)
    n1 = jax.lax.stop_gradient(jnp.linalg.norm(x1, axis=1, keepdims=True))
    n2 = jax.lax.stop_gradient(jnp.linalg.norm(x2, axis=1, keepdims=True))
    x1 = x1 / (n1 + 1e-6)
    x2 = x2 / (n2 + 1e-6)
    return jnp.mean((x1.T @ x2) ** 2)


def cmd_loss(x1: jnp.ndarray, x2: jnp.ndarray, n_moments: int = 5) -> jnp.ndarray:
    """Central moment discrepancy (misa.py:65-96)."""
    m1, m2 = x1.mean(axis=0), x2.mean(axis=0)
    s1, s2 = x1 - m1, x2 - m2

    def matchnorm(a, b):
        return jnp.sqrt(jnp.sum((a - b) ** 2))

    total = matchnorm(m1, m2)
    for k in range(2, n_moments + 1):
        total = total + matchnorm(jnp.mean(s1 ** k, axis=0), jnp.mean(s2 ** k, axis=0))
    return total


class TorchTransformerLayer(nn.Module):
    """Post-LN transformer encoder layer (torch nn.TransformerEncoderLayer
    defaults: ffn 2048, ReLU). Operates on (S, B, D) like the reference."""

    d_model: int
    nhead: int = 2
    dim_ff: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        xb = jnp.swapaxes(x, 0, 1)  # (B, S, D)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train)(xb, xb)
        xb = nn.LayerNorm()(xb + nn.Dropout(self.dropout, deterministic=not train)(attn))
        ff = nn.Dense(self.dim_ff)(xb)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model)(ff)
        xb = nn.LayerNorm()(xb + nn.Dropout(self.dropout, deterministic=not train)(ff))
        return jnp.swapaxes(xb, 0, 1)


@registry.register_model("misa")
class MISA(FromArgsMixin, nn.Module):
    hidden_dim: int = 128
    dropout: float = 0.3
    sim_weight: float = 0.1
    diff_weight: float = 0.1
    recon_weight: float = 0.1
    output_dim1: int = 6
    output_dim2: int = 1
    feat_type: str = "utt"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        H = self.hidden_dim
        enc = MLPEncoder if self.feat_type == "utt" else LSTMEncoder
        u_a = enc(H, self.dropout, name="audio_encoder")(batch["audios"], train)
        u_t = enc(H, self.dropout, name="text_encoder")(batch["texts"], train)
        u_v = enc(H, self.dropout, name="video_encoder")(batch["videos"], train)

        def project(name, x):
            x = nn.relu(nn.Dense(H, name=f"project_{name}")(x))
            return nn.LayerNorm(name=f"project_{name}_ln")(x)

        o_t, o_v, o_a = project("t", u_t), project("v", u_v), project("a", u_a)

        p_t = nn.sigmoid(nn.Dense(H, name="private_t")(o_t))
        p_v = nn.sigmoid(nn.Dense(H, name="private_v")(o_v))
        p_a = nn.sigmoid(nn.Dense(H, name="private_a")(o_a))
        shared = nn.Dense(H, name="shared")  # weight-tied across modalities
        s_t, s_v, s_a = nn.sigmoid(shared(o_t)), nn.sigmoid(shared(o_v)), nn.sigmoid(shared(o_a))

        r_t = nn.Dense(H, name="recon_t")(p_t + s_t)
        r_v = nn.Dense(H, name="recon_v")(p_v + s_v)
        r_a = nn.Dense(H, name="recon_a")(p_a + s_a)

        # fusion through one transformer layer over the 6 component tokens
        h = jnp.stack([p_t, p_v, p_a, s_t, s_v, s_a], axis=0)  # (6, B, H)
        h = TorchTransformerLayer(d_model=H, nhead=2, name="transformer")(h, train)
        h = jnp.concatenate([h[i] for i in range(6)], axis=1)  # (B, 6H)
        x = nn.Dense(3 * H, name="fusion_layer_1")(h)
        x = nn.relu(nn.Dropout(self.dropout, deterministic=not train)(x))
        features = nn.Dense(H // 2, name="fusion_layer_3")(x)

        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)

        recon = (_mse(r_t, o_t) + _mse(r_v, o_v) + _mse(r_a, o_a)) / 3.0
        diff = (diff_loss(p_t, s_t) + diff_loss(p_v, s_v) + diff_loss(p_a, s_a)
                + diff_loss(p_a, p_t) + diff_loss(p_a, p_v) + diff_loss(p_t, p_v))
        cmd = (cmd_loss(s_t, s_v) + cmd_loss(s_t, s_a) + cmd_loss(s_a, s_v)) / 3.0
        interloss = (self.diff_weight * diff + self.sim_weight * cmd
                     + self.recon_weight * recon)
        return features, emos_out, vals_out, interloss
