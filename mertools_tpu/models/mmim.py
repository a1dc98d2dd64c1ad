"""MMIM: hierarchical mutual-information maximization fusion.

Reference behavior (``MERBench/toolkit/models/mmim.py``): per-modality
encoders; two MMILB modules give a Gaussian log-likelihood lower bound
lld(text->vision) + lld(text->audio) (the label/memory entropy path is unused
in the reference forward, mmim.py:232-238); fusion = dropout + 2 tanh Dense
over the concat; three CPC heads give an InfoNCE score between each modality
encoding and the fusion; interloss = alpha * nce - beta * lld.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .modules import LSTMEncoder, MLPEncoder, SimpleClassifierHeads


class MMILB(nn.Module):
    """Gaussian-prior modality MI lower bound (mmim.py:12-55, lld path)."""

    y_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        mu = nn.Dense(self.y_size, name="mu_2")(nn.relu(nn.Dense(self.y_size, name="mu_1")(x)))
        logvar = nn.Dense(self.y_size, name="logvar_2")(nn.relu(nn.Dense(self.y_size, name="logvar_1")(x)))
        positive = -((mu - y) ** 2) / 2.0 / jnp.exp(logvar)
        return jnp.mean(jnp.sum(positive, axis=-1))


class CPC(nn.Module):
    """InfoNCE score between x and a prediction of x from y (mmim.py:93-131)."""

    x_size: int
    n_layers: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        h = y
        for i in range(self.n_layers):
            h = nn.Dense(self.x_size, name=f"net_{i}")(h)
            if self.n_layers > 1 and i == 0:
                h = jnp.tanh(h)
        x_pred = h / jnp.linalg.norm(h, axis=1, keepdims=True)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        pos = jnp.sum(x * x_pred, axis=-1)
        neg = jax_logsumexp(x @ x_pred.T, axis=-1)
        return -jnp.mean(pos - neg)


def jax_logsumexp(a, axis):
    import jax.scipy.special as jsp

    return jsp.logsumexp(a, axis=axis)


@registry.register_model("mmim")
class MMIM(FromArgsMixin, nn.Module):
    hidden_dim: int = 128
    dropout: float = 0.1
    cpc_layers: int = 1
    alpha: float = 0.1
    beta: float = 0.1
    output_dim1: int = 6
    output_dim2: int = 1
    feat_type: str = "utt"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        H = self.hidden_dim
        enc = MLPEncoder if self.feat_type == "utt" else LSTMEncoder
        audio_h = enc(H, self.dropout, name="audio_encoder")(batch["audios"], train)
        text_h = enc(H, self.dropout, name="text_encoder")(batch["texts"], train)
        vision_h = enc(H, self.dropout, name="video_encoder")(batch["videos"], train)

        lld = (MMILB(H, name="mi_tv")(text_h, vision_h)
               + MMILB(H, name="mi_ta")(text_h, audio_h))

        x = jnp.concatenate([text_h, audio_h, vision_h], axis=1)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = jnp.tanh(nn.Dense(H, name="fusion_1")(x))
        fusion = jnp.tanh(nn.Dense(H, name="fusion_2")(x))

        nce = (CPC(H, self.cpc_layers, name="cpc_zt")(text_h, fusion)
               + CPC(H, self.cpc_layers, name="cpc_zv")(vision_h, fusion)
               + CPC(H, self.cpc_layers, name="cpc_za")(audio_h, fusion))

        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(fusion)
        interloss = self.alpha * nce - self.beta * lld
        return fusion, emos_out, vals_out, interloss
