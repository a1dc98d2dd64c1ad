"""Q-Former: learned query tokens that compress encoder features.

Reference role (``my_affectgpt/models/affectgpt.py:357-406``): a BERT-style
transformer whose fixed query tokens self-attend and cross-attend to frozen
encoder outputs, compressing T x q tokens into e.g. 32 video tokens before
the LLM projection (BLIP-2 Q-Former, ``models/Qformer.py``).

Clean Flax implementation: each layer = self-attention over the queries,
cross-attention to the (masked) encoder sequence, and an MLP. (The BLIP-2
original cross-attends every ``cross_attention_freq`` layers; freq is
configurable here, default 1 for the compression-only use.)
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class QFormerConfig:
    num_queries: int = 32
    hidden_size: int = 768
    num_layers: int = 2
    num_heads: int = 12
    intermediate_size: int = 3072
    cross_attention_freq: int = 1
    layer_norm_eps: float = 1e-12


class _MHA(nn.Module):
    hidden: int
    heads: int
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, q_in, kv_in, bias=None):
        hd = self.hidden // self.heads
        dense = lambda n: nn.Dense(self.hidden, name=n, precision=self.precision)
        q = dense("q")(q_in).reshape(*q_in.shape[:2], self.heads, hd)
        k = dense("k")(kv_in).reshape(*kv_in.shape[:2], self.heads, hd)
        v = dense("v")(kv_in).reshape(*kv_in.shape[:2], self.heads, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            precision=self.precision) / np.sqrt(hd)
        if bias is not None:
            logits = logits + bias
        w = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=self.precision)
        return dense("out")(out.reshape(*q_in.shape[:2], self.hidden))


class QFormer(nn.Module):
    """(encoder_feats (B, T, D_enc)[, mask (B, T)]) -> (B, num_queries, H)."""

    cfg: QFormerConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, enc_feats: jnp.ndarray, enc_mask: jnp.ndarray | None = None):
        c = self.cfg
        B = enc_feats.shape[0]
        queries = self.param("query_tokens", nn.initializers.normal(0.02),
                             (c.num_queries, c.hidden_size))
        x = jnp.broadcast_to(queries, (B, c.num_queries, c.hidden_size))
        if enc_feats.shape[-1] != c.hidden_size:
            enc_feats = nn.Dense(c.hidden_size, name="enc_proj",
                                 precision=self.precision)(enc_feats)
        cross_bias = None
        if enc_mask is not None:
            cross_bias = jnp.where(enc_mask[:, None, None, :] > 0, 0.0, -1e30)

        ln = lambda n: nn.LayerNorm(epsilon=c.layer_norm_eps, name=n)
        for i in range(c.num_layers):
            a = _MHA(c.hidden_size, c.num_heads, self.precision,
                     name=f"self_attn_{i}")(x, x)
            x = ln(f"self_ln_{i}")(x + a)
            if i % c.cross_attention_freq == 0:
                a = _MHA(c.hidden_size, c.num_heads, self.precision,
                         name=f"cross_attn_{i}")(x, enc_feats, cross_bias)
                x = ln(f"cross_ln_{i}")(x + a)
            h = nn.Dense(c.intermediate_size, name=f"ffn1_{i}",
                         precision=self.precision)(x)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(c.hidden_size, name=f"ffn2_{i}",
                         precision=self.precision)(h)
            x = ln(f"ffn_ln_{i}")(x + h)
        return x
