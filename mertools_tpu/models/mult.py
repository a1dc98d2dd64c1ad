"""MULT: Multimodal Transformer (pairwise directional crossmodal attention).

Reference behavior (``MERBench/toolkit/models/mult.py`` + custom stack in
``modules/transformers_encoder/``):
  * per-modality Conv1d (VALID padding, no bias) to hidden_dim,
  * 6 crossmodal transformers (q from one modality, k/v from another) with
    pre-LN layers, inputs scaled by sqrt(H), ReLU FFN of width 4H, final LN,
  * an "offset-causal" mask: query i may attend key j iff
    j <= i + |T_k - T_q| (transformer.py buffered_future_mask),
  * 3 self-attention "mem" transformers (width 2H, >=3 layers) over the
    concatenated pair outputs; take the LAST timestep,
  * concat the three last states (6H) -> residual Dense block -> out layer
    (H // 2) -> heads.

New Flax implementation; attention is dense batched einsum on the MXU.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .modules import SimpleClassifierHeads


def offset_causal_bias(t_q: int, t_k: int, dtype=jnp.float32) -> jnp.ndarray:
    """(T_q, T_k) additive bias: 0 where j <= i + |T_k - T_q|, else -inf."""
    i = jnp.arange(t_q)[:, None]
    j = jnp.arange(t_k)[None, :]
    allowed = j <= i + abs(t_k - t_q)
    return jnp.where(allowed, 0.0, -jnp.inf).astype(dtype)


class MaskedMHA(nn.Module):
    embed_dim: int
    num_heads: int
    attn_dropout: float

    @nn.compact
    def __call__(self, q, k, v, train: bool = False, masked: bool = True):
        H, nh = self.embed_dim, self.num_heads
        hd = H // nh
        scaling = hd ** -0.5

        def proj(x, name):
            return nn.Dense(H, name=name)(x).reshape(x.shape[0], x.shape[1], nh, hd)

        qh = proj(q, "q_proj") * scaling
        kh = proj(k, "k_proj")
        vh = proj(v, "v_proj")
        logits = jnp.einsum("bqnd,bknd->bnqk", qh, kh)
        if masked:
            logits = logits + offset_causal_bias(q.shape[1], k.shape[1], logits.dtype)
        w = nn.softmax(logits, axis=-1)
        w = nn.Dropout(self.attn_dropout, deterministic=not train)(w)
        out = jnp.einsum("bnqk,bknd->bqnd", w, vh).reshape(q.shape[0], q.shape[1], H)
        return nn.Dense(H, name="out_proj")(out)


class CrossmodalTransformer(nn.Module):
    """Pre-LN transformer stack over (B, T, H); optional cross k/v source."""

    embed_dim: int
    num_heads: int
    layers: int
    dropout: float

    @nn.compact
    def __call__(self, x, x_kv=None, train: bool = False):
        scale = math.sqrt(self.embed_dim)
        drop = lambda y: nn.Dropout(self.dropout, deterministic=not train)(y)
        x = drop(scale * x)
        if x_kv is not None:
            x_kv = drop(scale * x_kv)
        for li in range(self.layers):
            residual = x
            xn = nn.LayerNorm(name=f"ln1_{li}")(x)
            if x_kv is None:
                attn = MaskedMHA(self.embed_dim, self.num_heads, self.dropout,
                                 name=f"attn_{li}")(xn, xn, xn, train)
            else:
                kvn = nn.LayerNorm(name=f"ln1kv_{li}")(x_kv)
                attn = MaskedMHA(self.embed_dim, self.num_heads, self.dropout,
                                 name=f"attn_{li}")(xn, kvn, kvn, train)
            x = residual + drop(attn)
            residual = x
            xn = nn.LayerNorm(name=f"ln2_{li}")(x)
            ff = nn.relu(nn.Dense(4 * self.embed_dim, name=f"fc1_{li}")(xn))
            ff = nn.Dense(self.embed_dim, name=f"fc2_{li}")(drop(ff))
            x = residual + drop(ff)
        return nn.LayerNorm(name="ln_final")(x)


@registry.register_model("mult")
class MULT(FromArgsMixin, nn.Module):
    hidden_dim: int = 128
    num_heads: int = 8
    layers: int = 4
    dropout: float = 0.1
    conv1d_kernel_size: int = 3
    output_dim1: int = 6
    output_dim2: int = 1
    feat_type: str = "frm_align"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        H = self.hidden_dim

        def proj(x, name):
            return nn.Conv(H, kernel_size=(self.conv1d_kernel_size,),
                           padding="VALID", use_bias=False, name=name)(x)

        x_l = proj(batch["texts"], "proj_l")
        x_a = proj(batch["audios"], "proj_a")
        x_v = proj(batch["videos"], "proj_v")

        def cross(name, q, kv):
            return CrossmodalTransformer(H, self.num_heads, self.layers,
                                         self.dropout, name=name)(q, kv, train)

        h_ls = jnp.concatenate([cross("trans_l_with_a", x_l, x_a),
                                cross("trans_l_with_v", x_l, x_v)], axis=2)
        h_as = jnp.concatenate([cross("trans_a_with_l", x_a, x_l),
                                cross("trans_a_with_v", x_a, x_v)], axis=2)
        h_vs = jnp.concatenate([cross("trans_v_with_l", x_v, x_l),
                                cross("trans_v_with_a", x_v, x_a)], axis=2)

        mem_layers = max(self.layers, 3)
        def mem(name, x):
            return CrossmodalTransformer(2 * H, self.num_heads, mem_layers,
                                         self.dropout, name=name)(x, None, train)

        last_l = mem("trans_l_mem", h_ls)[:, -1]
        last_a = mem("trans_a_mem", h_as)[:, -1]
        last_v = mem("trans_v_mem", h_vs)[:, -1]
        last_hs = jnp.concatenate([last_l, last_a, last_v], axis=1)  # (B, 6H)

        x = nn.relu(nn.Dense(6 * H, name="proj1")(last_hs))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(6 * H, name="proj2")(x)
        last_hs_proj = x + last_hs
        features = nn.Dense(H // 2, name="out_layer")(last_hs_proj)

        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)
        return features, emos_out, vals_out, jnp.float32(0.0)
