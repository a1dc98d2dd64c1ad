"""BERT-family text encoders in Flax (BERT/MacBERT/RoBERTa-wwm/ELECTRA bodies).

Backs the reference's text feature extraction
(``MERBench/feature_extraction/text/extract_text_huggingface.py``): sentence
-> tokens -> transformer with ``output_hidden_states`` -> sum of the last 4
hidden layers -> per-token (FRA) or masked mean (UTT) features with the
special-token span trimmed (``find_start_end_pos``, ``:95-120``).

The Chinese MacBERT/RoBERTa-wwm checkpoints are architecturally BertModel, so
one implementation + converter covers them; ELECTRA differs only in the
embedding projection (handled when embedding_size != hidden_size).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 21128
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    embedding_size: int | None = None  # ELECTRA-style factorized embeddings
    # RoBERTa-style position ids (cumsum from the pad id, offset by pad id).
    # English roberta-base/large & XLM-R; Chinese "RoBERTa" ckpts are BertModel.
    position_pad_id: int | None = None

    @classmethod
    def from_hf(cls, hf_cfg) -> "BertConfig":
        roberta = getattr(hf_cfg, "model_type", "") in (
            "roberta", "xlm-roberta", "camembert")
        return cls(vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
                   num_hidden_layers=hf_cfg.num_hidden_layers,
                   num_attention_heads=hf_cfg.num_attention_heads,
                   intermediate_size=hf_cfg.intermediate_size,
                   max_position_embeddings=hf_cfg.max_position_embeddings,
                   type_vocab_size=hf_cfg.type_vocab_size,
                   layer_norm_eps=hf_cfg.layer_norm_eps,
                   embedding_size=(hf_cfg.embedding_size
                                   if getattr(hf_cfg, "embedding_size", None) not in (None, hf_cfg.hidden_size)
                                   else None),
                   position_pad_id=hf_cfg.pad_token_id if roberta else None)


class _BertLayer(nn.Module):
    cfg: BertConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        H, nh = c.hidden_size, c.num_attention_heads
        hd = H // nh
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision)
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name)

        q = dense(H, "query")(x).reshape(*x.shape[:2], nh, hd)
        k = dense(H, "key")(x).reshape(*x.shape[:2], nh, hd)
        v = dense(H, "value")(x).reshape(*x.shape[:2], nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, precision=self.precision) / np.sqrt(hd)
        if bias is not None:
            logits = logits + bias
        w = nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=self.precision)
        attn = attn.reshape(*x.shape[:2], H)
        x = ln("attn_ln")(x + dense(H, "attn_out")(attn))

        h = dense(c.intermediate_size, "intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        x = ln("out_ln")(x + dense(H, "output")(h))
        return x


class BertEncoder(nn.Module):
    """(input_ids, attention_mask[, token_type_ids]) -> tuple of hidden states."""

    cfg: BertConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        c = self.cfg
        E = c.embedding_size or c.hidden_size
        B, S = input_ids.shape
        we = nn.Embed(c.vocab_size, E, name="word_embeddings")(input_ids)
        pe_table = self.param("position_embeddings", nn.initializers.zeros,
                              (c.max_position_embeddings, E))
        if c.position_pad_id is not None:   # RoBERTa create_position_ids
            m = (input_ids != c.position_pad_id).astype(jnp.int32)
            pe = pe_table[jnp.cumsum(m, axis=1) * m + c.position_pad_id]
        else:
            pe = pe_table[:S][None]
        tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
        te = nn.Embed(c.type_vocab_size, E, name="token_type_embeddings")(tt)
        x = we + pe + te
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")(x)
        if c.embedding_size:
            x = nn.Dense(c.hidden_size, name="embeddings_project",
                         precision=self.precision)(x)

        bias = None
        if attention_mask is not None:
            bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e30)

        hidden_states = [x]
        for i in range(c.num_hidden_layers):
            x = _BertLayer(c, self.precision, name=f"layer_{i}")(x, bias)
            hidden_states.append(x)
        return tuple(hidden_states)


# ---------------------------------------------------------------------------
# torch -> flax conversion (BertModel / ElectraModel state dicts)
# ---------------------------------------------------------------------------
def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_torch_state(cfg: BertConfig, sd: dict) -> dict:
    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T, "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}

    p = {
        "word_embeddings": {"embedding": _t(sd["embeddings.word_embeddings.weight"])},
        "position_embeddings": _t(sd["embeddings.position_embeddings.weight"]),
        "token_type_embeddings": {"embedding": _t(sd["embeddings.token_type_embeddings.weight"])},
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    if "embeddings_project.weight" in sd:  # ELECTRA factorized embeddings
        p["embeddings_project"] = dense("embeddings_project")
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "query": dense(f"{pre}.attention.self.query"),
            "key": dense(f"{pre}.attention.self.key"),
            "value": dense(f"{pre}.attention.self.value"),
            "attn_out": dense(f"{pre}.attention.output.dense"),
            "attn_ln": ln(f"{pre}.attention.output.LayerNorm"),
            "intermediate": dense(f"{pre}.intermediate.dense"),
            "output": dense(f"{pre}.output.dense"),
            "out_ln": ln(f"{pre}.output.LayerNorm"),
        }
    return jax.tree_util.tree_map(jnp.asarray, p)


def from_hf_torch(model) -> tuple[BertConfig, dict]:
    cfg = BertConfig.from_hf(model.config)
    return cfg, convert_torch_state(cfg, model.state_dict())
