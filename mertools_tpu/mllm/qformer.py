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
    # BLIP-2 checkpoint compatibility: cross-attn k/v consume the raw
    # encoder width (no shared projection), and the query tokens pass
    # through the BertEmbeddings LayerNorm first.
    project_encoder: bool = True
    query_layernorm: bool = False
    # text-conditioned mode (QFormerText): instruction tokens appended to
    # the queries (InstructBLIP / LLaMA-VID / VideoChat2 pattern)
    vocab_size: int | None = None
    max_position_embeddings: int = 512

    @classmethod
    def blip2(cls, num_layers=12, **kw):
        """BLIP-2 pretrained Q-Former shape (LAVIS blip2_pretrained.pth /
        HF Blip2QFormerModel): 12 layers, cross-attn every 2nd layer."""
        kw.setdefault("cross_attention_freq", 2)
        return cls(num_layers=num_layers, project_encoder=False,
                   query_layernorm=True, **kw)


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
        if c.query_layernorm:  # BLIP-2 BertEmbeddings LayerNorm on queries
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="query_ln")(x)
        if c.project_encoder and enc_feats.shape[-1] != c.hidden_size:
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


class QFormerText(nn.Module):
    """Text-conditioned Q-Former: ``[queries; instruction tokens]`` run the
    BERT stack jointly (self-attention over the concatenation), queries
    ALONE cross-attend to the encoder features, and the two position groups
    use their own FFN weights (``intermediate_query``/``output_query`` vs
    the text branch's ``intermediate``/``output``).

    This is the LAVIS ``BertModel(query_embeds=..., input_ids=...)``
    semantics (LLaMA-VID ``llamavid/model/qformer.py:51-110`` embeddings:
    word + absolute position, LayerNorm over the concatenation; BertLayer:
    cross-attention on the first ``query_length`` positions only) — the
    same pattern HF ships as the InstructBLIP Q-Former, which is the parity
    oracle in tests. Returns only the query positions (B, num_queries, H).
    """

    cfg: QFormerConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, text_mask: jnp.ndarray,
                 enc_feats: jnp.ndarray,
                 enc_mask: jnp.ndarray | None = None):
        c = self.cfg
        assert c.vocab_size, "QFormerText needs cfg.vocab_size"
        B, L = input_ids.shape
        nq = c.num_queries
        queries = self.param("query_tokens", nn.initializers.normal(0.02),
                             (nq, c.hidden_size))
        wemb = self.param("word_embeddings", nn.initializers.normal(0.02),
                          (c.vocab_size, c.hidden_size))
        pemb = self.param("position_embeddings",
                          nn.initializers.normal(0.02),
                          (c.max_position_embeddings, c.hidden_size))
        t = wemb[input_ids] + pemb[None, :L]
        x = jnp.concatenate(
            [jnp.broadcast_to(queries, (B, nq, c.hidden_size)), t], axis=1)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="emb_ln")(x)

        full_mask = jnp.concatenate(
            [jnp.ones((B, nq), text_mask.dtype), text_mask], axis=1)
        self_bias = jnp.where(full_mask[:, None, None, :] > 0, 0.0, -1e30)
        cross_bias = None
        if enc_mask is not None:
            cross_bias = jnp.where(enc_mask[:, None, None, :] > 0, 0.0,
                                   -1e30)

        ln = lambda n: nn.LayerNorm(epsilon=c.layer_norm_eps, name=n)
        for i in range(c.num_layers):
            a = _MHA(c.hidden_size, c.num_heads, self.precision,
                     name=f"self_attn_{i}")(x, x, self_bias)
            x = ln(f"self_ln_{i}")(x + a)
            xq, xt = x[:, :nq], x[:, nq:]
            if i % c.cross_attention_freq == 0:
                a = _MHA(c.hidden_size, c.num_heads, self.precision,
                         name=f"cross_attn_{i}")(xq, enc_feats, cross_bias)
                xq = ln(f"cross_ln_{i}")(xq + a)
            hq = nn.Dense(c.intermediate_size, name=f"ffn1_{i}",
                          precision=self.precision)(xq)
            hq = nn.Dense(c.hidden_size, name=f"ffn2_{i}",
                          precision=self.precision)(
                jax.nn.gelu(hq, approximate=False))
            xq = ln(f"ffn_ln_{i}")(xq + hq)
            ht = nn.Dense(c.intermediate_size, name=f"ffn1_text_{i}",
                          precision=self.precision)(xt)
            ht = nn.Dense(c.hidden_size, name=f"ffn2_text_{i}",
                          precision=self.precision)(
                jax.nn.gelu(ht, approximate=False))
            xt = ln(f"ffn_ln_text_{i}")(xt + ht)
            x = jnp.concatenate([xq, xt], axis=1)
        return x[:, :nq]


# ---------------------------------------------------------------------------
# BLIP-2 checkpoint conversion (LAVIS Qformer.bert.* / HF Blip2QFormerModel)
# ---------------------------------------------------------------------------


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def from_blip2_qformer(sd: dict, prefix: str = "Qformer.bert.",
                       attn_inner: str = "self", num_heads: int | None = None
                       ) -> tuple[QFormerConfig, dict]:
    """Convert a BLIP-2 Q-Former state dict (the reference loads LAVIS
    ``blip2_pretrained.pth`` for the EVA_CLIP_G vision Q-Former,
    encoder.py:76-85; its text branch — intermediate/output — is deleted, so
    only the *_query MLP path is mapped).

    ``prefix``/``attn_inner``: LAVIS uses ``Qformer.bert.`` + ``attention.
    self.query``; HF ``Blip2QFormerModel`` uses ``""`` + ``attention.
    attention.query`` (and ``layernorm`` instead of ``embeddings.LayerNorm``).
    """
    def get(k):
        return _t(sd[k])

    n_layers = 1 + max(int(k.removeprefix(f"{prefix}encoder.layer.")
                           .split(".")[0])
                       for k in sd if k.startswith(f"{prefix}encoder.layer."))
    H = get(f"{prefix}encoder.layer.0.attention.{attn_inner}.query.weight"
            ).shape[0]
    inter = get(f"{prefix}encoder.layer.0.intermediate_query.dense.weight"
                ).shape[0]
    has_cross = [i for i in range(n_layers) if
                 f"{prefix}encoder.layer.{i}.crossattention.{attn_inner}."
                 f"query.weight" in sd]
    freq = has_cross[1] - has_cross[0] if len(has_cross) > 1 else n_layers
    qt_key = "query_tokens"
    num_q = _t(sd[qt_key]).shape[1] if qt_key in sd else 32
    n_heads = num_heads or 12            # BLIP-2 production value
    cfg = QFormerConfig(num_queries=num_q, hidden_size=H,
                        num_layers=n_layers, num_heads=n_heads,
                        intermediate_size=inter, cross_attention_freq=freq,
                        project_encoder=False, query_layernorm=True)

    def dense(k):
        return {"kernel": get(f"{k}.weight").T, "bias": get(f"{k}.bias")}

    def ln(k):
        return {"scale": get(f"{k}.weight"), "bias": get(f"{k}.bias")}

    emb_ln = (f"{prefix}embeddings.LayerNorm"
              if f"{prefix}embeddings.LayerNorm.weight" in sd
              else f"{prefix.removesuffix('bert.')}layernorm")
    params: dict = {"query_ln": ln(emb_ln)}
    if qt_key in sd:
        params["query_tokens"] = _t(sd[qt_key]).reshape(num_q, H)
    for i in range(n_layers):
        lp = f"{prefix}encoder.layer.{i}"
        params[f"self_attn_{i}"] = {
            "q": dense(f"{lp}.attention.{attn_inner}.query"),
            "k": dense(f"{lp}.attention.{attn_inner}.key"),
            "v": dense(f"{lp}.attention.{attn_inner}.value"),
            "out": dense(f"{lp}.attention.output.dense")}
        params[f"self_ln_{i}"] = ln(f"{lp}.attention.output.LayerNorm")
        if i in has_cross:
            params[f"cross_attn_{i}"] = {
                "q": dense(f"{lp}.crossattention.{attn_inner}.query"),
                "k": dense(f"{lp}.crossattention.{attn_inner}.key"),
                "v": dense(f"{lp}.crossattention.{attn_inner}.value"),
                "out": dense(f"{lp}.crossattention.output.dense")}
            params[f"cross_ln_{i}"] = ln(f"{lp}.crossattention.output.LayerNorm")
        params[f"ffn1_{i}"] = dense(f"{lp}.intermediate_query.dense")
        params[f"ffn2_{i}"] = dense(f"{lp}.output_query.dense")
        params[f"ffn_ln_{i}"] = ln(f"{lp}.output_query.LayerNorm")
    return cfg, jax.tree_util.tree_map(jnp.asarray, params)


def from_bert_qformer_text(sd: dict, prefix: str = "bert.",
                           attn_inner: str = "self",
                           num_heads: int = 12,
                           query_tokens_key: str = "query_tokens"
                           ) -> tuple[QFormerConfig, dict]:
    """Convert a text-conditioned Q-Former state dict to QFormerText params.

    Accepts both the LAVIS naming (LLaMA-VID ``vlm_att_encoder.bert.*``:
    ``attention.self.query``, ``embeddings.LayerNorm``) and the HF
    InstructBLIP naming (``attention.attention.query``,
    ``embeddings.layernorm``) via ``prefix``/``attn_inner``."""
    def get(k):
        return _t(sd[k])

    n_layers = 1 + max(int(k.removeprefix(f"{prefix}encoder.layer.")
                           .split(".")[0])
                       for k in sd if k.startswith(f"{prefix}encoder.layer."))
    H = get(f"{prefix}encoder.layer.0.attention.{attn_inner}.query.weight"
            ).shape[0]
    inter = get(f"{prefix}encoder.layer.0.intermediate_query.dense.weight"
                ).shape[0]
    has_cross = [i for i in range(n_layers) if
                 f"{prefix}encoder.layer.{i}.crossattention.{attn_inner}."
                 f"query.weight" in sd]
    freq = has_cross[1] - has_cross[0] if len(has_cross) > 1 else n_layers
    wemb = get(f"{prefix}embeddings.word_embeddings.weight")
    pemb = get(f"{prefix}embeddings.position_embeddings.weight")
    qt = _t(sd[query_tokens_key])
    num_q = qt.shape[-2]
    cfg = QFormerConfig(num_queries=num_q, hidden_size=H,
                        num_layers=n_layers, num_heads=num_heads,
                        intermediate_size=inter, cross_attention_freq=freq,
                        project_encoder=False, query_layernorm=True,
                        vocab_size=wemb.shape[0],
                        max_position_embeddings=pemb.shape[0])

    def dense(k):
        return {"kernel": get(f"{k}.weight").T, "bias": get(f"{k}.bias")}

    def ln(k):
        return {"scale": get(f"{k}.weight"), "bias": get(f"{k}.bias")}

    emb_ln = (f"{prefix}embeddings.LayerNorm"
              if f"{prefix}embeddings.LayerNorm.weight" in sd
              else f"{prefix}embeddings.layernorm")
    params: dict = {
        "query_tokens": qt.reshape(num_q, H),
        "word_embeddings": wemb,
        "position_embeddings": pemb,
        "emb_ln": ln(emb_ln),
    }
    for i in range(n_layers):
        lp = f"{prefix}encoder.layer.{i}"
        params[f"self_attn_{i}"] = {
            "q": dense(f"{lp}.attention.{attn_inner}.query"),
            "k": dense(f"{lp}.attention.{attn_inner}.key"),
            "v": dense(f"{lp}.attention.{attn_inner}.value"),
            "out": dense(f"{lp}.attention.output.dense")}
        params[f"self_ln_{i}"] = ln(f"{lp}.attention.output.LayerNorm")
        if i in has_cross:
            params[f"cross_attn_{i}"] = {
                "q": dense(f"{lp}.crossattention.{attn_inner}.query"),
                "k": dense(f"{lp}.crossattention.{attn_inner}.key"),
                "v": dense(f"{lp}.crossattention.{attn_inner}.value"),
                "out": dense(f"{lp}.crossattention.output.dense")}
            params[f"cross_ln_{i}"] = ln(
                f"{lp}.crossattention.output.LayerNorm")
        params[f"ffn1_{i}"] = dense(f"{lp}.intermediate_query.dense")
        params[f"ffn2_{i}"] = dense(f"{lp}.output_query.dense")
        params[f"ffn_ln_{i}"] = ln(f"{lp}.output_query.LayerNorm")
        params[f"ffn1_text_{i}"] = dense(f"{lp}.intermediate.dense")
        params[f"ffn2_text_{i}"] = dense(f"{lp}.output.dense")
        params[f"ffn_ln_text_{i}"] = ln(f"{lp}.output.LayerNorm")
    return cfg, jax.tree_util.tree_map(jnp.asarray, params)
