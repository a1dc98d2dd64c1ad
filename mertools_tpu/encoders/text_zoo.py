"""Extended text-encoder zoo in Flax: the WHOLE_TEXT architectures beyond the
BERT family and the LLaMA-class decoders.

The reference's text extraction (``MERBench/feature_extraction/text/
extract_text_huggingface.py``; model list ``MERBench/toolkit/globals.py:106-115``)
runs ~60 LMs through one ``output_hidden_states`` + last-4-layer-sum pipeline.
`encoders/bert.py` covers the BertModel-compatible checkpoints and
`mllm/llm.py` the LLaMA/Qwen/Baichuan decoders; this module adds the remaining
architecture families, each converting from its HF torch state dict and
returning HF-layout hidden-state tuples so `features/text.TextExtractor` can
drive them unchanged:

- GPT2 (GPT2_CHINESE, WENZHONG_GPT2_CHINESE)
- OPT (OPT_13B)
- BLOOM (BLOOM_7B; ALiBi attention)
- ALBERT (ALBERT_TINY/SMALL_CHINESE, ALBERT_BASE/LARGE/XXLARGE; shared layers)
- T5 encoder (T5_BASE, T5_LARGE; relative-bucket position bias)
- MPNet (MPNET_BASE; shared relative position bias)
- DeBERTa-v2 (DEBERTA_LARGE_CHINESE Erlangshen; disentangled attention)
- DeBERTa-v1 (DEBERTA_BASE/LARGE; clamped relative positions, fused in_proj)
- XLNet (XLNET_BASE/LARGE; Transformer-XL relative attention, rel-shift)
- GPT-NeoX (STABLEML_7B stablelm-alpha; partial rotary, parallel residual)
- CodeGen (MOSS_7B architecture; GPT-J interleaved rotary, mp-sharded qkv)
- Falcon (FALCON_7B; multi-query attention, parallel attn/mlp, rotary)

Parity: tiny-config HF torch oracles in tests/test_text_zoo.py (<2e-4).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST
_NEG = -1e30


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _pad_bias(attention_mask):
    """(B, S) 1=valid -> additive (B, 1, 1, S)."""
    if attention_mask is None:
        return None
    return jnp.where(attention_mask[:, None, None, :] > 0, 0.0, _NEG)


def _causal_bias(S):
    return jnp.where(jnp.arange(S)[:, None] >= jnp.arange(S)[None, :],
                     0.0, _NEG)[None, None]


def _mha(q, k, v, bias, precision, scale=None):
    """q,k,v: (B, S, nh, hd); bias additive (broadcastable to B,nh,S,S)."""
    hd = q.shape[-1]
    scale = scale if scale is not None else 1.0 / np.sqrt(hd)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, precision=precision) * scale
    if bias is not None:
        logits = logits + bias
    w = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    attn = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=precision)
    return attn.reshape(*q.shape[:2], q.shape[2] * hd)


# ===========================================================================
# GPT2 (Conv1D fused qkv, gelu_new, pre-LN)
# ===========================================================================


@dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 21128
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, hf):
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.n_embd,
                   num_layers=hf.n_layer, num_heads=hf.n_head,
                   intermediate_size=hf.n_inner or 4 * hf.n_embd,
                   max_position_embeddings=hf.n_positions,
                   layer_norm_eps=hf.layer_norm_epsilon)


class _GPT2Block(nn.Module):
    cfg: GPT2Config
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        H, nh = c.hidden_size, c.num_heads
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name)
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision)

        h = ln("ln_1")(x)
        qkv = dense(3 * H, "c_attn")(h).reshape(*x.shape[:2], 3, nh, H // nh)
        attn = _mha(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias,
                    self.precision)
        x = x + dense(H, "c_proj")(attn)

        h = dense(c.intermediate_size, "c_fc")(ln("ln_2")(x))
        h = jax.nn.gelu(h, approximate=True)  # HF NewGELU
        return x + dense(H, "mlp_c_proj")(h)


class GPT2Encoder(nn.Module):
    """(input_ids, attention_mask) -> tuple of hidden states (HF layout:
    embeddings + per-block outputs, last entry after ln_f)."""

    cfg: GPT2Config
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        S = input_ids.shape[1]
        x = (nn.Embed(c.vocab_size, c.hidden_size, name="wte")(input_ids)
             + self.param("wpe", nn.initializers.zeros,
                          (c.max_position_embeddings, c.hidden_size))[:S][None])
        bias = _causal_bias(S)
        pad = _pad_bias(attention_mask)
        if pad is not None:
            bias = bias + pad
        hs = [x]
        for i in range(c.num_layers):
            x = _GPT2Block(c, self.precision, name=f"h_{i}")(x, bias)
            hs.append(x)
        hs[-1] = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_f")(x)
        return tuple(hs)


def from_hf_gpt2(model):
    cfg = GPT2Config.from_hf(model.config)
    sd = model.state_dict()

    def conv1d(prefix):  # HF Conv1D: weight (in, out) — no transpose
        return {"kernel": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {"wte": {"embedding": _t(sd["wte.weight"])},
         "wpe": _t(sd["wpe.weight"]), "ln_f": ln("ln_f")}
    for i in range(cfg.num_layers):
        pre = f"h.{i}"
        p[f"h_{i}"] = {
            "ln_1": ln(f"{pre}.ln_1"), "ln_2": ln(f"{pre}.ln_2"),
            "c_attn": conv1d(f"{pre}.attn.c_attn"),
            "c_proj": conv1d(f"{pre}.attn.c_proj"),
            "c_fc": conv1d(f"{pre}.mlp.c_fc"),
            "mlp_c_proj": conv1d(f"{pre}.mlp.c_proj"),
        }
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# OPT (learned positions offset 2, ReLU MLP, pre-LN)
# ===========================================================================


@dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 5120
    num_layers: int = 40
    num_heads: int = 40
    intermediate_size: int = 20480
    max_position_embeddings: int = 2048
    word_embed_proj_dim: int | None = None   # != hidden -> project_in/out
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, hf):
        proj = (hf.word_embed_proj_dim
                if hf.word_embed_proj_dim != hf.hidden_size else None)
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
                   num_layers=hf.num_hidden_layers,
                   num_heads=hf.num_attention_heads,
                   intermediate_size=hf.ffn_dim,
                   max_position_embeddings=hf.max_position_embeddings,
                   word_embed_proj_dim=proj)


class _OPTLayer(nn.Module):
    cfg: OPTConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        H, nh = c.hidden_size, c.num_heads
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="self_attn_layer_norm")(x)
        q = dense(H, "q_proj")(h).reshape(*x.shape[:2], nh, H // nh)
        k = dense(H, "k_proj")(h).reshape(*x.shape[:2], nh, H // nh)
        v = dense(H, "v_proj")(h).reshape(*x.shape[:2], nh, H // nh)
        x = x + dense(H, "out_proj")(_mha(q, k, v, bias, self.precision))

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)
        h = jax.nn.relu(dense(c.intermediate_size, "fc1")(h))
        return x + dense(H, "fc2")(h)


class OPTEncoder(nn.Module):
    cfg: OPTConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        B, S = input_ids.shape
        E = c.word_embed_proj_dim or c.hidden_size
        mask = (attention_mask if attention_mask is not None
                else jnp.ones((B, S), jnp.int32))
        x = nn.Embed(c.vocab_size, E, name="embed_tokens")(input_ids)
        if c.word_embed_proj_dim:
            x = nn.Dense(c.hidden_size, use_bias=False, name="project_in",
                         precision=self.precision)(x)
        # OPTLearnedPositionalEmbedding: cumsum(mask)-1, +2 offset
        positions = jnp.cumsum(mask, axis=1) * mask - 1
        pe = self.param("embed_positions", nn.initializers.zeros,
                        (c.max_position_embeddings + 2, c.hidden_size))
        x = x + pe[positions + 2]
        bias = _causal_bias(S)
        pad = _pad_bias(attention_mask)
        if pad is not None:
            bias = bias + pad
        hs = [x]
        for i in range(c.num_layers):
            x = _OPTLayer(c, self.precision, name=f"layer_{i}")(x, bias)
            hs.append(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)
        if c.word_embed_proj_dim:
            x = nn.Dense(E, use_bias=False, name="project_out",
                         precision=self.precision)(x)
        hs[-1] = x
        return tuple(hs)


def from_hf_opt(model):
    cfg = OPTConfig.from_hf(model.config)
    sd = model.state_dict()
    pre = "decoder." if any(k.startswith("decoder.") for k in sd) else ""

    def dense(prefix, bias=True):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if bias:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {"embed_tokens": {"embedding": _t(sd[f"{pre}embed_tokens.weight"])},
         "embed_positions": _t(sd[f"{pre}embed_positions.weight"]),
         "final_layer_norm": ln(f"{pre}final_layer_norm")}
    if cfg.word_embed_proj_dim:
        p["project_in"] = dense(f"{pre}project_in", bias=False)
        p["project_out"] = dense(f"{pre}project_out", bias=False)
    for i in range(cfg.num_layers):
        lp = f"{pre}layers.{i}"
        p[f"layer_{i}"] = {
            "self_attn_layer_norm": ln(f"{lp}.self_attn_layer_norm"),
            "final_layer_norm": ln(f"{lp}.final_layer_norm"),
            "q_proj": dense(f"{lp}.self_attn.q_proj"),
            "k_proj": dense(f"{lp}.self_attn.k_proj"),
            "v_proj": dense(f"{lp}.self_attn.v_proj"),
            "out_proj": dense(f"{lp}.self_attn.out_proj"),
            "fc1": dense(f"{lp}.fc1"), "fc2": dense(f"{lp}.fc2"),
        }
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# BLOOM (ALiBi, fused per-head qkv, gelu_new)
# ===========================================================================


@dataclass(frozen=True)
class BloomConfig:
    vocab_size: int = 250880
    hidden_size: int = 4096
    num_layers: int = 30
    num_heads: int = 32
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, hf):
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
                   num_layers=hf.n_layer, num_heads=hf.n_head,
                   layer_norm_eps=hf.layer_norm_epsilon)


def alibi_slopes(num_heads: int) -> np.ndarray:
    """HF build_alibi_tensor slope schedule (modeling_bloom.py)."""
    cp2 = 2 ** int(np.floor(np.log2(num_heads)))
    base = 2.0 ** (-(2.0 ** -(np.log2(cp2) - 3)))
    slopes = base ** np.arange(1, 1 + cp2)
    if cp2 != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(np.log2(2 * cp2) - 3)))
        extra = extra_base ** np.arange(1, 1 + 2 * (num_heads - cp2), 2)
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)


class _BloomLayer(nn.Module):
    cfg: BloomConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        H, nh = c.hidden_size, c.num_heads
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="input_layernorm")(x)
        qkv = dense(3 * H, "query_key_value")(h)
        qkv = qkv.reshape(*x.shape[:2], nh, 3, H // nh)   # HF per-head layout
        attn = _mha(qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :], bias,
                    self.precision)
        x = x + dense(H, "dense")(attn)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="post_attention_layernorm")(x)
        h = jax.nn.gelu(dense(4 * H, "dense_h_to_4h")(h), approximate=True)
        return x + dense(H, "dense_4h_to_h")(h)


class BloomEncoder(nn.Module):
    cfg: BloomConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        B, S = input_ids.shape
        mask = (attention_mask if attention_mask is not None
                else jnp.ones((B, S), jnp.int32))
        x = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(input_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="word_embeddings_layernorm")(x)
        # ALiBi: slopes * mask-aware key positions (build_alibi_tensor)
        slopes = jnp.asarray(alibi_slopes(c.num_heads))
        kpos = (jnp.cumsum(mask, axis=-1) - 1) * mask       # (B, S)
        alibi = slopes[None, :, None, None] * kpos[:, None, None, :]
        bias = alibi + _causal_bias(S)
        pad = _pad_bias(attention_mask)
        if pad is not None:
            bias = bias + pad
        hs = [x]
        for i in range(c.num_layers):
            x = _BloomLayer(c, self.precision, name=f"h_{i}")(x, bias)
            hs.append(x)
        hs[-1] = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_f")(x)
        return tuple(hs)


def from_hf_bloom(model):
    cfg = BloomConfig.from_hf(model.config)
    sd = model.state_dict()
    nh, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T,
                "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {"word_embeddings": {"embedding": _t(sd["word_embeddings.weight"])},
         "word_embeddings_layernorm": ln("word_embeddings_layernorm"),
         "ln_f": ln("ln_f")}
    for i in range(cfg.num_layers):
        pre = f"h.{i}"
        p[f"h_{i}"] = {
            "input_layernorm": ln(f"{pre}.input_layernorm"),
            "post_attention_layernorm": ln(f"{pre}.post_attention_layernorm"),
            "query_key_value": dense(f"{pre}.self_attention.query_key_value"),
            "dense": dense(f"{pre}.self_attention.dense"),
            "dense_h_to_4h": dense(f"{pre}.mlp.dense_h_to_4h"),
            "dense_4h_to_h": dense(f"{pre}.mlp.dense_4h_to_h"),
        }
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# ALBERT (factorized embedding, cross-layer parameter sharing)
# ===========================================================================


@dataclass(frozen=True)
class AlbertConfig:
    vocab_size: int = 21128
    embedding_size: int = 128
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_hidden_groups: int = 1
    inner_group_num: int = 1
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu_new"

    @classmethod
    def from_hf(cls, hf):
        return cls(vocab_size=hf.vocab_size, embedding_size=hf.embedding_size,
                   hidden_size=hf.hidden_size,
                   num_hidden_layers=hf.num_hidden_layers,
                   num_hidden_groups=hf.num_hidden_groups,
                   inner_group_num=hf.inner_group_num,
                   num_attention_heads=hf.num_attention_heads,
                   intermediate_size=hf.intermediate_size,
                   max_position_embeddings=hf.max_position_embeddings,
                   type_vocab_size=hf.type_vocab_size,
                   layer_norm_eps=hf.layer_norm_eps, hidden_act=hf.hidden_act)


def _act(name):
    return {"gelu": lambda x: jax.nn.gelu(x, approximate=False),
            "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
            "relu": jax.nn.relu,
            "silu": jax.nn.silu,
            "tanh": jnp.tanh}[name]


class _AlbertLayer(nn.Module):
    cfg: AlbertConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        H, nh = c.hidden_size, c.num_attention_heads
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision)
        q = dense(H, "query")(x).reshape(*x.shape[:2], nh, H // nh)
        k = dense(H, "key")(x).reshape(*x.shape[:2], nh, H // nh)
        v = dense(H, "value")(x).reshape(*x.shape[:2], nh, H // nh)
        attn = dense(H, "attn_out")(_mha(q, k, v, bias, self.precision))
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(x + attn)
        h = _act(c.hidden_act)(dense(c.intermediate_size, "ffn")(x))
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            name="full_ln")(x + dense(H, "ffn_output")(h))


class AlbertEncoder(nn.Module):
    """Shared-parameter stack: num_hidden_layers applications of the (few)
    group layers (HF AlbertTransformer group dispatch)."""

    cfg: AlbertConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        c = self.cfg
        E, S = c.embedding_size, input_ids.shape[1]
        we = nn.Embed(c.vocab_size, E, name="word_embeddings")(input_ids)
        pe = self.param("position_embeddings", nn.initializers.zeros,
                        (c.max_position_embeddings, E))[:S]
        tt = (token_type_ids if token_type_ids is not None
              else jnp.zeros_like(input_ids))
        te = nn.Embed(c.type_vocab_size, E, name="token_type_embeddings")(tt)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="embeddings_ln")(we + pe[None] + te)
        x = nn.Dense(c.hidden_size, name="embedding_hidden_mapping_in",
                     precision=self.precision)(x)
        bias = _pad_bias(attention_mask)
        layers = [[_AlbertLayer(c, self.precision, name=f"group_{g}_layer_{j}")
                   for j in range(c.inner_group_num)]
                  for g in range(c.num_hidden_groups)]
        hs = [x]
        per_group = c.num_hidden_layers // c.num_hidden_groups
        for i in range(c.num_hidden_layers):
            for layer in layers[i // per_group]:
                x = layer(x, bias)
            hs.append(x)
        return tuple(hs)


def from_hf_albert(model):
    cfg = AlbertConfig.from_hf(model.config)
    sd = model.state_dict()

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T,
                "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {
        "word_embeddings": {"embedding": _t(sd["embeddings.word_embeddings.weight"])},
        "position_embeddings": _t(sd["embeddings.position_embeddings.weight"]),
        "token_type_embeddings": {"embedding": _t(sd["embeddings.token_type_embeddings.weight"])},
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "embedding_hidden_mapping_in": dense("encoder.embedding_hidden_mapping_in"),
    }
    for g in range(cfg.num_hidden_groups):
        for j in range(cfg.inner_group_num):
            pre = f"encoder.albert_layer_groups.{g}.albert_layers.{j}"
            p[f"group_{g}_layer_{j}"] = {
                "query": dense(f"{pre}.attention.query"),
                "key": dense(f"{pre}.attention.key"),
                "value": dense(f"{pre}.attention.value"),
                "attn_out": dense(f"{pre}.attention.dense"),
                "attn_ln": ln(f"{pre}.attention.LayerNorm"),
                "ffn": dense(f"{pre}.ffn"),
                "ffn_output": dense(f"{pre}.ffn_output"),
                "full_ln": ln(f"{pre}.full_layer_layer_norm"),
            }
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# Relative-position bucketing (T5 / MPNet shared semantics)
# ===========================================================================


def relative_position_bucket(relative_position: np.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """HF T5Attention._relative_position_bucket, bidirectional (host-side:
    sequence lengths are static under jit)."""
    ret = np.zeros_like(relative_position)
    num_buckets //= 2
    ret += (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


def _rel_bucket_table(S: int, num_buckets: int, max_distance: int) -> np.ndarray:
    ctx = np.arange(S)[:, None]
    mem = np.arange(S)[None, :]
    return relative_position_bucket(mem - ctx, num_buckets, max_distance)


# ===========================================================================
# T5 encoder stack (RMS LayerNorm, unscaled attention, relative bias)
# ===========================================================================


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    hidden_size: int = 768          # d_model
    num_layers: int = 12
    num_heads: int = 12
    head_dim: int = 64              # d_kv (NOT d_model/num_heads in general)
    intermediate_size: int = 3072   # d_ff
    num_buckets: int = 32
    max_distance: int = 128
    layer_norm_eps: float = 1e-6
    gated_act: bool = False
    hidden_act: str = "relu"

    @classmethod
    def from_hf(cls, hf):
        act = hf.dense_act_fn if hasattr(hf, "dense_act_fn") else "relu"
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.d_model,
                   num_layers=hf.num_layers, num_heads=hf.num_heads,
                   head_dim=hf.d_kv, intermediate_size=hf.d_ff,
                   num_buckets=hf.relative_attention_num_buckets,
                   max_distance=getattr(hf, "relative_attention_max_distance", 128),
                   layer_norm_eps=hf.layer_norm_epsilon,
                   gated_act=getattr(hf, "is_gated_act", False), hidden_act=act)


class T5LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class _T5Block(nn.Module):
    cfg: T5Config
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        inner = c.num_heads * c.head_dim
        dense = lambda d, name: nn.Dense(d, use_bias=False, name=name,
                                         precision=self.precision)
        h = T5LayerNorm(c.layer_norm_eps, name="ln_attn")(x)
        q = dense(inner, "q")(h).reshape(*x.shape[:2], c.num_heads, c.head_dim)
        k = dense(inner, "k")(h).reshape(*x.shape[:2], c.num_heads, c.head_dim)
        v = dense(inner, "v")(h).reshape(*x.shape[:2], c.num_heads, c.head_dim)
        x = x + dense(c.hidden_size, "o")(
            _mha(q, k, v, bias, self.precision, scale=1.0))  # T5: no 1/sqrt(d)

        h = T5LayerNorm(c.layer_norm_eps, name="ln_ff")(x)
        if c.gated_act:
            h = (_act(c.hidden_act)(dense(c.intermediate_size, "wi_0")(h))
                 * dense(c.intermediate_size, "wi_1")(h))
        else:
            h = _act(c.hidden_act)(dense(c.intermediate_size, "wi")(h))
        return x + dense(c.hidden_size, "wo")(h)


class T5Encoder(nn.Module):
    cfg: T5Config
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        S = input_ids.shape[1]
        x = nn.Embed(c.vocab_size, c.hidden_size, name="shared")(input_ids)
        table = _rel_bucket_table(S, c.num_buckets, c.max_distance)
        rel = nn.Embed(c.num_buckets, c.num_heads,
                       name="relative_attention_bias")(jnp.asarray(table))
        bias = rel.transpose(2, 0, 1)[None]          # (1, nh, S, S)
        pad = _pad_bias(attention_mask)
        if pad is not None:
            bias = bias + pad
        hs = [x]
        for i in range(c.num_layers):
            x = _T5Block(c, self.precision, name=f"block_{i}")(x, bias)
            hs.append(x)
        hs[-1] = T5LayerNorm(c.layer_norm_eps, name="final_layer_norm")(x)
        return tuple(hs)


def from_hf_t5_encoder(model):
    cfg = T5Config.from_hf(model.config)
    sd = model.state_dict()

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T}

    p = {"shared": {"embedding": _t(sd["shared.weight"])},
         "relative_attention_bias": {"embedding": _t(
             sd["encoder.block.0.layer.0.SelfAttention"
                ".relative_attention_bias.weight"])},
         "final_layer_norm": {"weight": _t(sd["encoder.final_layer_norm.weight"])}}
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        blk = {
            "ln_attn": {"weight": _t(sd[f"{pre}.layer.0.layer_norm.weight"])},
            "ln_ff": {"weight": _t(sd[f"{pre}.layer.1.layer_norm.weight"])},
            "q": dense(f"{pre}.layer.0.SelfAttention.q"),
            "k": dense(f"{pre}.layer.0.SelfAttention.k"),
            "v": dense(f"{pre}.layer.0.SelfAttention.v"),
            "o": dense(f"{pre}.layer.0.SelfAttention.o"),
            "wo": dense(f"{pre}.layer.1.DenseReluDense.wo"),
        }
        if cfg.gated_act:
            blk["wi_0"] = dense(f"{pre}.layer.1.DenseReluDense.wi_0")
            blk["wi_1"] = dense(f"{pre}.layer.1.DenseReluDense.wi_1")
        else:
            blk["wi"] = dense(f"{pre}.layer.1.DenseReluDense.wi")
        p[f"block_{i}"] = blk
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# MPNet (BERT layout + shared T5-style relative position bias)
# ===========================================================================


@dataclass(frozen=True)
class MPNetConfig:
    vocab_size: int = 30527
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    num_buckets: int = 32
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    hidden_act: str = "gelu"

    @classmethod
    def from_hf(cls, hf):
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
                   num_hidden_layers=hf.num_hidden_layers,
                   num_attention_heads=hf.num_attention_heads,
                   intermediate_size=hf.intermediate_size,
                   max_position_embeddings=hf.max_position_embeddings,
                   num_buckets=hf.relative_attention_num_buckets,
                   layer_norm_eps=hf.layer_norm_eps,
                   pad_token_id=hf.pad_token_id, hidden_act=hf.hidden_act)


class MPNetEncoder(nn.Module):
    cfg: MPNetConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        S = input_ids.shape[1]
        # RoBERTa-style positions from the pad id (MPNetEmbeddings)
        m = (input_ids != c.pad_token_id).astype(jnp.int32)
        positions = jnp.cumsum(m, axis=1) * m + c.pad_token_id
        we = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(input_ids)
        pe = nn.Embed(c.max_position_embeddings, c.hidden_size,
                      name="position_embeddings")(positions)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")(we + pe)
        table = _rel_bucket_table(S, c.num_buckets, 128)
        rel = nn.Embed(c.num_buckets, c.num_attention_heads,
                       name="relative_attention_bias")(jnp.asarray(table))
        bias = rel.transpose(2, 0, 1)[None]
        pad = _pad_bias(attention_mask)
        if pad is not None:
            bias = bias + pad

        H, nh = c.hidden_size, c.num_attention_heads
        hs = [x]
        for i in range(c.num_hidden_layers):
            dense = lambda d, name: nn.Dense(d, name=f"layer_{i}_{name}",
                                             precision=self.precision)
            ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps,
                                           name=f"layer_{i}_{name}")
            q = dense(H, "q")(x).reshape(*x.shape[:2], nh, H // nh)
            k = dense(H, "k")(x).reshape(*x.shape[:2], nh, H // nh)
            v = dense(H, "v")(x).reshape(*x.shape[:2], nh, H // nh)
            attn = dense(H, "o")(_mha(q, k, v, bias, self.precision))
            x = ln("attn_ln")(x + attn)
            h = _act(c.hidden_act)(dense(c.intermediate_size, "intermediate")(x))
            x = ln("out_ln")(x + dense(H, "output")(h))
            hs.append(x)
        return tuple(hs)


def from_hf_mpnet(model):
    cfg = MPNetConfig.from_hf(model.config)
    sd = model.state_dict()

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T,
                "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {
        "word_embeddings": {"embedding": _t(sd["embeddings.word_embeddings.weight"])},
        "position_embeddings": {"embedding": _t(sd["embeddings.position_embeddings.weight"])},
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "relative_attention_bias": {"embedding": _t(
            sd["encoder.relative_attention_bias.weight"])},
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}"
        p.update({
            f"layer_{i}_q": dense(f"{pre}.attention.attn.q"),
            f"layer_{i}_k": dense(f"{pre}.attention.attn.k"),
            f"layer_{i}_v": dense(f"{pre}.attention.attn.v"),
            f"layer_{i}_o": dense(f"{pre}.attention.attn.o"),
            f"layer_{i}_attn_ln": ln(f"{pre}.attention.LayerNorm"),
            f"layer_{i}_intermediate": dense(f"{pre}.intermediate.dense"),
            f"layer_{i}_output": dense(f"{pre}.output.dense"),
            f"layer_{i}_out_ln": ln(f"{pre}.output.LayerNorm"),
        })
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# DeBERTa-v2 (disentangled attention: c2p + p2c over log-bucketed relative
# positions; optional conv layer after block 0)
# ===========================================================================


@dataclass(frozen=True)
class DebertaV2Config:
    vocab_size: int = 12800
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    position_buckets: int = 256
    max_relative_positions: int = 512
    pos_att_type: tuple = ("c2p", "p2c")
    share_att_key: bool = True
    norm_rel_ebd: str = "layer_norm"
    position_biased_input: bool = False
    conv_kernel_size: int = 0
    conv_groups: int = 1
    conv_act: str = "tanh"
    layer_norm_eps: float = 1e-7
    hidden_act: str = "gelu"

    @classmethod
    def from_hf(cls, hf):
        max_rel = hf.max_relative_positions
        if max_rel < 1:
            max_rel = hf.max_position_embeddings
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
                   num_hidden_layers=hf.num_hidden_layers,
                   num_attention_heads=hf.num_attention_heads,
                   intermediate_size=hf.intermediate_size,
                   max_position_embeddings=hf.max_position_embeddings,
                   position_buckets=getattr(hf, "position_buckets", -1),
                   max_relative_positions=max_rel,
                   pos_att_type=tuple(hf.pos_att_type or ()),
                   share_att_key=getattr(hf, "share_att_key", False),
                   norm_rel_ebd=getattr(hf, "norm_rel_ebd", "none"),
                   position_biased_input=hf.position_biased_input,
                   conv_kernel_size=getattr(hf, "conv_kernel_size", 0),
                   conv_groups=getattr(hf, "conv_groups", 1),
                   conv_act=getattr(hf, "conv_act", "tanh"),
                   layer_norm_eps=hf.layer_norm_eps, hidden_act=hf.hidden_act)

    @property
    def pos_ebd_size(self):
        return (self.position_buckets if self.position_buckets > 0
                else self.max_relative_positions)


def make_log_bucket_position(relative_pos: np.ndarray, bucket_size: int,
                             max_position: int) -> np.ndarray:
    """HF modeling_deberta_v2.make_log_bucket_position (host-side)."""
    sign = np.sign(relative_pos)
    mid = bucket_size // 2
    abs_pos = np.where((relative_pos < mid) & (relative_pos > -mid),
                       mid - 1, np.abs(relative_pos)).astype(np.float64)
    log_pos = (np.ceil(np.log(abs_pos / mid)
                       / np.log((max_position - 1) / mid) * (mid - 1)) + mid)
    return np.where(abs_pos <= mid, relative_pos,
                    (log_pos * sign).astype(np.int64)).astype(np.int64)


def deberta_relative_position(S: int, cfg: DebertaV2Config) -> np.ndarray:
    rel = np.arange(S)[:, None] - np.arange(S)[None, :]   # q_ids - k_ids
    if cfg.position_buckets > 0 and cfg.max_relative_positions > 0:
        rel = make_log_bucket_position(rel, cfg.position_buckets,
                                       cfg.max_relative_positions)
    return rel


class _DebertaLayer(nn.Module):
    cfg: DebertaV2Config
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, pad, rel_pos, rel_emb):
        c = self.cfg
        H, nh = c.hidden_size, c.num_attention_heads
        hd = H // nh
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision)
        scale_factor = 1 + len(c.pos_att_type)
        scale = np.sqrt(hd * scale_factor)

        query_proj = nn.Dense(H, name="query_proj", precision=self.precision)
        key_proj = nn.Dense(H, name="key_proj", precision=self.precision)
        q = query_proj(x).reshape(*x.shape[:2], nh, hd)
        k = key_proj(x).reshape(*x.shape[:2], nh, hd)
        v = dense(H, "value_proj")(x).reshape(*x.shape[:2], nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            precision=self.precision) / scale
        if rel_emb is not None:
            span = c.pos_ebd_size
            if c.share_att_key:
                pos_k = key_proj(rel_emb)
                pos_q = query_proj(rel_emb)
            else:
                pos_k = dense(H, "pos_key_proj")(rel_emb)
                pos_q = dense(H, "pos_query_proj")(rel_emb)
            pos_k = pos_k.reshape(-1, nh, hd)
            pos_q = pos_q.reshape(-1, nh, hd)
            if "c2p" in c.pos_att_type:
                full = jnp.einsum("bqnd,pnd->bnqp", q, pos_k,
                                  precision=self.precision)
                idx = np.clip(rel_pos + span, 0, 2 * span - 1)
                c2p = jnp.take_along_axis(
                    full, jnp.asarray(idx)[None, None], axis=-1)
                logits = logits + c2p / scale
            if "p2c" in c.pos_att_type:
                full = jnp.einsum("bknd,pnd->bnkp", k, pos_q,
                                  precision=self.precision)
                idx = np.clip(-rel_pos + span, 0, 2 * span - 1)  # (k, q) index
                p2c = jnp.take_along_axis(
                    full, jnp.asarray(idx)[None, None], axis=-1)
                logits = logits + p2c.transpose(0, 1, 3, 2) / scale
        if pad is not None:
            logits = logits + pad
        w = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bnqk,bknd->bqnd", w, v,
                          precision=self.precision).reshape(*x.shape[:2], H)
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name)
        x = ln("attn_ln")(x + dense(H, "attn_out")(attn))
        h = _act(c.hidden_act)(dense(c.intermediate_size, "intermediate")(x))
        return ln("out_ln")(x + dense(H, "output")(h))


class DebertaV2Encoder(nn.Module):
    cfg: DebertaV2Config
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        B, S = input_ids.shape
        mask = (attention_mask if attention_mask is not None
                else jnp.ones((B, S), jnp.int32))
        x = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(input_ids)
        if c.position_biased_input:
            x = x + self.param("position_embeddings", nn.initializers.zeros,
                               (c.max_position_embeddings, c.hidden_size))[:S][None]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")(x)
        x = x * mask[:, :, None].astype(x.dtype)
        embeddings = x

        pad = _pad_bias(attention_mask)
        rel_pos = deberta_relative_position(S, c)
        rel_emb = self.param("rel_embeddings", nn.initializers.zeros,
                             (2 * c.pos_ebd_size, c.hidden_size))
        if c.norm_rel_ebd == "layer_norm":
            rel_emb = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                   name="rel_ln")(rel_emb)

        hs = [x]
        for i in range(c.num_hidden_layers):
            x = _DebertaLayer(c, self.precision, name=f"layer_{i}")(
                x, pad, rel_pos, rel_emb)
            if i == 0 and c.conv_kernel_size > 0:
                # ConvLayer: depthwise-groups conv over the *embeddings*,
                # gated into layer-0's output (modeling_deberta_v2.ConvLayer)
                conv = nn.Conv(c.hidden_size, (c.conv_kernel_size,),
                               feature_group_count=c.conv_groups,
                               padding=[((c.conv_kernel_size - 1) // 2,) * 2],
                               name="conv", precision=self.precision)(embeddings)
                conv = conv * mask[:, :, None].astype(conv.dtype)
                conv = _act(c.conv_act)(conv)
                x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                 name="conv_ln")(x + conv)
                x = x * mask[:, :, None].astype(x.dtype)
            hs.append(x)
        return tuple(hs)


def from_hf_deberta_v2(model):
    cfg = DebertaV2Config.from_hf(model.config)
    sd = model.state_dict()

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T,
                "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {
        "word_embeddings": {"embedding": _t(sd["embeddings.word_embeddings.weight"])},
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "rel_embeddings": _t(sd["encoder.rel_embeddings.weight"]),
    }
    if cfg.position_biased_input:
        p["position_embeddings"] = _t(sd["embeddings.position_embeddings.weight"])
    if cfg.norm_rel_ebd == "layer_norm":
        p["rel_ln"] = ln("encoder.LayerNorm")
    if cfg.conv_kernel_size > 0:
        # torch Conv1d weight (out, in/groups, k) -> flax (k, in/groups, out)
        p["conv"] = {"kernel": _t(sd["encoder.conv.conv.weight"]).transpose(2, 1, 0),
                     "bias": _t(sd["encoder.conv.conv.bias"])}
        p["conv_ln"] = ln("encoder.conv.LayerNorm")
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}"
        lp = {
            "query_proj": dense(f"{pre}.attention.self.query_proj"),
            "key_proj": dense(f"{pre}.attention.self.key_proj"),
            "value_proj": dense(f"{pre}.attention.self.value_proj"),
            "attn_out": dense(f"{pre}.attention.output.dense"),
            "attn_ln": ln(f"{pre}.attention.output.LayerNorm"),
            "intermediate": dense(f"{pre}.intermediate.dense"),
            "output": dense(f"{pre}.output.dense"),
            "out_ln": ln(f"{pre}.output.LayerNorm"),
        }
        if not cfg.share_att_key and cfg.pos_att_type:
            if "c2p" in cfg.pos_att_type:
                lp["pos_key_proj"] = dense(f"{pre}.attention.self.pos_key_proj")
            if "p2c" in cfg.pos_att_type:
                lp["pos_query_proj"] = dense(f"{pre}.attention.self.pos_query_proj")
        p[f"layer_{i}"] = lp
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# DeBERTa-v1 (fused in_proj with q/v biases only, clamped relative positions
# with an S-adaptive span; modeling_deberta.DisentangledSelfAttention)
# ===========================================================================


@dataclass(frozen=True)
class DebertaV1Config:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    max_relative_positions: int = 512
    pos_att_type: tuple = ("c2p", "p2c")
    relative_attention: bool = True
    position_biased_input: bool = False
    type_vocab_size: int = 0
    layer_norm_eps: float = 1e-7
    hidden_act: str = "gelu"

    @classmethod
    def from_hf(cls, hf):
        max_rel = hf.max_relative_positions
        if max_rel < 1:
            max_rel = hf.max_position_embeddings
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
                   num_hidden_layers=hf.num_hidden_layers,
                   num_attention_heads=hf.num_attention_heads,
                   intermediate_size=hf.intermediate_size,
                   max_position_embeddings=hf.max_position_embeddings,
                   max_relative_positions=max_rel,
                   pos_att_type=tuple(hf.pos_att_type or ()),
                   relative_attention=hf.relative_attention,
                   position_biased_input=hf.position_biased_input,
                   type_vocab_size=hf.type_vocab_size,
                   layer_norm_eps=hf.layer_norm_eps, hidden_act=hf.hidden_act)


class _DebertaV1Layer(nn.Module):
    cfg: DebertaV1Config
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, pad, rel_pos, rel_emb, span):
        c = self.cfg
        H, nh = c.hidden_size, c.num_attention_heads
        hd = H // nh
        dense = lambda d, name, **kw: nn.Dense(d, name=name,
                                               precision=self.precision, **kw)
        scale = np.sqrt(hd * (1 + len(c.pos_att_type)))

        qkv = dense(3 * H, "in_proj", use_bias=False)(x)
        qkv = qkv.reshape(*x.shape[:2], nh, 3, hd)    # per-head [q, k, v]
        q_bias = self.param("q_bias", nn.initializers.zeros, (H,)).reshape(nh, hd)
        v_bias = self.param("v_bias", nn.initializers.zeros, (H,)).reshape(nh, hd)
        q = qkv[..., 0, :] + q_bias
        k = qkv[..., 1, :]
        v = qkv[..., 2, :] + v_bias
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            precision=self.precision) / scale
        if c.relative_attention and rel_emb is not None:
            pos_k = dense(H, "pos_proj", use_bias=False)(rel_emb).reshape(-1, nh, hd)
            pos_q = dense(H, "pos_q_proj")(rel_emb).reshape(-1, nh, hd)
            if "c2p" in c.pos_att_type:
                full = jnp.einsum("bqnd,pnd->bnqp", q, pos_k,
                                  precision=self.precision)
                idx = np.clip(rel_pos + span, 0, 2 * span - 1)
                c2p = jnp.take_along_axis(
                    full, jnp.asarray(idx)[None, None], axis=-1)
                logits = logits + c2p / scale
            if "p2c" in c.pos_att_type:
                full = jnp.einsum("bknd,pnd->bnkp", k, pos_q,
                                  precision=self.precision)
                idx = np.clip(-rel_pos + span, 0, 2 * span - 1)
                p2c = jnp.take_along_axis(
                    full, jnp.asarray(idx)[None, None], axis=-1)
                logits = logits + p2c.transpose(0, 1, 3, 2) / scale
        if pad is not None:
            logits = logits + pad
        w = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bnqk,bknd->bqnd", w, v,
                          precision=self.precision).reshape(*x.shape[:2], H)
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name)
        x = ln("attn_ln")(x + dense(H, "attn_out")(attn))
        h = _act(c.hidden_act)(dense(c.intermediate_size, "intermediate")(x))
        return ln("out_ln")(x + dense(H, "output")(h))


class DebertaV1Encoder(nn.Module):
    cfg: DebertaV1Config
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        B, S = input_ids.shape
        mask = (attention_mask if attention_mask is not None
                else jnp.ones((B, S), jnp.int32))
        x = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(input_ids)
        if c.position_biased_input:
            x = x + self.param("position_embeddings", nn.initializers.zeros,
                               (c.max_position_embeddings, c.hidden_size))[:S][None]
        if c.type_vocab_size > 0:
            x = x + nn.Embed(c.type_vocab_size, c.hidden_size,
                             name="token_type_embeddings")(jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")(x)
        x = x * mask[:, :, None].astype(x.dtype)

        pad = _pad_bias(attention_mask)
        # v1: att_span adapts to the sequence (disentangled_att_bias), and the
        # rel-embedding slice is centered at max_relative_positions
        span = min(S, c.max_relative_positions)
        rel_pos = np.arange(S)[:, None] - np.arange(S)[None, :]
        rel_emb = None
        if c.relative_attention:
            table = self.param("rel_embeddings", nn.initializers.zeros,
                               (2 * c.max_relative_positions, c.hidden_size))
            rel_emb = table[c.max_relative_positions - span:
                            c.max_relative_positions + span]

        hs = [x]
        for i in range(c.num_hidden_layers):
            x = _DebertaV1Layer(c, self.precision, name=f"layer_{i}")(
                x, pad, rel_pos, rel_emb, span)
            hs.append(x)
        return tuple(hs)


def from_hf_deberta_v1(model):
    cfg = DebertaV1Config.from_hf(model.config)
    sd = model.state_dict()

    def dense(prefix, bias=True):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if bias:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {
        "word_embeddings": {"embedding": _t(sd["embeddings.word_embeddings.weight"])},
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    if cfg.position_biased_input:
        p["position_embeddings"] = _t(sd["embeddings.position_embeddings.weight"])
    if cfg.type_vocab_size > 0:
        p["token_type_embeddings"] = {
            "embedding": _t(sd["embeddings.token_type_embeddings.weight"])}
    if cfg.relative_attention:
        p["rel_embeddings"] = _t(sd["encoder.rel_embeddings.weight"])
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}"
        lp = {
            "in_proj": dense(f"{pre}.attention.self.in_proj", bias=False),
            "q_bias": _t(sd[f"{pre}.attention.self.q_bias"]),
            "v_bias": _t(sd[f"{pre}.attention.self.v_bias"]),
            "attn_out": dense(f"{pre}.attention.output.dense"),
            "attn_ln": ln(f"{pre}.attention.output.LayerNorm"),
            "intermediate": dense(f"{pre}.intermediate.dense"),
            "output": dense(f"{pre}.output.dense"),
            "out_ln": ln(f"{pre}.output.LayerNorm"),
        }
        if cfg.relative_attention:
            if "c2p" in cfg.pos_att_type:
                lp["pos_proj"] = dense(f"{pre}.attention.self.pos_proj",
                                       bias=False)
            if "p2c" in cfg.pos_att_type:
                lp["pos_q_proj"] = dense(f"{pre}.attention.self.pos_q_proj")
        p[f"layer_{i}"] = lp
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# XLNet (Transformer-XL relative attention, sinusoid rel positions + rel-shift;
# no mems / no target mapping — the feature-extraction regime)
# ===========================================================================


@dataclass(frozen=True)
class XLNetZooConfig:
    vocab_size: int = 32000
    d_model: int = 768
    n_layer: int = 12
    n_head: int = 12
    d_head: int = 64
    d_inner: int = 3072
    ff_activation: str = "gelu"
    layer_norm_eps: float = 1e-12

    @classmethod
    def from_hf(cls, hf):
        return cls(vocab_size=hf.vocab_size, d_model=hf.d_model,
                   n_layer=hf.n_layer, n_head=hf.n_head, d_head=hf.d_head,
                   d_inner=hf.d_inner, ff_activation=hf.ff_activation,
                   layer_norm_eps=hf.layer_norm_eps)

    @property
    def hidden_size(self):   # TextExtractor/CLI output-dim contract
        return self.d_model


def _rel_shift(x, klen):
    """XLNet rel_shift_bnij: (B, N, S, P) -> (B, N, S, klen)."""
    B, N, S, P = x.shape
    x = x.reshape(B, N, P, S)[:, :, 1:, :].reshape(B, N, S, P - 1)
    return x[..., :klen]


class _XLNetLayer(nn.Module):
    cfg: XLNetZooConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, pos_emb, bias):
        c = self.cfg
        S = x.shape[1]
        w = lambda name: self.param(name, nn.initializers.zeros,
                                    (c.d_model, c.n_head, c.d_head))
        b = lambda name: self.param(name, nn.initializers.zeros,
                                    (c.n_head, c.d_head))
        pr = self.precision
        q = jnp.einsum("bsd,dnh->bsnh", x, w("q"), precision=pr)
        k = jnp.einsum("bsd,dnh->bsnh", x, w("k"), precision=pr)
        v = jnp.einsum("bsd,dnh->bsnh", x, w("v"), precision=pr)
        kr = jnp.einsum("pd,dnh->pnh", pos_emb, w("r"), precision=pr)
        ac = jnp.einsum("bind,bjnd->bnij", q + b("r_w_bias"), k, precision=pr)
        bd = _rel_shift(jnp.einsum("bind,pnd->bnip", q + b("r_r_bias"), kr,
                                   precision=pr), klen=S)
        score = (ac + bd) / np.sqrt(c.d_head)
        if bias is not None:
            score = score + bias
        probs = nn.softmax(score.astype(jnp.float32), axis=-1).astype(x.dtype)
        av = jnp.einsum("bnij,bjnd->bind", probs, v, precision=pr)
        out = jnp.einsum("bsnh,dnh->bsd", av, w("o"), precision=pr)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(x + out)
        h = _act(c.ff_activation)(
            nn.Dense(c.d_inner, name="ff_layer_1", precision=pr)(x))
        h = nn.Dense(c.d_model, name="ff_layer_2", precision=pr)(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="ff_ln")(x + h)


class XLNetEncoder(nn.Module):
    cfg: XLNetZooConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        S = input_ids.shape[1]
        x = nn.Embed(c.vocab_size, c.d_model, name="word_embedding")(input_ids)
        # bi-attn relative sinusoid positions: klen .. -qlen+1 (attn_type="bi")
        inv_freq = 1.0 / (10000 ** (np.arange(0, c.d_model, 2) / c.d_model))
        sin_inp = np.outer(np.arange(S, -S, -1.0), inv_freq)
        pos_emb = jnp.asarray(
            np.concatenate([np.sin(sin_inp), np.cos(sin_inp)], -1), x.dtype)
        bias = _pad_bias(attention_mask)
        hs = [x]
        for i in range(c.n_layer):
            x = _XLNetLayer(c, self.precision, name=f"layer_{i}")(
                x, pos_emb, bias)
            hs.append(x)
        return tuple(hs)


def from_hf_xlnet(model):
    cfg = XLNetZooConfig.from_hf(model.config)
    sd = model.state_dict()

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T,
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {"word_embedding": {"embedding": _t(sd["word_embedding.weight"])}}
    for i in range(cfg.n_layer):
        pre = f"layer.{i}"
        p[f"layer_{i}"] = {
            "q": _t(sd[f"{pre}.rel_attn.q"]),
            "k": _t(sd[f"{pre}.rel_attn.k"]),
            "v": _t(sd[f"{pre}.rel_attn.v"]),
            "o": _t(sd[f"{pre}.rel_attn.o"]),
            "r": _t(sd[f"{pre}.rel_attn.r"]),
            "r_w_bias": _t(sd[f"{pre}.rel_attn.r_w_bias"]),
            "r_r_bias": _t(sd[f"{pre}.rel_attn.r_r_bias"]),
            "attn_ln": ln(f"{pre}.rel_attn.layer_norm"),
            "ff_layer_1": dense(f"{pre}.ff.layer_1"),
            "ff_layer_2": dense(f"{pre}.ff.layer_2"),
            "ff_ln": ln(f"{pre}.ff.layer_norm"),
        }
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# Rotary helpers (NeoX/llama non-interleaved + GPT-J interleaved)
# ===========================================================================


def _rope_tables(S, dim, base=10000.0):
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2) / dim))
    freqs = np.outer(np.arange(S, dtype=np.float64), inv_freq)
    return np.cos(freqs), np.sin(freqs)


def _apply_rope_half(x, cos, sin):
    """NeoX/llama style on the leading `2*cos.shape[-1]` dims of x
    (cos/sin (S, rd/2)); x (B, S, nh, hd)."""
    rd = 2 * cos.shape[-1]
    xr, xp = x[..., :rd], x[..., rd:]
    c = jnp.asarray(np.concatenate([cos, cos], -1), x.dtype)[None, :, None]
    s = jnp.asarray(np.concatenate([sin, sin], -1), x.dtype)[None, :, None]
    half = rd // 2
    rot = jnp.concatenate([-xr[..., half:], xr[..., :half]], axis=-1)
    return jnp.concatenate([xr * c + rot * s, xp], axis=-1)


def _apply_rope_interleaved(x, cos, sin):
    """GPT-J/CodeGen style (sin/cos column-interleaved, rotate_every_two)."""
    rd = 2 * cos.shape[-1]
    xr, xp = x[..., :rd], x[..., rd:]
    c = jnp.asarray(np.repeat(cos, 2, axis=-1), x.dtype)[None, :, None]
    s = jnp.asarray(np.repeat(sin, 2, axis=-1), x.dtype)[None, :, None]
    x2 = jnp.stack([-xr[..., 1::2], xr[..., ::2]], axis=-1)
    rot = x2.reshape(xr.shape)
    return jnp.concatenate([xr * c + rot * s, xp], axis=-1)


# ===========================================================================
# GPT-NeoX (stablelm-alpha / pythia: partial rotary, parallel residual)
# ===========================================================================


@dataclass(frozen=True)
class GPTNeoXZooConfig:
    vocab_size: int = 50432
    hidden_size: int = 6144
    num_layers: int = 16
    num_heads: int = 48
    intermediate_size: int = 24576
    rotary_pct: float = 0.25
    rotary_base: float = 10000.0
    use_parallel_residual: bool = True
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"

    @classmethod
    def from_hf(cls, hf):
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
                   num_layers=hf.num_hidden_layers,
                   num_heads=hf.num_attention_heads,
                   intermediate_size=hf.intermediate_size,
                   rotary_pct=hf.rotary_pct,
                   rotary_base=getattr(hf, "rotary_emb_base", 10000.0),
                   use_parallel_residual=hf.use_parallel_residual,
                   layer_norm_eps=hf.layer_norm_eps, hidden_act=hf.hidden_act)


class _GPTNeoXLayer(nn.Module):
    cfg: GPTNeoXZooConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, bias, cos, sin):
        c = self.cfg
        H, nh = c.hidden_size, c.num_heads
        hd = H // nh
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision)
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name)

        h = ln("input_layernorm")(x)
        qkv = dense(3 * H, "query_key_value")(h)
        qkv = qkv.reshape(*x.shape[:2], nh, 3, hd)    # per-head [q, k, v]
        q = _apply_rope_half(qkv[..., 0, :], cos, sin)
        k = _apply_rope_half(qkv[..., 1, :], cos, sin)
        attn = dense(H, "dense")(_mha(q, k, qkv[..., 2, :], bias,
                                      self.precision))
        m_in = ln("post_attention_layernorm")(
            x if c.use_parallel_residual else x + attn)
        h = _act(c.hidden_act)(dense(c.intermediate_size, "dense_h_to_4h")(m_in))
        mlp = dense(H, "dense_4h_to_h")(h)
        if c.use_parallel_residual:
            return x + attn + mlp
        return x + attn + mlp


class GPTNeoXEncoder(nn.Module):
    cfg: GPTNeoXZooConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        S = input_ids.shape[1]
        hd = c.hidden_size // c.num_heads
        rd = int(hd * c.rotary_pct)
        cos, sin = _rope_tables(S, rd, c.rotary_base)
        x = nn.Embed(c.vocab_size, c.hidden_size, name="embed_in")(input_ids)
        bias = _causal_bias(S)
        pad = _pad_bias(attention_mask)
        if pad is not None:
            bias = bias + pad
        hs = [x]
        for i in range(c.num_layers):
            x = _GPTNeoXLayer(c, self.precision, name=f"layer_{i}")(
                x, bias, cos, sin)
            hs.append(x)
        hs[-1] = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name="final_layer_norm")(x)
        return tuple(hs)


def from_hf_gpt_neox(model):
    cfg = GPTNeoXZooConfig.from_hf(model.config)
    sd = model.state_dict()

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T,
                "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {"embed_in": {"embedding": _t(sd["embed_in.weight"])},
         "final_layer_norm": ln("final_layer_norm")}
    for i in range(cfg.num_layers):
        pre = f"layers.{i}"
        p[f"layer_{i}"] = {
            "input_layernorm": ln(f"{pre}.input_layernorm"),
            "post_attention_layernorm": ln(f"{pre}.post_attention_layernorm"),
            "query_key_value": dense(f"{pre}.attention.query_key_value"),
            "dense": dense(f"{pre}.attention.dense"),
            "dense_h_to_4h": dense(f"{pre}.mlp.dense_h_to_4h"),
            "dense_4h_to_h": dense(f"{pre}.mlp.dense_4h_to_h"),
        }
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# CodeGen (= MOSS architecture: GPT-J block, interleaved rotary on the first
# rotary_dim dims, mp_num=4-sharded fused qkv de-interleaved in the converter)
# ===========================================================================


@dataclass(frozen=True)
class CodeGenZooConfig:
    vocab_size: int = 51200
    hidden_size: int = 4096
    num_layers: int = 28
    num_heads: int = 16
    intermediate_size: int = 16384
    rotary_dim: int = 64
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, hf):
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.n_embd,
                   num_layers=hf.n_layer, num_heads=hf.n_head,
                   intermediate_size=hf.n_inner or 4 * hf.n_embd,
                   rotary_dim=hf.rotary_dim,
                   layer_norm_eps=hf.layer_norm_epsilon)


class _CodeGenBlock(nn.Module):
    cfg: CodeGenZooConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, bias, cos, sin):
        c = self.cfg
        H, nh = c.hidden_size, c.num_heads
        hd = H // nh
        dense = lambda d, name, **kw: nn.Dense(d, name=name,
                                               precision=self.precision, **kw)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_1")(x)
        q = dense(H, "q_proj", use_bias=False)(h).reshape(*x.shape[:2], nh, hd)
        k = dense(H, "k_proj", use_bias=False)(h).reshape(*x.shape[:2], nh, hd)
        v = dense(H, "v_proj", use_bias=False)(h).reshape(*x.shape[:2], nh, hd)
        q = _apply_rope_interleaved(q, cos, sin)
        k = _apply_rope_interleaved(k, cos, sin)
        attn = dense(H, "out_proj", use_bias=False)(
            _mha(q, k, v, bias, self.precision))
        m = dense(c.intermediate_size, "fc_in")(h)
        m = dense(H, "fc_out")(jax.nn.gelu(m, approximate=True))
        return x + attn + m    # GPT-J parallel residual off one shared ln_1


class CodeGenEncoder(nn.Module):
    cfg: CodeGenZooConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        S = input_ids.shape[1]
        cos, sin = _rope_tables(S, c.rotary_dim)
        x = nn.Embed(c.vocab_size, c.hidden_size, name="wte")(input_ids)
        bias = _causal_bias(S)
        pad = _pad_bias(attention_mask)
        if pad is not None:
            bias = bias + pad
        hs = [x]
        for i in range(c.num_layers):
            x = _CodeGenBlock(c, self.precision, name=f"h_{i}")(
                x, bias, cos, sin)
            hs.append(x)
        hs[-1] = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_f")(x)
        return tuple(hs)


def from_hf_codegen(model):
    cfg = CodeGenZooConfig.from_hf(model.config)
    sd = model.state_dict()
    H = cfg.hidden_size

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T,
                "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {"wte": {"embedding": _t(sd["wte.weight"])}, "ln_f": ln("ln_f")}
    for i in range(cfg.num_layers):
        pre = f"h.{i}"
        # qkv_proj rows: (mp=4) x [query, value, key] x (H/4); heads are
        # mp-major which matches the natural head order after concatenation
        w = _t(sd[f"{pre}.attn.qkv_proj.weight"]).reshape(4, 3, H // 4, H)
        p[f"h_{i}"] = {
            "ln_1": ln(f"{pre}.ln_1"),
            "q_proj": {"kernel": w[:, 0].reshape(H, H).T},
            "v_proj": {"kernel": w[:, 1].reshape(H, H).T},
            "k_proj": {"kernel": w[:, 2].reshape(H, H).T},
            "out_proj": {"kernel": _t(sd[f"{pre}.attn.out_proj.weight"]).T},
            "fc_in": dense(f"{pre}.mlp.fc_in"),
            "fc_out": dense(f"{pre}.mlp.fc_out"),
        }
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# Falcon (falcon-7b lineage: multi-query attention, shared-ln parallel
# attn+mlp, full-head rotary, no biases)
# ===========================================================================


@dataclass(frozen=True)
class FalconZooConfig:
    vocab_size: int = 65024
    hidden_size: int = 4544
    num_layers: int = 32
    num_heads: int = 71
    rope_theta: float = 10000.0
    bias: bool = False
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, hf):
        assert hf.multi_query and hf.parallel_attn and not hf.alibi, \
            "falcon-7b-style config expected"
        assert not hf.new_decoder_architecture
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
                   num_layers=hf.num_hidden_layers,
                   num_heads=hf.num_attention_heads,
                   rope_theta=getattr(hf, "rope_theta", 10000.0),
                   bias=hf.bias,
                   layer_norm_eps=hf.layer_norm_epsilon)


class _FalconLayer(nn.Module):
    cfg: FalconZooConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, bias, cos, sin):
        c = self.cfg
        H, nh = c.hidden_size, c.num_heads
        hd = H // nh
        dense = lambda d, name: nn.Dense(d, name=name, use_bias=c.bias,
                                         precision=self.precision)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="input_layernorm")(x)
        qkv = dense((nh + 2) * hd, "query_key_value")(h)
        qkv = qkv.reshape(*x.shape[:2], nh + 2, hd)
        q = _apply_rope_half(qkv[..., :nh, :], cos, sin)
        k = _apply_rope_half(qkv[..., nh: nh + 1, :], cos, sin)
        v = qkv[..., nh + 1:, :]
        k = jnp.broadcast_to(k, q.shape)      # multi-query: 1 kv head
        v = jnp.broadcast_to(v, q.shape)
        attn = dense(H, "dense")(_mha(q, k, v, bias, self.precision))
        m = dense(4 * H, "dense_h_to_4h")(h)
        m = dense(H, "dense_4h_to_h")(jax.nn.gelu(m, approximate=False))
        return x + attn + m


class FalconEncoder(nn.Module):
    cfg: FalconZooConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        S = input_ids.shape[1]
        hd = c.hidden_size // c.num_heads
        cos, sin = _rope_tables(S, hd, c.rope_theta)
        x = nn.Embed(c.vocab_size, c.hidden_size,
                     name="word_embeddings")(input_ids)
        bias = _causal_bias(S)
        pad = _pad_bias(attention_mask)
        if pad is not None:
            bias = bias + pad
        hs = [x]
        for i in range(c.num_layers):
            x = _FalconLayer(c, self.precision, name=f"h_{i}")(
                x, bias, cos, sin)
            hs.append(x)
        hs[-1] = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_f")(x)
        return tuple(hs)


def from_hf_falcon(model):
    cfg = FalconZooConfig.from_hf(model.config)
    sd = model.state_dict()

    def dense(prefix):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if cfg.bias:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {"word_embeddings": {"embedding": _t(sd["word_embeddings.weight"])},
         "ln_f": ln("ln_f")}
    for i in range(cfg.num_layers):
        pre = f"h.{i}"
        p[f"h_{i}"] = {
            "input_layernorm": ln(f"{pre}.input_layernorm"),
            "query_key_value": dense(f"{pre}.self_attention.query_key_value"),
            "dense": dense(f"{pre}.self_attention.dense"),
            "dense_h_to_4h": dense(f"{pre}.mlp.dense_h_to_4h"),
            "dense_4h_to_h": dense(f"{pre}.mlp.dense_4h_to_h"),
        }
    return cfg, jax.tree_util.tree_map(jnp.asarray, p)


# ===========================================================================
# GLM (ChatGLM2/3 / GLM-4 family: RMSNorm, GQA, interleaved partial rotary,
# fused gate_up SwiGLU). The HF-native "glm" layout is the oracle; THUDM
# "chatglm" checkpoints convert via key remap WITHOUT trust_remote_code.
# ===========================================================================


@dataclass(frozen=True)
class GlmZooConfig:
    vocab_size: int = 151552
    hidden_size: int = 4096
    num_layers: int = 40
    num_heads: int = 32
    num_kv_heads: int = 2
    head_dim: int = 128
    intermediate_size: int = 13696
    partial_rotary_factor: float = 0.5
    rope_theta: float = 10000.0
    attention_bias: bool = True
    rms_norm_eps: float = 1.5625e-07

    @classmethod
    def from_hf(cls, hf):
        return cls(vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
                   num_layers=hf.num_hidden_layers,
                   num_heads=hf.num_attention_heads,
                   num_kv_heads=hf.num_key_value_heads,
                   head_dim=getattr(hf, "head_dim", None)
                   or hf.hidden_size // hf.num_attention_heads,
                   intermediate_size=hf.intermediate_size,
                   partial_rotary_factor=hf.partial_rotary_factor,
                   rope_theta=hf.rope_theta,
                   attention_bias=hf.attention_bias,
                   rms_norm_eps=hf.rms_norm_eps)

    @classmethod
    def from_chatglm(cls, c: dict):
        """THUDM chatglm2/3-6b config.json fields -> GlmZooConfig."""
        return cls(vocab_size=c["padded_vocab_size"],
                   hidden_size=c["hidden_size"],
                   num_layers=c["num_layers"],
                   num_heads=c["num_attention_heads"],
                   num_kv_heads=(c["multi_query_group_num"]
                                 if c.get("multi_query_attention") else
                                 c["num_attention_heads"]),
                   head_dim=c["kv_channels"],
                   intermediate_size=c["ffn_hidden_size"],
                   partial_rotary_factor=0.5,
                   rope_theta=10000.0 * c.get("rope_ratio", 1.0),
                   attention_bias=c.get("add_qkv_bias", True),
                   rms_norm_eps=c["layernorm_epsilon"])


class _GlmLayer(nn.Module):
    cfg: GlmZooConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, bias, cos, sin):
        c = self.cfg
        nh, nkv, hd = c.num_heads, c.num_kv_heads, c.head_dim
        dense = lambda d, name, b: nn.Dense(d, name=name, use_bias=b,
                                            precision=self.precision)
        h = T5LayerNorm(c.rms_norm_eps, name="input_layernorm")(x)
        q = dense(nh * hd, "q_proj", c.attention_bias)(h)
        k = dense(nkv * hd, "k_proj", c.attention_bias)(h)
        v = dense(nkv * hd, "v_proj", c.attention_bias)(h)
        q = _apply_rope_interleaved(q.reshape(*x.shape[:2], nh, hd), cos, sin)
        k = _apply_rope_interleaved(k.reshape(*x.shape[:2], nkv, hd), cos, sin)
        v = v.reshape(*x.shape[:2], nkv, hd)
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        x = x + dense(c.hidden_size, "o_proj", False)(
            _mha(q, k, v, bias, self.precision))
        h = T5LayerNorm(c.rms_norm_eps, name="post_attention_layernorm")(x)
        gate, up = jnp.split(
            dense(2 * c.intermediate_size, "gate_up_proj", False)(h), 2, -1)
        return x + dense(c.hidden_size, "down_proj", False)(
            jax.nn.silu(gate) * up)


class GlmEncoder(nn.Module):
    cfg: GlmZooConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        S = input_ids.shape[1]
        rd = int(c.head_dim * c.partial_rotary_factor)
        cos, sin = _rope_tables(S, rd, c.rope_theta)
        x = nn.Embed(c.vocab_size, c.hidden_size,
                     name="embed_tokens")(input_ids)
        bias = _causal_bias(S)
        pad = _pad_bias(attention_mask)
        if pad is not None:
            bias = bias + pad
        hs = [x]
        for i in range(c.num_layers):
            x = _GlmLayer(c, self.precision, name=f"layer_{i}")(
                x, bias, cos, sin)
            hs.append(x)
        hs[-1] = T5LayerNorm(c.rms_norm_eps, name="norm")(x)
        return tuple(hs)


def from_hf_glm(model):
    cfg = GlmZooConfig.from_hf(model.config)
    return cfg, _glm_params_from_sd(cfg, model.state_dict())


def _glm_params_from_sd(cfg, sd):
    def dense(prefix, bias):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if bias:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    p = {"embed_tokens": {"embedding": _t(sd["embed_tokens.weight"])},
         "norm": {"weight": _t(sd["norm.weight"])}}
    for i in range(cfg.num_layers):
        pre = f"layers.{i}"
        p[f"layer_{i}"] = {
            "input_layernorm": {"weight": _t(sd[f"{pre}.input_layernorm.weight"])},
            "post_attention_layernorm": {
                "weight": _t(sd[f"{pre}.post_attention_layernorm.weight"])},
            "q_proj": dense(f"{pre}.self_attn.q_proj", cfg.attention_bias),
            "k_proj": dense(f"{pre}.self_attn.k_proj", cfg.attention_bias),
            "v_proj": dense(f"{pre}.self_attn.v_proj", cfg.attention_bias),
            "o_proj": dense(f"{pre}.self_attn.o_proj", False),
            "gate_up_proj": dense(f"{pre}.mlp.gate_up_proj", False),
            "down_proj": dense(f"{pre}.mlp.down_proj", False),
        }
    return jax.tree_util.tree_map(jnp.asarray, p)


def chatglm_to_glm_state_dict(sd: dict, cfg: GlmZooConfig) -> dict:
    """Remap a THUDM chatglm2/3-6b torch state dict (fused query_key_value,
    dense/dense_h_to_4h naming, optional ``transformer.`` prefix) into the
    HF-glm layout consumed by :func:`_glm_params_from_sd`. Pure key surgery —
    the checkpoint is converted without executing its remote modeling code."""
    pre = ("transformer."
           if any(k.startswith("transformer.") for k in sd) else "")
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    qs, kvs = nh * hd, nkv * hd
    out = {"embed_tokens.weight": sd[f"{pre}embedding.word_embeddings.weight"],
           "norm.weight": sd[f"{pre}encoder.final_layernorm.weight"]}
    for i in range(cfg.num_layers):
        src = f"{pre}encoder.layers.{i}"
        dst = f"layers.{i}"
        qkv_w = _t(sd[f"{src}.self_attention.query_key_value.weight"])
        out[f"{dst}.self_attn.q_proj.weight"] = qkv_w[:qs]
        out[f"{dst}.self_attn.k_proj.weight"] = qkv_w[qs: qs + kvs]
        out[f"{dst}.self_attn.v_proj.weight"] = qkv_w[qs + kvs:]
        if cfg.attention_bias:
            qkv_b = _t(sd[f"{src}.self_attention.query_key_value.bias"])
            out[f"{dst}.self_attn.q_proj.bias"] = qkv_b[:qs]
            out[f"{dst}.self_attn.k_proj.bias"] = qkv_b[qs: qs + kvs]
            out[f"{dst}.self_attn.v_proj.bias"] = qkv_b[qs + kvs:]
        out[f"{dst}.self_attn.o_proj.weight"] = sd[f"{src}.self_attention.dense.weight"]
        out[f"{dst}.mlp.gate_up_proj.weight"] = sd[f"{src}.mlp.dense_h_to_4h.weight"]
        out[f"{dst}.mlp.down_proj.weight"] = sd[f"{src}.mlp.dense_4h_to_h.weight"]
        out[f"{dst}.input_layernorm.weight"] = sd[f"{src}.input_layernorm.weight"]
        out[f"{dst}.post_attention_layernorm.weight"] = \
            sd[f"{src}.post_attention_layernorm.weight"]
    return out


def from_chatglm_checkpoint_dir(path: str):
    """Load a local chatglm2/3-6b checkpoint dir (config.json +
    pytorch_model*.bin / *.safetensors) without trust_remote_code."""
    import json
    import os

    with open(os.path.join(path, "config.json")) as f:
        cfg = GlmZooConfig.from_chatglm(json.load(f))
    sd = {}
    for fn in sorted(os.listdir(path)):
        fp = os.path.join(path, fn)
        if fn.endswith(".safetensors"):
            from safetensors.torch import load_file
            sd.update(load_file(fp))
        elif fn.startswith("pytorch_model") and fn.endswith(".bin"):
            import torch
            sd.update(torch.load(fp, map_location="cpu"))
    return cfg, _glm_params_from_sd(cfg, chatglm_to_glm_state_dict(sd, cfg))


# ===========================================================================
# CLI dispatch: HF config.model_type -> (state-dict converter, encoder class).
# Every entry consumes the plain AutoModel (base, no head) and yields
# HF-layout hidden-state tuples for features/text.TextExtractor(encoder_cls=).
# ===========================================================================

MODEL_TYPE_DISPATCH = {
    "gpt2": (from_hf_gpt2, GPT2Encoder),
    "opt": (from_hf_opt, OPTEncoder),
    "bloom": (from_hf_bloom, BloomEncoder),
    "albert": (from_hf_albert, AlbertEncoder),
    "t5": (from_hf_t5_encoder, T5Encoder),
    "mpnet": (from_hf_mpnet, MPNetEncoder),
    "deberta-v2": (from_hf_deberta_v2, DebertaV2Encoder),
    "deberta": (from_hf_deberta_v1, DebertaV1Encoder),
    "xlnet": (from_hf_xlnet, XLNetEncoder),
    "gpt_neox": (from_hf_gpt_neox, GPTNeoXEncoder),
    "codegen": (from_hf_codegen, CodeGenEncoder),
    "moss": (from_hf_codegen, CodeGenEncoder),   # MOSS = CodeGen layout
    "falcon": (from_hf_falcon, FalconEncoder),
    "glm": (from_hf_glm, GlmEncoder),
    # "chatglm" (THUDM remote-code checkpoints) loads via
    # from_chatglm_checkpoint_dir — dispatched specially in the CLI.
}
