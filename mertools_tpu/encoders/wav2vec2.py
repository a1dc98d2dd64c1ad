"""wav2vec2-family audio encoders (wav2vec2 / HuBERT / data2vec-audio) in Flax.

Covers the architectures behind the reference's audio feature extraction
(``MERBench/feature_extraction/audio/extract_audio_huggingface.py``):
raw 16 kHz wav -> strided conv feature extractor -> projection -> conv
positional embedding -> transformer stack, with ``output_hidden_states`` for
the last-4-layer sum.

Two encoder norm regimes, selected like HF:
  * ``group`` + post-LN (base models): GroupNorm(C, C) on conv layer 0 only;
    encoder applies LayerNorm BEFORE the layers (post-LN blocks).
  * ``layer`` + pre-LN / "stable layer norm" (large models): LayerNorm after
    every conv; pre-LN blocks with a final LayerNorm.

Weights convert from HF torch state dicts via :func:`convert_torch_state`
(weight-normed positional conv is materialized). Parity: <1e-5 vs torch on
random tiny configs (tests/test_encoder_parity.py).

All matmuls run with HIGHEST precision by default for the <1e-3 feature
parity contract (BASELINE.md); pass ``precision=None`` for speed once
parity is validated at bf16 for a given model.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Wav2Vec2Config:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" | "layer"
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    # WavLM: gated relative-position-bias attention (modeling_wavlm.py:108-271)
    attn_type: str = "standard"       # "standard" | "wavlm"
    num_buckets: int = 320
    max_distance: int = 800
    # data2vec-audio: stack of pos-conv layers with non-affine LN
    # (modeling_data2vec_audio.py:93-124) instead of one weight-normed conv
    pos_conv_depth: int = 0
    conv_pos_kernel_size: int = 19
    # Pallas flash attention (TPU): O(T) memory, fused softmax — avoids
    # materializing the (B, nh, T, T) logits in HBM. Inference-path numerics
    # differ at the ~1e-3 level from XLA attention; the extractor enables it
    # automatically in bf16 production mode only (standard attn, TPU).
    use_flash_attention: bool = False

    @classmethod
    def base(cls):
        return cls()

    @classmethod
    def large(cls):
        return cls(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
                   intermediate_size=4096, conv_bias=True,
                   feat_extract_norm="layer", do_stable_layer_norm=True)

    @classmethod
    def from_hf(cls, hf_cfg) -> "Wav2Vec2Config":
        return cls(hidden_size=hf_cfg.hidden_size,
                   num_hidden_layers=hf_cfg.num_hidden_layers,
                   num_attention_heads=hf_cfg.num_attention_heads,
                   intermediate_size=hf_cfg.intermediate_size,
                   conv_dim=tuple(hf_cfg.conv_dim),
                   conv_kernel=tuple(hf_cfg.conv_kernel),
                   conv_stride=tuple(hf_cfg.conv_stride),
                   conv_bias=getattr(hf_cfg, "conv_bias", False),
                   # data2vec-audio has no feat_extract_norm knob: every conv
                   # carries a LayerNorm ("layer" mode), post-LN encoder
                   feat_extract_norm=getattr(hf_cfg, "feat_extract_norm",
                                             "layer"),
                   do_stable_layer_norm=getattr(hf_cfg,
                                                "do_stable_layer_norm", False),
                   num_conv_pos_embeddings=hf_cfg.num_conv_pos_embeddings,
                   num_conv_pos_embedding_groups=hf_cfg.num_conv_pos_embedding_groups,
                   layer_norm_eps=hf_cfg.layer_norm_eps,
                   attn_type=("wavlm" if hf_cfg.model_type == "wavlm"
                              else "standard"),
                   num_buckets=getattr(hf_cfg, "num_buckets", 320),
                   max_distance=getattr(hf_cfg, "max_bucket_distance", 800),
                   pos_conv_depth=(hf_cfg.num_conv_pos_embeddings
                                   if hf_cfg.model_type == "data2vec-audio"
                                   else 0),
                   conv_pos_kernel_size=getattr(hf_cfg,
                                                "conv_pos_kernel_size", 19))

    def feat_lengths(self, wav_lengths):
        """conv output frame count per sample (HF _get_feat_extract_output_lengths)."""
        L = wav_lengths
        for k, s in zip(self.conv_kernel, self.conv_stride):
            L = (L - k) // s + 1
        return L


_PRECISION = jax.lax.Precision.HIGHEST


class MaskedChannelNorm(nn.Module):
    """GroupNorm(C, C) (per-channel instance norm over time) with the
    statistics restricted to valid frames.

    HF computes GroupNorm over ALL frames including padding, so batched
    padded inference differs from per-clip inference for 'group'-norm models
    (why HF warns against attention_mask on wav2vec2-base). The reference
    extracts per clip; masking the statistics makes our batched forward
    bit-match its per-clip outputs.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, frame_mask: jnp.ndarray | None):
        # x: (B, T, C); frame_mask: (B, T) or None
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        if frame_mask is None:
            mean = x.mean(axis=1, keepdims=True)
            var = x.var(axis=1, keepdims=True)
        else:
            m = frame_mask[:, :, None].astype(x.dtype)
            n = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
            mean = (x * m).sum(axis=1, keepdims=True) / n
            var = ((x - mean) ** 2 * m).sum(axis=1, keepdims=True) / n
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class _Attention(nn.Module):
    cfg: Wav2Vec2Config
    precision: object = _PRECISION
    dot_general: object = None  # e.g. ops.quant.int8_dot_general

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        H, nh = c.hidden_size, c.num_attention_heads
        hd = H // nh

        def proj(name, y):
            return nn.Dense(H, name=name, precision=self.precision,
                            dot_general=self.dot_general)(y)

        q = proj("q_proj", x).reshape(*x.shape[:2], nh, hd) * (hd ** -0.5)
        k = proj("k_proj", x).reshape(*x.shape[:2], nh, hd)
        v = proj("v_proj", x).reshape(*x.shape[:2], nh, hd)
        if c.use_flash_attention:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds, flash_attention)

            B, T = x.shape[0], x.shape[1]
            Tp = -(-T // 512) * 512            # kernel-friendly padding
            padlen = Tp - T
            # valid frames recovered from the additive pad bias; pads get
            # their own segment (2) so masked rows stay finite (zeros attend
            # zeros) instead of NaN-ing a fully-masked softmax row.
            valid = (bias[:, 0, 0, :] > -1e29) if bias is not None \
                else jnp.ones((B, T), bool)
            seg = jnp.where(valid, 1, 2).astype(jnp.int32)
            seg = jnp.pad(seg, ((0, 0), (0, padlen)), constant_values=2)
            pad4 = ((0, 0), (0, padlen), (0, 0), (0, 0))
            qh = jnp.pad(q, pad4).transpose(0, 2, 1, 3)
            kh = jnp.pad(k, pad4).transpose(0, 2, 1, 3)
            vh = jnp.pad(v, pad4).transpose(0, 2, 1, 3)
            out = flash_attention(qh, kh, vh, causal=False, sm_scale=1.0,
                                  segment_ids=SegmentIds(q=seg, kv=seg))
            out = out.transpose(0, 2, 1, 3)[:, :T].reshape(B, T, H)
            return proj("out_proj", out)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, precision=self.precision)
        if bias is not None:
            logits = logits + bias
        w = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=self.precision)
        out = out.reshape(*x.shape[:2], H)
        return proj("out_proj", out)


def wavlm_rel_buckets(T: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """T5-style bidirectional log buckets (modeling_wavlm.py:253-271)."""
    half = num_buckets // 2
    rel = np.arange(T)[None, :] - np.arange(T)[:, None]     # memory - context
    buckets = (rel > 0).astype(np.int64) * half
    rel = np.abs(rel)
    max_exact = half // 2
    is_small = rel < max_exact
    large = max_exact + (np.log(np.maximum(rel, 1) / max_exact) /
                         np.log(max_distance / max_exact) *
                         (half - max_exact)).astype(np.int64)
    large = np.minimum(large, half - 1)
    return buckets + np.where(is_small, rel, large)


class _WavLMAttention(nn.Module):
    """WavLM gated relative-position attention: the shared (nh, T, T) bias is
    gated per layer/query from projected head states
    (modeling_wavlm.py:147-186)."""

    cfg: Wav2Vec2Config
    precision: object = _PRECISION
    dot_general: object = None

    @nn.compact
    def __call__(self, x, bias, pos_bias):
        c = self.cfg
        H, nh = c.hidden_size, c.num_attention_heads
        hd = H // nh
        B, T = x.shape[0], x.shape[1]

        def proj(name, y):
            return nn.Dense(H, name=name, precision=self.precision,
                            dot_general=self.dot_general)(y)

        heads = x.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)   # (B,nh,T,hd)
        g = nn.Dense(8, name="gru_rel_pos_linear",
                     precision=self.precision)(heads)
        g = g.reshape(B, nh, T, 2, 4).sum(-1)
        gate_a, gate_b = jnp.split(jax.nn.sigmoid(g), 2, axis=-1)
        const = self.param("gru_rel_pos_const", nn.initializers.ones,
                           (1, nh, 1, 1))
        gate = gate_a * (gate_b * const - 1.0) + 2.0            # (B,nh,T,1)
        gated_bias = gate * pos_bias[None]                      # (B,nh,T,T)

        q = proj("q_proj", x).reshape(B, T, nh, hd) * (hd ** -0.5)
        k = proj("k_proj", x).reshape(B, T, nh, hd)
        v = proj("v_proj", x).reshape(B, T, nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, precision=self.precision)
        logits = logits + gated_bias
        if bias is not None:
            logits = logits + bias
        w = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=self.precision)
        return proj("out_proj", out.reshape(B, T, H))


class _Layer(nn.Module):
    cfg: Wav2Vec2Config
    precision: object = _PRECISION
    dot_general: object = None

    @nn.compact
    def __call__(self, x, bias, pos_bias=None):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name)
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision,
                                         dot_general=self.dot_general)
        if c.attn_type == "wavlm":
            wl = _WavLMAttention(c, self.precision, self.dot_general,
                                 name="attention")
            attn = lambda y, b: wl(y, b, pos_bias)
        else:
            attn = _Attention(c, self.precision, self.dot_general,
                              name="attention")
        if c.do_stable_layer_norm:  # pre-LN
            x = x + attn(ln("layer_norm")(x), bias)
            h = ln("final_layer_norm")(x)
            h = dense(c.intermediate_size, "ffn_intermediate")(h)
            h = jax.nn.gelu(h, approximate=False)
            x = x + dense(c.hidden_size, "ffn_output")(h)
        else:  # post-LN
            x = ln("layer_norm")(x + attn(x, bias))
            h = dense(c.intermediate_size, "ffn_intermediate")(x)
            h = jax.nn.gelu(h, approximate=False)
            x = ln("final_layer_norm")(x + dense(c.hidden_size, "ffn_output")(h))
        return x


class Wav2Vec2Encoder(nn.Module):
    """wav (B, T) [+ wav lengths] -> tuple of hidden states (num_layers+1)."""

    cfg: Wav2Vec2Config
    precision: object = _PRECISION
    # quantized dot_general for the transformer-layer Dense sites only (the
    # conv frontend and fp_projection stay at `precision`)
    dot_general: object = None

    @nn.compact
    def __call__(self, wav: jnp.ndarray, wav_lengths: jnp.ndarray | None = None):
        c = self.cfg
        x = wav[:, :, None]  # (B, T, 1)
        lengths = wav_lengths
        for i, (dim, k, s) in enumerate(zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            x = nn.Conv(dim, kernel_size=(k,), strides=(s,), padding="VALID",
                        use_bias=c.conv_bias, name=f"conv_{i}",
                        precision=self.precision)(x)
            if lengths is not None:
                lengths = (lengths - k) // s + 1
            if c.feat_extract_norm == "group" and i == 0:
                fm = None
                if lengths is not None:
                    t_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape[:2], 1)
                    fm = t_idx < lengths[:, None]
                x = MaskedChannelNorm(epsilon=c.layer_norm_eps,
                                      name="conv_norm_0")(x, fm)
            elif c.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=c.layer_norm_eps, name=f"conv_norm_{i}")(x)
            x = jax.nn.gelu(x, approximate=False)

        # frame-level attention mask from wav lengths
        mask = None
        if wav_lengths is not None:
            frames = c.feat_lengths(wav_lengths)
            t_idx = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], x.shape[1]), 1)
            mask = t_idx < frames[:, None]  # (B, F)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="fp_layer_norm")(x)
        x = nn.Dense(c.hidden_size, name="fp_projection", precision=self.precision)(x)

        if mask is not None:
            x = jnp.where(mask[:, :, None], x, 0.0)  # HF zeroes masked frames

        if c.pos_conv_depth > 0:
            # data2vec-audio: conv->LN(no affine)->gelu stack
            k = c.conv_pos_kernel_size
            pos = x
            for j in range(c.pos_conv_depth):
                pos = nn.Conv(c.hidden_size, kernel_size=(k,),
                              feature_group_count=c.num_conv_pos_embedding_groups,
                              padding=[(k // 2, k // 2)],
                              name=f"pos_conv_{j}",
                              precision=self.precision)(pos)
                if k % 2 == 0:
                    pos = pos[:, :-1]
                mean = pos.mean(-1, keepdims=True)
                var = ((pos - mean) ** 2).mean(-1, keepdims=True)
                pos = (pos - mean) * jax.lax.rsqrt(var + c.layer_norm_eps)
                pos = jax.nn.gelu(pos, approximate=False)
            x = x + pos
        else:
            # convolutional positional embedding (same-style pad k//2 both
            # sides, drop last column when kernel is even — HF
            # Wav2Vec2PositionalConvEmbedding)
            k = c.num_conv_pos_embeddings
            pos = nn.Conv(c.hidden_size, kernel_size=(k,),
                          feature_group_count=c.num_conv_pos_embedding_groups,
                          padding=[(k // 2, k // 2)], name="pos_conv",
                          precision=self.precision)(x)
            if k % 2 == 0:
                pos = pos[:, :-1]
            pos = jax.nn.gelu(pos, approximate=False)
            x = x + pos

        bias = None
        if mask is not None:
            bias = jnp.where(mask[:, None, None, :], 0.0, -1e30).astype(x.dtype)

        pos_bias = None
        if c.attn_type == "wavlm":
            # shared relative bias, embedded once (layer 0 owns the table in
            # HF; stored top-level here) then gated per layer
            table = self.param("rel_attn_embed", nn.initializers.normal(0.02),
                               (c.num_buckets, c.num_attention_heads))
            buckets = wavlm_rel_buckets(x.shape[1], c.num_buckets,
                                        c.max_distance)
            pos_bias = table[jnp.asarray(buckets)].transpose(2, 0, 1)

        hidden_states = []
        if not c.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_layer_norm")(x)
        hidden_states.append(x)
        for i in range(c.num_hidden_layers):
            x = _Layer(c, self.precision, self.dot_general,
                       name=f"layer_{i}")(x, bias, pos_bias)
            hidden_states.append(x)
        if c.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_layer_norm")(x)
            hidden_states[-1] = x
        return tuple(hidden_states)


# ---------------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------------
def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_torch_state(cfg: Wav2Vec2Config, sd: dict) -> dict:
    """Map an HF Wav2Vec2Model/HubertModel/Data2VecAudioModel state dict to
    this module's param pytree."""
    p: dict = {}

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T,
                "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    for i in range(len(cfg.conv_dim)):
        w = _t(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])  # (out,in,k)
        conv = {"kernel": w.transpose(2, 1, 0)}  # (k,in,out)
        if cfg.conv_bias:
            conv["bias"] = _t(sd[f"feature_extractor.conv_layers.{i}.conv.bias"])
        p[f"conv_{i}"] = conv
        norm_key = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if norm_key in sd:
            p[f"conv_norm_{i}"] = ln(f"feature_extractor.conv_layers.{i}.layer_norm")

    p["fp_layer_norm"] = ln("feature_projection.layer_norm")
    p["fp_projection"] = dense("feature_projection.projection")

    if cfg.pos_conv_depth > 0:  # data2vec-audio stack (plain convs)
        for j in range(cfg.pos_conv_depth):
            base = f"encoder.pos_conv_embed.layers.{j}.conv"
            p[f"pos_conv_{j}"] = {
                "kernel": _t(sd[f"{base}.weight"]).transpose(2, 1, 0),
                "bias": _t(sd[f"{base}.bias"])}
        return _finish_layers(cfg, sd, p, dense, ln)
    # weight-normed positional conv: w = g * v / ||v||_(dims 0,1)
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.parametrizations.weight.original0" in sd:
        g = _t(sd[f"{base}.parametrizations.weight.original0"])  # (1,1,k)
        v = _t(sd[f"{base}.parametrizations.weight.original1"])  # (out,in/g,k)
    else:  # older torch naming
        g = _t(sd[f"{base}.weight_g"])
        v = _t(sd[f"{base}.weight_v"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = (g * v / norm)  # (out, in/groups, k)
    p["pos_conv"] = {"kernel": w.transpose(2, 1, 0),
                     "bias": _t(sd[f"{base}.bias"])}
    return _finish_layers(cfg, sd, p, dense, ln)


def _finish_layers(cfg, sd, p, dense, ln):
    p["encoder_layer_norm"] = ln("encoder.layer_norm")
    if cfg.attn_type == "wavlm":
        p["rel_attn_embed"] = _t(
            sd["encoder.layers.0.attention.rel_attn_embed.weight"])
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        layer = {
            "attention": {n: dense(f"{pre}.attention.{n}")
                          for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "layer_norm": ln(f"{pre}.layer_norm"),
            "final_layer_norm": ln(f"{pre}.final_layer_norm"),
            "ffn_intermediate": dense(f"{pre}.feed_forward.intermediate_dense"),
            "ffn_output": dense(f"{pre}.feed_forward.output_dense"),
        }
        if cfg.attn_type == "wavlm":
            layer["attention"]["gru_rel_pos_linear"] = dense(
                f"{pre}.attention.gru_rel_pos_linear")
            layer["attention"]["gru_rel_pos_const"] = _t(
                sd[f"{pre}.attention.gru_rel_pos_const"])
        p[f"layer_{i}"] = layer
    return jax.tree_util.tree_map(jnp.asarray, p)


def from_hf_torch(model) -> tuple[Wav2Vec2Config, dict]:
    cfg = Wav2Vec2Config.from_hf(model.config)
    return cfg, convert_torch_state(cfg, model.state_dict())
