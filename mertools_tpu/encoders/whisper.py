"""Whisper (encoder + decoder) in Flax.

Two reference roles:
  1. audio features: the reference feeds [1, 80, 3000] log-mels plus a 2-token
     decoder stub and keeps the decoder ``last_hidden_state``
     (``extract_audio_huggingface.py:83-91``) -> (2, D) per clip;
  2. ASR transcripts (``MER2024/main-asr.py`` uses wenetruntime; the TPU
     build replaces it with Whisper decoding — SURVEY.md §2.9).

Pre-LN transformer both sides; encoder conv stem (k3 gelu, k3 stride-2 gelu) +
sinusoidal positions (stored as weights, converted verbatim); decoder has
learned positions, causal self-attention, and cross-attention. ``decode_step``
supports greedy generation with a static-size KV cache for the ASR path.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class WhisperConfig:
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    num_mel_bins: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    vocab_size: int = 51865
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257

    @classmethod
    def from_hf(cls, hf):
        return cls(d_model=hf.d_model, encoder_layers=hf.encoder_layers,
                   decoder_layers=hf.decoder_layers,
                   num_heads=hf.encoder_attention_heads,
                   ffn_dim=hf.encoder_ffn_dim, num_mel_bins=hf.num_mel_bins,
                   max_source_positions=hf.max_source_positions,
                   max_target_positions=hf.max_target_positions,
                   vocab_size=hf.vocab_size,
                   decoder_start_token_id=hf.decoder_start_token_id,
                   eos_token_id=hf.eos_token_id)


def _attn(cfg, name, q_in, kv_in, bias, precision):
    H, nh = cfg.d_model, cfg.num_heads
    hd = H // nh
    dense = lambda d, n, use_bias=True: nn.Dense(d, name=n, use_bias=use_bias,
                                                 precision=precision)
    q = dense(H, f"{name}_q")(q_in).reshape(*q_in.shape[:2], nh, hd) * (hd ** -0.5)
    k = dense(H, f"{name}_k", use_bias=False)(kv_in).reshape(*kv_in.shape[:2], nh, hd)
    v = dense(H, f"{name}_v")(kv_in).reshape(*kv_in.shape[:2], nh, hd)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, precision=precision)
    if bias is not None:
        logits = logits + bias
    w = nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=precision)
    return dense(H, f"{name}_out")(out.reshape(*q_in.shape[:2], H))


class _EncLayer(nn.Module):
    cfg: WhisperConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, bias=None):
        c = self.cfg
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, name=n)  # torch default eps
        h = ln("self_attn_layer_norm")(x)
        x = x + _attn(c, "self_attn", h, h, bias, self.precision)
        h = ln("final_layer_norm")(x)
        h = jax.nn.gelu(nn.Dense(c.ffn_dim, name="fc1", precision=self.precision)(h),
                        approximate=False)
        return x + nn.Dense(c.d_model, name="fc2", precision=self.precision)(h)


class _DecLayer(nn.Module):
    cfg: WhisperConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, enc, causal_bias):
        c = self.cfg
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, name=n)  # torch default eps
        h = ln("self_attn_layer_norm")(x)
        x = x + _attn(c, "self_attn", h, h, causal_bias, self.precision)
        h = ln("encoder_attn_layer_norm")(x)
        x = x + _attn(c, "encoder_attn", h, enc, None, self.precision)
        h = ln("final_layer_norm")(x)
        h = jax.nn.gelu(nn.Dense(c.ffn_dim, name="fc1", precision=self.precision)(h),
                        approximate=False)
        return x + nn.Dense(c.d_model, name="fc2", precision=self.precision)(h)


class WhisperEncoder(nn.Module):
    cfg: WhisperConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, mel: jnp.ndarray):
        """mel: (B, 80, 3000) -> (B, 1500, D)."""
        c = self.cfg
        x = jnp.swapaxes(mel, 1, 2)  # (B, T, 80)
        x = nn.Conv(c.d_model, kernel_size=(3,), padding=[(1, 1)], name="conv1",
                    precision=self.precision)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(c.d_model, kernel_size=(3,), strides=(2,), padding=[(1, 1)],
                    name="conv2", precision=self.precision)(x)
        x = jax.nn.gelu(x, approximate=False)
        pos = self.param("embed_positions", nn.initializers.zeros,
                         (c.max_source_positions, c.d_model))
        x = x + pos[None, : x.shape[1]]
        for i in range(c.encoder_layers):
            x = _EncLayer(c, self.precision, name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)


class WhisperDecoder(nn.Module):
    cfg: WhisperConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, enc: jnp.ndarray):
        """input_ids: (B, S); enc: (B, T, D) -> (B, S, D) last hidden."""
        c = self.cfg
        S = input_ids.shape[1]
        x = nn.Embed(c.vocab_size, c.d_model, name="embed_tokens")(input_ids)
        pos = self.param("embed_positions", nn.initializers.zeros,
                         (c.max_target_positions, c.d_model))
        x = x + pos[None, :S]
        causal = jnp.where(
            jnp.arange(S)[:, None] >= jnp.arange(S)[None, :], 0.0, -1e30)
        for i in range(c.decoder_layers):
            x = _DecLayer(c, self.precision, name=f"layer_{i}")(x, enc, causal)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)


class WhisperModel(nn.Module):
    cfg: WhisperConfig
    precision: object = _PRECISION

    def setup(self):
        self.encoder = WhisperEncoder(self.cfg, self.precision)
        self.decoder = WhisperDecoder(self.cfg, self.precision)

    def __call__(self, mel, decoder_input_ids):
        enc = self.encoder(mel)
        return self.decoder(decoder_input_ids, enc)

    def encode(self, mel):
        return self.encoder(mel)

    def decode(self, input_ids, enc):
        return self.decoder(input_ids, enc)


def whisper_logits(model: WhisperModel, params, mel, decoder_input_ids):
    """Tied-embedding LM head (proj_out = embed_tokens.T)."""
    h = model.apply({"params": params}, mel, decoder_input_ids)
    emb = params["decoder"]["embed_tokens"]["embedding"]
    return jnp.einsum("bsd,vd->bsv", h, emb,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------------
def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_torch_state(cfg: WhisperConfig, sd: dict) -> dict:
    def dense(prefix, use_bias=True):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if use_bias:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}

    def attn(prefix, name):
        return {
            f"{name}_q": dense(f"{prefix}.q_proj"),
            f"{name}_k": dense(f"{prefix}.k_proj", use_bias=False),
            f"{name}_v": dense(f"{prefix}.v_proj"),
            f"{name}_out": dense(f"{prefix}.out_proj"),
        }

    enc: dict = {
        "conv1": {"kernel": _t(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
                  "bias": _t(sd["encoder.conv1.bias"])},
        "conv2": {"kernel": _t(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
                  "bias": _t(sd["encoder.conv2.bias"])},
        "embed_positions": _t(sd["encoder.embed_positions.weight"]),
        "layer_norm": ln("encoder.layer_norm"),
    }
    for i in range(cfg.encoder_layers):
        pre = f"encoder.layers.{i}"
        enc[f"layer_{i}"] = {
            **attn(f"{pre}.self_attn", "self_attn"),
            "self_attn_layer_norm": ln(f"{pre}.self_attn_layer_norm"),
            "final_layer_norm": ln(f"{pre}.final_layer_norm"),
            "fc1": dense(f"{pre}.fc1"), "fc2": dense(f"{pre}.fc2"),
        }

    dec: dict = {
        "embed_tokens": {"embedding": _t(sd["decoder.embed_tokens.weight"])},
        "embed_positions": _t(sd["decoder.embed_positions.weight"]),
        "layer_norm": ln("decoder.layer_norm"),
    }
    for i in range(cfg.decoder_layers):
        pre = f"decoder.layers.{i}"
        dec[f"layer_{i}"] = {
            **attn(f"{pre}.self_attn", "self_attn"),
            **attn(f"{pre}.encoder_attn", "encoder_attn"),
            "self_attn_layer_norm": ln(f"{pre}.self_attn_layer_norm"),
            "encoder_attn_layer_norm": ln(f"{pre}.encoder_attn_layer_norm"),
            "final_layer_norm": ln(f"{pre}.final_layer_norm"),
            "fc1": dense(f"{pre}.fc1"), "fc2": dense(f"{pre}.fc2"),
        }
    return jax.tree_util.tree_map(jnp.asarray, {"encoder": enc, "decoder": dec})


def from_hf_torch(model) -> tuple[WhisperConfig, dict]:
    cfg = WhisperConfig.from_hf(model.config)
    return cfg, convert_torch_state(cfg, model.state_dict())
