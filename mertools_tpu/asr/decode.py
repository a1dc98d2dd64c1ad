"""KV-cached greedy decoding for the Flax Whisper model.

The reference gets transcripts from the wenetruntime C++ ASR decoder
(``MER2024/main-asr.py:11-33``); the TPU-native replacement is Whisper
running fully under jit: one encoder forward per 30 s window, then a
``lax.scan`` over decode steps with static-shape KV caches — no Python in
the loop, one compile for all utterances of a batch size.

Operates directly on the converted parameter pytree of
:class:`~mertools_tpu.encoders.whisper.WhisperModel` (same params serve the
full-sequence forward, which the tests use as the step-decoder's oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_P = jax.lax.Precision.HIGHEST
_LN_EPS = 1e-6  # flax nn.LayerNorm default, matches WhisperModel modules


def _ln(p, x):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + _LN_EPS) * p["scale"] + p["bias"]


def _dense(p, x):
    y = jnp.einsum("...i,io->...o", x, p["kernel"], precision=_P)
    return y + p["bias"] if "bias" in p else y


def _split_heads(x, nh):
    return x.reshape(*x.shape[:-1], nh, x.shape[-1] // nh)


def precompute_cross_kv(cfg, dec_params, enc_out):
    """Per-layer cross-attention K/V from the encoder output, once per clip.
    Returns (layers, B, T, nh, hd) arrays (k, v)."""
    nh = cfg.num_heads
    ks, vs = [], []
    for i in range(cfg.decoder_layers):
        lp = dec_params[f"layer_{i}"]
        ks.append(_split_heads(_dense(lp["encoder_attn_k"], enc_out), nh))
        vs.append(_split_heads(_dense(lp["encoder_attn_v"], enc_out), nh))
    return jnp.stack(ks), jnp.stack(vs)


def _decoder_step(cfg, dec_params, tok, t, self_k, self_v, cross_k, cross_v):
    """One decode step.

    tok: (B,) int32 current input token; t: scalar position.
    self_k/self_v: (layers, B, L, nh, hd) caches (updated here).
    Returns (logits (B, V), new_self_k, new_self_v).
    """
    nh = cfg.num_heads
    hd = cfg.d_model // nh
    B = tok.shape[0]
    L = self_k.shape[2]

    emb = dec_params["embed_tokens"]["embedding"]
    x = emb[tok] + dec_params["embed_positions"][t]          # (B, D)
    pos_mask = (jnp.arange(L) <= t)[None, None, :]           # (1,1,L)

    for i in range(cfg.decoder_layers):
        lp = dec_params[f"layer_{i}"]
        # self attention with cache
        h = _ln(lp["self_attn_layer_norm"], x)
        q = _split_heads(_dense(lp["self_attn_q"], h), nh) * (hd ** -0.5)
        k_t = _split_heads(_dense(lp["self_attn_k"], h), nh)
        v_t = _split_heads(_dense(lp["self_attn_v"], h), nh)
        self_k = jax.lax.dynamic_update_slice(
            self_k, k_t[None, :, None], (i, 0, t, 0, 0))
        self_v = jax.lax.dynamic_update_slice(
            self_v, v_t[None, :, None], (i, 0, t, 0, 0))
        logits = jnp.einsum("bnd,blnd->bnl", q, self_k[i], precision=_P)
        logits = jnp.where(pos_mask, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1)
        att = jnp.einsum("bnl,blnd->bnd", w, self_v[i], precision=_P)
        x = x + _dense(lp["self_attn_out"], att.reshape(B, -1))

        # cross attention (precomputed K/V)
        h = _ln(lp["encoder_attn_layer_norm"], x)
        q = _split_heads(_dense(lp["encoder_attn_q"], h), nh) * (hd ** -0.5)
        logits = jnp.einsum("bnd,btnd->bnt", q, cross_k[i], precision=_P)
        w = jax.nn.softmax(logits, axis=-1)
        att = jnp.einsum("bnt,btnd->bnd", w, cross_v[i], precision=_P)
        x = x + _dense(lp["encoder_attn_out"], att.reshape(B, -1))

        # mlp
        h = _ln(lp["final_layer_norm"], x)
        h = jax.nn.gelu(_dense(lp["fc1"], h), approximate=False)
        x = x + _dense(lp["fc2"], h)

    x = _ln(dec_params["layer_norm"], x)
    logits = jnp.einsum("bd,vd->bv", x, emb, precision=_P)
    return logits, self_k, self_v


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens",
                                             "prompt_len"))
def greedy_decode(cfg, params, enc_out, prompt, prompt_len: int,
                  max_new_tokens: int = 128, suppress_mask=None):
    """Greedy generation. enc_out: (B, T, D); prompt: (B, prompt_len) int32.

    Returns (B, prompt_len + max_new_tokens) int32, EOS-padded.
    suppress_mask: optional (V,) bool — True entries are never produced.
    """
    dec = params["decoder"]
    nh = cfg.num_heads
    hd = cfg.d_model // nh
    B = enc_out.shape[0]
    L = prompt_len + max_new_tokens
    eos = cfg.eos_token_id

    cross_k, cross_v = precompute_cross_kv(cfg, dec, enc_out)
    self_k = jnp.zeros((cfg.decoder_layers, B, L, nh, hd), enc_out.dtype)
    self_v = jnp.zeros_like(self_k)
    tokens = jnp.concatenate(
        [prompt.astype(jnp.int32),
         jnp.full((B, max_new_tokens), eos, jnp.int32)], axis=1)
    done = jnp.zeros((B,), bool)

    def step(carry, t):
        tokens, self_k, self_v, done = carry
        tok = tokens[:, t]
        logits, self_k, self_v = _decoder_step(cfg, dec, tok, t, self_k,
                                               self_v, cross_k, cross_v)
        if suppress_mask is not None:
            logits = jnp.where(suppress_mask[None], -1e30, logits)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        in_prompt = t + 1 < prompt_len
        keep = jnp.logical_or(in_prompt, done)
        nxt = jnp.where(keep, tokens[:, t + 1], jnp.where(done, eos, nxt))
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t + 1))
        done = jnp.logical_or(done,
                              jnp.logical_and(~in_prompt, nxt == eos))
        return (tokens, self_k, self_v, done), None

    (tokens, _, _, _), _ = jax.lax.scan(
        step, (tokens, self_k, self_v, done), jnp.arange(L - 1))
    return tokens
