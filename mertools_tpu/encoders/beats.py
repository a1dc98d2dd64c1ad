"""BEATs audio encoder (Flax) — the SSL audio tower SALMONN pairs with
Whisper (``SALMONN/model.py:57-66``; architecture per the vendored
``SALMONN/beats/{BEATs,backbone}.py``, re-implemented TPU-native here).

Pipeline (BEATs.py:118-180):
- kaldi fbank 128 mel bins @ 25/10 ms on the 2^15-scaled waveform
  (ops/fbank.kaldi_fbank is the validated kaldi-compatible implementation),
  normalized ``(fbank - 15.41663) / (2 * 6.55582)``;
- 16x16/16 Conv2d patch embedding over (T, 128) -> (B, T/16 * 8, 512),
  LayerNorm, 512 -> 768 projection;
- 12-layer post-LN transformer with DeepNorm residual scaling
  ``alpha = (2L)^(1/4)`` (backbone.py:210, 260-272), conv positional
  embedding (k=128, 16 groups, SamePad trims one trailing element), and
  WavLM-style gated relative position bias (T5 log buckets, 320/800,
  shared table computed by layer 0 and gated per layer from the PROJECTED
  query heads — backbone.py:650-658; note this differs from HF WavLM,
  which gates from the raw hidden states).

Weight layout follows the fairseq checkpoint names so
:func:`convert_beats_state` maps ``BEATs_iter3_plus_AS2M_finetuned...pt``
style state dicts (and the ``beats.``-prefixed subtree of a SALMONN
checkpoint) directly. Parity: original-architecture torch oracle in
``tests/test_beats.py`` (no fairseq/torchaudio BEATs exists in this image).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .wav2vec2 import wavlm_rel_buckets

_PRECISION = jax.lax.Precision.HIGHEST

FBANK_MEAN = 15.41663
FBANK_STD = 6.55582


@dataclass(frozen=True)
class BEATsConfig:
    input_patch_size: int = 16
    embed_dim: int = 512
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    conv_bias: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True
    deep_norm: bool = True
    layer_norm_first: bool = False

    @classmethod
    def from_fairseq(cls, cfg: dict) -> "BEATsConfig":
        keep = {f.name for f in __import__("dataclasses").fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in keep})

    @property
    def deep_norm_alpha(self) -> float:
        return (2 * self.encoder_layers) ** 0.25 if self.deep_norm else 1.0


class _GatedAttention(nn.Module):
    """BEATs/fairseq MultiheadAttention with gated relative position bias
    (backbone.py:513-658). Gating input is the projected q heads."""

    cfg: BEATsConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, pad_bias, pos_bias):
        c = self.cfg
        H, nh = c.encoder_embed_dim, c.encoder_attention_heads
        hd = H // nh
        B, T = x.shape[0], x.shape[1]

        def proj(name, y, dim=H):
            return nn.Dense(dim, name=name, precision=self.precision)(y)

        q_raw = proj("q_proj", x).reshape(B, T, nh, hd)
        k = proj("k_proj", x).reshape(B, T, nh, hd)
        v = proj("v_proj", x).reshape(B, T, nh, hd)
        q = q_raw * (hd ** -0.5)

        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            precision=self.precision)
        if pos_bias is not None:
            if c.gru_rel_pos:
                # gate from the UNSCALED projected query heads
                heads = q_raw.transpose(0, 2, 1, 3)           # (B,nh,T,hd)
                g = nn.Dense(8, name="grep_linear",
                             precision=self.precision)(heads)
                g = g.reshape(B, nh, T, 2, 4).sum(-1)
                gate_a, gate_b = jnp.split(jax.nn.sigmoid(g), 2, axis=-1)
                grep_a = self.param("grep_a", nn.initializers.ones,
                                    (1, nh, 1, 1))
                gate = gate_a * (gate_b * grep_a - 1.0) + 2.0  # (B,nh,T,1)
                logits = logits + gate * pos_bias[None]
            else:
                logits = logits + pos_bias[None]
        if pad_bias is not None:
            logits = logits + pad_bias
        w = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=self.precision)
        return proj("out_proj", out.reshape(B, T, H))


class _Layer(nn.Module):
    """Post-LN transformer layer with DeepNorm residual scaling
    (backbone.py:249-274)."""

    cfg: BEATsConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, pad_bias, pos_bias):
        c = self.cfg
        alpha = c.deep_norm_alpha
        a = _GatedAttention(c, self.precision, name="self_attn")(
            x, pad_bias, pos_bias)
        x = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(
            x * alpha + a)
        h = nn.Dense(c.encoder_ffn_embed_dim, name="fc1",
                     precision=self.precision)(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.encoder_embed_dim, name="fc2",
                     precision=self.precision)(h)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(
            x * alpha + h)


class BEATsEncoder(nn.Module):
    """Normalized fbank (B, T, 128) [+ frame mask (B, T)] ->
    (B, T//16 * 8, 768) features (``extract_features(feature_only=True)``)."""

    cfg: BEATsConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, fbank: jnp.ndarray, fbank_mask=None):
        c = self.cfg
        p = c.input_patch_size
        B, T, M = fbank.shape
        t = T // p
        x = fbank[:, : t * p, :]
        # Conv2d(1, embed, k=p, s=p) == per-patch flatten + Dense
        x = x.reshape(B, t, p, M // p, p).transpose(0, 1, 3, 2, 4)
        x = x.reshape(B, t * (M // p), p * p)   # (B, n_patches, 256)
        x = nn.Dense(c.embed_dim, use_bias=c.conv_bias,
                     name="patch_embedding", precision=self.precision)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        if c.embed_dim != c.encoder_embed_dim:
            x = nn.Dense(c.encoder_embed_dim, name="post_extract_proj",
                         precision=self.precision)(x)

        pad_bias = None
        patch_mask = None
        if fbank_mask is not None:
            # a patch is valid iff ALL its frames are (BEATs.py:105-116)
            pm = fbank_mask[:, : t * p].reshape(B, t, p).all(-1)
            patch_mask = jnp.repeat(pm, M // p, axis=1)       # (B, n_patch)
            x = jnp.where(patch_mask[:, :, None], x, 0.0)
            pad_bias = jnp.where(patch_mask[:, None, None, :], 0.0, -1e30)

        # conv positional embedding (SamePad trims one trailing output)
        k = c.conv_pos
        pos = nn.Conv(c.encoder_embed_dim, kernel_size=(k,),
                      feature_group_count=c.conv_pos_groups,
                      padding=[(k // 2, k // 2)], name="pos_conv",
                      precision=self.precision)(x)
        pos = jax.nn.gelu(pos[:, : x.shape[1]], approximate=False)
        x = x + pos
        if not c.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(x)

        pos_bias = None
        if c.relative_position_embedding:
            table = self.param("relative_attention_bias",
                               nn.initializers.normal(0.02),
                               (c.num_buckets, c.encoder_attention_heads))
            buckets = wavlm_rel_buckets(x.shape[1], c.num_buckets,
                                        c.max_distance)
            pos_bias = table[jnp.asarray(buckets)].transpose(2, 0, 1)

        for i in range(c.encoder_layers):
            x = _Layer(c, self.precision, name=f"layer_{i}")(
                x, pad_bias, pos_bias)
        if patch_mask is not None:
            x = jnp.where(patch_mask[:, :, None], x, 0.0)
        return x


def beats_fbank(wavs: jnp.ndarray) -> jnp.ndarray:
    """(B, T) float32 16 kHz in [-1, 1] -> normalized (B, F, 128) fbank
    (BEATs.py:118-133: kaldi fbank on the 2^15-scaled waveform)."""
    from ..ops.fbank import kaldi_fbank

    fb = kaldi_fbank(jnp.asarray(wavs, jnp.float32) * 32768.0,
                     num_mel_bins=128)
    return (fb - FBANK_MEAN) / (2.0 * FBANK_STD)


# ---------------------------------------------------------------------------
# fairseq checkpoint conversion
# ---------------------------------------------------------------------------


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_beats_state(cfg: BEATsConfig, sd: dict) -> dict:
    """fairseq BEATs state dict (BEATs_iter3...pt ``model``, or a SALMONN
    checkpoint's ``beats.``-stripped subtree) -> Flax params."""
    def dense(prefix):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if f"{prefix}.bias" in sd:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p: dict = {}
    # Conv2d(1, E, k, k) (E,1,k,k) -> per-patch Dense (k*k, E); the patch
    # flatten order above is (row-major within the patch) == the conv's
    # (in_h, in_w) kernel order
    w = _t(sd["patch_embedding.weight"])          # (E, 1, k, k)
    p["patch_embedding"] = {
        "kernel": w.reshape(w.shape[0], -1).T}    # (k*k, E)
    if "patch_embedding.bias" in sd:
        p["patch_embedding"]["bias"] = _t(sd["patch_embedding.bias"])
    p["layer_norm"] = ln("layer_norm")
    if "post_extract_proj.weight" in sd:
        p["post_extract_proj"] = dense("post_extract_proj")

    # weight-normed pos conv: compose g * v / ||v|| (norm over dims (0, 1),
    # per kernel index — fairseq weight_norm(dim=2))
    g = _t(sd["encoder.pos_conv.0.weight_g"])
    v = _t(sd["encoder.pos_conv.0.weight_v"])     # (E, E/groups, k)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    wpc = g * v / np.maximum(norm, 1e-12)
    # torch conv1d (out, in/groups, k) -> flax (k, in/groups, out)
    p["pos_conv"] = {"kernel": wpc.transpose(2, 1, 0),
                     "bias": _t(sd["encoder.pos_conv.0.bias"])}
    p["encoder_layer_norm"] = ln("encoder.layer_norm")
    if "encoder.layers.0.self_attn.relative_attention_bias.weight" in sd:
        p["relative_attention_bias"] = _t(
            sd["encoder.layers.0.self_attn.relative_attention_bias.weight"])

    for i in range(cfg.encoder_layers):
        b = f"encoder.layers.{i}"
        attn = {n: dense(f"{b}.self_attn.{n}")
                for n in ("q_proj", "k_proj", "v_proj", "out_proj")}
        if cfg.gru_rel_pos:
            attn["grep_linear"] = dense(f"{b}.self_attn.grep_linear")
            attn["grep_a"] = _t(sd[f"{b}.self_attn.grep_a"])
        p[f"layer_{i}"] = {
            "self_attn": attn,
            "self_attn_layer_norm": ln(f"{b}.self_attn_layer_norm"),
            "fc1": dense(f"{b}.fc1"),
            "fc2": dense(f"{b}.fc2"),
            "final_layer_norm": ln(f"{b}.final_layer_norm"),
        }
    return p
