"""emotion2vec audio encoder (data2vec-2.0 architecture) + funasr converter.

The reference extracts emotion2vec features through funasr
(``MER2024/run-mer2024.sh:46``, ``MER2024/feature_extraction/audio/``),
whose checkpoint is a fairseq *data2vec-multi* audio model: a conv local
encoder, a linear feature projection, a depth-5 grouped-conv relative
positional encoder, ``prenet_depth`` transformer blocks inside the modality
encoder plus ``depth`` main blocks (fused-qkv ViT-style, pre-norm), and a
final LayerNorm. funasr's extraction applies a per-utterance layer_norm to
the raw wav, runs ``extract_features`` and saves the last hidden state
(frame level) or its mean (utterance level).

This module implements that architecture in Flax (batched, masked instance
norm so ragged batches are bit-equal to per-clip) and converts the
fairseq/funasr state-dict layout:

    modality_encoders.AUDIO.local_encoder.conv_layers.N.{0,2.1}.*
    modality_encoders.AUDIO.project_features.*
    modality_encoders.AUDIO.relative_positional_encoder.N.0.*
    modality_encoders.AUDIO.context_encoder.blocks.M.{norm1,attn.qkv,
        attn.proj,norm2,mlp.fc1,mlp.fc2}.*
    blocks.K.{...same...}
    norm.*

EMA teacher / decoder keys are ignored (inference path only). Parity is
tested against an original-architecture torch oracle with the same key
layout (``tests/test_emotion2vec.py``) — no funasr install exists in this
environment, so the oracle re-creates the published module structure.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_PRECISION = jax.lax.Precision.HIGHEST

CONV_LAYERS_BASE = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                    (512, 3, 2), (512, 2, 2), (512, 2, 2))


@dataclass(frozen=True)
class Emotion2VecConfig:
    conv_layers: tuple = CONV_LAYERS_BASE
    hidden_size: int = 768
    prenet_depth: int = 4        # modality_encoders.AUDIO.context_encoder
    depth: int = 8               # main blocks
    num_heads: int = 12
    mlp_ratio: int = 4
    conv_pos_depth: int = 5
    conv_pos_width: int = 95     # kernel per layer = max(3, width//depth)
    conv_pos_groups: int = 16
    conv_bias: bool = False
    project_ln: bool = False     # LayerNorm before project_features (some
                                 # fairseq builds nest LN+Linear in the
                                 # project_features Sequential)
    ln_eps: float = 1e-5


def out_lengths(n: np.ndarray, cfg: Emotion2VecConfig) -> np.ndarray:
    n = np.asarray(n)
    for _, k, s in cfg.conv_layers:
        n = (n - k) // s + 1
    return n


class _LocalEncoder(nn.Module):
    """fairseq ConvFeatureExtractionModel, mode='layer_norm'."""
    cfg: Emotion2VecConfig

    @nn.compact
    def __call__(self, x, mask):
        # x (B, T) raw wav, mask (B, T) valid samples
        c = self.cfg
        h = x[..., None]                       # (B, T, 1) NWC
        m = mask
        for i, (dim, k, s) in enumerate(c.conv_layers):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=c.conv_bias, name=f"conv{i}",
                        precision=_PRECISION)(h)
            # frame valid iff its receptive field is fully inside the clip:
            # track via the conv length recurrence on the mask
            n_valid = jnp.sum(m.astype(jnp.int32), axis=-1)
            n_valid = (n_valid - k) // s + 1
            T = h.shape[1]
            m = jnp.arange(T)[None, :] < jnp.maximum(n_valid, 0)[:, None]
            h = nn.LayerNorm(epsilon=c.ln_eps, name=f"ln{i}")(h)
            h = jax.nn.gelu(h, approximate=False)
            h = jnp.where(m[..., None], h, 0.0)
        return h, m


class _ConvPos(nn.Module):
    """depth x (grouped conv k, SamePad, LayerNorm(no affine), GELU)."""
    cfg: Emotion2VecConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        k = max(3, c.conv_pos_width // c.conv_pos_depth)
        h = jnp.where(mask[..., None], x, 0.0)
        for i in range(c.conv_pos_depth):
            h = nn.Conv(c.hidden_size, (k,), padding=[(k // 2, k // 2)],
                        feature_group_count=c.conv_pos_groups,
                        name=f"pos{i}", precision=_PRECISION)(h)
            if k % 2 == 0:                    # fairseq SamePad trims one
                h = h[:, :-1]
            mu = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.var(h, axis=-1, keepdims=True)
            h = (h - mu) * jax.lax.rsqrt(var + c.ln_eps)
            h = jax.nn.gelu(h, approximate=False)
            h = jnp.where(mask[..., None], h, 0.0)
        return h


class _Block(nn.Module):
    cfg: Emotion2VecConfig

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        H, nh = c.hidden_size, c.num_heads
        hd = H // nh
        y = nn.LayerNorm(epsilon=c.ln_eps, name="norm1")(x)
        qkv = nn.Dense(3 * H, name="qkv", precision=_PRECISION)(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(*y.shape[:2], nh, hd) * (hd ** -0.5)
        k = k.reshape(*y.shape[:2], nh, hd)
        v = v.reshape(*y.shape[:2], nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, precision=_PRECISION)
        if attn_bias is not None:
            logits = logits + attn_bias
        w = nn.softmax(logits, axis=-1)
        o = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=_PRECISION)
        o = o.reshape(*y.shape[:2], H)
        x = x + nn.Dense(H, name="proj", precision=_PRECISION)(o)
        y = nn.LayerNorm(epsilon=c.ln_eps, name="norm2")(x)
        y = nn.Dense(c.mlp_ratio * H, name="fc1", precision=_PRECISION)(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(H, name="fc2", precision=_PRECISION)(y)
        return x + y


class Emotion2Vec(nn.Module):
    """(B, T) wav + (B,) lengths -> (B, T', 768) frames + (B, T') mask."""
    cfg: Emotion2VecConfig = field(default_factory=Emotion2VecConfig)

    @nn.compact
    def __call__(self, wav, lengths):
        c = self.cfg
        B, T = wav.shape
        smask = jnp.arange(T)[None, :] < lengths[:, None]
        # funasr: F.layer_norm(source, source.shape) per utterance —
        # masked so padded batching equals per-clip
        n = jnp.maximum(jnp.sum(smask, axis=-1, keepdims=True), 1)
        mu = jnp.sum(wav * smask, axis=-1, keepdims=True) / n
        var = jnp.sum(((wav - mu) * smask) ** 2, axis=-1, keepdims=True) / n
        x = (wav - mu) * jax.lax.rsqrt(var + 1e-5) * smask

        h, fmask = _LocalEncoder(c, name="local")(x, smask)
        if c.project_ln:
            h = nn.LayerNorm(epsilon=c.ln_eps, name="project_ln")(h)
        h = nn.Dense(c.hidden_size, name="project_features",
                     precision=_PRECISION)(h)
        h = h + _ConvPos(c, name="pos_conv")(h, fmask)

        bias = jnp.where(fmask[:, None, None, :], 0.0, -1e30)
        for i in range(c.prenet_depth):
            h = _Block(c, name=f"pre{i}")(h, bias)
        for i in range(c.depth):
            h = _Block(c, name=f"blk{i}")(h, bias)
        h = nn.LayerNorm(epsilon=c.ln_eps, name="norm")(h)
        return jnp.where(fmask[..., None], h, 0.0), fmask


# ---------------------------------------------------------------------------
# funasr / fairseq state-dict conversion
# ---------------------------------------------------------------------------


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                      else x)


def convert_funasr_state(sd: dict, cfg: Emotion2VecConfig | None = None,
                         conv_strides: tuple | None = None,
                         num_heads: int = 12
                         ) -> tuple[Emotion2VecConfig, dict]:
    """fairseq data2vec-multi (emotion2vec) state dict -> Flax params.

    Accepts the raw ``model`` dict of the funasr/fairseq checkpoint;
    ``_ema``/``decoder`` (teacher/pretrain-only) keys are ignored. All
    shape-bearing hyperparameters are inferred from the weights; conv
    strides (not recoverable from weights) follow the wav2vec2 schedule
    ``(5,2,2,2,2,2,2)`` unless ``conv_strides`` overrides, and
    ``num_heads`` defaults to the base model's 12.
    """
    sd = {k: v for k, v in sd.items()
          if not (k.startswith("_ema") or ".decoder." in k
                  or k.startswith("decoder."))}
    A = "modality_encoders.AUDIO."
    n_conv = len([k for k in sd if k.startswith(A + "local_encoder.conv_layers")
                  and k.endswith(".0.weight")])
    n_pre = 1 + max([int(k[len(A + "context_encoder.blocks."):].split(".")[0])
                     for k in sd
                     if k.startswith(A + "context_encoder.blocks.")] or [-1])
    n_main = 1 + max([int(k.split(".")[1]) for k in sd
                      if k.startswith("blocks.")] or [-1])
    if cfg is None:
        if conv_strides is None:
            conv_strides = tuple(s for _, _, s in CONV_LAYERS_BASE)[:n_conv]
        conv_layers = []
        for i in range(n_conv):
            w = _t(sd[A + f"local_encoder.conv_layers.{i}.0.weight"])
            # torch conv1d weight (out, in/groups, k)
            conv_layers.append((w.shape[0], w.shape[2], conv_strides[i]))
        proj_nested = (A + "project_features.2.weight") in sd
        proj_key = (A + "project_features.2.weight" if proj_nested
                    else A + "project_features.weight")
        H = _t(sd[proj_key]).shape[0]
        fc1 = _t(sd["blocks.0.mlp.fc1.weight"]) if n_main else _t(
            sd[A + "context_encoder.blocks.0.mlp.fc1.weight"])
        pos_keys = sorted(k for k in sd if k.startswith(
            A + "relative_positional_encoder.") and k.endswith(".0.weight"))
        wpos = _t(sd[pos_keys[0]])
        cfg = Emotion2VecConfig(
            conv_layers=tuple(conv_layers), hidden_size=H,
            prenet_depth=n_pre, depth=n_main, project_ln=proj_nested,
            num_heads=num_heads, mlp_ratio=fc1.shape[0] // H,
            conv_pos_depth=len(pos_keys),
            conv_pos_width=wpos.shape[2] * len(pos_keys),
            conv_pos_groups=H // wpos.shape[1],
            conv_bias=(A + "local_encoder.conv_layers.0.0.bias") in sd)

    p: dict = {"local": {}, "pos_conv": {}}
    for i in range(n_conv):
        w = _t(sd[A + f"local_encoder.conv_layers.{i}.0.weight"])
        p["local"][f"conv{i}"] = {"kernel": w.transpose(2, 1, 0)}
        if cfg.conv_bias:
            p["local"][f"conv{i}"]["bias"] = _t(
                sd[A + f"local_encoder.conv_layers.{i}.0.bias"])
        p["local"][f"ln{i}"] = {
            "scale": _t(sd[A + f"local_encoder.conv_layers.{i}.2.1.weight"]),
            "bias": _t(sd[A + f"local_encoder.conv_layers.{i}.2.1.bias"])}
    if cfg.project_ln:
        p["project_ln"] = {
            "scale": _t(sd[A + "project_features.1.weight"]),
            "bias": _t(sd[A + "project_features.1.bias"])}
        p["project_features"] = {
            "kernel": _t(sd[A + "project_features.2.weight"]).T,
            "bias": _t(sd[A + "project_features.2.bias"])}
    else:
        p["project_features"] = {
            "kernel": _t(sd[A + "project_features.weight"]).T,
            "bias": _t(sd[A + "project_features.bias"])}
    for i in range(cfg.conv_pos_depth):
        w = _t(sd[A + f"relative_positional_encoder.{i}.0.weight"])
        p["pos_conv"][f"pos{i}"] = {
            "kernel": w.transpose(2, 1, 0),
            "bias": _t(sd[A + f"relative_positional_encoder.{i}.0.bias"])}

    def block(prefix):
        out = {}
        for ours, theirs in (("norm1", "norm1"), ("norm2", "norm2")):
            out[ours] = {"scale": _t(sd[f"{prefix}.{theirs}.weight"]),
                         "bias": _t(sd[f"{prefix}.{theirs}.bias"])}
        out["qkv"] = {"kernel": _t(sd[f"{prefix}.attn.qkv.weight"]).T,
                      "bias": _t(sd[f"{prefix}.attn.qkv.bias"])}
        out["proj"] = {"kernel": _t(sd[f"{prefix}.attn.proj.weight"]).T,
                       "bias": _t(sd[f"{prefix}.attn.proj.bias"])}
        out["fc1"] = {"kernel": _t(sd[f"{prefix}.mlp.fc1.weight"]).T,
                      "bias": _t(sd[f"{prefix}.mlp.fc1.bias"])}
        out["fc2"] = {"kernel": _t(sd[f"{prefix}.mlp.fc2.weight"]).T,
                      "bias": _t(sd[f"{prefix}.mlp.fc2.bias"])}
        return out

    for i in range(n_pre):
        p[f"pre{i}"] = block(A + f"context_encoder.blocks.{i}")
    for i in range(n_main):
        p[f"blk{i}"] = block(f"blocks.{i}")
    p["norm"] = {"scale": _t(sd["norm.weight"]),
                 "bias": _t(sd["norm.bias"])}
    return cfg, p


def load_funasr_checkpoint(path: str) -> tuple[Emotion2VecConfig, dict]:
    """Load a funasr emotion2vec ``.pt`` and convert (torch CPU)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob.get("state_dict", blob))
    return convert_funasr_state(sd)
