"""ImageBind audio encoder (the reference AffectGPT's ``IMAGEBIND`` acoustic
encoder) in Flax.

Reference: ``MER2025/MER2025_Track23/my_affectgpt/models/encoder.py:285-311``
consumes mel "images" [b, t, 1, 128, 204] through
``ImageBindModel.get_audio_feature`` (``models/ImageBind/models/
imagebind_model.py:477-511``): AudioPreprocessor (patch conv k16/s10 +
LayerNorm + CLS + learned pos-embed) -> SimpleTransformer trunk (12 pre-LN
blocks, torch ``nn.MultiheadAttention`` with ``add_bias_kv=True``) -> head
(LayerNorm -> CLS -> Linear 768->1024 no-bias) -> postprocess (L2 normalize
x logit_scale 20). The per-clip 1024-d embeddings are what AffectGPT's
audio Q-Former consumes.

``add_bias_kv`` is torch MHA semantics: one learned (projected-space) k/v
slot appended to the key/value sequences of every attention call.

``convert_torch_state`` maps the published ``imagebind_huge.pth`` audio
subtree (``modality_preprocessors.audio.* / modality_trunks.audio.* /
modality_heads.audio.*``); block math is parity-tested against
``torch.nn.MultiheadAttention(add_bias_kv=True)`` in tests/test_imagebind.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class ImageBindAudioConfig:
    embed_dim: int = 768
    num_blocks: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    out_embed_dim: int = 1024
    kernel_size: int = 16
    stride: int = 10
    num_mel_bins: int = 128
    target_len: int = 204
    logit_scale: float = 20.0
    layer_norm_eps: float = 1e-6

    @property
    def grid(self) -> tuple[int, int]:
        g = lambda n: (n - self.kernel_size) // self.stride + 1
        return g(self.num_mel_bins), g(self.target_len)

    @property
    def num_patches(self) -> int:
        gm, gt = self.grid
        return gm * gt


class _BiasKVAttention(nn.Module):
    """torch nn.MultiheadAttention(bias=True, add_bias_kv=True) equivalent."""

    cfg: ImageBindAudioConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        H, nh = c.embed_dim, c.num_heads
        hd = H // nh
        B, N = x.shape[:2]
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision)
        q = dense(H, "q")(x)
        k = dense(H, "k")(x)
        v = dense(H, "v")(x)
        bias_k = self.param("bias_k", nn.initializers.normal(0.02), (H,))
        bias_v = self.param("bias_v", nn.initializers.normal(0.02), (H,))
        k = jnp.concatenate([k, jnp.broadcast_to(bias_k, (B, 1, H))], axis=1)
        v = jnp.concatenate([v, jnp.broadcast_to(bias_v, (B, 1, H))], axis=1)
        q = q.reshape(B, N, nh, hd) * (hd ** -0.5)
        k = k.reshape(B, N + 1, nh, hd)
        v = v.reshape(B, N + 1, nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, precision=self.precision)
        w = nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=self.precision)
        return dense(H, "out_proj")(attn.reshape(B, N, H))


class _Block(nn.Module):
    cfg: ImageBindAudioConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name)
        x = x + _BiasKVAttention(c, self.precision, name="attn")(ln("norm_1")(x))
        h = ln("norm_2")(x)
        h = nn.Dense(c.embed_dim * c.mlp_ratio, name="fc1",
                     precision=self.precision)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.embed_dim, name="fc2", precision=self.precision)(h)
        return x + h


class ImageBindAudioEncoder(nn.Module):
    """mel clips (B, num_mel_bins, target_len) -> dict(embed, feature).

    ``embed``   = L2-normalized x logit_scale projected CLS (B, out_embed_dim)
                  — the reference's per-clip audio embedding (1024-d),
    ``feature`` = pre-projection layernormed CLS (B, embed_dim).
    """

    cfg: ImageBindAudioConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, mels: jnp.ndarray):
        c = self.cfg
        B = mels.shape[0]
        x = nn.Conv(c.embed_dim, kernel_size=(c.kernel_size, c.kernel_size),
                    strides=(c.stride, c.stride), padding="VALID",
                    use_bias=False, name="patch_conv",
                    precision=self.precision)(mels[..., None])
        x = x.reshape(B, -1, c.embed_dim)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        cls = self.param("cls_token", nn.initializers.zeros, (c.embed_dim,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, c.embed_dim)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (c.num_patches + 1, c.embed_dim))
        x = x + pos[None]

        for i in range(c.num_blocks):
            x = _Block(c, self.precision, name=f"block_{i}")(x)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="head_norm")(x)
        feature = x[:, 0]
        embed = nn.Dense(c.out_embed_dim, use_bias=False, name="head_proj",
                         precision=self.precision)(feature)
        embed = embed / jnp.linalg.norm(embed, axis=-1, keepdims=True)
        return {"embed": embed * c.logit_scale, "feature": feature}


# ---------------------------------------------------------------------------
# torch converter (imagebind_huge checkpoint, audio subtree)
# ---------------------------------------------------------------------------


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_torch_state(cfg: ImageBindAudioConfig, sd: dict) -> dict:
    pre_p = "modality_preprocessors.audio."
    pre_t = "modality_trunks.audio."
    pre_h = "modality_heads.audio."

    def dense(prefix, bias=True):
        d = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if bias:
            d["bias"] = _t(sd[f"{prefix}.bias"])
        return d

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {
        "patch_conv": {"kernel": _t(sd[f"{pre_p}rgbt_stem.proj.weight"]
                                    ).transpose(2, 3, 1, 0)},
        "stem_norm": ln(f"{pre_p}rgbt_stem.norm_layer"),
        "cls_token": _t(sd[f"{pre_p}cls_token"]).reshape(-1),
        "pos_embed": _t(sd[f"{pre_p}pos_embedding_helper.pos_embed"])[0],
        "head_norm": ln(f"{pre_h}0"),
        "head_proj": dense(f"{pre_h}2", bias=False),
    }
    H = cfg.embed_dim
    for i in range(cfg.num_blocks):
        bp = f"{pre_t}blocks.{i}"
        w = _t(sd[f"{bp}.attn.in_proj_weight"])
        b = _t(sd[f"{bp}.attn.in_proj_bias"])
        p[f"block_{i}"] = {
            "attn": {
                "q": {"kernel": w[:H].T, "bias": b[:H]},
                "k": {"kernel": w[H:2 * H].T, "bias": b[H:2 * H]},
                "v": {"kernel": w[2 * H:].T, "bias": b[2 * H:]},
                "bias_k": _t(sd[f"{bp}.attn.bias_k"]).reshape(-1),
                "bias_v": _t(sd[f"{bp}.attn.bias_v"]).reshape(-1),
                "out_proj": dense(f"{bp}.attn.out_proj"),
            },
            "norm_1": ln(f"{bp}.norm_1"),
            "norm_2": ln(f"{bp}.norm_2"),
            "fc1": dense(f"{bp}.mlp.fc1"),
            "fc2": dense(f"{bp}.mlp.fc2"),
        }
    return jax.tree_util.tree_map(jnp.asarray, p)


def from_imagebind_checkpoint(sd: dict) -> tuple[ImageBindAudioConfig, dict]:
    cfg = ImageBindAudioConfig()
    return cfg, convert_torch_state(cfg, sd)
