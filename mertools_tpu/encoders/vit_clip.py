"""CLIP-ViT vision encoders in Flax.

Backs the reference's visual feature extraction
(``MERBench/feature_extraction/visual/extract_vision_huggingface.py:104-122``):
face frames -> CLIP vision tower -> pooled CLS (post-LN) -> visual projection
(``get_image_features``), batched over frames; UTT = frame mean.

Architecture (HF CLIPVisionModel): patch conv (no bias on embedding proj? —
conv has no bias in CLIP), CLS token, learned position embeddings,
pre-layernorm, pre-LN transformer blocks with quick_gelu MLPs, post-layernorm
on the CLS token, linear projection without bias.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    # Token Merging (arXiv:2210.09461) production mode: r merges per layer.
    # CLIP pools the protected CLS token, so the output contract is
    # unchanged — only the attention context is approximated.
    tome_r: int = 0

    @classmethod
    def from_hf(cls, hf_cfg, projection_dim=None) -> "CLIPVisionConfig":
        return cls(hidden_size=hf_cfg.hidden_size,
                   num_hidden_layers=hf_cfg.num_hidden_layers,
                   num_attention_heads=hf_cfg.num_attention_heads,
                   intermediate_size=hf_cfg.intermediate_size,
                   image_size=hf_cfg.image_size, patch_size=hf_cfg.patch_size,
                   projection_dim=projection_dim or hf_cfg.projection_dim,
                   layer_norm_eps=hf_cfg.layer_norm_eps)


class _CLIPLayer(nn.Module):
    cfg: CLIPVisionConfig
    precision: object = _PRECISION
    dot_general: object = None  # e.g. ops.quant.int8_dot_general

    @nn.compact
    def __call__(self, x, sizes=None):
        c = self.cfg
        H, nh = c.hidden_size, c.num_attention_heads
        hd = H // nh
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision,
                                         dot_general=self.dot_general)
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name)

        residual = x
        xn = ln("layer_norm1")(x)
        q = dense(H, "q_proj")(xn).reshape(*x.shape[:2], nh, hd) * (hd ** -0.5)
        k = dense(H, "k_proj")(xn).reshape(*x.shape[:2], nh, hd)
        v = dense(H, "v_proj")(xn).reshape(*x.shape[:2], nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, precision=self.precision)
        if sizes is not None:            # ToMe proportional attention
            logits = logits + jnp.log(sizes)[:, None, None, :]
        w = nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=self.precision)
        x = residual + dense(H, "out_proj")(attn.reshape(*x.shape[:2], H))

        if c.tome_r > 0 and sizes is not None:
            from .vit import tome_merge

            r_eff = min(c.tome_r, (x.shape[1] - 1) // 2)
            if r_eff > 0:
                x, sizes = tome_merge(x, k.mean(axis=2), sizes, r_eff, 1)

        residual = x
        xn = ln("layer_norm2")(x)
        h = quick_gelu(dense(c.intermediate_size, "fc1")(xn))
        x = residual + dense(H, "fc2")(h)
        if c.tome_r > 0:
            return x, sizes
        return x


class CLIPVisionEncoder(nn.Module):
    """pixel_values (B, H, W, 3) -> dict(image_embeds, pooled, last_hidden)."""

    cfg: CLIPVisionConfig
    precision: object = _PRECISION
    # quantized dot_general for the transformer-layer Dense sites only (the
    # patch embed and visual projection stay at `precision`)
    dot_general: object = None

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray):
        c = self.cfg
        B = pixel_values.shape[0]
        patches = nn.Conv(c.hidden_size, kernel_size=(c.patch_size, c.patch_size),
                          strides=(c.patch_size, c.patch_size), padding="VALID",
                          use_bias=False, name="patch_embedding",
                          precision=self.precision)(pixel_values)
        patches = patches.reshape(B, -1, c.hidden_size)
        cls_emb = self.param("class_embedding", nn.initializers.zeros, (c.hidden_size,))
        x = jnp.concatenate([jnp.broadcast_to(cls_emb, (B, 1, c.hidden_size)), patches], axis=1)
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.zeros, (n_pos, c.hidden_size))
        x = x + pos[None, : x.shape[1]]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="pre_layernorm")(x)

        sizes = (jnp.ones(x.shape[:2], x.dtype) if c.tome_r > 0 else None)
        for i in range(c.num_hidden_layers):
            out = _CLIPLayer(c, self.precision, self.dot_general,
                             name=f"layer_{i}")(x, sizes)
            x, sizes = out if c.tome_r > 0 else (out, sizes)

        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, name="post_layernorm")(x[:, 0])
        image_embeds = nn.Dense(c.projection_dim, use_bias=False,
                                name="visual_projection",
                                precision=self.precision)(pooled)
        return {"image_embeds": image_embeds, "pooled": pooled, "last_hidden": x}


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_torch_state(cfg: CLIPVisionConfig, sd: dict) -> dict:
    """Map CLIPVisionModelWithProjection (or CLIPModel vision half) weights."""
    pre = "vision_model."

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T, "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}

    p = {
        "class_embedding": _t(sd[f"{pre}embeddings.class_embedding"]),
        "patch_embedding": {
            # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
            "kernel": _t(sd[f"{pre}embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)},
        "position_embedding": _t(sd[f"{pre}embeddings.position_embedding.weight"]),
        "pre_layernorm": ln(f"{pre}pre_layrnorm"),  # sic: HF's typo'd name
        "post_layernorm": ln(f"{pre}post_layernorm"),
        "visual_projection": {"kernel": _t(sd["visual_projection.weight"]).T},
    }
    for i in range(cfg.num_hidden_layers):
        lp = f"{pre}encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "q_proj": dense(f"{lp}.self_attn.q_proj"),
            "k_proj": dense(f"{lp}.self_attn.k_proj"),
            "v_proj": dense(f"{lp}.self_attn.v_proj"),
            "out_proj": dense(f"{lp}.self_attn.out_proj"),
            "layer_norm1": ln(f"{lp}.layer_norm1"),
            "layer_norm2": ln(f"{lp}.layer_norm2"),
            "fc1": dense(f"{lp}.mlp.fc1"),
            "fc2": dense(f"{lp}.mlp.fc2"),
        }
    return jax.tree_util.tree_map(jnp.asarray, p)


def from_hf_torch(model) -> tuple[CLIPVisionConfig, dict]:
    cfg = CLIPVisionConfig.from_hf(model.config)
    return cfg, convert_torch_state(cfg, model.state_dict())
