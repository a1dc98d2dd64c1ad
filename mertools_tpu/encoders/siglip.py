"""SigLIP vision tower in Flax (the reference's ``SigLIP_SO`` frozen encoder).

Backs ``MER2025/MER2025_Track23/my_affectgpt/models/encoder.py:249-282``:
frames -> ``model.vision_model(..., output_hidden_states=True)`` -> take the
**last hidden state** (pre-post-layernorm, i.e. HF ``hidden_states[-1]``) and
mean over all tokens -> (B, hidden) per frame. SigLIP has no CLS token; the
canonical checkpoint is ``siglip-so400m-patch14-384`` (hidden 1152).

Architecture (HF ``SiglipVisionTransformer``):
- patch conv (bias=True, VALID) + learned position embeddings, no CLS,
- pre-LN blocks, full-bias q/k/v/out, MLP with tanh-approximated GELU
  (``gelu_pytorch_tanh``),
- final ``post_layernorm``,
- optional attention-pooling head (``SiglipMultiheadAttentionPoolingHead``):
  a learned probe cross-attends over the tokens (torch
  ``nn.MultiheadAttention`` packed-qkv layout), then LN + residual MLP.

``from_hf_torch`` converts ``SiglipVisionModel`` checkpoints; parity is
enforced in tests/test_vit_family_parity.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    num_layers: int = 27
    num_heads: int = 16
    intermediate_size: int = 4304
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    use_head: bool = True
    # Token Merging (arXiv:2210.09461); SigLIP has no CLS, so nothing is
    # protected and the token-mean feature becomes size-weighted.
    tome_r: int = 0

    @classmethod
    def from_hf(cls, hf_cfg, use_head: bool = True) -> "SiglipVisionConfig":
        return cls(hidden_size=hf_cfg.hidden_size,
                   num_layers=hf_cfg.num_hidden_layers,
                   num_heads=hf_cfg.num_attention_heads,
                   intermediate_size=hf_cfg.intermediate_size,
                   image_size=hf_cfg.image_size, patch_size=hf_cfg.patch_size,
                   layer_norm_eps=hf_cfg.layer_norm_eps, use_head=use_head)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _gelu_tanh(x):
    return nn.gelu(x, approximate=True)


class _SiglipLayer(nn.Module):
    cfg: SiglipVisionConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, sizes=None):
        c = self.cfg
        H, nh = c.hidden_size, c.num_heads
        hd = H // nh
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision)
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

            r_eff = min(c.tome_r, x.shape[1] // 2)
            if r_eff > 0:
                x, sizes = tome_merge(x, k.mean(axis=2), sizes, r_eff, 0)

        residual = x
        xn = ln("layer_norm2")(x)
        h = _gelu_tanh(dense(c.intermediate_size, "fc1")(xn))
        x = residual + dense(H, "fc2")(h)
        if c.tome_r > 0:
            return x, sizes
        return x


class _AttentionPoolHead(nn.Module):
    """SiglipMultiheadAttentionPoolingHead: learned probe -> MHA over tokens
    (torch packed-qkv MultiheadAttention layout) -> LN -> residual MLP."""

    cfg: SiglipVisionConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, tokens):
        c = self.cfg
        H, nh = c.hidden_size, c.num_heads
        hd = H // nh
        B = tokens.shape[0]
        probe = self.param("probe", nn.initializers.zeros, (1, H))
        dense = lambda d, name: nn.Dense(d, name=name, precision=self.precision)

        q = dense(H, "attn_q")(jnp.broadcast_to(probe, (B, 1, H)))
        k = dense(H, "attn_k")(tokens)
        v = dense(H, "attn_v")(tokens)
        q = q.reshape(B, 1, nh, hd) * (hd ** -0.5)
        k = k.reshape(B, -1, nh, hd)
        v = v.reshape(B, -1, nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, precision=self.precision)
        w = nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=self.precision)
        x = dense(H, "attn_out")(attn.reshape(B, 1, H))

        residual = x
        xn = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layernorm")(x)
        h = _gelu_tanh(dense(c.intermediate_size, "fc1")(xn))
        x = residual + dense(H, "fc2")(h)
        return x[:, 0]


class SiglipVisionEncoder(nn.Module):
    """pixel_values (B, H, W, 3) -> dict(last_hidden, post_ln, pooled).

    ``last_hidden`` matches HF ``output_hidden_states=True`` ->
    ``hidden_states[-1]`` (pre post-layernorm) — the tensor the reference
    mean-pools (encoder.py:277-278). ``post_ln`` is the layernormed output;
    ``pooled`` is the attention-pool head output (when configured).
    """

    cfg: SiglipVisionConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray):
        c = self.cfg
        B = pixel_values.shape[0]
        x = nn.Conv(c.hidden_size, kernel_size=(c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embedding",
                    precision=self.precision)(pixel_values)
        x = x.reshape(B, -1, c.hidden_size)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (c.num_patches, c.hidden_size))
        x = x + pos[None, : x.shape[1]]

        sizes = (jnp.ones(x.shape[:2], x.dtype) if c.tome_r > 0 else None)
        for i in range(c.num_layers):
            out = _SiglipLayer(c, self.precision, name=f"layer_{i}")(x, sizes)
            x, sizes = out if c.tome_r > 0 else (out, sizes)

        last_hidden = x
        post_ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                               name="post_layernorm")(x)
        out = {"last_hidden": last_hidden, "post_ln": post_ln}
        if c.tome_r > 0:
            out["sizes"] = sizes
        if c.use_head:
            out["pooled"] = _AttentionPoolHead(c, self.precision,
                                               name="head")(post_ln)
        return out


# ---------------------------------------------------------------------------
# torch converter
# ---------------------------------------------------------------------------


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_torch_state(cfg: SiglipVisionConfig, sd: dict) -> dict:
    """Map ``SiglipVisionModel`` (or the vision half of ``SiglipModel``)
    state-dict to this module's params."""
    pre = "vision_model." if any(k.startswith("vision_model.") for k in sd) \
        else ""

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T,
                "bias": _t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p = {
        "patch_embedding": {
            "kernel": _t(sd[f"{pre}embeddings.patch_embedding.weight"]
                         ).transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{pre}embeddings.patch_embedding.bias"])},
        "position_embedding": _t(
            sd[f"{pre}embeddings.position_embedding.weight"]),
        "post_layernorm": ln(f"{pre}post_layernorm"),
    }
    for i in range(cfg.num_layers):
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
    if cfg.use_head:
        hp = f"{pre}head"
        # torch nn.MultiheadAttention packs qkv: in_proj_weight (3H, H)
        w = _t(sd[f"{hp}.attention.in_proj_weight"])
        b = _t(sd[f"{hp}.attention.in_proj_bias"])
        H = cfg.hidden_size
        p["head"] = {
            "probe": _t(sd[f"{hp}.probe"]).reshape(1, H),
            "attn_q": {"kernel": w[:H].T, "bias": b[:H]},
            "attn_k": {"kernel": w[H:2 * H].T, "bias": b[H:2 * H]},
            "attn_v": {"kernel": w[2 * H:].T, "bias": b[2 * H:]},
            "attn_out": dense(f"{hp}.attention.out_proj"),
            "layernorm": ln(f"{hp}.layernorm"),
            "fc1": dense(f"{hp}.mlp.fc1"),
            "fc2": dense(f"{hp}.mlp.fc2"),
        }
    return jax.tree_util.tree_map(jnp.asarray, p)


def from_hf_torch(model, use_head: bool = True
                  ) -> tuple[SiglipVisionConfig, dict]:
    hf_cfg = getattr(model.config, "vision_config", model.config)
    cfg = SiglipVisionConfig.from_hf(hf_cfg, use_head=use_head)
    return cfg, convert_torch_state(cfg, dict(model.state_dict()))
