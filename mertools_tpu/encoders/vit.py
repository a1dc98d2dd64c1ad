"""Generic ViT encoder family: DINOv2 / data2vec-vision (BEiT) / VideoMAE / EVA-02.

Backs the reference's non-CLIP visual extractors
(``MERBench/feature_extraction/visual/extract_vision_huggingface.py``):
data2vec-vision & DINOv2 take the last hidden state summed/meaned over patch
tokens (``:124-145``; DINOv2 pre-samples 64 frames ``:136``), VideoMAE
resamples 16 frames and mean-pools tubelet tokens (``:147-159``), EVA-02 runs
through timm (``:91-95,161-169``). All four are one architecture family with
switches; this module implements them as a single Flax ViT with:

- 2D patch-conv or 3D tubelet-conv (VideoMAE) embeddings,
- learned / fixed-sinusoid / no absolute position embeddings,
- optional CLS token,
- pre-LN blocks with optional LayerScale (DINOv2/BEiT lambda),
- optional BEiT-style per-layer relative position bias,
- q/v-only bias (BEiT/VideoMAE) or full qkv bias,
- optional rotary position embeddings + SwiGLU (EVA-02-style),
- optional final LayerNorm (DINOv2 yes; BEiT/VideoMAE mean-pool variants no).

Torch->Flax converters cover the HF ``Dinov2Model`` / ``Data2VecVisionModel``
/ ``VideoMAEModel`` checkpoints with <1e-4 parity (see tests).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    # VideoMAE: >0 turns on 3D tubelet embedding over (frames, H, W)
    num_frames: int = 0
    tubelet_size: int = 2
    use_cls_token: bool = True
    pos_embed: str = "learned"          # learned | sincos | none
    layerscale: float = 0.0             # >0: LayerScale init value
    rel_pos_bias: bool = False          # BEiT decomposed relative bias
    qv_bias_only: bool = False          # q,v bias, k bias-free
    use_rope: bool = False              # EVA-02 2D rotary embeddings
    use_swiglu: bool = False            # EVA-02 SwiGLU MLP
    final_layernorm: bool = True
    layer_norm_eps: float = 1e-6
    # Token Merging (ToMe, arXiv:2210.09461): merge r most-similar token
    # pairs after every block's attention — static shapes (N shrinks by a
    # fixed r per layer), so it jits cleanly. Production accelerator for the
    # token-sum/mean extractors; incompatible with per-layer relative bias
    # or rope (position-dependent attention).
    tome_r: int = 0
    arch: str = "dinov2"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        n = self.grid * self.grid
        if self.num_frames:
            n *= self.num_frames // self.tubelet_size
        return n

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_cls_token else 0)


def sinusoid_table(n_pos: int, dim: int) -> np.ndarray:
    """VideoMAE fixed table (modeling_videomae.get_sinusoid_encoding_table)."""
    pos = np.arange(n_pos)[:, None]
    den = np.power(10000.0, 2 * (np.arange(dim) // 2) / dim)
    tab = pos / den
    tab[:, 0::2] = np.sin(tab[:, 0::2])
    tab[:, 1::2] = np.cos(tab[:, 1::2])
    return tab.astype(np.float32)


def beit_relative_position_index(grid: int) -> np.ndarray:
    """BEiT relative position index over (1+N, 1+N) incl. CLS slots
    (modeling_beit.BeitRelativePositionBias.generate_relative_position_index)."""
    num_rel = (2 * grid - 1) ** 2 + 3
    coords = np.stack(np.meshgrid(np.arange(grid), np.arange(grid),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += grid - 1
    rel[:, :, 1] += grid - 1
    rel[:, :, 0] *= 2 * grid - 1
    n = grid * grid
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


def _rope_2d(grid: int, head_dim: int) -> tuple[np.ndarray, np.ndarray]:
    """EVA-02-style 2D axial rotary tables (sin, cos) of shape (N, head_dim)."""
    half = head_dim // 2
    quarter = half // 2
    freqs = 1.0 / (100.0 ** (np.arange(quarter) / quarter))
    ys, xs = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    ang_y = ys.reshape(-1, 1) * freqs[None, :]
    ang_x = xs.reshape(-1, 1) * freqs[None, :]
    ang = np.concatenate([ang_y, ang_x], axis=-1)         # (N, half)
    ang = np.concatenate([ang, ang], axis=-1)             # (N, head_dim)
    return np.sin(ang).astype(np.float32), np.cos(ang).astype(np.float32)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def tome_merge(x, metric, sizes, r: int, n_protected: int):
    """ToMe bipartite soft matching (arXiv:2210.09461 §3): split tokens
    alternately into sets A/B, match each A token to its most similar B
    token (cosine on the attention-key metric), merge the r best-scoring A
    tokens into their matches by size-weighted mean. Fixed r -> static
    output shape (B, N - r, D). The first ``n_protected`` tokens (CLS) are
    never merged."""
    prot_x = x[:, :n_protected]
    xm = x[:, n_protected:]
    m = metric[:, n_protected:]
    sm = sizes[:, n_protected:]
    m = m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + 1e-6)
    a, b = m[:, ::2], m[:, 1::2]
    xa, xb = xm[:, ::2], xm[:, 1::2]
    sa, sb = sm[:, ::2], sm[:, 1::2]

    scores = jnp.einsum("bad,bkd->bak", a, b)
    node_max = scores.max(axis=-1)                    # (B, Na)
    node_idx = scores.argmax(axis=-1)                 # (B, Na) dst in B
    order = jnp.argsort(-node_max, axis=-1)
    merge_src = order[:, :r]
    keep_src = order[:, r:]

    def one(xa_, sa_, xb_, sb_, dsts, msrc, ksrc):
        xa_m = xa_[msrc] * sa_[msrc, None]
        num = (xb_ * sb_[:, None]).at[dsts[msrc]].add(xa_m)
        den = sb_.at[dsts[msrc]].add(sa_[msrc])
        return (xa_[ksrc], sa_[ksrc], num / den[:, None], den)

    xa_k, sa_k, xb_n, sb_n = jax.vmap(one)(xa, sa, xb, sb, node_idx,
                                           merge_src, keep_src)
    out = jnp.concatenate([prot_x, xa_k, xb_n], axis=1)
    out_sizes = jnp.concatenate(
        [sizes[:, :n_protected], sa_k, sb_n], axis=1)
    return out, out_sizes


class _Block(nn.Module):
    cfg: ViTConfig
    precision: object = _PRECISION
    dot_general: object = None  # e.g. ops.quant.int8_dot_general

    @nn.compact
    def __call__(self, x, rel_bias=None, rope=None, sizes=None):
        c = self.cfg
        H, nh = c.hidden_size, c.num_heads
        hd = H // nh
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name)
        dense = lambda d, name, use_bias=True: nn.Dense(
            d, name=name, use_bias=use_bias, precision=self.precision,
            dot_general=self.dot_general)

        residual = x
        xn = ln("norm1")(x)
        q = dense(H, "q")(xn)
        k = dense(H, "k", use_bias=not c.qv_bias_only)(xn)
        v = dense(H, "v")(xn)
        B, N = x.shape[0], x.shape[1]
        q = q.reshape(B, N, nh, hd)
        k = k.reshape(B, N, nh, hd)
        v = v.reshape(B, N, nh, hd)
        if rope is not None:
            sin, cos = rope
            ncls = 1 if c.use_cls_token else 0
            def rot(t):
                head, tail = t[:, :ncls], t[:, ncls:]
                tail = tail * cos[None, :, None, :] + _rotate_half(tail) * sin[None, :, None, :]
                return jnp.concatenate([head, tail], axis=1)
            q, k = rot(q), rot(k)
        logits = jnp.einsum("bqnd,bknd->bnqk", q * (hd ** -0.5), k,
                            precision=self.precision)
        if rel_bias is not None:
            logits = logits + rel_bias[None]
        if sizes is not None:     # ToMe proportional attention (§3)
            logits = logits + jnp.log(sizes)[:, None, None, :]
        w = nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bnqk,bknd->bqnd", w, v, precision=self.precision)
        out = dense(H, "proj")(attn.reshape(B, N, H))
        if c.layerscale > 0:
            out = out * self.param("ls1", nn.initializers.constant(c.layerscale),
                                   (H,))
        x = residual + out

        if c.tome_r > 0 and sizes is not None:
            assert not (c.rel_pos_bias or c.use_rope), \
                "ToMe is incompatible with per-layer positional attention"
            ncls = 1 if c.use_cls_token else 0
            # cap r so the bipartite sets stay non-empty (paper caps at N/2)
            r_eff = min(c.tome_r, (N - ncls) // 2)
            if r_eff > 0:
                metric = k.mean(axis=2)      # attention keys, head-mean
                x, sizes = tome_merge(x, metric, sizes, r_eff, ncls)

        residual = x
        xn = ln("norm2")(x)
        if c.use_swiglu:
            g = dense(c.intermediate_size, "fc1")(xn)
            u = dense(c.intermediate_size, "fc1_gate")(xn)
            h = nn.silu(u) * g
        else:
            h = nn.gelu(dense(c.intermediate_size, "fc1")(xn), approximate=False)
        out = dense(H, "fc2")(h)
        if c.layerscale > 0:
            out = out * self.param("ls2", nn.initializers.constant(c.layerscale),
                                   (H,))
        x = residual + out
        if c.tome_r > 0:
            return x, sizes
        return x


class ViTEncoder(nn.Module):
    """(B, H, W, C) images -> (B, seq, hidden); VideoMAE variant takes
    (B, T, H, W, C) frame stacks."""

    cfg: ViTConfig
    precision: object = _PRECISION
    # quantized dot_general for the transformer-block Dense sites only (the
    # patch embed stays at `precision`)
    dot_general: object = None

    @nn.compact
    def __call__(self, pixels):
        c = self.cfg
        if c.num_frames:
            # tubelet embed: Conv over (T, H, W)
            x = nn.Conv(c.hidden_size,
                        kernel_size=(c.tubelet_size, c.patch_size, c.patch_size),
                        strides=(c.tubelet_size, c.patch_size, c.patch_size),
                        name="patch_embed", precision=self.precision)(pixels)
            x = x.reshape(pixels.shape[0], -1, c.hidden_size)
        else:
            x = nn.Conv(c.hidden_size, kernel_size=(c.patch_size, c.patch_size),
                        strides=(c.patch_size, c.patch_size),
                        name="patch_embed", precision=self.precision)(pixels)
            x = x.reshape(pixels.shape[0], -1, c.hidden_size)

        if c.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros, (c.hidden_size,))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (x.shape[0], 1, c.hidden_size)), x], 1)

        if c.pos_embed == "learned":
            pe = self.param("pos_embed", nn.initializers.normal(0.02),
                            (c.seq_len, c.hidden_size))
            x = x + pe[None]
        elif c.pos_embed == "sincos":
            x = x + jnp.asarray(sinusoid_table(c.num_patches, c.hidden_size))[None]

        rel_index = (beit_relative_position_index(c.grid)
                     if c.rel_pos_bias else None)
        rope = None
        if c.use_rope:
            sin, cos = _rope_2d(c.grid, c.hidden_size // c.num_heads)
            rope = (jnp.asarray(sin), jnp.asarray(cos))

        sizes = (jnp.ones(x.shape[:2], x.dtype) if c.tome_r > 0 else None)
        for i in range(c.num_layers):
            rel_bias = None
            if c.rel_pos_bias:
                table = self.param(f"rel_bias_table_{i}", nn.initializers.zeros,
                                   ((2 * c.grid - 1) ** 2 + 3, c.num_heads))
                rel_bias = table[jnp.asarray(rel_index)].transpose(2, 0, 1)
            out = _Block(c, name=f"block_{i}", precision=self.precision,
                         dot_general=self.dot_general)(x, rel_bias, rope, sizes)
            x, sizes = out if c.tome_r > 0 else (out, sizes)

        if c.final_layernorm:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_norm")(x)
        if c.tome_r > 0:
            # merged tokens carry their size: size-weighted pooling
            # reconstructs sums/means over the ORIGINAL token count
            return x, sizes
        return x


# ---------------------------------------------------------------------------
# canonical configs
# ---------------------------------------------------------------------------


def dinov2_config(hf_cfg=None, **kw) -> ViTConfig:
    if hf_cfg is not None:
        swiglu = bool(getattr(hf_cfg, "use_swiglu_ffn", False))
        inter = int(hf_cfg.hidden_size * hf_cfg.mlp_ratio)
        if swiglu:   # dinov2-giant: HF rounds 2/3 of the MLP dim up to 8
            inter = (int(inter * 2 / 3) + 7) // 8 * 8
        return ViTConfig(
            hidden_size=hf_cfg.hidden_size, num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            intermediate_size=inter, use_swiglu=swiglu,
            image_size=hf_cfg.image_size, patch_size=hf_cfg.patch_size,
            layerscale=hf_cfg.layerscale_value, pos_embed="learned",
            final_layernorm=True, layer_norm_eps=hf_cfg.layer_norm_eps,
            arch="dinov2")
    return ViTConfig(arch="dinov2", patch_size=14, layerscale=1.0, **kw)


def beit_config(hf_cfg=None, **kw) -> ViTConfig:
    """data2vec-vision == BEiT architecture (HF Data2VecVisionModel)."""
    if hf_cfg is not None:
        return ViTConfig(
            hidden_size=hf_cfg.hidden_size, num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            image_size=hf_cfg.image_size, patch_size=hf_cfg.patch_size,
            layerscale=getattr(hf_cfg, "layer_scale_init_value", 0.1),
            pos_embed=("learned" if hf_cfg.use_absolute_position_embeddings
                       else "none"),
            rel_pos_bias=hf_cfg.use_relative_position_bias, qv_bias_only=True,
            final_layernorm=not getattr(hf_cfg, "use_mean_pooling", True),
            layer_norm_eps=hf_cfg.layer_norm_eps, arch="beit")
    return ViTConfig(arch="beit", pos_embed="none", rel_pos_bias=True,
                     qv_bias_only=True, layerscale=0.1, final_layernorm=False,
                     **kw)


def videomae_config(hf_cfg=None, **kw) -> ViTConfig:
    if hf_cfg is not None:
        return ViTConfig(
            hidden_size=hf_cfg.hidden_size, num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            image_size=hf_cfg.image_size, patch_size=hf_cfg.patch_size,
            num_frames=hf_cfg.num_frames, tubelet_size=hf_cfg.tubelet_size,
            use_cls_token=False, pos_embed="sincos",
            qv_bias_only=hf_cfg.qkv_bias,
            final_layernorm=not getattr(hf_cfg, "use_mean_pooling", True),
            layer_norm_eps=hf_cfg.layer_norm_eps, arch="videomae")
    kw.setdefault("num_frames", 16)
    return ViTConfig(arch="videomae", use_cls_token=False,
                     pos_embed="sincos", qv_bias_only=True,
                     final_layernorm=False, **kw)


def eva_clip_g_config(**kw) -> ViTConfig:
    """BLIP-2 / Video-LLaMA EVA-ViT-g (the reference AffectGPT's EVA_CLIP_G
    frozen encoder, ``my_affectgpt/models/eva_vit.py:389-402``): patch 14,
    1408 hidden x 39 layers x 16 heads, mlp 6144 (ratio 4.3637), q/v-only
    bias (k bias frozen at zero, eva_vit.py:76-122), learned abs pos embed
    with CLS, **no final layernorm** (forward_features returns raw block
    output; AffectGPT applies its own ``ln_vision``)."""
    kw.setdefault("hidden_size", 1408)
    kw.setdefault("num_layers", 39)
    kw.setdefault("num_heads", 16)
    kw.setdefault("intermediate_size", int(kw["hidden_size"] * 4.3637))
    kw.setdefault("patch_size", 14)
    return ViTConfig(arch="eva_clip_g", qv_bias_only=True,
                     final_layernorm=False, layer_norm_eps=1e-6, **kw)


def eva02_config(**kw) -> ViTConfig:
    """EVA-02 structure (timm ``eva02_*``): rotary + SwiGLU, no torch oracle
    in this environment — structural implementation, reference
    ``extract_vision_huggingface.py:91-95`` runs it through timm."""
    return ViTConfig(arch="eva02", patch_size=14, use_rope=True,
                     use_swiglu=True, final_layernorm=True, **kw)


# ---------------------------------------------------------------------------
# torch converters
# ---------------------------------------------------------------------------


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _conv_hwio(w):  # torch OIHW -> flax HWIO
    return _t(w).transpose(2, 3, 1, 0)


def _conv3d(w):     # torch OIDHW -> flax DHWIO
    return _t(w).transpose(2, 3, 4, 1, 0)


def _dense(w):
    return _t(w).T


def _block_params(cfg, get, i, prefix, names) -> dict:
    """names: dict with keys q,k,v,proj,fc1,fc2,norm1,norm2[,ls1,ls2,fc1_gate]"""
    p = {
        "norm1": {"scale": _t(get(f"{prefix}.{names['norm1']}.weight")),
                  "bias": _t(get(f"{prefix}.{names['norm1']}.bias"))},
        "norm2": {"scale": _t(get(f"{prefix}.{names['norm2']}.weight")),
                  "bias": _t(get(f"{prefix}.{names['norm2']}.bias"))},
        "q": {"kernel": _dense(get(f"{prefix}.{names['q']}.weight"))},
        "k": {"kernel": _dense(get(f"{prefix}.{names['k']}.weight"))},
        "v": {"kernel": _dense(get(f"{prefix}.{names['v']}.weight"))},
        "proj": {"kernel": _dense(get(f"{prefix}.{names['proj']}.weight")),
                 "bias": _t(get(f"{prefix}.{names['proj']}.bias"))},
        "fc1": {"kernel": _dense(get(f"{prefix}.{names['fc1']}.weight")),
                "bias": _t(get(f"{prefix}.{names['fc1']}.bias"))},
        "fc2": {"kernel": _dense(get(f"{prefix}.{names['fc2']}.weight")),
                "bias": _t(get(f"{prefix}.{names['fc2']}.bias"))},
    }
    qb = get(f"{prefix}.{names['q']}.bias", optional=True)
    if qb is not None:
        p["q"]["bias"] = _t(qb)
    vb = get(f"{prefix}.{names['v']}.bias", optional=True)
    if vb is not None:
        p["v"]["bias"] = _t(vb)
    if not cfg.qv_bias_only:
        kb = get(f"{prefix}.{names['k']}.bias", optional=True)
        if kb is not None:
            p["k"]["bias"] = _t(kb)
    if cfg.layerscale > 0:
        p["ls1"] = _t(get(f"{prefix}.{names['ls1']}"))
        p["ls2"] = _t(get(f"{prefix}.{names['ls2']}"))
    return p


def _getter(sd):
    def get(key, optional=False):
        if key in sd:
            return sd[key]
        if optional:
            return None
        raise KeyError(key)
    return get


def from_hf_dinov2(model) -> tuple[ViTConfig, dict]:
    cfg = dinov2_config(model.config)
    sd = dict(model.state_dict())
    get = _getter(sd)
    params = {
        "patch_embed": {
            "kernel": _conv_hwio(get("embeddings.patch_embeddings.projection.weight")),
            "bias": _t(get("embeddings.patch_embeddings.projection.bias"))},
        "cls_token": _t(get("embeddings.cls_token")).reshape(-1),
        "pos_embed": _t(get("embeddings.position_embeddings"))[0],
        "final_norm": {"scale": _t(get("layernorm.weight")),
                       "bias": _t(get("layernorm.bias"))},
    }
    names = dict(norm1="norm1", norm2="norm2",
                 q="attention.attention.query", k="attention.attention.key",
                 v="attention.attention.value", proj="attention.output.dense",
                 fc1="mlp.fc1", fc2="mlp.fc2",
                 ls1="layer_scale1.lambda1", ls2="layer_scale2.lambda1")
    if cfg.use_swiglu:   # dinov2-giant SwiGLUFFN: weights_in packs both
        names.update(fc1="mlp.weights_in", fc2="mlp.weights_out")
    for i in range(cfg.num_layers):
        bp = _block_params(cfg, get, i, f"encoder.layer.{i}", names)
        if cfg.use_swiglu:
            # HF: x1, x2 = chunk(weights_in(x)); silu(x1) * x2
            # ours: silu(fc1_gate(x)) * fc1(x)  ->  gate <- x1, fc1 <- x2
            kin, bin_ = bp["fc1"]["kernel"], bp["fc1"]["bias"]
            half = kin.shape[1] // 2
            bp["fc1_gate"] = {"kernel": kin[:, :half], "bias": bin_[:half]}
            bp["fc1"] = {"kernel": kin[:, half:], "bias": bin_[half:]}
        params[f"block_{i}"] = bp
    return cfg, params


def from_hf_beit(model) -> tuple[ViTConfig, dict]:
    """HF Data2VecVisionModel / BeitModel (identical structure)."""
    cfg = beit_config(model.config)
    sd = dict(model.state_dict())
    get = _getter(sd)
    params = {
        "patch_embed": {
            "kernel": _conv_hwio(get("embeddings.patch_embeddings.projection.weight")),
            "bias": _t(get("embeddings.patch_embeddings.projection.bias"))},
        "cls_token": _t(get("embeddings.cls_token")).reshape(-1),
    }
    if cfg.final_layernorm:
        params["final_norm"] = {"scale": _t(get("layernorm.weight")),
                                "bias": _t(get("layernorm.bias"))}
    names = dict(norm1="layernorm_before", norm2="layernorm_after",
                 q="attention.attention.query", k="attention.attention.key",
                 v="attention.attention.value", proj="attention.output.dense",
                 fc1="intermediate.dense", fc2="output.dense",
                 ls1="lambda_1", ls2="lambda_2")
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        params[f"block_{i}"] = _block_params(cfg, get, i, pre, names)
        if cfg.rel_pos_bias:
            params[f"rel_bias_table_{i}"] = _t(get(
                f"{pre}.attention.attention.relative_position_bias."
                "relative_position_bias_table"))
    return cfg, params


def from_hf_videomae(model) -> tuple[ViTConfig, dict]:
    cfg = videomae_config(model.config)
    sd = dict(model.state_dict())
    get = _getter(sd)
    params = {
        "patch_embed": {
            "kernel": _conv3d(get("embeddings.patch_embeddings.projection.weight")),
            "bias": _t(get("embeddings.patch_embeddings.projection.bias"))},
    }
    if cfg.final_layernorm:
        params["final_norm"] = {"scale": _t(get("layernorm.weight")),
                                "bias": _t(get("layernorm.bias"))}
    names = dict(norm1="layernorm_before", norm2="layernorm_after",
                 q="attention.attention.query", k="attention.attention.key",
                 v="attention.attention.value", proj="attention.output.dense",
                 fc1="intermediate.dense", fc2="output.dense")
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        blk = _block_params(cfg, get, i, pre, names)
        # VideoMAE keeps q/v biases as separate parameters (modeling_videomae
        # VideoMAESelfAttention.q_bias/v_bias), not on the Linear modules.
        qb = get(f"{pre}.attention.attention.q_bias", optional=True)
        vb = get(f"{pre}.attention.attention.v_bias", optional=True)
        if qb is not None:
            blk["q"]["bias"] = _t(qb)
        if vb is not None:
            blk["v"]["bias"] = _t(vb)
        params[f"block_{i}"] = blk
    return cfg, params


def from_eva_clip_g_checkpoint(sd: dict, cfg: ViTConfig | None = None
                               ) -> tuple[ViTConfig, dict]:
    """Convert a BLIP-2 ``eva_vit_g.pth`` state dict (timm-style naming:
    ``patch_embed.proj / cls_token / pos_embed / blocks.N.{norm1,norm2,attn.
    {qkv,q_bias,v_bias,proj},mlp.{fc1,fc2}}``; packed bias-free qkv with
    separate q/v bias params, eva_vit.py:76-124)."""
    if cfg is None:
        n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                           if k.startswith("blocks."))
        H = _t(sd["cls_token"]).shape[-1]
        inter = _t(sd["blocks.0.mlp.fc1.weight"]).shape[0]
        n_pos = _t(sd["pos_embed"]).shape[1]
        patch = _t(sd["patch_embed.proj.weight"]).shape[-1]
        grid = int(np.sqrt(n_pos - 1))
        cfg = eva_clip_g_config(hidden_size=H, num_layers=n_layers,
                                intermediate_size=inter,
                                image_size=grid * patch, patch_size=patch)
    H = cfg.hidden_size
    params = {
        "patch_embed": {"kernel": _conv_hwio(sd["patch_embed.proj.weight"]),
                        "bias": _t(sd["patch_embed.proj.bias"])},
        "cls_token": _t(sd["cls_token"]).reshape(-1),
        "pos_embed": _t(sd["pos_embed"])[0],
    }
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        qkv = _t(sd[f"{pre}.attn.qkv.weight"])
        blk = {
            "norm1": {"scale": _t(sd[f"{pre}.norm1.weight"]),
                      "bias": _t(sd[f"{pre}.norm1.bias"])},
            "norm2": {"scale": _t(sd[f"{pre}.norm2.weight"]),
                      "bias": _t(sd[f"{pre}.norm2.bias"])},
            "q": {"kernel": qkv[:H].T, "bias": _t(sd[f"{pre}.attn.q_bias"])},
            "k": {"kernel": qkv[H:2 * H].T},
            "v": {"kernel": qkv[2 * H:].T,
                  "bias": _t(sd[f"{pre}.attn.v_bias"])},
            "proj": {"kernel": _dense(sd[f"{pre}.attn.proj.weight"]),
                     "bias": _t(sd[f"{pre}.attn.proj.bias"])},
            "fc1": {"kernel": _dense(sd[f"{pre}.mlp.fc1.weight"]),
                    "bias": _t(sd[f"{pre}.mlp.fc1.bias"])},
            "fc2": {"kernel": _dense(sd[f"{pre}.mlp.fc2.weight"]),
                    "bias": _t(sd[f"{pre}.mlp.fc2.bias"])},
        }
        params[f"block_{i}"] = blk
    return cfg, jax.tree_util.tree_map(jnp.asarray, params)
