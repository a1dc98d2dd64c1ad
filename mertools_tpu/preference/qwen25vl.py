"""Qwen2.5-VL zero-shot wrapper — runnable video judge/baseline model.

Reference: ``MER2026/MER2026_Track3/utils/qwen25vl.py`` (batched HF
``Qwen2_5_VLForConditionalGeneration`` calling: 1 fps video sampling,
``max_pixels=360*420``, left-padded batches, max_new_tokens=512).

TPU-native re-design:
  * the windowed ViT runs as ONE packed sequence per batch (all clips'
    patches concatenated, exactly HF's cu_seqlens packing) under jit at
    bucketed static lengths; window / full attention block-diagonality is
    expressed with SEGMENT IDS (bias = seg_q != seg_k), the shuffle to
    window order and the merge-unit reordering are host-side numpy index
    computations (they depend only on grid_thw);
  * M-RoPE (3-D t/h/w rotary, ``mrope_section`` frequency banding) runs in
    the shared LLM stack (mllm/llm.rotary + mllm/generate) — one
    implementation serves training, parity and KV-cached decoding;
  * video features are spliced at the ``<|video_pad|>`` positions and
    decoding rides the shared batched engine.

Conversion from the HF checkpoint (``model.visual.* /
model.language_model.* / lm_head``) is exact — parity-tested against the
torch oracle in ``tests/test_qwen25vl.py`` (tower, full-model logits,
greedy generation, get_rope_index).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..mllm.llm import LLM, LLMConfig
from ..mllm.llm import convert_torch_state as convert_llm_state

_PRECISION = jax.lax.Precision.HIGHEST

# Qwen2-VL image normalization (OPENAI_CLIP_MEAN/STD,
# image_processing_qwen2_vl.py defaults)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class VisionConfig:
    """Qwen2_5_VLVisionConfig equivalent."""

    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    out_hidden_size: int = 3584
    tokens_per_second: int = 2

    @classmethod
    def from_hf(cls, hf):
        return cls(depth=hf.depth, hidden_size=hf.hidden_size,
                   intermediate_size=hf.intermediate_size,
                   num_heads=hf.num_heads, in_channels=hf.in_channels,
                   patch_size=hf.patch_size,
                   temporal_patch_size=hf.temporal_patch_size,
                   spatial_merge_size=hf.spatial_merge_size,
                   window_size=hf.window_size,
                   fullatt_block_indexes=tuple(hf.fullatt_block_indexes),
                   out_hidden_size=hf.out_hidden_size,
                   tokens_per_second=getattr(hf, "tokens_per_second", 2))

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2

    @property
    def patch_dim(self) -> int:
        return (self.in_channels * self.temporal_patch_size
                * self.patch_size ** 2)


# ---------------------------------------------------------------------------
# host-side geometry (numpy ports of the HF index computations)
# ---------------------------------------------------------------------------
def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> tuple[int, int]:
    """image_processing_qwen2_vl.smart_resize: round to multiples of
    ``factor`` keeping the pixel count within [min_pixels, max_pixels]."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio > 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def patchify(frames: np.ndarray, cfg: VisionConfig
             ) -> tuple[np.ndarray, tuple[int, int, int]]:
    """(T, H, W, C) float frames (already resized+normalized) -> flattened
    patches (S, C*tp*ps*ps) in the HF ordering
    (image_processing_qwen2_vl._preprocess patch reshape) + grid_thw."""
    ps, tp, ms = cfg.patch_size, cfg.temporal_patch_size, cfg.spatial_merge_size
    x = frames.transpose(0, 3, 1, 2)  # (T, C, H, W)
    if x.shape[0] % tp:
        reps = np.repeat(x[-1:], tp - x.shape[0] % tp, axis=0)
        x = np.concatenate([x, reps], axis=0)
    C, H, W = x.shape[1:]
    gt, gh, gw = x.shape[0] // tp, H // ps, W // ps
    x = x.reshape(gt, tp, C, gh // ms, ms, ps, gw // ms, ms, ps)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(gt * gh * gw, C * tp * ps * ps), (gt, gh, gw)


def rot_pos_ids(grid_thw: np.ndarray, merge_size: int) -> np.ndarray:
    """(S, 2) h/w position ids in merge-block order
    (Qwen2_5_VisionTransformerPretrainedModel.rot_pos_emb)."""
    out = []
    for t, h, w in grid_thw:
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w))

        def blocked(a):
            a = a.reshape(h // merge_size, merge_size,
                          w // merge_size, merge_size)
            return a.transpose(0, 2, 1, 3).reshape(-1)

        pair = np.stack([blocked(hp), blocked(wp)], axis=-1)
        out.append(np.tile(pair, (t, 1)))
    return np.concatenate(out, axis=0)


def window_index(grid_thw: np.ndarray, cfg: VisionConfig
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(window_index over merge units, cu_window_seqlens over patches) —
    numpy port of get_window_index."""
    ms = cfg.spatial_merge_size
    unit = cfg.merge_unit
    vws = cfg.window_size // ms // cfg.patch_size
    idx_out, cu = [], [0]
    base = 0
    for t, h, w in grid_thw:
        lh, lw = h // ms, w // ms
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        # HF pads by (vws - llm_grid % vws) even when already divisible —
        # the extra all -100 windows produce zero-length seqlens that
        # unique_consecutive collapses later.
        pad_h, pad_w = vws - lh % vws, vws - lw % vws
        nh, nw = (lh + pad_h) // vws, (lw + pad_w) // vws
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = index
        padded = padded.reshape(t, nh, vws, nw, vws)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(t, nh * nw, vws, vws)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        keep = flat[flat != -100]
        idx_out.append(keep + base)
        cu.extend((np.cumsum(seqlens) * unit + cu[-1]).tolist())
        base += int(t * lh * lw)
    wi = np.concatenate(idx_out)
    cu = np.asarray(cu, np.int64)
    # unique_consecutive
    keep = np.ones(len(cu), bool)
    keep[1:] = cu[1:] != cu[:-1]
    return wi, cu[keep]


def _segments_from_cu(cu: np.ndarray, total: int) -> np.ndarray:
    """cu_seqlens -> per-patch segment ids (padding gets a fresh id)."""
    seg = np.full(total, len(cu), np.int32)
    for i in range(len(cu) - 1):
        seg[cu[i]: cu[i + 1]] = i
    return seg


def get_rope_index(input_ids: np.ndarray, attention_mask: np.ndarray,
                   video_grid_thw: np.ndarray | None, cfg: VisionConfig,
                   video_token_id: int, vision_start_token_id: int,
                   image_grid_thw: np.ndarray | None = None,
                   image_token_id: int = -1,
                   second_per_grid_ts=None) -> np.ndarray:
    """(B, S, 3) M-RoPE position ids — numpy port of
    Qwen2_5_VLModel.get_rope_index (right-pad aware; text spans advance all
    components, vision spans use (t*spgt*tokens_per_second, h, w) grids)."""
    B, S = input_ids.shape
    pos = np.zeros((B, S, 3), np.int32)
    vid_i = img_i = 0
    for b in range(B):
        valid = attention_mask[b] > 0
        ids = input_ids[b][valid].tolist()
        chunks = []
        st = 0
        starts = [i for i, t in enumerate(ids) if t == vision_start_token_id]
        for s in starts:
            if s + 1 >= len(ids):
                continue
            vtok = ids[s + 1]
            if vtok == video_token_id:
                t, h, w = video_grid_thw[vid_i]
                spgt = (1.0 if second_per_grid_ts is None
                        else float(second_per_grid_ts[vid_i]))
                vid_i += 1
            elif vtok == image_token_id:
                t, h, w = image_grid_thw[img_i]
                spgt = 0.0
                img_i += 1
            else:
                continue
            ed = s + 1
            lt, lh, lw = int(t), int(h) // cfg.spatial_merge_size, \
                int(w) // cfg.spatial_merge_size
            text_len = ed - st
            st_idx = (chunks[-1].max() + 1) if chunks else 0
            chunks.append(np.broadcast_to(
                np.arange(text_len)[None], (3, text_len)) + st_idx)
            t_idx = (np.repeat(np.arange(lt), lh * lw).astype(np.float64)
                     * spgt * cfg.tokens_per_second).astype(np.int64)
            h_idx = np.tile(np.repeat(np.arange(lh), lw), lt)
            w_idx = np.tile(np.arange(lw), lt * lh)
            chunks.append(np.stack([t_idx, h_idx, w_idx]) + text_len + st_idx)
            st = ed + lt * lh * lw
        if st < len(ids):
            st_idx = (chunks[-1].max() + 1) if chunks else 0
            n = len(ids) - st
            chunks.append(np.broadcast_to(np.arange(n)[None], (3, n)) + st_idx)
        got = np.concatenate(chunks, axis=1).T  # (n_valid, 3)
        pos[b, valid] = got.astype(np.int32)
    return pos


# ---------------------------------------------------------------------------
# vision tower (Flax)
# ---------------------------------------------------------------------------
class _RMS(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * w


class _VisionBlock(nn.Module):
    cfg: VisionConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x, cos, sin, seg):
        c = self.cfg
        nh, hd = c.num_heads, c.head_dim
        S = x.shape[0]
        xn = _RMS(name="norm1")(x)
        qkv = nn.Dense(3 * c.hidden_size, name="qkv",
                       precision=self.precision)(xn)
        q, k, v = [t.reshape(S, nh, hd)
                   for t in jnp.split(qkv, 3, axis=-1)]

        def rope(t):
            t32 = t.astype(jnp.float32)
            t1, t2 = t32[..., : hd // 2], t32[..., hd // 2:]
            rot = jnp.concatenate([-t2, t1], axis=-1)
            return (t32 * cos[:, None] + rot * sin[:, None]).astype(t.dtype)

        q, k = rope(q), rope(k)
        logits = jnp.einsum("qnd,knd->nqk", q, k,
                            precision=self.precision) / np.sqrt(hd)
        bias = jnp.where(seg[:, None] == seg[None, :], 0.0, -1e30)
        w = jax.nn.softmax((logits + bias[None]).astype(jnp.float32),
                           axis=-1).astype(x.dtype)
        att = jnp.einsum("nqk,knd->qnd", w, v, precision=self.precision)
        x = x + nn.Dense(c.hidden_size, name="proj",
                         precision=self.precision)(att.reshape(S, -1))

        xn = _RMS(name="norm2")(x)
        g = nn.Dense(c.intermediate_size, name="gate_proj",
                     precision=self.precision)(xn)
        u = nn.Dense(c.intermediate_size, name="up_proj",
                     precision=self.precision)(xn)
        return x + nn.Dense(c.hidden_size, name="down_proj",
                            precision=self.precision)(jax.nn.silu(g) * u)


class Qwen25VLVisionTower(nn.Module):
    """Packed-sequence windowed ViT. Inputs are already in window order
    (host-side shuffle); ``seg_full``/``seg_win`` carry the block-diagonal
    attention structure; ``ang`` is the (S, head_dim/2) rotary angle table
    ([h-freqs | w-freqs])."""

    cfg: VisionConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, patches, ang, seg_full, seg_win):
        c = self.cfg
        kernel = self.param("patch_embed",
                            nn.initializers.lecun_normal(),
                            (c.patch_dim, c.hidden_size))
        x = jnp.einsum("sd,dh->sh", patches, kernel,
                       precision=self.precision)
        emb = jnp.concatenate([ang, ang], axis=-1)
        cos, sin = jnp.cos(emb), jnp.sin(emb)
        for i in range(c.depth):
            seg = seg_full if i in c.fullatt_block_indexes else seg_win
            x = _VisionBlock(c, self.precision, name=f"block_{i}")(
                x, cos, sin, seg)
        x = _RMS(name="ln_q")(x)
        x = x.reshape(-1, c.merge_unit * c.hidden_size)
        h = nn.Dense(c.merge_unit * c.hidden_size, name="mlp0",
                     precision=self.precision)(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(c.out_hidden_size, name="mlp2",
                        precision=self.precision)(h)


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------
def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_qwen25vl_visual(vcfg: VisionConfig, sd: dict,
                            pre: str = "") -> dict:
    """The vision-tower subtree ({pre}visual.*) — shared with Qwen2.5-Omni
    (its Qwen2_5OmniVisionEncoder is structurally identical)."""

    def dense(prefix):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if f"{prefix}.bias" in sd:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    vis: dict = {
        "patch_embed": _t(sd[f"{pre}visual.patch_embed.proj.weight"]
                          ).reshape(vcfg.hidden_size, -1).T,
        "ln_q": {"weight": _t(sd[f"{pre}visual.merger.ln_q.weight"])},
        "mlp0": dense(f"{pre}visual.merger.mlp.0"),
        "mlp2": dense(f"{pre}visual.merger.mlp.2"),
    }
    def qkv(b):
        if f"{b}.attn.qkv.weight" in sd:
            return dense(f"{b}.attn.qkv")
        # Qwen2.5-Omni names the same projections separately (attn.q/k/v)
        return {"kernel": np.concatenate(
            [_t(sd[f"{b}.attn.{n}.weight"]).T for n in "qkv"], axis=1),
            "bias": np.concatenate(
            [_t(sd[f"{b}.attn.{n}.bias"]) for n in "qkv"])}

    for i in range(vcfg.depth):
        b = f"{pre}visual.blocks.{i}"
        vis[f"block_{i}"] = {
            "norm1": {"weight": _t(sd[f"{b}.norm1.weight"])},
            "norm2": {"weight": _t(sd[f"{b}.norm2.weight"])},
            "qkv": qkv(b),
            "proj": dense(f"{b}.attn.proj"),
            "gate_proj": dense(f"{b}.mlp.gate_proj"),
            "up_proj": dense(f"{b}.mlp.up_proj"),
            "down_proj": dense(f"{b}.mlp.down_proj"),
        }
    return jax.tree_util.tree_map(jnp.asarray, vis)


def convert_qwen25vl_state(vcfg: VisionConfig, lcfg: LLMConfig,
                           sd: dict) -> dict:
    pre = "model." if any(k.startswith("model.visual.") for k in sd) else ""
    lsd = {k[len(f"{pre}language_model."):]: v for k, v in sd.items()
           if k.startswith(f"{pre}language_model.")}
    if "lm_head.weight" in sd:
        lsd["lm_head.weight"] = sd["lm_head.weight"]
    return {"visual": convert_qwen25vl_visual(vcfg, sd, pre),
            "llm": convert_llm_state(lcfg, lsd)}


# ---------------------------------------------------------------------------
# model wrapper
# ---------------------------------------------------------------------------
class Qwen25VL:
    def __init__(self, vcfg: VisionConfig, lcfg: LLMConfig, params: dict,
                 video_token_id: int, vision_start_token_id: int,
                 image_token_id: int = -1):
        self.vcfg, self.lcfg = vcfg, lcfg
        self.params = params
        self.video_token_id = video_token_id
        self.vision_start_token_id = vision_start_token_id
        self.image_token_id = image_token_id
        self._tower = Qwen25VLVisionTower(vcfg)
        self._llm = LLM(lcfg)
        self._encode = jax.jit(
            lambda p, *a: self._tower.apply({"params": p["visual"]}, *a))
        self._forward = jax.jit(
            lambda p, emb, mask, pos: self._llm.apply(
                {"params": p["llm"]}, emb, attention_mask=mask,
                positions=pos))

    @classmethod
    def from_hf_torch(cls, hf_model) -> "Qwen25VL":
        cfg = hf_model.config
        vcfg = VisionConfig.from_hf(cfg.vision_config)
        lcfg = LLMConfig.from_hf(cfg.text_config)
        params = convert_qwen25vl_state(vcfg, lcfg, hf_model.state_dict())
        return cls(vcfg, lcfg, params, cfg.video_token_id,
                   cfg.vision_start_token_id, cfg.image_token_id)

    def encode_patches(self, patches: np.ndarray,
                       grid_thw: np.ndarray) -> np.ndarray:
        """Packed patches (S, patch_dim) + grid_thw (N, 3) -> merged
        features (S/merge_unit, out_hidden) in the ORIGINAL patch order
        (window shuffle + argsort unshuffle are host-side)."""
        c = self.vcfg
        S = len(patches)
        assert S % c.merge_unit == 0
        ang = rot_pos_ids(grid_thw, c.spatial_merge_size)  # (S, 2)
        hd4 = c.head_dim // 4
        inv = 1.0 / (10000.0 ** (np.arange(hd4, dtype=np.float32) / hd4))
        ang = np.concatenate([ang[:, :1] * inv, ang[:, 1:] * inv],
                             axis=-1)  # (S, head_dim/2)

        wi, cu_win = window_index(grid_thw, c)
        cu_full = np.concatenate(
            [[0], np.cumsum(np.repeat(grid_thw[:, 1] * grid_thw[:, 2],
                                      grid_thw[:, 0]))])
        # shuffle to window order at merge-unit granularity
        shuf = (wi[:, None] * c.merge_unit
                + np.arange(c.merge_unit)[None]).reshape(-1)
        seg_full = _segments_from_cu(cu_full, S)[shuf]
        seg_win = _segments_from_cu(cu_win, S)
        out = np.asarray(self._encode(
            self.params, jnp.asarray(patches[shuf]), jnp.asarray(ang[shuf]),
            jnp.asarray(seg_full), jnp.asarray(seg_win)))
        return out[np.argsort(wi)]

    def splice_embeds(self, input_ids: np.ndarray,
                      feats: np.ndarray) -> np.ndarray:
        """feats rows fill video/image token positions in order across the
        whole batch (HF masked-scatter semantics over the packed vision
        sequence)."""
        table = np.asarray(self.params["llm"]["embed_tokens"]["embedding"])
        emb = table[input_ids].astype(np.float32)
        vis = ((input_ids == self.video_token_id)
               | (input_ids == self.image_token_id))
        used = 0
        for b in range(input_ids.shape[0]):
            pos = np.where(vis[b])[0]
            emb[b, pos] = feats[used: used + len(pos)]
            used += len(pos)
        assert used == len(feats), (used, len(feats))
        return emb

    def forward_logits(self, input_ids, attention_mask, patches, grid_thw,
                       second_per_grid_ts=None) -> np.ndarray:
        feats = self.encode_patches(patches, grid_thw)
        emb = self.splice_embeds(input_ids, feats)
        pos = get_rope_index(input_ids, attention_mask, grid_thw, self.vcfg,
                             self.video_token_id, self.vision_start_token_id,
                             second_per_grid_ts=second_per_grid_ts)
        return np.asarray(self._forward(self.params, jnp.asarray(emb),
                                        jnp.asarray(attention_mask),
                                        jnp.asarray(pos)))

    def generate_batch(self, ids_list, patches, grid_thw, tokenizer, *,
                       second_per_grid_ts=None, max_new_tokens: int = 512,
                       temperature: float = 0.0, top_p: float = 0.9,
                       prng_key=None) -> list[str]:
        from ..mllm.generate import bucket_len, generate

        B = len(ids_list)
        S = bucket_len(max(len(x) for x in ids_list))
        ids = np.zeros((B, S), np.int32)
        mask = np.zeros((B, S), np.int32)
        for i, x in enumerate(ids_list):
            ids[i, : len(x)] = x
            mask[i, : len(x)] = 1
        feats = self.encode_patches(patches, grid_thw)
        emb = self.splice_embeds(ids, feats)
        pos = get_rope_index(ids, mask, grid_thw, self.vcfg,
                             self.video_token_id, self.vision_start_token_id,
                             second_per_grid_ts=second_per_grid_ts)
        eos = tokenizer.eos_token_id
        toks = np.asarray(generate(
            self.lcfg, self.params["llm"], jnp.asarray(emb), jnp.asarray(mask),
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, eos_token_id=eos if eos is not None else -1,
            prng_key=prng_key, positions=jnp.asarray(pos)))
        out = []
        for row in toks:
            stop = np.where(row == eos)[0] if eos is not None else []
            row = row[: stop[0]] if len(stop) else row
            out.append(tokenizer.decode(row, skip_special_tokens=True))
        return out


class Qwen25VLCaller:
    """Reference-compatible wrapper (utils/qwen25vl.py): 1 fps frame
    sampling, ``max_pixels=360*420`` smart resize, batched generation.
    Implements ``func_calling_sample`` and the batched
    ``caller(samples, prompts)`` protocol (samples carry ``frames``
    (T, H, W, 3) uint8 RGB arrays or ``video_path``)."""

    VIDEO_PAD = "<|video_pad|>"
    VISION_START, VISION_END = "<|vision_start|>", "<|vision_end|>"

    def __init__(self, model_path: str | None = None, *, model=None,
                 tokenizer=None, batch: int = 8, max_new_tokens: int = 512,
                 max_pixels: int = 360 * 420, fps: float = 1.0,
                 chat_template: str | None = None):
        if model is None:
            from transformers import (AutoProcessor,
                                      Qwen2_5_VLForConditionalGeneration)

            hf = Qwen2_5_VLForConditionalGeneration.from_pretrained(model_path)
            model = Qwen25VL.from_hf_torch(hf)
            del hf
            proc = AutoProcessor.from_pretrained(model_path)
            tokenizer = proc.tokenizer
            chat_template = chat_template or getattr(proc, "chat_template",
                                                     None)
        self.model = model
        self.tok = tokenizer
        self.batch = batch
        self.max_new_tokens = max_new_tokens
        self.max_pixels = max_pixels
        self.fps = fps
        self.chat_template = chat_template

    def _load_frames(self, sample: dict) -> np.ndarray:
        if "frames" in sample:
            return np.asarray(sample["frames"])
        from ..io import video as vio

        info = vio.video_info(sample["video_path"])
        frames = vio.decode_frames(sample["video_path"])
        src_fps = info.get("fps", 25.0) or 25.0
        # 1 fps sampling, even count (qwen_vl_utils smart_nframes)
        n = max(2, int(round(len(frames) / src_fps * self.fps / 2)) * 2)
        idx = np.linspace(0, len(frames) - 1, min(n, len(frames))
                          ).round().astype(int)
        return frames[idx]

    def preprocess_video(self, frames: np.ndarray
                         ) -> tuple[np.ndarray, tuple[int, int, int], float]:
        """uint8 RGB frames -> (patches, grid_thw, second_per_grid_t)."""
        c = self.model.vcfg
        T, H, W = frames.shape[:3]
        factor = c.patch_size * c.spatial_merge_size
        h, w = smart_resize(H, W, factor, max_pixels=self.max_pixels)
        from ..ops.image import resize_separable

        x = frames.astype(np.float32) / 255.0
        x = np.asarray(resize_separable(jnp.asarray(x), h, w))
        x = (x - IMAGE_MEAN) / IMAGE_STD
        patches, grid = patchify(x, c)
        return patches, grid, c.temporal_patch_size / self.fps

    def prompt_ids(self, prompt: str, grid: tuple[int, int, int]
                   ) -> np.ndarray:
        n_tok = int(np.prod(grid)) // self.model.vcfg.merge_unit
        conv = [{"role": "user", "content": [
            {"type": "video", "video": "local"},
            {"type": "text", "text": prompt}]}]
        if self.chat_template:
            text = self.tok.apply_chat_template(
                conv, chat_template=self.chat_template,
                add_generation_prompt=True, tokenize=False)
        else:
            text = (f"{self.VISION_START}{self.VIDEO_PAD}{self.VISION_END}"
                    f"{prompt}")
        text = text.replace(self.VIDEO_PAD, self.VIDEO_PAD * n_tok, 1)
        return np.asarray(self.tok(text).input_ids, np.int32)

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        out: list[str] = [""] * len(samples)
        for i in range(0, len(samples), self.batch):
            grp = list(range(i, min(i + self.batch, len(samples))))
            packed, grids, spgts, ids = [], [], [], []
            for j in grp:
                frames = self._load_frames(samples[j])
                patches, grid, spgt = self.preprocess_video(frames)
                packed.append(patches)
                grids.append(grid)
                spgts.append(spgt)
                ids.append(self.prompt_ids(prompts[j], grid))
            texts = self.model.generate_batch(
                ids, np.concatenate(packed), np.asarray(grids), self.tok,
                second_per_grid_ts=np.asarray(spgts),
                max_new_tokens=self.max_new_tokens)
            for j, t in zip(grp, texts):
                out[j] = t.replace("\n", " ").replace("\t", " ").strip()
        return out

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        return self([{"video_path": video_path}], [prompt])[0]
