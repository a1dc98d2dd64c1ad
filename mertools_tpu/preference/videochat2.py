"""VideoChat2 zero-shot judge — UMT ViT + instruction-aware Q-Former +
Vicuna(LoRA).

Reference: ``MER2026/MER2026_Track3/utils/videochat2.py`` wrapping the
vendored ``MER2025_Track23/VideoChat2``:

- **UMT-L vision encoder** (``models/blip2/vit.py``): Conv3d tubelet patch
  embed (tubelet 1 for inference), FIXED sinusoid position table over the
  T*L token grid (regenerated per segment count — conversation.py:182),
  pre-norm blocks with layer-scale gammas and fused qkv whose k bias is
  pinned to zero (vit.py:57-101), joint space-time attention, truncated
  depth (``return_index``), optional final LN;
- ``vision_layernorm`` (eps 1e-12) on the flattened (B, T*L, C) stream
  (videochat2_it.py:186-191);
- **text-conditioned Q-Former** (= :class:`mertools_tpu.mllm.qformer.
  QFormerText`) with ``query_tokens + extra_query_tokens`` concatenated
  (it.py:195-218) and the FIXED instruction "Watch the video and answer
  the question." (conversation.py:184);
- ``llama_proj`` on the query outputs -> splice at ``<VideoHere>`` inside
  the ### conversation (system "", "Human:"/"Assistant:" roles,
  get_prompt conversation.py:26-33) -> Vicuna + LoRA(r16, alpha32) decode
  (wrapper protocol: do_sample, temperature 1.0, top_p 0.9,
  max_new_tokens 1000; response split on '###' then 'Assistant:' —
  conversation.py:60-85, utils/videochat2.py:24-98).

TPU-native re-design: the batch's videos run tower + Q-Former as single
jitted calls; decode rides the shared KV-cached ``mllm/generate``. Parity
vs a hand-assembled torch oracle of the vendored modules in
tests/test_videochat2.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..mllm.llm import LLM, LLMConfig
from ..mllm.qformer import QFormerConfig, QFormerText, from_bert_qformer_text
from .videollava import IMAGE_MEAN, IMAGE_STD

_P = jax.lax.Precision.HIGHEST

QFORMER_INSTRUCTION = "Watch the video and answer the question."
VIDEO_PLACEHOLDER = "<VideoHere>"


def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """vit.py get_sinusoid_encoding_table (even dims sin, odd cos)."""
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (j // 2) / d_hid)
    out = np.zeros((n_position, d_hid), np.float32)
    out[:, 0::2] = np.sin(angle[:, 0::2])
    out[:, 1::2] = np.cos(angle[:, 1::2])
    return out


@dataclass(frozen=True)
class UMTViTConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24           # checkpoint depth; return_index truncates
    num_heads: int = 16
    mlp_ratio: float = 4.0
    tubelet_size: int = 1
    return_index: int = -1    # run depth + return_index + 1 blocks
    with_ln: bool = False
    layer_scale: bool = True

    @property
    def run_depth(self) -> int:
        return self.depth + self.return_index + 1


class UMTViT(nn.Module):
    """(B, T, H, W, 3) -> (B, T, L, C): joint space-time pre-norm ViT with
    layer-scale and a fixed sinusoid position table."""

    cfg: UMTViTConfig
    precision: object = _P

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B, T = pixels.shape[:2]
        # Conv3d tubelet embed; tubelet 1 == per-frame Conv2d
        x = nn.Conv(c.embed_dim,
                    kernel_size=(c.tubelet_size, c.patch_size, c.patch_size),
                    strides=(c.tubelet_size, c.patch_size, c.patch_size),
                    padding="VALID", name="patch_embed",
                    precision=self.precision)(pixels)
        L = x.shape[2] * x.shape[3]
        x = x.reshape(B, (T // c.tubelet_size) * L, c.embed_dim)
        pos = sinusoid_table(x.shape[1], c.embed_dim)
        x = x + jnp.asarray(pos)[None]
        nh, hd = c.num_heads, c.embed_dim // c.num_heads
        for i in range(c.run_depth):
            h = nn.LayerNorm(epsilon=1e-6, name=f"norm1_{i}")(x)
            qkv = nn.Dense(3 * c.embed_dim, use_bias=False,
                           name=f"qkv_{i}", precision=self.precision)(h)
            qb = self.param(f"q_bias_{i}", nn.initializers.zeros,
                            (c.embed_dim,))
            vb = self.param(f"v_bias_{i}", nn.initializers.zeros,
                            (c.embed_dim,))
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = (q + qb).reshape(B, -1, nh, hd)
            k = k.reshape(B, -1, nh, hd)
            v = (v + vb).reshape(B, -1, nh, hd)
            att = jnp.einsum("bqnd,bknd->bnqk", q * hd ** -0.5, k,
                             precision=self.precision)
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("bnqk,bknd->bqnd", att, v,
                           precision=self.precision)
            o = nn.Dense(c.embed_dim, name=f"proj_{i}",
                         precision=self.precision)(
                o.reshape(B, -1, c.embed_dim))
            if c.layer_scale:
                o = o * self.param(f"gamma1_{i}", nn.initializers.ones,
                                   (c.embed_dim,))
            x = x + o
            h = nn.LayerNorm(epsilon=1e-6, name=f"norm2_{i}")(x)
            h = nn.Dense(int(c.embed_dim * c.mlp_ratio), name=f"fc1_{i}",
                         precision=self.precision)(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(c.embed_dim, name=f"fc2_{i}",
                         precision=self.precision)(h)
            if c.layer_scale:
                h = h * self.param(f"gamma2_{i}", nn.initializers.ones,
                                   (c.embed_dim,))
            x = x + h
        if c.with_ln:
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x.reshape(B, T // c.tubelet_size, L, c.embed_dim)


class VideoChat2:
    """Batched TPU VideoChat2. ``params``: {vit, vision_ln, qformer,
    llama_proj, llm}."""

    def __init__(self, vit_cfg: UMTViTConfig, qf_cfg: QFormerConfig,
                 llm_cfg: LLMConfig, params: dict):
        self.vit_cfg = vit_cfg
        self.qf_cfg = qf_cfg
        self.llm_cfg = llm_cfg
        self.params = params
        self._vit = UMTViT(vit_cfg)
        self._qf = QFormerText(qf_cfg)
        self._llm = LLM(llm_cfg)

        def encode(p, pixels, text_ids, text_mask):
            h = self._vit.apply({"params": p["vit"]}, pixels)
            B = h.shape[0]
            h = h.reshape(B, -1, h.shape[-1])           # (B, T*L, C)
            mu = h.mean(-1, keepdims=True)
            var = ((h - mu) ** 2).mean(-1, keepdims=True)
            h = ((h - mu) * jax.lax.rsqrt(var + 1e-12)
                 * p["vision_ln"]["scale"] + p["vision_ln"]["bias"])
            q = self._qf.apply({"params": p["qformer"]}, text_ids,
                               text_mask, h)            # (B, nq, H_bert)
            return (jnp.einsum("bqd,dh->bqh", q,
                               p["llama_proj"]["kernel"], precision=_P)
                    + p["llama_proj"]["bias"])

        self._encode = jax.jit(encode)

    def video_embeds(self, pixels: np.ndarray, text_ids: np.ndarray,
                     text_mask: np.ndarray) -> np.ndarray:
        """(B, T, H, W, 3) normalized + Q-Former instruction ids ->
        (B, num_queries, H_llm)."""
        return np.asarray(self._encode(self.params, jnp.asarray(pixels),
                                       jnp.asarray(text_ids),
                                       jnp.asarray(text_mask)))

    def generate_batch(self, left_ids: list, right_ids: list,
                       embeds_v: np.ndarray, tokenizer, *,
                       max_new_tokens: int = 1000,
                       temperature: float = 0.0, top_p: float = 0.9,
                       prng_key=None) -> list[str]:
        """Per-row [left; video; right] splice, right-pad, batched decode
        (conversation.py get_context_emb)."""
        from ..mllm.generate import bucket_len, generate

        table = np.asarray(self.params["llm"]["embed_tokens"]["embedding"])
        rows = [np.concatenate([table[l], embeds_v[i], table[r]], axis=0)
                for i, (l, r) in enumerate(zip(left_ids, right_ids))]
        B = len(rows)
        S = bucket_len(max(len(r) for r in rows))
        emb = np.zeros((B, S, rows[0].shape[-1]), np.float32)
        mask = np.zeros((B, S), np.int32)
        for i, r in enumerate(rows):
            emb[i, : len(r)] = r
            mask[i, : len(r)] = 1
        eos = tokenizer.eos_token_id
        toks = np.asarray(generate(
            self.llm_cfg, self.params["llm"], jnp.asarray(emb),
            jnp.asarray(mask), max_new_tokens=max_new_tokens,
            temperature=temperature, top_p=top_p,
            eos_token_id=eos if eos is not None else -1, prng_key=prng_key))
        out = []
        for row in toks:
            stop = np.where(row == eos)[0] if eos is not None else []
            row = row[: stop[0]] if len(stop) else row
            out.append(tokenizer.decode(row, skip_special_tokens=True))
        return out


def convert_videochat2_state(vit_cfg: UMTViTConfig, llm_cfg: LLMConfig,
                             sd: dict, *, num_heads: int = 12
                             ) -> tuple[QFormerConfig, dict]:
    """VideoChat2 stage-3 checkpoint layout -> our tree. Keys:
    ``vision_encoder.encoder.*`` (UMT), ``vision_layernorm``,
    ``qformer.bert.*`` + ``query_tokens``/``extra_query_tokens``,
    ``llama_proj``, ``llama_model.*`` (peft-wrapped base + LoRA)."""
    from ..mllm.llm import convert_torch_state

    def t(x):
        return np.asarray(x.detach().cpu().numpy()
                          if hasattr(x, "detach") else x)

    vp: dict = {"patch_embed": {
        "kernel": t(sd["vision_encoder.encoder.patch_embed.proj.weight"]
                    ).transpose(2, 3, 4, 1, 0),
        "bias": t(sd["vision_encoder.encoder.patch_embed.proj.bias"])}}
    for i in range(vit_cfg.run_depth):
        b = f"vision_encoder.encoder.blocks.{i}"
        vp[f"norm1_{i}"] = {"scale": t(sd[f"{b}.norm1.weight"]),
                            "bias": t(sd[f"{b}.norm1.bias"])}
        vp[f"qkv_{i}"] = {"kernel": t(sd[f"{b}.attn.qkv.weight"]).T}
        vp[f"q_bias_{i}"] = t(sd[f"{b}.attn.q_bias"])
        vp[f"v_bias_{i}"] = t(sd[f"{b}.attn.v_bias"])
        vp[f"proj_{i}"] = {"kernel": t(sd[f"{b}.attn.proj.weight"]).T,
                           "bias": t(sd[f"{b}.attn.proj.bias"])}
        vp[f"norm2_{i}"] = {"scale": t(sd[f"{b}.norm2.weight"]),
                            "bias": t(sd[f"{b}.norm2.bias"])}
        vp[f"fc1_{i}"] = {"kernel": t(sd[f"{b}.mlp.fc1.weight"]).T,
                          "bias": t(sd[f"{b}.mlp.fc1.bias"])}
        vp[f"fc2_{i}"] = {"kernel": t(sd[f"{b}.mlp.fc2.weight"]).T,
                          "bias": t(sd[f"{b}.mlp.fc2.bias"])}
        if vit_cfg.layer_scale:
            vp[f"gamma1_{i}"] = t(sd[f"{b}.gamma_1"])
            vp[f"gamma2_{i}"] = t(sd[f"{b}.gamma_2"])
    if vit_cfg.with_ln:
        vp["norm"] = {"scale": t(sd["vision_encoder.encoder.norm.weight"]),
                      "bias": t(sd["vision_encoder.encoder.norm.bias"])}

    qsd = {k.removeprefix("qformer."): v for k, v in sd.items()
           if k.startswith("qformer.")}
    qt = np.concatenate([t(sd["query_tokens"]),
                         t(sd["extra_query_tokens"])], axis=1) \
        if "extra_query_tokens" in sd else t(sd["query_tokens"])
    qsd["query_tokens"] = qt
    qf_cfg, qparams = from_bert_qformer_text(qsd, prefix="bert.",
                                             num_heads=num_heads)

    params: dict = {
        "vit": vp,
        "vision_ln": {"scale": t(sd["vision_layernorm.weight"]),
                      "bias": t(sd["vision_layernorm.bias"])},
        "qformer": qparams,
        "llama_proj": {"kernel": t(sd["llama_proj.weight"]).T,
                       "bias": t(sd["llama_proj.bias"])},
    }
    # peft-wrapped vicuna: base weights + LoRA factors
    lsd = {}
    for k, v in sd.items():
        if not k.startswith("llama_model."):
            continue
        kk = k.removeprefix("llama_model.").removeprefix("base_model.model.")
        if ".lora_A." in kk or ".lora_B." in kk:
            continue
        lsd[kk.replace(".base_layer.", ".")] = v
    lparams = convert_torch_state(llm_cfg, lsd)
    for k, v in sd.items():
        if ".lora_A." not in k and ".lora_B." not in k:
            continue
        parts = k.split(".")
        li = parts[parts.index("layers") + 1]
        # peft default targets q_proj/v_proj; address by the module name
        name = [p for p in parts if p.endswith("_proj")][0]
        which = "lora_a" if ".lora_A." in k else "lora_b"
        # peft stores A (r, in), B (out, r); ours (in, r) / (r, out)
        lparams[f"layer_{li}"][name][which] = t(v).T
    params["llm"] = lparams
    return qf_cfg, jax.tree_util.tree_map(jnp.asarray, params)


class VideoChat2Caller:
    """Unified judge wrapper (utils/videochat2.py protocol: 8 segments,
    ### conversation, sampled decode t=1.0 top_p=0.9; --temperature 0
    stays greedy) + the batched ``caller(samples, prompts)`` contract."""

    def __init__(self, model: VideoChat2, tokenizer, bert_tokenizer, *,
                 batch: int = 2, num_segments: int = 8,
                 max_new_tokens: int = 1000, temperature: float = 0.0,
                 top_p: float = 0.9, seed: int = 0, max_txt_len: int = 32):
        self.model = model
        self.tok = tokenizer
        self.bert_tok = bert_tokenizer
        self.batch = batch
        self.num_segments = num_segments
        self.max_new_tokens = max_new_tokens
        self.temperature = float(temperature)
        self.top_p = top_p
        self.seed = seed
        self.max_txt_len = max_txt_len

    @classmethod
    def from_checkpoints(cls, stage3_path: str, vit_qformer_path: str,
                         vicuna_path: str, bert_path: str, *,
                         vit_cfg: UMTViTConfig | None = None, **kw
                         ) -> "VideoChat2Caller":
        """Assemble from real checkpoints (utils/videochat2.py:28-53:
        umt_l16_qformer.pth towers + videochat2_7b_stage3.pth overlay +
        vicuna-7b + bert tokenizer). Stage-3 keys overwrite stage-1/2."""
        import torch
        from transformers import AutoTokenizer, LlamaForCausalLM

        from ..mllm.llm import LLMConfig

        sd = {}
        for path in (vit_qformer_path, stage3_path):
            d = torch.load(path, map_location="cpu")
            sd.update(d.get("model", d))
        hfl = LlamaForCausalLM.from_pretrained(vicuna_path)
        llm_cfg = LLMConfig.from_hf(hfl.config, lora_r=16)
        llm_cfg = type(llm_cfg)(**{**llm_cfg.__dict__, "lora_alpha": 32.0})
        for k, v in hfl.state_dict().items():
            sd.setdefault(f"llama_model.base_model.model.{k}", v)
        del hfl
        vit_cfg = vit_cfg or UMTViTConfig()   # UMT-L/16 224 defaults
        qf_cfg, params = convert_videochat2_state(vit_cfg, llm_cfg, sd)
        model = VideoChat2(vit_cfg, qf_cfg, llm_cfg, params)
        tok = AutoTokenizer.from_pretrained(vicuna_path, use_fast=False)
        bert_tok = AutoTokenizer.from_pretrained(bert_path,
                                                 truncation_side="left")
        return cls(model, tok, bert_tok, **kw)

    @staticmethod
    def get_index(num_frames: int, num_segments: int) -> np.ndarray:
        """conversation.py:87-93 segment-center sampling."""
        seg_size = float(num_frames - 1) / num_segments
        start = int(seg_size / 2)
        return np.array([start + int(np.round(seg_size * i))
                         for i in range(num_segments)])

    def _load_frames(self, sample: dict) -> np.ndarray:
        if "frames" in sample:
            frames = np.asarray(sample["frames"])
        else:
            from ..io import video as vio

            frames = vio.decode_frames(sample["video_path"])
        return frames[self.get_index(len(frames), self.num_segments)]

    def preprocess(self, frames: np.ndarray) -> np.ndarray:
        """GroupScale(224) + GroupCenterCrop(224) + CLIP norm."""
        from ..ops.image import resize_separable

        c = self.model.vit_cfg.img_size
        F, H, W = frames.shape[:3]
        if H <= W:
            nh, nw = c, max(c, int(round(W * c / H)))
        else:
            nh, nw = max(c, int(round(H * c / W))), c
        x = frames.astype(np.float32) / 255.0
        x = np.asarray(resize_separable(jnp.asarray(x), nh, nw))
        top, left = (nh - c) // 2, (nw - c) // 2
        x = x[:, top: top + c, left: left + c]
        return (x - IMAGE_MEAN) / IMAGE_STD

    def _prompt_ids(self, prompt: str) -> tuple[list, list]:
        """### conversation (get_prompt with system ''): left of
        <VideoHere> gets BOS, right continues through the question."""
        left = "###Human: <Video>"
        right = (f"</Video>\n###Human: {prompt}###Assistant:")
        lids = self.tok(left, add_special_tokens=True).input_ids
        rids = self.tok(right, add_special_tokens=False).input_ids
        return lids, rids

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        out: list[str] = [""] * len(samples)
        key = (jax.random.PRNGKey(self.seed)
               if self.temperature > 0 else None)
        enc = self.bert_tok([QFORMER_INSTRUCTION], padding="longest",
                            truncation=True, max_length=self.max_txt_len)
        bids = np.asarray(enc["input_ids"], np.int32)
        bmask = np.asarray(enc["attention_mask"], np.int32)
        for i in range(0, len(samples), self.batch):
            grp = list(range(i, min(i + self.batch, len(samples))))
            pixels = np.stack([self.preprocess(self._load_frames(samples[j]))
                               for j in grp])
            embeds = self.model.video_embeds(
                pixels, np.repeat(bids, len(grp), 0),
                np.repeat(bmask, len(grp), 0))
            lids, rids = zip(*[self._prompt_ids(prompts[j]) for j in grp])
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            texts = self.model.generate_batch(
                list(lids), list(rids), embeds, self.tok,
                max_new_tokens=self.max_new_tokens,
                temperature=self.temperature, top_p=self.top_p,
                prng_key=sub)
            for j, t in zip(grp, texts):
                # conversation.py:82-83 + wrapper flattening
                t = t.split("###")[0].split("Assistant:")[-1].strip()
                t = t.replace("\n", " ").replace("\t", " ").strip()
                out[j] = t
        return out

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        return self([{"video_path": video_path}], [prompt])[0]
