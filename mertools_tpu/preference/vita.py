"""VITA zero-shot judge — InternViT + pixel-shuffle + Qwen2.5 (VITA-1.5).

Reference wrapper: ``MER2026/MER2026_Track3/utils/vita.py`` (1 fps frame
sampling with min 4 / max 100 frames via ``MAX_IMAGE_LENGTH``, expand2square
padding with the processor mean, ``DEFAULT_IMAGE_TOKEN * slice_len`` prompt,
``qwen2p5_instruct`` conversation, greedy decode — ``do_sample=False`` at
temperature 0.01 — with ``max_new_tokens=1024``, and the decoded response
sliced ``[1:]`` to drop VITA's leading query-type marker character before the
stop-string strip; the audio branch receives a fixed dummy zero mel
(utils/vita.py:177-186) and the prompt carries no ``<audio>`` token, so audio
features never reach the LLM — the judge is video-only by the wrapper's own
protocol).

NOTE: the wrapper imports ``vita.*`` which is NOT vendored anywhere in the
reference tree — this implementation follows the published VITA-1.5
architecture (VITA-MLLM/VITA):

- **InternViT-300M-448px** tower (OpenGVLab ``modeling_intern_vit.py``):
  learned CLS + position embeddings, pre-LN blocks with LayerScale
  (ls1/ls2), fused qkv attention, GELU MLP, NO final layernorm — this is
  exactly our ``encoders.vit.ViTEncoder`` with ``layerscale>0`` (the fused
  qkv is split at conversion time);
- last hidden state, CLS dropped, **pixel shuffle** at downsample ratio 0.5
  (InternVL ``ps_version='v2'`` operation order reproduced literally):
  (32, 32, C) -> (16, 16, 4C) = 256 tokens per 448px frame;
- 2-layer GELU ``mm_projector`` (torch ``Sequential[Linear, GELU, Linear]``);
- per-frame token blocks INSERTED at the ``<image>`` sentinel positions
  (IMAGE_TOKEN_INDEX -200, llava-style sequence insertion — one sentinel
  per frame);
- Qwen2.5 LLM (attention biases) decoding through the shared KV-cached
  ``mllm/generate``.

The ``qwen2p5_instruct`` conversation template (ChatML with VITA's system
prompt, modality-conditioned final sentence) is reconstructed from the
published repo's ``vita/conversation.py``; override via ``system=`` if a
checkpoint ships its own. Parity vs a hand-assembled torch oracle of the
published architecture in tests/test_vita.py (features <2e-4, greedy
generation EXACT).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..encoders.vit import ViTConfig, ViTEncoder
from ..mllm.llm import LLM, LLMConfig
from ..mllm.llm import convert_torch_state as convert_llm_state
from .llamavid import DEFAULT_IMAGE_TOKEN, IMAGE_TOKEN_INDEX, \
    tokenizer_image_token

_P = jax.lax.Precision.HIGHEST

# InternViT processor statistics (IMAGENET_DEFAULT_MEAN/STD)
IMAGE_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGE_STD = np.array([0.229, 0.224, 0.225], np.float32)

# vita/conversation.py conv_qwen2p5_instruct (published repo): the base
# system prompt plus a modality-conditioned closing sentence.
VITA_SYSTEM_BASE = (
    "You are an AI robot and your name is VITA.\n"
    "- You are a multimodal large language model developed by the open "
    "source community. Your aim is to be helpful, honest and harmless.\n"
    "- You support the ability to communicate fluently and answer user "
    "questions in multiple languages of the user's choice.\n"
    "- If the user corrects the wrong answer you generated, you will "
    "apologize and discuss the correct answer with the user.")
VITA_SYSTEM_MODALITY = {
    "image": ("\n- You must answer the question strictly according to the "
              "content of the image given by the user, and it is strictly "
              "forbidden to answer the question without the content of the "
              "image. Please note that you are seeing the image, not the "
              "video."),
    "video": ("\n- You must answer the question strictly according to the "
              "content of the video given by the user, and it is strictly "
              "forbidden to answer the question without the content of the "
              "video. Please note that you are seeing the video, not the "
              "image."),
    "lang": "",
}


def internvit_config(hidden_size: int = 1024, num_layers: int = 24,
                     num_heads: int = 16, intermediate_size: int = 4096,
                     image_size: int = 448, patch_size: int = 14,
                     layerscale: float = 0.1) -> ViTConfig:
    """InternViT-300M-448px defaults (OpenGVLab config.json)."""
    return ViTConfig(hidden_size=hidden_size, num_layers=num_layers,
                     num_heads=num_heads, intermediate_size=intermediate_size,
                     image_size=image_size, patch_size=patch_size,
                     use_cls_token=True, pos_embed="learned",
                     layerscale=layerscale, final_layernorm=False,
                     layer_norm_eps=1e-6, arch="internvit")


def pixel_shuffle(x: jnp.ndarray, scale_factor: float = 0.5) -> jnp.ndarray:
    """InternVL/VITA pixel shuffle, ``ps_version='v2'`` (vita_arch.py):
    (N, g, g, C) -> (N, g*s, g*s, C/s^2) with the published operation
    order reproduced literally."""
    n, w, h, c = x.shape
    x = x.reshape(n, w, int(h * scale_factor), int(c / scale_factor))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(n, int(h * scale_factor), int(w * scale_factor),
                  int(c / (scale_factor * scale_factor)))
    x = x.transpose(0, 2, 1, 3)
    return x


class Vita:
    """Batched TPU VITA-1.5: frames -> InternViT -> pixel shuffle ->
    mlp2x_gelu projector -> per-frame insertion at the ``<image>``
    sentinels -> Qwen2.5 decode. ``params``: {tower, mm_projector, llm}."""

    def __init__(self, vcfg: ViTConfig, llm_cfg: LLMConfig, params: dict, *,
                 downsample_ratio: float = 0.5):
        self.vcfg = vcfg
        self.llm_cfg = llm_cfg
        self.params = params
        self.downsample_ratio = downsample_ratio
        self._tower = ViTEncoder(vcfg)
        self._llm = LLM(llm_cfg)

        def encode(p, pixels):
            h = self._tower.apply({"params": p["tower"]}, pixels)
            h = h[:, 1:]                               # drop CLS
            g = vcfg.grid
            h = h.reshape(h.shape[0], g, g, h.shape[-1])
            h = pixel_shuffle(h, downsample_ratio)
            h = h.reshape(h.shape[0], -1, h.shape[-1])
            pj = p["mm_projector"]
            y = jnp.einsum("...d,dh->...h", h, pj["linear_1"]["kernel"],
                           precision=_P) + pj["linear_1"]["bias"]
            y = jax.nn.gelu(y, approximate=False)
            return jnp.einsum("...d,dh->...h", y, pj["linear_2"]["kernel"],
                              precision=_P) + pj["linear_2"]["bias"]

        self._encode = jax.jit(encode)
        self._forward = jax.jit(
            lambda p, emb, mask: self._llm.apply(
                {"params": p["llm"]}, emb, attention_mask=mask))

    @property
    def tokens_per_frame(self) -> int:
        return int(round(self.vcfg.grid * self.downsample_ratio)) ** 2

    def frame_features(self, pixels: np.ndarray) -> np.ndarray:
        """(B, F, H, W, 3) normalized -> (B, F, tokens_per_frame, H_llm)."""
        B, F = pixels.shape[:2]
        h = self._encode(self.params, jnp.asarray(
            pixels.reshape((B * F,) + pixels.shape[2:])))
        return np.asarray(h).reshape(B, F, -1, h.shape[-1])

    def splice_rows(self, ids_list: list[np.ndarray], feats: np.ndarray,
                    n_frames: list[int] | None = None) -> list[np.ndarray]:
        """llava-style INSERTION: row b's k-th IMAGE_TOKEN_INDEX sentinel is
        replaced by frame k's token block (sequence grows)."""
        table = np.asarray(self.params["llm"]["embed_tokens"]["embedding"])
        rows = []
        for b, ids in enumerate(ids_list):
            pos = np.where(ids == IMAGE_TOKEN_INDEX)[0]
            nf = len(pos) if n_frames is None else n_frames[b]
            assert len(pos) == nf, (len(pos), nf)
            parts, prev = [], 0
            for k, i in enumerate(pos):
                parts.append(table[ids[prev:i]])
                parts.append(feats[b, k])
                prev = i + 1
            parts.append(table[ids[prev:]])
            rows.append(np.concatenate(parts, axis=0))
        return rows

    def generate_batch(self, ids_list: list[np.ndarray], pixels: np.ndarray,
                       tokenizer, *, max_new_tokens: int = 1024,
                       temperature: float = 0.0, top_p: float = 0.9,
                       prng_key=None, n_frames: list[int] | None = None
                       ) -> list[str]:
        from ..mllm.generate import bucket_len, generate

        feats = self.frame_features(pixels)
        rows = self.splice_rows(ids_list, feats, n_frames)
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


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                      else x)


def convert_vita_state(vcfg: ViTConfig, llm_cfg: LLMConfig, sd: dict, *,
                       tower_prefix: str = "model.vision_tower.vision_tower"
                       ) -> dict:
    """VITA checkpoint state dict -> our tree {tower, mm_projector, llm}.

    Tower keys follow OpenGVLab InternVisionModel
    (``embeddings.{class_embedding,patch_embedding,position_embedding}``,
    ``encoder.layers.{i}.{norm1,attn.qkv,attn.proj,mlp.fc1,mlp.fc2,norm2,
    ls1,ls2}``); the fused qkv is split three ways. ``model.mm_projector``
    is a torch Sequential (indices 0/2). LLM keys are Qwen2
    (``model.layers...``, ``lm_head``)."""
    pre = f"{tower_prefix}."

    def dense(p):
        out = {"kernel": _t(sd[f"{p}.weight"]).T}
        if f"{p}.bias" in sd:
            out["bias"] = _t(sd[f"{p}.bias"])
        return out

    def ln(p):
        return {"scale": _t(sd[f"{p}.weight"]), "bias": _t(sd[f"{p}.bias"])}

    tower: dict = {
        "cls_token": _t(sd[f"{pre}embeddings.class_embedding"]).reshape(-1),
        "pos_embed": _t(sd[f"{pre}embeddings.position_embedding"]
                        ).reshape(-1, vcfg.hidden_size),
        "patch_embed": {
            "kernel": _t(sd[f"{pre}embeddings.patch_embedding.weight"]
                         ).transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{pre}embeddings.patch_embedding.bias"]),
        },
    }
    H = vcfg.hidden_size
    for i in range(vcfg.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        qkv_w = _t(sd[f"{lp}.attn.qkv.weight"])          # (3H, H)
        qkv_b = _t(sd[f"{lp}.attn.qkv.bias"])
        blk = {
            "norm1": ln(f"{lp}.norm1"),
            "norm2": ln(f"{lp}.norm2"),
            "q": {"kernel": qkv_w[:H].T, "bias": qkv_b[:H]},
            "k": {"kernel": qkv_w[H: 2 * H].T, "bias": qkv_b[H: 2 * H]},
            "v": {"kernel": qkv_w[2 * H:].T, "bias": qkv_b[2 * H:]},
            "proj": dense(f"{lp}.attn.proj"),
            "fc1": dense(f"{lp}.mlp.fc1"),
            "fc2": dense(f"{lp}.mlp.fc2"),
        }
        if f"{lp}.ls1" in sd:
            blk["ls1"] = _t(sd[f"{lp}.ls1"])
            blk["ls2"] = _t(sd[f"{lp}.ls2"])
        tower[f"block_{i}"] = blk

    params: dict = {
        "tower": tower,
        "mm_projector": {
            "linear_1": dense("model.mm_projector.0"),
            "linear_2": dense("model.mm_projector.2"),
        },
    }
    lsd = {k: v for k, v in sd.items()
           if k.startswith("model.layers.")
           or k in ("model.embed_tokens.weight", "model.norm.weight",
                    "lm_head.weight")}
    params["llm"] = convert_llm_state(llm_cfg, lsd)
    return jax.tree_util.tree_map(jnp.asarray, params)


def expand2square(img: np.ndarray, fill: np.ndarray) -> np.ndarray:
    """utils/vita.py:137-148 — pad a (H, W, 3) frame to a centered square
    with the processor-mean background."""
    H, W = img.shape[:2]
    if H == W:
        return img
    side = max(H, W)
    out = np.empty((side, side, 3), img.dtype)
    out[:] = fill
    if W > H:
        top = (side - H) // 2
        out[top: top + H] = img
    else:
        left = (side - W) // 2
        out[:, left: left + W] = img
    return out


class VitaCaller:
    """utils/vita.py protocol: 1 fps frames (min 4, max 100), expand2square
    + 448 InternViT preprocess, ``<image>`` sentinel per frame,
    qwen2p5_instruct ChatML conversation, greedy decode with
    max_new_tokens=1024, response ``[1:]`` marker strip + stop-string strip
    — plus the batched ``caller(samples, prompts)`` contract."""

    STOP_STR = "<|im_end|>"

    def __init__(self, model: Vita, tokenizer, *, batch: int = 1,
                 max_new_tokens: int = 1024, temperature: float = 0.0,
                 top_p: float = 0.9, seed: int = 0, fps: float = 1.0,
                 min_frames: int = 4, max_frames: int = 100,
                 system: str | None = None, strip_marker: bool = True):
        self.model = model
        self.tok = tokenizer
        self.batch = batch
        self.max_new_tokens = max_new_tokens
        self.temperature = float(temperature)
        self.top_p = top_p
        self.seed = seed
        self.fps = fps
        self.min_frames = min_frames
        self.max_frames = max_frames
        self.system = system
        # real VITA checkpoints emit a leading query-type marker character
        # the wrapper drops via ``[1:]``; tiny test checkpoints don't
        self.strip_marker = strip_marker

    @classmethod
    def from_checkpoint(cls, model_path: str, **kw) -> "VitaCaller":
        """Assemble from a VITA checkpoint dir (config.json carrying the
        Qwen2 text config + ``vision_config``/InternViT defaults, torch
        .bin/.safetensors shards, tokenizer)."""
        import json
        import os

        from transformers import AutoTokenizer

        with open(os.path.join(model_path, "config.json")) as f:
            cfg = json.load(f)
        sd = {}
        for fn in sorted(os.listdir(model_path)):
            p = os.path.join(model_path, fn)
            if fn.endswith((".bin", ".pth")):
                import torch

                sd.update(torch.load(p, map_location="cpu"))
            elif fn.endswith(".safetensors"):
                from safetensors.numpy import load_file

                sd.update(load_file(p))
        vc = cfg.get("vision_config", {})
        vcfg = internvit_config(
            hidden_size=vc.get("hidden_size", 1024),
            num_layers=vc.get("num_hidden_layers", 24),
            num_heads=vc.get("num_attention_heads", 16),
            intermediate_size=vc.get("intermediate_size", 4096),
            image_size=vc.get("image_size", 448),
            patch_size=vc.get("patch_size", 14))
        llm_cfg = LLMConfig(
            vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg.get("num_key_value_heads",
                                 cfg["num_attention_heads"]),
            intermediate_size=cfg["intermediate_size"],
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            attention_bias=cfg.get("model_type", "qwen2") != "llama")
        params = convert_vita_state(vcfg, llm_cfg, sd)
        model = Vita(vcfg, llm_cfg, params)
        tok = AutoTokenizer.from_pretrained(model_path)
        return cls(model, tok, **kw)

    def _load_frames(self, sample: dict) -> np.ndarray:
        if "frames" in sample:
            frames = np.asarray(sample["frames"])
            src_fps = sample.get("fps", 25.0)
        else:
            from ..io import video as vio

            frames = vio.decode_frames(sample["video_path"])
            src_fps = sample.get("fps", 25.0)
        # _get_rawvideo_dec (utils/vita.py:112-131): stride to ~1 fps, then
        # uniform re-sample into [min_frames, max_frames]
        stride = max(1, int(round(src_fps / self.fps)))
        pos = np.arange(0, len(frames), stride)
        if len(pos) > self.max_frames:
            pos = pos[np.linspace(0, len(pos) - 1, num=self.max_frames,
                                  dtype=int)]
        elif len(pos) < self.min_frames:
            pos = pos[np.linspace(0, len(pos) - 1, num=self.min_frames,
                                  dtype=int)]
        return frames[pos]

    def preprocess(self, frames: np.ndarray) -> np.ndarray:
        """uint8 RGB (F, H, W, 3) -> normalized (F, 448, 448, 3):
        expand2square with the mean background, resize, ImageNet norm."""
        from ..ops.image import resize_separable

        s = self.model.vcfg.image_size
        bg = (IMAGE_MEAN * 255.0).astype(frames.dtype if
                                         frames.dtype == np.uint8 else
                                         np.float32)
        sq = np.stack([expand2square(f, bg) for f in frames])
        x = sq.astype(np.float32) / 255.0
        x = np.asarray(resize_separable(jnp.asarray(x), s, s))
        return (x - IMAGE_MEAN) / IMAGE_STD

    def prompt_ids(self, prompt: str, n_frames: int,
                   modality: str = "video") -> np.ndarray:
        qs = DEFAULT_IMAGE_TOKEN * n_frames + "\n" + prompt
        system = (self.system if self.system is not None else
                  VITA_SYSTEM_BASE + VITA_SYSTEM_MODALITY[modality])
        text = (f"<|im_start|>system\n{system}<|im_end|>\n"
                f"<|im_start|>user\n{qs}<|im_end|>\n"
                f"<|im_start|>assistant\n")
        return tokenizer_image_token(text, self.tok)

    def _postprocess(self, text: str) -> str:
        if self.strip_marker:
            text = text[1:]              # utils/vita.py:234 marker drop
        text = text.strip()
        if text.endswith(self.STOP_STR):
            text = text[: -len(self.STOP_STR)]
        return text.strip()

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        out: list[str] = [""] * len(samples)
        key = (jax.random.PRNGKey(self.seed)
               if self.temperature > 0 else None)
        for i in range(0, len(samples), self.batch):
            grp = list(range(i, min(i + self.batch, len(samples))))
            frames = [self.preprocess(self._load_frames(samples[j]))
                      for j in grp]
            n_frames = [len(f) for f in frames]
            F = max(n_frames)
            pixels = np.stack([
                np.concatenate([f, np.zeros((F - len(f),) + f.shape[1:],
                                            f.dtype)])
                if len(f) < F else f for f in frames])
            ids = [self.prompt_ids(prompts[j], n_frames[k])
                   for k, j in enumerate(grp)]
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            texts = self.model.generate_batch(
                ids, pixels, self.tok, max_new_tokens=self.max_new_tokens,
                temperature=self.temperature, top_p=self.top_p,
                prng_key=sub, n_frames=n_frames)
            for j, t in zip(grp, texts):
                out[j] = self._postprocess(t)
        return out

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        """Reference-exact single-sample entry (the wrapper ignores
        audio_path — see module docstring)."""
        return self([{"video_path": video_path}], [prompt])[0]
