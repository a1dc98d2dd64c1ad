"""Video-ChatGPT zero-shot wrapper — spatio-temporal-pooled video judge.

Reference: ``MER2026/MER2026_Track3/utils/videochatgpt.py:26-91`` driving
the vendored ``MER2025/MER2025_Track23/Video-ChatGPT/``:
  * 100 uniform frames (segment-midpoint rule, ``eval/model_utils.py:56-80``),
    nearest-resize to 224 if needed (``:40-45``), CLIP preprocess;
  * CLIP ViT-L/14 penultimate hidden layer, CLS dropped
    (``demo/chat.py:111-115`` — "Same as used in LLaVA");
  * spatio-temporal pooling (``inference.py:12-43``): per-frame spatial
    mean -> 100 temporal tokens (zero-padded), per-patch temporal mean ->
    256 spatial tokens, concat -> 356 tokens;
  * linear ``mm_projector`` 1024 -> LLM dim (``model/video_chatgpt.py:39``);
  * features spliced over the 356 ``<vid_patch>`` positions between
    ``<vid_start>``/``<vid_end>`` (``model/video_chatgpt.py:97-124``);
  * ``video-chatgpt_v1`` conversation (``video_conversation.py:145-157``),
    prompt hard-cut to 1200 chars + ``\\n<video>``
    (``utils/videochatgpt.py:50-56``);
  * sampling at temperature 0.2, ``max_new_tokens=min(512, 1536)``, stop
    ``</s>``, response flattened (``demo/chat.py:119-137``,
    ``utils/videochatgpt.py:36,88``).

TPU-native design: the fixed 356-token layout makes every prompt's splice
STATIC — whole batches share one compiled shape. The tower runs all
sampled frames of a batch as one jitted call; pooling is a masked mean on
device (ragged clip lengths ride a frame mask, matching the reference's
zero-padding of missing temporal tokens); decode rides the shared
KV-cached ``mllm/generate`` engine.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..encoders.vit_clip import CLIPVisionConfig, _t
from ..mllm.llm import LLM, LLMConfig
from ..mllm.llm import convert_torch_state as convert_llm_state
from .videollava import (CLIPHiddenTower, IMAGE_MEAN, IMAGE_STD,
                         n_tower_layers)

_PRECISION = jax.lax.Precision.HIGHEST

DEFAULT_VIDEO_TOKEN = "<video>"
DEFAULT_VIDEO_PATCH_TOKEN = "<vid_patch>"
DEFAULT_VID_START_TOKEN = "<vid_start>"
DEFAULT_VID_END_TOKEN = "<vid_end>"
VIDEO_TOKEN_LEN = 356  # eval/model_utils.py:155
N_TEMPORAL = 100

SYSTEM = ("You are Video-ChatGPT, a large vision-language assistant. "
          "You are able to understand the video content that the user "
          "provides, and assist the user with a variety of tasks using "
          "natural language."
          "Follow the instructions carefully and explain your answers in "
          "detail based on the provided video.")


def get_seq_frames(total: int, desired: int) -> list[int]:
    """Segment-midpoint uniform sampling (model_utils.py:56-80)."""
    seg = float(total - 1) / desired
    return [(int(round(seg * i)) + int(round(seg * (i + 1)))) // 2
            for i in range(desired)]


def spatio_temporal_pool(feats: jnp.ndarray,
                         frame_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T, S, C) frame patch features + (B, T) mask ->
    (B, 100 + S, C): 100 temporal tokens (per-frame spatial mean, zeros at
    padded frames — the reference zero-pads clips shorter than 100,
    inference.py:29-35) then S spatial tokens (per-patch mean over REAL
    frames, inference.py:38)."""
    B, T, S, C = feats.shape
    assert T <= N_TEMPORAL, (T, N_TEMPORAL)
    m = frame_mask.astype(feats.dtype)
    temporal = jnp.mean(feats, axis=2) * m[:, :, None]  # (B, T, C)
    temporal = jnp.pad(temporal, ((0, 0), (0, N_TEMPORAL - T), (0, 0)))
    denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)[:, None, None]
    spatial = jnp.sum(feats * m[:, :, None, None], axis=1) / denom
    return jnp.concatenate([temporal, spatial], axis=1)


class VideoChatGPT:
    """Batched TPU Video-ChatGPT: frames -> tower(-2, CLS-drop) ->
    spatio-temporal pool (356 tokens) -> linear projector -> splice at the
    ``<vid_patch>`` block -> LLM."""

    def __init__(self, vcfg: CLIPVisionConfig, llm_cfg: LLMConfig,
                 params: dict, *, vid_patch_token: int,
                 feature_layer: int = -2):
        self.vcfg = vcfg
        self.llm_cfg = llm_cfg
        self.params = params
        self.vid_patch_token = vid_patch_token
        self._tower = CLIPHiddenTower(vcfg, n_tower_layers(vcfg,
                                                           feature_layer))
        self._llm = LLM(llm_cfg)

        def encode(p, pixels, frame_mask):
            B, T = pixels.shape[:2]
            h = self._tower.apply({"params": p["tower"]},
                                  pixels.reshape((B * T,) + pixels.shape[2:]))
            h = h[:, 1:]  # CLS drop (chat.py:115)
            feats = spatio_temporal_pool(
                h.reshape(B, T, h.shape[1], h.shape[2]), frame_mask)
            k = p["mm_projector"]
            return feats @ k["kernel"] + k["bias"]

        self._encode = jax.jit(encode)
        self._forward = jax.jit(
            lambda p, emb, mask: self._llm.apply(
                {"params": p["llm"]}, emb, attention_mask=mask))

    @property
    def n_spatial(self) -> int:
        return (self.vcfg.image_size // self.vcfg.patch_size) ** 2

    def video_features(self, pixels: np.ndarray,
                       frame_mask: np.ndarray | None = None) -> np.ndarray:
        """(B, T, H, W, 3) normalized frames -> (B, 100+S, H_llm)."""
        if frame_mask is None:
            frame_mask = np.ones(pixels.shape[:2], np.float32)
        return np.asarray(self._encode(self.params, jnp.asarray(pixels),
                                       jnp.asarray(frame_mask)))

    def splice_embeds(self, input_ids: np.ndarray,
                      feats: np.ndarray) -> np.ndarray:
        """Scatter row b's 356 video tokens over its ``<vid_patch>``
        positions (video_chatgpt.py:97-124; positions are consecutive
        between the start/end markers so lengths never change)."""
        table = np.asarray(self.params["llm"]["embed_tokens"]["embedding"])
        emb = table[np.maximum(input_ids, 0)].astype(np.float32)
        for b in range(input_ids.shape[0]):
            pos = np.where(input_ids[b] == self.vid_patch_token)[0]
            emb[b, pos] = feats[b, : len(pos)]
        return emb

    def forward_logits(self, input_ids: np.ndarray, pixels: np.ndarray,
                       attention_mask: np.ndarray,
                       frame_mask: np.ndarray | None = None) -> np.ndarray:
        feats = self.video_features(pixels, frame_mask)
        emb = self.splice_embeds(input_ids, feats)
        return np.asarray(self._forward(self.params, jnp.asarray(emb),
                                        jnp.asarray(attention_mask)))

    def generate_batch(self, ids_list: list[np.ndarray], pixels: np.ndarray,
                       tokenizer, *, frame_mask: np.ndarray | None = None,
                       max_new_tokens: int = 512, temperature: float = 0.2,
                       top_p: float = 1.0, prng_key=None,
                       stop_str: str = "</s>") -> list[str]:
        from ..mllm.generate import bucket_len, generate

        B = len(ids_list)
        S = bucket_len(max(len(x) for x in ids_list))
        ids = np.zeros((B, S), np.int32)
        mask = np.zeros((B, S), np.int32)
        for i, x in enumerate(ids_list):
            ids[i, : len(x)] = x
            mask[i, : len(x)] = 1
        feats = self.video_features(pixels, frame_mask)
        emb = self.splice_embeds(ids, feats) * mask[..., None]
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
            text = tokenizer.decode(row, skip_special_tokens=True).strip()
            # KeywordsStoppingCriteria + endswith-strip (chat.py:101-136)
            if stop_str and stop_str in text:
                text = text[: text.index(stop_str)]
            out.append(text.strip())
        return out


def convert_videochatgpt_state(vcfg: CLIPVisionConfig, llm_cfg: LLMConfig,
                               vision_sd: dict, model_sd: dict, *,
                               feature_layer: int = -2) -> dict:
    """CLIPVisionModel state dict + VideoChatGPTLlamaForCausalLM state dict
    (``model.mm_projector.* / model.embed_tokens / model.layers.* /
    lm_head``) -> our tree {tower, mm_projector, llm}."""
    from .videollava import _convert_tower

    n_run = n_tower_layers(vcfg, feature_layer)
    # CLIPVisionModel prefixes with "vision_model." directly
    tower_sd = {("x." + k): v for k, v in vision_sd.items()}
    params = {
        "tower": _convert_tower(vcfg, tower_sd, "x", n_run),
        "mm_projector": {
            "kernel": _t(model_sd["model.mm_projector.weight"]).T,
            "bias": _t(model_sd["model.mm_projector.bias"]),
        },
    }
    lsd = {k[len("model."):]: v for k, v in model_sd.items()
           if k.startswith("model.") and not k.startswith("model.mm_")}
    if "lm_head.weight" in model_sd:
        lsd["lm_head.weight"] = model_sd["lm_head.weight"]
    params["llm"] = convert_llm_state(llm_cfg, lsd)
    return jax.tree_util.tree_map(jnp.asarray, params)


class VideoChatGPTCaller:
    """Unified preference-pipeline wrapper (utils/videochatgpt.py protocol).

    Samples carry ``frames`` (T, H, W, 3) uint8 RGB or ``video_path``.
    Defaults reproduce the reference: 100 segment-midpoint frames,
    temperature-0.2 sampling, 512 new tokens, flattened response.
    """

    def __init__(self, model_path: str | None = None, *, model=None,
                 tokenizer=None, batch: int = 4, n_frames: int = 100,
                 max_new_tokens: int = 512, temperature: float = 0.2,
                 seed: int = 0):
        if model is None:
            model, tokenizer = load_videochatgpt(model_path)
        self.model = model
        self.tok = tokenizer
        self.batch = batch
        self.n_frames = n_frames
        self.max_new_tokens = min(int(max_new_tokens), 1536)  # chat.py:125
        self.temperature = temperature
        self.seed = seed
        rep = (DEFAULT_VID_START_TOKEN
               + DEFAULT_VIDEO_PATCH_TOKEN * VIDEO_TOKEN_LEN
               + DEFAULT_VID_END_TOKEN)
        self.replace_token = rep

    def _load_frames(self, sample: dict) -> np.ndarray:
        if "frames" in sample:
            frames = np.asarray(sample["frames"])
        else:
            from ..io import video as vio

            frames = vio.decode_frames(sample["video_path"])
        n = min(len(frames), self.n_frames)
        return frames[get_seq_frames(len(frames), n)]

    def preprocess_video(self, frames: np.ndarray) -> np.ndarray:
        """uint8 RGB (T, H, W, 3) -> normalized (T, 224, 224, 3). The
        reference nearest-resizes to 224 (F.interpolate default,
        model_utils.py:42-45) before the CLIP processor's (then no-op)
        resize/crop; mean/std are CLIP's."""
        s = self.model.vcfg.image_size
        T, H, W = frames.shape[:3]
        if (H, W) != (s, s):
            yi = (np.arange(s) * (H / s)).astype(int)
            xi = (np.arange(s) * (W / s)).astype(int)
            frames = frames[:, yi][:, :, xi]
        x = frames.astype(np.float32) / 255.0
        return (x - IMAGE_MEAN) / IMAGE_STD

    def prompt_ids(self, prompt: str) -> np.ndarray:
        """Reference prompt assembly: hard cuts (utils/videochatgpt.py:50-56),
        ``video-chatgpt_v1`` conversation, ``<video>`` -> start+356+end.

        The reference applies text[:1536] (every turn) then text[:1200]
        (first video turn) back-to-back on the same string, so for this
        single-turn protocol the composition is exactly the 1200 cut."""
        text = prompt[:1200]
        if DEFAULT_VIDEO_TOKEN not in text:
            text = text + "\n" + DEFAULT_VIDEO_TOKEN
        full = f"{SYSTEM} USER: {text} ASSISTANT:"
        full = full.replace(DEFAULT_VIDEO_TOKEN, self.replace_token, 1)
        return np.asarray(self.tok(full).input_ids, np.int32)

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        import jax as _jax

        out: list[str] = [""] * len(samples)
        key = (_jax.random.PRNGKey(self.seed)
               if self.temperature > 0 else None)
        for i in range(0, len(samples), self.batch):
            grp = list(range(i, min(i + self.batch, len(samples))))
            vids = [self.preprocess_video(self._load_frames(samples[j]))
                    for j in grp]
            T = max(v.shape[0] for v in vids)
            pixels = np.zeros((len(grp), T) + vids[0].shape[1:], np.float32)
            fmask = np.zeros((len(grp), T), np.float32)
            for b, v in enumerate(vids):
                pixels[b, : v.shape[0]] = v
                fmask[b, : v.shape[0]] = 1.0
            ids = [self.prompt_ids(prompts[j]) for j in grp]
            if key is not None:
                key, sub = _jax.random.split(key)
            else:
                sub = None
            texts = self.model.generate_batch(
                ids, pixels, self.tok, frame_mask=fmask,
                max_new_tokens=self.max_new_tokens,
                temperature=self.temperature, prng_key=sub)
            for j, t in zip(grp, texts):
                # response flattening (utils/videochatgpt.py:88)
                out[j] = t.replace("\n", " ").replace("\t", " ").strip()
        return out

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        """Reference-exact single-sample entry (video-only model)."""
        return self([{"video_path": video_path}], [prompt])[0]


def load_videochatgpt(model_path: str):
    """Assemble from a checkpoint dir: ``config.json`` + torch bins holding
    the LLaVA-7B LLM + mm_projector (+ the projection bin merged in), and a
    ``vision_tower/`` (or config-named) CLIPVisionModel. Tokenizer must
    already contain the three video special tokens
    (model_utils.py:119-124)."""
    import json
    import os

    import torch
    from transformers import AutoTokenizer, CLIPVisionConfig as HFV
    from transformers import LlamaConfig

    with open(os.path.join(model_path, "config.json")) as f:
        cfg = json.load(f)
    sd = {}
    for fn in sorted(os.listdir(model_path)):
        if fn.endswith((".bin", ".pth")):
            sd.update(torch.load(os.path.join(model_path, fn),
                                 map_location="cpu"))
    vis_dir = os.path.join(model_path, "vision_tower")
    vsd = {}
    if os.path.isdir(vis_dir):
        for fn in sorted(os.listdir(vis_dir)):
            if fn.endswith((".bin", ".pth")):
                vsd.update(torch.load(os.path.join(vis_dir, fn),
                                      map_location="cpu"))
        with open(os.path.join(vis_dir, "config.json")) as f:
            hfv = HFV(**json.load(f))
    else:  # tower weights merged into the main state dict
        vsd = {k[len("vision_tower."):]: v for k, v in sd.items()
               if k.startswith("vision_tower.")}
        hfv = HFV(**cfg["vision_config"]) if "vision_config" in cfg else HFV()
    vcfg = CLIPVisionConfig.from_hf(hfv, projection_dim=1)
    llm_cfg = LLMConfig.from_hf(LlamaConfig(**{
        k: v for k, v in cfg.items() if not isinstance(v, (dict, list))}))
    tok = AutoTokenizer.from_pretrained(model_path)
    params = convert_videochatgpt_state(vcfg, llm_cfg, vsd, sd)
    patch_id = tok.convert_tokens_to_ids(DEFAULT_VIDEO_PATCH_TOKEN)
    model = VideoChatGPT(vcfg, llm_cfg, params, vid_patch_token=patch_id)
    return model, tok
