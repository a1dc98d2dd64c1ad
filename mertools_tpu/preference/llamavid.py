"""LLaMA-VID zero-shot judge — one context token + one content token per
frame.

Reference: ``MER2026/MER2026_Track3/utils/llamavid.py`` wrapping the
vendored ``MER2025_Track23/LLaMA-VID/llamavid/model/llamavid_arch.py``.
Per frame (arch:252-420):

- vision tower (EVA-G-LAVIS or CLIP ViT) -> patch features (P, D_v)
  (``mm_vision_select_feature='patch'`` drops CLS);
- the USER PROMPT drives a text-conditioned Q-Former
  (``vlm_att_encoder``, BERT-base + 32 queries, cross-attn freq 2;
  'pretrain' types LayerNorm the vision input first) ->
  ``vlm_att_projector`` -> text_q (32, D_v);
- **context token** (arch:376-392): softmax(text_q @ key_proj(vis)^T /
  sqrt(D_v)) @ vis, mean over the 32 queries, ``vlm_att_val_projector``
  -> ONE token;
- **content token** (arch:396-416): vis compressed (``compress_type``
  'mean' -> 1 token for the fps-1 video model; 'grid:N' -> NxN avg pool;
  None -> all patches) -> ``mm_projector`` (linear / mlp2x_gelu);
- tokens [ctx, content] concatenated across frames splice into the
  llava_v1 prompt at the ``<image>`` position (IMAGE_TOKEN_INDEX -200,
  sequence INSERTION, not placeholder overwrite) -> Vicuna decode
  (wrapper protocol: do_sample, temperature 0.5, top_p 0.7,
  max_new_tokens 512, 1 fps frame sampling — utils/llamavid.py:55-132).

TPU-native re-design: the whole batch's frames run the tower + Q-Former +
token generation as single jitted calls (the reference loops per sample);
decode rides the shared KV-cached ``mllm/generate``. Parity vs a
hand-assembled torch oracle of arch:252-420 in tests/test_llamavid.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..encoders.vit_clip import CLIPVisionConfig
from ..mllm.llm import LLM, LLMConfig
from ..mllm.qformer import QFormerConfig, QFormerText, from_bert_qformer_text
from .videollava import (IMAGE_MEAN, IMAGE_STD, CLIPHiddenTower,
                         _convert_tower, convert_llm_state, n_tower_layers)

_P = jax.lax.Precision.HIGHEST
IMAGE_TOKEN_INDEX = -200          # llamavid/constants.py
DEFAULT_IMAGE_TOKEN = "<image>"

LLAVA_V1_SYSTEM = ("A chat between a curious human and an artificial "
                   "intelligence assistant. The assistant gives helpful, "
                   "detailed, and polite answers to the human's questions.")


def tokenizer_image_token(prompt: str, tokenizer,
                          image_token_index: int = IMAGE_TOKEN_INDEX
                          ) -> np.ndarray:
    """llava.mm_utils.tokenizer_image_token: split on ``<image>``, tokenize
    chunks, join with the sentinel index (BOS kept from the first chunk)."""
    chunks = [tokenizer(c).input_ids
              for c in prompt.split(DEFAULT_IMAGE_TOKEN)]
    ids = list(chunks[0])
    bos = getattr(tokenizer, "bos_token_id", None)
    for c in chunks[1:]:
        ids.append(image_token_index)
        ids.extend(c[1:] if (bos is not None and len(c) and c[0] == bos)
                   else c)
    return np.asarray(ids, np.int32)


class LlamaVid:
    """Batched TPU LLaMA-VID. ``params``: {tower, att_ln?, qformer,
    att_proj, key_proj, val_proj, mm_projector, llm}."""

    def __init__(self, vcfg: CLIPVisionConfig, qf_cfg: QFormerConfig,
                 llm_cfg: LLMConfig, params: dict, *,
                 feature_layer: int = -2, compress_type: str | None = "mean",
                 use_att_ln: bool = True, mm_projector_type: str = "linear"):
        self.vcfg = vcfg
        self.qf_cfg = qf_cfg
        self.llm_cfg = llm_cfg
        self.params = params
        self.compress_type = compress_type
        n_run = n_tower_layers(vcfg, feature_layer)
        self._tower = CLIPHiddenTower(vcfg, n_run)
        self._qf = QFormerText(qf_cfg)
        self._llm = LLM(llm_cfg)
        grid = vcfg.image_size // vcfg.patch_size

        def mm_projector(p, x):
            y = jnp.einsum("...d,dh->...h", x, p["linear_1"]["kernel"],
                           precision=_P) + p["linear_1"]["bias"]
            if mm_projector_type == "mlp2x_gelu":
                y = jax.nn.gelu(y, approximate=False)
                y = jnp.einsum("...d,dh->...h", y, p["linear_2"]["kernel"],
                               precision=_P) + p["linear_2"]["bias"]
            return y

        def encode(p, pixels, text_ids, text_mask):
            """pixels (N, H, W, 3); text_ids/mask (N, L) — the user prompt
            repeated per frame. -> (N, 1 + n_content, H_llm)."""
            h = self._tower.apply({"params": p["tower"]}, pixels)
            vis = h[:, 1:]                                # 'patch' CLS drop
            bert_in = vis
            if use_att_ln:
                mu = bert_in.mean(-1, keepdims=True)
                var = ((bert_in - mu) ** 2).mean(-1, keepdims=True)
                bert_in = ((bert_in - mu) * jax.lax.rsqrt(var + 1e-5)
                           * p["att_ln"]["scale"] + p["att_ln"]["bias"])
            q = self._qf.apply({"params": p["qformer"]}, text_ids,
                               text_mask, bert_in)        # (N, nq, H_bert)
            text_q = jnp.einsum("bqd,dh->bqh", q, p["att_proj"]["kernel"],
                                precision=_P) + p["att_proj"]["bias"]
            # context token (arch:376-392)
            key = jnp.einsum("bpd,dh->bph", vis, p["key_proj"]["kernel"],
                             precision=_P) + p["key_proj"]["bias"]
            att = jnp.einsum("bqh,bph->bqp", text_q, key, precision=_P)
            att = jax.nn.softmax(att / np.sqrt(vis.shape[-1]), axis=-1)
            ctx = jnp.einsum("bqp,bpd->bqd", att, vis,
                             precision=_P).mean(axis=1)   # (N, D_v)
            ctx = (jnp.einsum("bd,dh->bh", ctx, p["val_proj"]["kernel"],
                              precision=_P) + p["val_proj"]["bias"])[:, None]
            # content token(s) (arch:396-413)
            if compress_type == "mean":
                vis_c = vis.mean(axis=1, keepdims=True)
            elif compress_type and compress_type.startswith("grid:"):
                gs = int(compress_type.split(":")[-1])
                st = grid // gs
                v = vis.reshape(vis.shape[0], grid, grid, -1)
                v = jax.lax.reduce_window(
                    v, 0.0, jax.lax.add, (1, st, st, 1), (1, st, st, 1),
                    "VALID") / float(st * st)
                vis_c = v.reshape(vis.shape[0], gs * gs, -1)
            else:
                vis_c = vis
            content = mm_projector(p["mm_projector"], vis_c)
            return jnp.concatenate([ctx, content], axis=1)

        self._encode = jax.jit(encode)
        self._forward = jax.jit(
            lambda p, emb, mask: self._llm.apply(
                {"params": p["llm"]}, emb, attention_mask=mask))

    @property
    def tokens_per_frame(self) -> int:
        grid = self.vcfg.image_size // self.vcfg.patch_size
        if self.compress_type == "mean":
            return 2
        if self.compress_type and self.compress_type.startswith("grid:"):
            return 1 + int(self.compress_type.split(":")[-1]) ** 2
        return 1 + grid * grid

    def video_tokens(self, pixels: np.ndarray, prompt_ids: np.ndarray,
                     prompt_mask: np.ndarray) -> np.ndarray:
        """(B, F, H, W, 3) normalized frames + per-sample BERT prompt ids
        (B, L) -> (B, F * tokens_per_frame, H_llm)."""
        B, F = pixels.shape[:2]
        ids = np.repeat(prompt_ids, F, axis=0)
        mask = np.repeat(prompt_mask, F, axis=0)
        h = self._encode(self.params, jnp.asarray(
            pixels.reshape((B * F,) + pixels.shape[2:])),
            jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(h).reshape(B, -1, h.shape[-1])

    def splice_rows(self, ids_list: list[np.ndarray], tokens: np.ndarray,
                    n_frames: list[int] | None = None) -> list[np.ndarray]:
        """llava-style INSERTION: each row's IMAGE_TOKEN_INDEX sentinel is
        replaced by that row's video tokens (sequence grows). ``n_frames``
        limits row b to its true frame count when the pixel batch was
        padded to a common F."""
        table = np.asarray(self.params["llm"]["embed_tokens"]["embedding"])
        tpf = self.tokens_per_frame
        rows = []
        for b, ids in enumerate(ids_list):
            pos = np.where(ids == IMAGE_TOKEN_INDEX)[0]
            assert len(pos) == 1, "exactly one <image> per prompt"
            i = int(pos[0])
            tk = tokens[b]
            if n_frames is not None:
                tk = tk[: n_frames[b] * tpf]
            rows.append(np.concatenate([
                table[ids[:i]], tk, table[ids[i + 1:]]], axis=0))
        return rows

    def generate_batch(self, ids_list: list[np.ndarray], pixels: np.ndarray,
                       bert_ids: np.ndarray, bert_mask: np.ndarray,
                       tokenizer, *, max_new_tokens: int = 512,
                       temperature: float = 0.0, top_p: float = 0.9,
                       prng_key=None, n_frames: list[int] | None = None
                       ) -> list[str]:
        from ..mllm.generate import bucket_len, generate

        tokens = self.video_tokens(pixels, bert_ids, bert_mask)
        rows = self.splice_rows(ids_list, tokens, n_frames)
        B = len(rows)
        S = bucket_len(max(len(r) for r in rows))
        H = rows[0].shape[-1]
        emb = np.zeros((B, S, H), np.float32)
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


def convert_llamavid_state(vcfg: CLIPVisionConfig, llm_cfg: LLMConfig,
                           sd: dict, *, feature_layer: int = -2,
                           num_heads: int = 12) -> tuple[QFormerConfig, dict]:
    """LLaMA-VID checkpoint state dict (``model.vision_tower.vision_tower.
    vision_model.*``, ``model.vlm_att_*``, ``model.mm_projector``,
    ``model.layers...``, ``lm_head``) -> (qformer cfg, our param tree)."""
    n_run = n_tower_layers(vcfg, feature_layer)

    def dense(p):
        return {"kernel": np.asarray(_t(sd[f"{p}.weight"])).T,
                "bias": np.asarray(_t(sd[f"{p}.bias"]))}

    qsd = {k.removeprefix("model.vlm_att_encoder."): v for k, v in sd.items()
           if k.startswith("model.vlm_att_encoder.")}
    qsd["query_tokens"] = sd["model.vlm_att_query"]
    qf_cfg, qparams = from_bert_qformer_text(qsd, prefix="bert.",
                                             num_heads=num_heads)
    params: dict = {
        "tower": _convert_tower(
            vcfg, sd, "model.vision_tower.vision_tower", n_run),
        "qformer": qparams,
        "att_proj": dense("model.vlm_att_projector"),
        "key_proj": dense("model.vlm_att_key_projector"),
        "val_proj": dense("model.vlm_att_val_projector"),
    }
    if "model.vlm_att_ln.weight" in sd:
        params["att_ln"] = {"scale": _t(sd["model.vlm_att_ln.weight"]),
                            "bias": _t(sd["model.vlm_att_ln.bias"])}
    if "model.mm_projector.weight" in sd:      # linear
        params["mm_projector"] = {"linear_1": dense("model.mm_projector")}
    else:                                      # mlp2x_gelu (Sequential 0/2)
        params["mm_projector"] = {
            "linear_1": dense("model.mm_projector.0"),
            "linear_2": dense("model.mm_projector.2")}
    lsd = {k.removeprefix("model."): v for k, v in sd.items()
           if k.startswith("model.layers.")
           or k in ("model.embed_tokens.weight", "model.norm.weight")}
    lsd = {f"model.{k}": v for k, v in lsd.items()}
    lsd["lm_head.weight"] = sd["lm_head.weight"]
    params["llm"] = convert_llm_state(llm_cfg, lsd)
    return qf_cfg, jax.tree_util.tree_map(jnp.asarray, params)


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                      else x)


class LlamaVidCaller:
    """Unified judge wrapper (utils/llamavid.py protocol: 1 fps frames,
    llava_v1 conversation, <image> insertion, sampled decode t=0.5
    top_p=0.7, response flattening + </s> strip) + the batched
    ``caller(samples, prompts)`` contract."""

    def __init__(self, model: LlamaVid, tokenizer, bert_tokenizer, *,
                 batch: int = 2, max_new_tokens: int = 512,
                 temperature: float = 0.0, top_p: float = 0.7,
                 seed: int = 0, fps: float = 1.0, max_frames: int = 32,
                 bert_max_length: int = 256):
        self.model = model
        self.tok = tokenizer
        self.bert_tok = bert_tokenizer
        self.batch = batch
        self.max_new_tokens = max_new_tokens
        self.temperature = float(temperature)
        self.top_p = top_p
        self.seed = seed
        self.fps = fps
        self.max_frames = max_frames
        self.bert_max_length = bert_max_length

    @classmethod
    def from_checkpoint(cls, model_path: str, bert_path: str, **kw
                        ) -> "LlamaVidCaller":
        """Assemble from a real LLaMA-VID checkpoint dir (config.json +
        torch bins + tokenizer) and the BERT tokenizer the Q-Former uses
        (``init_bert``, arch:204-210: bert-base-uncased + '[DEC]')."""
        import json
        import os

        import torch
        from transformers import AutoTokenizer

        from ..encoders.vit_clip import CLIPVisionConfig
        from ..mllm.llm import LLMConfig

        with open(os.path.join(model_path, "config.json")) as f:
            cfg = json.load(f)
        sd = {}
        for fn in sorted(os.listdir(model_path)):
            if fn.endswith(".bin") or fn.endswith(".pth"):
                sd.update(torch.load(os.path.join(model_path, fn),
                                     map_location="cpu"))
        from transformers import CLIPVisionConfig as HFCLIPVisionConfig
        from transformers import LlamaConfig

        vcfg = CLIPVisionConfig.from_hf(
            HFCLIPVisionConfig(**cfg["vision_tower_config"])
            if "vision_tower_config" in cfg else
            HFCLIPVisionConfig(hidden_size=cfg.get("mm_hidden_size", 1408)),
            projection_dim=1)
        llm_cfg = LLMConfig.from_hf(LlamaConfig(**{
            k: v for k, v in cfg.items()
            if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                     "num_attention_heads", "num_key_value_heads",
                     "intermediate_size", "max_position_embeddings",
                     "rms_norm_eps", "rope_theta")}))
        fl = cfg.get("mm_vision_select_layer", -2)
        qf_cfg, params = convert_llamavid_state(vcfg, llm_cfg, sd,
                                                feature_layer=fl)
        model = LlamaVid(
            vcfg, qf_cfg, llm_cfg, params, feature_layer=fl,
            compress_type=cfg.get("compress_type", "mean"),
            use_att_ln="pretrain" in cfg.get("bert_type", "qformer_pretrain"),
            mm_projector_type=cfg.get("mm_projector_type", "mlp2x_gelu"))
        tok = AutoTokenizer.from_pretrained(model_path, use_fast=False)
        bert_tok = AutoTokenizer.from_pretrained(bert_path,
                                                 truncation_side="left")
        bert_tok.add_special_tokens({"bos_token": "[DEC]"})
        return cls(model, tok, bert_tok, **kw)

    def _load_frames(self, sample: dict) -> np.ndarray:
        if "frames" in sample:
            frames = np.asarray(sample["frames"])
            src_fps = sample.get("fps", 25.0)
        else:
            from ..io import video as vio

            frames = vio.decode_frames(sample["video_path"])
            src_fps = sample.get("fps", 25.0)
        # 1 fps sampling (utils/llamavid.py:55-60), bounded for static batch
        step = max(1, round(src_fps / self.fps))
        frames = frames[::step][: self.max_frames]
        return frames

    def preprocess(self, frames: np.ndarray) -> np.ndarray:
        """CLIPImageProcessor semantics: shortest-edge resize + center crop
        + CLIP mean/std."""
        from ..ops.image import resize_separable

        c = self.model.vcfg.image_size
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

    def prompt_ids(self, prompt: str) -> np.ndarray:
        text = (f"{LLAVA_V1_SYSTEM} USER: {DEFAULT_IMAGE_TOKEN}\n{prompt} "
                f"ASSISTANT:")
        return tokenizer_image_token(text, self.tok)

    def bert_prompt(self, prompts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """vlm_att_tokenlizer(padding='longest', truncation, max 256) on the
        RAW user prompt (arch:277-283 via update_prompt)."""
        enc = self.bert_tok(prompts, padding="longest", truncation=True,
                            max_length=self.bert_max_length)
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        return ids, mask

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
            ids = [self.prompt_ids(prompts[j]) for j in grp]
            bids, bmask = self.bert_prompt([prompts[j] for j in grp])
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            texts = self.model.generate_batch(
                ids, pixels, bids, bmask, self.tok,
                max_new_tokens=self.max_new_tokens,
                temperature=self.temperature, top_p=self.top_p,
                prng_key=sub, n_frames=n_frames)
            for j, t in zip(grp, texts):
                t = t.replace("\n", " ").replace("\t", " ").strip()
                if t.endswith("</s>"):
                    t = t[: -len("</s>")]
                out[j] = t.strip()
        return out

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        return self([{"video_path": video_path}], [prompt])[0]
