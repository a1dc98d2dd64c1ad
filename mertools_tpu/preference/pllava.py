"""PLLaVA zero-shot judge — LLaVA-NeXT with adaptive spatio-temporal
pooling.

Reference wrapper: ``MER2026/MER2026_Track3/utils/pllava.py`` (load_pllava
with num_frames=16, lora_alpha=4, the "Video Magic ChatBot" SYSTEM string,
num_beams=1 / temperature=1.0 sampled answers, max_new_tokens=200).
NOTE: the wrapper imports ``pllava.*`` which is NOT vendored anywhere in
the reference tree — this implementation follows the published PLLaVA
architecture (magic-research/PLLaVA ``models/pllava/modeling_pllava.py``):

- CLIP ViT tower, ``vision_feature_layer`` hidden states, CLS dropped
  under the "default" strategy;
- 2-layer GELU ``multi_modal_projector`` applied PER FRAME;
- **AdaptiveAvgPool3d** over (T, 24, 24) to ``pooling_shape``
  (16, 12, 12) on the projected features -> 2304 video tokens
  (torch floor/ceil interval semantics reproduced exactly via per-axis
  averaging matrices — adaptive average pooling is separable);
- tokens overwrite the expanded ``<image>`` placeholders; LoRA LLaMA.

Parity vs a hand-assembled torch oracle (HF CLIPVisionModel +
F.adaptive_avg_pool3d + tiny LLaMA) in tests/test_pllava.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..encoders.vit_clip import CLIPVisionConfig
from ..mllm.llm import LLMConfig
from .videollava import VideoLlava, VideoLlavaCaller, convert_videollava_state

PLLAVA_SYSTEM = (
    "You are a powerful Video Magic ChatBot, a large vision-language "
    "assistant. \nYou are able to understand the video content that the "
    "user provides and assist the user in a video-language related task."
    "\nThe user might provide you with the video and maybe some extra "
    "noisy information to help you out or ask you a question. Make use of "
    "the information in a proper way to be competent for the job.\n### "
    "INSTRUCTIONS:\n1. Follow the user's instruction.\n2. Be critical yet "
    "believe in yourself.\n")


def adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix reproducing torch
    AdaptiveAvgPool1d exactly: output i averages input
    [floor(i*n_in/n_out), ceil((i+1)*n_in/n_out))."""
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -(-((i + 1) * n_in) // n_out)   # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


class Pllava(VideoLlava):
    """LLaVA tower + projector per frame, then separable adaptive 3D
    average pooling to ``pooling_shape`` over (T, grid, grid)."""

    def __init__(self, vcfg, llm_cfg, params, *, image_token_index: int,
                 feature_layer: int = -2, select_strategy: str = "default",
                 pooling_shape: tuple = (16, 12, 12)):
        super().__init__(vcfg, llm_cfg, params,
                         video_token_index=image_token_index,
                         feature_layer=feature_layer,
                         select_strategy=select_strategy)
        self.pooling_shape = tuple(pooling_shape)
        grid = vcfg.image_size // vcfg.patch_size
        self._grid = grid

        def pool(feats, mt, mh, mw):
            # feats (B, T, g, g, H); per-axis adaptive means
            x = jnp.einsum("ot,bthwd->bohwd", mt, feats,
                           precision=jax.lax.Precision.HIGHEST)
            x = jnp.einsum("oh,bthwd->btowd", mh, x,
                           precision=jax.lax.Precision.HIGHEST)
            x = jnp.einsum("ow,bthwd->bthod", mw, x,
                           precision=jax.lax.Precision.HIGHEST)
            return x

        self._pool = jax.jit(pool)

    @classmethod
    def from_hf_torch(cls, hf_model, *, pooling_shape=(16, 12, 12)
                      ) -> "Pllava":
        """From an HF-Llava-shaped model (vision_tower +
        multi_modal_projector + language_model)."""
        cfg = hf_model.config
        vcfg = CLIPVisionConfig.from_hf(cfg.vision_config, projection_dim=1)
        llm_cfg = LLMConfig.from_hf(cfg.text_config)
        fl = cfg.vision_feature_layer
        sd = dict(hf_model.state_dict())
        # map llava naming (vision_tower) onto the videollava converter
        sd = {k.replace("model.vision_tower.", "model.video_tower.")
              .replace("vision_tower.", "video_tower.")
              if k.startswith(("vision_tower.", "model.vision_tower."))
              else k: v for k, v in sd.items()}
        params = convert_videollava_state(vcfg, llm_cfg, sd,
                                          feature_layer=fl)
        return cls(vcfg, llm_cfg, params,
                   image_token_index=cfg.image_token_index,
                   feature_layer=fl,
                   select_strategy=cfg.vision_feature_select_strategy,
                   pooling_shape=pooling_shape)

    @property
    def tokens_per_video(self) -> int:
        return int(np.prod(self.pooling_shape))

    def video_features(self, pixels: np.ndarray) -> np.ndarray:
        """(B, T, H, W, 3) normalized -> (B, prod(pooling_shape), H_llm):
        tower(-2) -> CLS drop -> projector -> adaptive 3D avg pool."""
        B, T = pixels.shape[:2]
        h = self._encode(self.params, jnp.asarray(
            pixels.reshape((B * T,) + pixels.shape[2:])), "video_tower")
        if self.select_strategy == "default":
            h = h[:, 1:]
        g = self._grid
        h = h.reshape(B, T, g, g, h.shape[-1])
        pt, ph, pw = self.pooling_shape
        mt = jnp.asarray(adaptive_pool_matrix(T, pt))
        mh = jnp.asarray(adaptive_pool_matrix(g, ph))
        mw = jnp.asarray(adaptive_pool_matrix(g, pw))
        out = np.asarray(self._pool(h, mt, mh, mw))
        return out.reshape(B, pt * ph * pw, -1)


class PllavaCaller(VideoLlavaCaller):
    """utils/pllava.py protocol: 16 uniform frames, the Video-Magic
    system preamble, plain USER/ASSISTANT turns, sampled decode t=1.0
    (num_beams=1), max_new_tokens=200; --temperature 0 stays greedy.
    The ``<image>`` placeholder expands to prod(pooling_shape) tokens."""

    VIDEO_TOKEN = "<image>"

    def __init__(self, model_path: str | None = None, *, model=None,
                 tokenizer=None, batch: int = 2, n_frames: int = 16,
                 max_new_tokens: int = 200, temperature: float = 0.0,
                 seed: int = 0):
        super().__init__(model_path, model=model, tokenizer=tokenizer,
                         batch=batch, n_frames=n_frames,
                         max_new_tokens=max_new_tokens,
                         temperature=temperature, chat_template=None,
                         seed=seed)

    def prompt_ids(self, prompt: str) -> np.ndarray:
        n_tok = self.model.tokens_per_video
        text = (f"{PLLAVA_SYSTEM} USER: {self.VIDEO_TOKEN}\n{prompt} "
                f"ASSISTANT:")
        text = text.replace(self.VIDEO_TOKEN, self.VIDEO_TOKEN * n_tok, 1)
        return np.asarray(self.tok(text).input_ids, np.int32)

    # videollava's preprocess (square resize + CLIP norm) matches the
    # PLLaVA processor's 336 resize; frames are uniform-sampled in
    # _load_frames (inherited)
