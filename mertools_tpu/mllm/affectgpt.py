"""AffectGPT-equivalent audio-video-text MLLM.

Reference (``my_affectgpt/models/affectgpt.py``): frozen visual (CLIP/EVA) and
acoustic (HuBERT) encoders -> per-modality Q-Formers (video Q-Former adds
frame position embeddings and compresses T x q tokens to 32 — :357-406) ->
Dense projection to the LLM dim -> the projected AV tokens are SPLICED into
the token-embedding sequence at placeholder positions (:677-713) -> LoRA LLM
-> causal LM loss on the answer span (:722-731).

TPU-native: everything is one jitted forward; the splice is a vmapped
``dynamic_update_slice`` at a per-sample start index; frozen parts live under
``stop_gradient`` and the optimizer masks non-trainable params
(see :func:`trainable_labels`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from .llm import LLM, LLMConfig, lm_loss
from .qformer import QFormer, QFormerConfig

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class AffectGPTConfig:
    llm: LLMConfig = field(default_factory=LLMConfig.tiny)
    video_qformer: QFormerConfig = field(default_factory=lambda: QFormerConfig(num_queries=32))
    audio_qformer: QFormerConfig = field(default_factory=lambda: QFormerConfig(num_queries=8))
    multi_qformer: QFormerConfig | None = None  # optional AV fusion stage
    video_dim: int = 768     # frozen visual encoder output dim
    audio_dim: int = 1024    # frozen acoustic encoder output dim
    max_video_frames: int = 64
    fusion: str = "qformer"  # qformer | mean | attention (reference variants)


class AffectGPT(nn.Module):
    cfg: AffectGPTConfig
    precision: object = _PRECISION

    def setup(self):
        c = self.cfg
        self.frame_pos = self.param(
            "frame_position_embedding", nn.initializers.normal(0.02),
            (c.max_video_frames, c.video_dim))
        self.video_qformer = QFormer(c.video_qformer, self.precision)
        self.audio_qformer = QFormer(c.audio_qformer, self.precision)
        if c.fusion == "attention":
            self.video_attn_query = self.param(
                "video_attn_query", nn.initializers.normal(0.02),
                (c.video_dim,))
            self.audio_attn_query = self.param(
                "audio_attn_query", nn.initializers.normal(0.02),
                (c.audio_dim,))
        if c.multi_qformer is not None:
            self.multi_qformer = QFormer(c.multi_qformer, self.precision)
        self.video_proj = nn.Dense(c.llm.hidden_size, name="video_proj",
                                   precision=self.precision)
        self.audio_proj = nn.Dense(c.llm.hidden_size, name="audio_proj",
                                   precision=self.precision)
        self.llm = LLM(c.llm, self.precision)

    @property
    def num_av_tokens(self) -> int:
        c = self.cfg
        if c.fusion in ("mean", "attention"):
            return 2  # one pooled token per modality
        if c.multi_qformer is not None:
            return c.multi_qformer.num_queries
        return c.video_qformer.num_queries + c.audio_qformer.num_queries

    def _pool(self, feats, mask, which: str):
        """mean / attention temporal pooling variants
        (affectgpt.py:408-441 encode_*_mean, :442-520 encode_*_attention)."""
        c = self.cfg
        m = (jnp.ones(feats.shape[:2], feats.dtype) if mask is None
             else mask.astype(feats.dtype))
        if c.fusion == "mean":
            pooled = (feats * m[..., None]).sum(1) / jnp.maximum(
                m.sum(1, keepdims=True), 1.0)
        else:  # learned attention pooling over time
            q = getattr(self, f"{which}_attn_query")
            logits = jnp.einsum("btd,d->bt", feats, q)
            logits = jnp.where(m > 0, logits, -1e30)
            w = jax.nn.softmax(logits, axis=-1)
            pooled = jnp.einsum("bt,btd->bd", w, feats)
        return pooled[:, None]                       # (B, 1, D)

    def encode_av(self, video_feats, audio_feats, video_mask=None, audio_mask=None):
        """Frozen-encoder features -> (B, P, H_llm) AV tokens.

        video_feats: (B, Tv, Dv) frame features; audio_feats: (B, Ta, Da).
        Gradients do not flow into the inputs (encoders are frozen).
        """
        c = self.cfg
        video_feats = jax.lax.stop_gradient(video_feats)
        audio_feats = jax.lax.stop_gradient(audio_feats)
        video_feats = video_feats + self.frame_pos[None, : video_feats.shape[1]]
        if c.fusion in ("mean", "attention"):
            v_tok = self._pool(video_feats, video_mask, "video")
            a_tok = self._pool(audio_feats, audio_mask, "audio")
            return jnp.concatenate(
                [self.video_proj(v_tok), self.audio_proj(a_tok)], axis=1)
        v_tok = self.video_qformer(video_feats, video_mask)
        a_tok = self.audio_qformer(audio_feats, audio_mask)
        if c.multi_qformer is not None:
            av = jnp.concatenate([v_tok, a_tok], axis=1)
            m_tok = self.multi_qformer(av)
            return self.video_proj(m_tok)
        return jnp.concatenate(
            [self.video_proj(v_tok), self.audio_proj(a_tok)], axis=1)

    def __call__(self, batch: dict):
        """batch keys:
          video_feats (B, Tv, Dv), audio_feats (B, Ta, Da),
          [video_mask (B, Tv), audio_mask (B, Ta)],
          input_ids (B, S) with placeholder run of num_av_tokens tokens,
          splice_start (B,) int — index of the placeholder run,
          attention_mask (B, S), labels (B, S) with -100 outside the answer.
        Returns (loss, logits).
        """
        av = self.encode_av(batch["video_feats"], batch["audio_feats"],
                            batch.get("video_mask"), batch.get("audio_mask"))
        embeds = self.llm.embed(batch["input_ids"])

        def splice(e, a, start):
            return jax.lax.dynamic_update_slice(e, a.astype(e.dtype), (start, 0))

        embeds = jax.vmap(splice)(embeds, av, batch["splice_start"])
        logits = self.llm(embeds, batch.get("attention_mask"))
        loss = lm_loss(logits, batch["labels"])
        return loss, logits

    def generate_step_embeds(self, batch: dict):
        """Spliced prompt embeddings for autoregressive decoding (inference)."""
        av = self.encode_av(batch["video_feats"], batch["audio_feats"],
                            batch.get("video_mask"), batch.get("audio_mask"))
        embeds = self.llm.embed(batch["input_ids"])

        def splice(e, a, start):
            return jax.lax.dynamic_update_slice(e, a.astype(e.dtype), (start, 0))

        return jax.vmap(splice)(embeds, av, batch["splice_start"])


def trainable_labels(params: dict) -> dict:
    """'train' for Q-Formers / projections / frame positions / LoRA, 'frozen'
    for the LLM base — mirrors the reference's trainable-params-only regime
    (runner_base.py:594 saves trainable-only state dicts)."""

    def label(path, _leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        if any(n in ("lora_a", "lora_b") for n in names):
            return "train"
        if names and names[0] == "llm":
            return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)
