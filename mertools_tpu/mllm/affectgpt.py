"""AffectGPT-equivalent audio-video-text MLLM.

Reference (``my_affectgpt/models/affectgpt.py``): frozen visual (CLIP/EVA) and
acoustic (HuBERT) encoders feed per-modality fusion branches — Q-Former
(frame/audio position embeddings, :142-255), unnormalized linear-score
``attention`` pooling (:442-520, :543-568) or plain ``mean`` pooling — whose
outputs are projected to the LLM dim and SPLICED into the token-embedding
sequence at placeholder runs (:686-711). A ``multi`` branch pre-fuses the raw
video/audio hidden states (projections to a shared width + position embedding
+ Q-Former, or a 2-way attention mix — :580-655). Up to four segments are
spliced per sample (frame / face / audio / multi / image), selected by the
dataset's ``face_or_frame`` mode (base_dataset.py:150-181, prompt templates
:463-549); the best-setup config is ``multiface_audio_face_text`` with
``attention`` fusion everywhere (train_configs/..._bestsetup_bestfusion_
face_lz.yaml:16-19,55). Face and frame share the video branch weights
(forward:660-664 calls ``encode_video_merge`` for both); the LLM is
LoRA-wrapped with the base frozen and the loss is causal LM CE (:722-731).

TPU-native: everything is one jitted forward; the stream set is static
(derived from config), every splice is a vmapped ``dynamic_update_slice`` at a
per-sample start index; frozen features enter under ``stop_gradient`` and the
optimizer masks non-trainable params (see :func:`trainable_labels`).

Back-compat: when ``cfg.face_or_frame is None`` the batch carries one fused
AV block (``video_feats``/``audio_feats``/``splice_start``) exactly as before.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from .llm import LLM, LLMConfig, lm_loss
from .qformer import QFormer, QFormerConfig

_PRECISION = jax.lax.Precision.HIGHEST

# Spliced placeholder segments per ``face_or_frame`` mode, in prompt order
# (base_dataset.py:463-549 — <MultiHere> first, then <AudioHere>, then the
# visual runs; 'faceframe' orders audio, frame, face).
SEGMENTS_BY_MODE = {
    "faceframe": ("audio", "frame", "face"),
    "face": ("audio", "face"),
    "frame": ("audio", "frame"),
    "audioonly": ("audio",),
    "textonly": (),
    "faceonly": ("face",),
    "frameonly": ("frame",),
    "image": ("image",),
    "audio_text": ("audio",),
    "face_text": ("face",),
    "frame_text": ("frame",),
    "multiface_text": ("multi",),
    "multiface_audio_face_text": ("multi", "audio", "face"),
    "multiframe_audio_frame_text": ("multi", "audio", "frame"),
    "multiface_audio_face_frame_text": ("multi", "audio", "face", "frame"),
}


def stream_plan(face_or_frame: str) -> tuple[tuple[str, ...], set[str]]:
    """(spliced segments in prompt order, encoder streams to run).

    The encode set is the reference's ``get_needed_data``
    (base_dataset.py:150-181) plus the multi branch's inputs: ``multi``
    consumes (face|frame per the mode prefix) and audio hidden states even
    when those streams are not themselves spliced (e.g. 'multiface_text').
    """
    segments = SEGMENTS_BY_MODE[face_or_frame]
    needed = {s for s in segments if s != "multi"}
    if "multi" in segments:
        needed.add("face" if face_or_frame.startswith("multiface")
                   else "frame")
        needed.add("audio")
    return segments, needed


@dataclass(frozen=True)
class AffectGPTConfig:
    llm: LLMConfig = field(default_factory=LLMConfig.tiny)
    video_qformer: QFormerConfig = field(default_factory=lambda: QFormerConfig(num_queries=32))
    audio_qformer: QFormerConfig = field(default_factory=lambda: QFormerConfig(num_queries=8))
    multi_qformer: QFormerConfig | None = None  # AV pre-fusion stage
    video_dim: int = 768     # frozen visual encoder output dim
    audio_dim: int = 1024    # frozen acoustic encoder output dim
    image_dim: int | None = None   # image stream dim (None -> video_dim)
    max_video_frames: int = 64
    max_audio_frames: int = 64     # reference Embedding(8, D) (:201) — ours
                                   # sizes to the feature-store cap
    multi_max_positions: int = 264  # reference Embedding(264, maxdim) (:256)
    # Branch fusion types (reference *_fusion_type — affectgpt.py:56-59).
    # ``fusion`` is the default for the video/audio branches; the per-branch
    # keys override it.
    fusion: str = "qformer"            # qformer | mean | attention
    video_fusion: str | None = None
    audio_fusion: str | None = None
    multi_fusion: str = "qformer"      # qformer | attention
    image_fusion: str = "mean"         # token | mean
    # Pooled-expansion token counts for mean/attention branches (the pooled
    # vector is repeated this many times — :437-440). Q-Former branches use
    # their num_queries instead.
    num_video_query_token: int = 1
    num_audio_query_token: int = 1
    num_multi_query_token: int = 1
    num_image_query_token: int = 1
    # Multi-stream mode: a SEGMENTS_BY_MODE key, or None for the legacy
    # single-block (video+audio) splice contract.
    face_or_frame: str | None = None
    # Chunked LM loss (round 5): > 0 computes the training cross-entropy
    # over sequence chunks of this size without materializing the
    # (B, S, V) logits (LLM.loss) — the memory lever for long-sequence
    # training (B=8 x S=1024 x V=32k dense logits OOM the 16 GB chip).
    # The forward then returns (loss, None). 0 = dense path (default).
    loss_chunk: int = 0

    @property
    def video_fusion_type(self) -> str:
        return self.video_fusion or self.fusion

    @property
    def audio_fusion_type(self) -> str:
        return self.audio_fusion or self.fusion

    @property
    def multi_width(self) -> int:
        """Shared width of the multi branch (reference max_hidden_size)."""
        return max(self.video_dim, self.audio_dim)

    @property
    def has_multi(self) -> bool:
        if self.face_or_frame is not None:
            return "multi" in SEGMENTS_BY_MODE[self.face_or_frame]
        return self.multi_qformer is not None

    def segment_tokens(self, segment: str) -> int:
        """Spliced token count of one segment (placeholder run length)."""
        if segment in ("frame", "face"):
            return (self.video_qformer.num_queries
                    if self.video_fusion_type == "qformer"
                    else self.num_video_query_token)
        if segment == "audio":
            return (self.audio_qformer.num_queries
                    if self.audio_fusion_type == "qformer"
                    else self.num_audio_query_token)
        if segment == "multi":
            return (self.multi_qformer.num_queries
                    if self.multi_fusion == "qformer" and self.multi_qformer
                    else self.num_multi_query_token)
        if segment == "image":
            return self.num_image_query_token
        raise KeyError(segment)


def _expand(tok: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, H) pooled vector -> (B, n, H) repeated tokens (:437-440)."""
    return jnp.broadcast_to(tok[:, None, :], (tok.shape[0], n, tok.shape[1]))


def _masked_mean(feats, mask):
    m = (jnp.ones(feats.shape[:2], feats.dtype) if mask is None
         else mask.astype(feats.dtype))
    return (feats * m[..., None]).sum(1) / jnp.maximum(
        m.sum(1, keepdims=True), 1.0)


class AffectGPT(nn.Module):
    cfg: AffectGPTConfig
    precision: object = _PRECISION

    def setup(self):
        c = self.cfg
        dense = lambda n, d: nn.Dense(d, name=n, precision=self.precision)

        # --- video branch (shared by the face and frame streams, :660-664)
        vf = c.video_fusion_type
        if vf == "qformer":
            self.frame_pos = self.param(
                "frame_position_embedding", nn.initializers.normal(0.02),
                (c.max_video_frames, c.video_dim))
            self.video_qformer = QFormer(c.video_qformer, self.precision)
        elif vf == "attention":
            # unnormalized linear scores (:442-478: Linear(D, 1), no softmax)
            self.video_attention_mlp = dense("video_attention_mlp", 1)
        # reference affectgpt_proj (:179) — shared across face/frame
        self.video_proj = dense("video_proj", c.llm.hidden_size)

        # --- audio branch
        af = c.audio_fusion_type
        if af == "qformer":
            self.audio_pos = self.param(
                "audio_position_embedding", nn.initializers.normal(0.02),
                (c.max_audio_frames, c.audio_dim))
            self.audio_qformer = QFormer(c.audio_qformer, self.precision)
        elif af == "attention":
            self.audio_attention_mlp = dense("audio_attention_mlp", 1)
        self.audio_proj = dense("audio_proj", c.llm.hidden_size)

        # --- multi branch (pre-fusion of raw AV hiddens, :245-299)
        if c.has_multi:
            self.multi_video_embs = dense("multi_video_embs", c.multi_width)
            self.multi_audio_embs = dense("multi_audio_embs", c.multi_width)
            if c.multi_fusion == "qformer":
                assert c.multi_qformer is not None, \
                    "multi_fusion='qformer' needs a multi_qformer config"
                self.multi_pos = self.param(
                    "multi_position_embedding", nn.initializers.normal(0.02),
                    (c.multi_max_positions, c.multi_width))
                self.multi_qformer_mod = QFormer(c.multi_qformer,
                                                 self.precision,
                                                 name="multi_qformer")
            else:  # 2-way attention mix (:615-640)
                self.attention_mlp = dense("attention_mlp", c.multi_width)
                self.fc_att = dense("fc_att", 2)
            self.multi_proj = dense("multi_proj", c.llm.hidden_size)

        # --- image branch (:301-346)
        if (c.face_or_frame is not None
                and "image" in stream_plan(c.face_or_frame)[1]):
            self.image_proj = dense("image_proj", c.llm.hidden_size)

        self.llm = LLM(c.llm, self.precision)

    # ------------------------------------------------------------------ #
    # fusion branches — each returns (llm_tokens (B, n, H), raw hiddens)  #
    # ------------------------------------------------------------------ #
    def _attention_pool(self, feats, mask, score_mlp):
        """Σ_t h_t · s_t with s = Linear(D,1)(h): reference encode_*_attention
        (:442-478) — scores are NOT softmaxed; padded steps score 0."""
        scores = score_mlp(feats)                         # (B, T, 1)
        if mask is not None:
            scores = scores * mask[..., None].astype(scores.dtype)
        return (feats * scores).sum(1)                    # (B, D)

    def _video_branch(self, feats, mask):
        c = self.cfg
        feats = jax.lax.stop_gradient(feats)
        hiddens = feats  # raw encoder hiddens feed the multi branch (:370)
        vf = c.video_fusion_type
        if vf == "qformer":
            x = feats + self.frame_pos[None, : feats.shape[1]]
            tok = self.video_proj(self.video_qformer(x, mask))
        elif vf == "mean":
            tok = _expand(self.video_proj(_masked_mean(feats, mask)),
                          c.num_video_query_token)
        else:
            pooled = self._attention_pool(feats, mask,
                                          self.video_attention_mlp)
            tok = _expand(self.video_proj(pooled), c.num_video_query_token)
        return tok, hiddens

    def _audio_branch(self, feats, mask):
        c = self.cfg
        feats = jax.lax.stop_gradient(feats)
        hiddens = feats
        af = c.audio_fusion_type
        if af == "qformer":
            x = feats + self.audio_pos[None, : feats.shape[1]]
            tok = self.audio_proj(self.audio_qformer(x, mask))
        elif af == "mean":
            tok = _expand(self.audio_proj(_masked_mean(feats, mask)),
                          c.num_audio_query_token)
        else:
            pooled = self._attention_pool(feats, mask,
                                          self.audio_attention_mlp)
            tok = _expand(self.audio_proj(pooled), c.num_audio_query_token)
        return tok, hiddens

    def _multi_branch(self, video_hiddens, video_mask, audio_hiddens,
                      audio_mask):
        c = self.cfg
        if c.multi_fusion == "qformer":   # :580-613
            v = self.multi_video_embs(video_hiddens)
            a = self.multi_audio_embs(audio_hiddens)
            x = jnp.concatenate([v, a], axis=1)
            x = x + self.multi_pos[None, : x.shape[1]]
            ones = lambda h: jnp.ones(h.shape[:2], jnp.int32)
            m = jnp.concatenate(
                [video_mask if video_mask is not None else ones(v),
                 audio_mask if audio_mask is not None else ones(a)], axis=1)
            return self.multi_proj(self.multi_qformer_mod(x, m))
        # attention mix (:615-640): pooled means -> shared width -> 2 scores
        v = self.multi_video_embs(_masked_mean(video_hiddens, video_mask))
        a = self.multi_audio_embs(_masked_mean(audio_hiddens, audio_mask))
        att = self.fc_att(self.attention_mlp(
            jnp.concatenate([v, a], axis=-1)))            # (B, 2), no softmax
        fused = v * att[:, 0:1] + a * att[:, 1:2]
        return _expand(self.multi_proj(fused), c.num_multi_query_token)

    def _image_branch(self, feats):
        """(B, Tq, D) per-image tokens: 'token' keeps one LLM token per input
        token (:301-322), 'mean' pools then repeats (:324-344)."""
        c = self.cfg
        feats = jax.lax.stop_gradient(feats)
        if c.image_fusion == "token":
            return self.image_proj(feats)
        return _expand(self.image_proj(feats.mean(axis=1)),
                       c.num_image_query_token)

    # ------------------------------------------------------------------ #
    # legacy single-block contract (face_or_frame=None)                   #
    # ------------------------------------------------------------------ #
    @property
    def num_av_tokens(self) -> int:
        c = self.cfg
        if c.has_multi:
            return c.segment_tokens("multi")
        return c.segment_tokens("frame") + c.segment_tokens("audio")

    def encode_av(self, video_feats, audio_feats, video_mask=None,
                  audio_mask=None):
        """Frozen-encoder features -> (B, P, H_llm) AV tokens (one block:
        multi tokens when the multi branch is on, else video ++ audio)."""
        v_tok, v_hid = self._video_branch(video_feats, video_mask)
        a_tok, a_hid = self._audio_branch(audio_feats, audio_mask)
        if self.cfg.has_multi:
            return self._multi_branch(v_hid, video_mask, a_hid, audio_mask)
        return jnp.concatenate([v_tok, a_tok], axis=1)

    # ------------------------------------------------------------------ #
    # forward                                                             #
    # ------------------------------------------------------------------ #
    def _splice_all(self, embeds, batch):
        """Splice every configured segment at its per-sample start index."""

        def splice(e, a, start):
            return jax.lax.dynamic_update_slice(e, a.astype(e.dtype),
                                                (start, 0))

        c = self.cfg
        if c.face_or_frame is None:
            av = self.encode_av(batch["video_feats"], batch["audio_feats"],
                                batch.get("video_mask"),
                                batch.get("audio_mask"))
            return jax.vmap(splice)(embeds, av, batch["splice_start"])

        segments, needed = stream_plan(c.face_or_frame)
        toks, hiddens, masks = {}, {}, {}
        for s in ("face", "frame"):
            if s in needed:
                masks[s] = batch.get(f"{s}_mask")
                toks[s], hiddens[s] = self._video_branch(
                    batch[f"{s}_feats"], masks[s])
        if "audio" in needed:
            masks["audio"] = batch.get("audio_mask")
            toks["audio"], hiddens["audio"] = self._audio_branch(
                batch["audio_feats"], masks["audio"])
        if "image" in needed:
            toks["image"] = self._image_branch(batch["image_feats"])
        if "multi" in segments:
            v = "face" if c.face_or_frame.startswith("multiface") else "frame"
            toks["multi"] = self._multi_branch(
                hiddens[v], masks[v], hiddens["audio"], masks["audio"])
        for s in segments:
            embeds = jax.vmap(splice)(embeds, toks[s],
                                      batch[f"splice_{s}"])
        return embeds

    def __call__(self, batch: dict):
        """Legacy batch keys (face_or_frame=None): video_feats (B, Tv, Dv),
        audio_feats (B, Ta, Da), [video_mask/audio_mask], input_ids (B, S)
        with a placeholder run of num_av_tokens, splice_start (B,) int.

        Multi-stream batch keys (face_or_frame set): per needed stream s —
        ``{s}_feats`` (+ optional ``{s}_mask``) — and per spliced segment g —
        ``splice_{g}`` (B,) int placeholder-run starts.

        Always: attention_mask (B, S), labels (B, S) with -100 outside the
        answer. Returns (loss, logits) — logits is None when
        ``cfg.loss_chunk`` > 0 (the chunked loss never materializes them).
        """
        embeds = self._splice_all(self.llm.embed(batch["input_ids"]), batch)
        if self.cfg.loss_chunk:
            loss = self.llm.loss(embeds, batch["labels"],
                                 batch.get("attention_mask"),
                                 chunk=self.cfg.loss_chunk)
            return loss, None
        logits = self.llm(embeds, batch.get("attention_mask"))
        loss = lm_loss(logits, batch["labels"])
        return loss, logits

    def generate_step_embeds(self, batch: dict):
        """Spliced prompt embeddings for autoregressive decoding."""
        return self._splice_all(self.llm.embed(batch["input_ids"]), batch)


# reference frozen_* config keys (affectgpt.py:44-48,121-226; the best-setup
# yamls set them all False = fully trainable bridge) -> our param subtrees
FROZEN_KEY_MAP = {
    "frozen_llm": ("llm",),                       # includes LoRA (:121-124)
    # each *_Qformer flag freezes that branch's fusion module whatever the
    # fusion type (qformer: Q-Former + position embedding + query tokens,
    # reference :154-176; attention: the score MLP)
    "frozen_video_Qformer": ("video_qformer", "frame_position_embedding",
                             "video_attention_mlp"),
    "frozen_audio_Qformer": ("audio_qformer", "audio_position_embedding",
                             "audio_attention_mlp"),
    "frozen_multi_Qformer": ("multi_qformer", "multi_position_embedding",
                             "attention_mlp", "fc_att",
                             "multi_video_embs", "multi_audio_embs"),
    "frozen_video_proj": ("video_proj",),
    "frozen_audio_proj": ("audio_proj",),
    "frozen_multi_llama_proj": ("multi_proj",),
    "frozen_image_proj": ("image_proj",),
}


def frozen_components(cfg: dict) -> tuple:
    """Reference frozen_* yaml keys -> param-subtree names to freeze."""
    out = []
    for key, subtrees in FROZEN_KEY_MAP.items():
        if cfg.get(key):
            out.extend(subtrees)
    return tuple(out)


def trainable_labels(params: dict, frozen: tuple = ()) -> dict:
    """'train' for Q-Formers / projections / position embeddings / fusion
    MLPs / LoRA, 'frozen' for the LLM base — mirrors the reference's
    trainable-params-only regime (runner_base.py:594 saves trainable-only
    state dicts). ``frozen`` freezes additional top-level subtrees (the
    reference frozen_* flags, affectgpt.py:121-226; 'llm' in ``frozen``
    freezes the LoRA deltas too, :121-124)."""

    def label(path, _leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        if names and names[0] in frozen:
            return "frozen"
        if any(n in ("lora_a", "lora_b") for n in names):
            return "train"
        if names and names[0] == "llm":
            return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)
