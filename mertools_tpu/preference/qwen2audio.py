"""Qwen2-Audio zero-shot wrapper — a REAL runnable judge/baseline model.

Reference: ``MER2026/MER2026_Track3/utils/qwen2audio.py`` (sample-wise
``func_calling_sample(audio, video, prompt, input_type)`` around HF
``Qwen2AudioForConditionalGeneration``, max_new_tokens=512, response
flattened with ``replace('\\n',' ').replace('\\t',' ').strip()``).

TPU-native re-design: the audio tower (a Whisper encoder + k2s2 average
pool + layer norm — ``modeling_qwen2_audio.Qwen2AudioEncoder``) runs batched
under jit at the static (B, n_mels, 3000) shape; log-mels are computed ON
DEVICE (``ops/mel.log_mel_spectrogram`` with n_mels=128); the projector
output is spliced into the LLM token embeddings at the ``<|AUDIO|>``
positions (masked-scatter semantics of the HF forward); decoding rides the
shared KV-cached batched ``mllm/generate.generate``. One compile serves all
clips; the reference loops sample-by-sample on GPU.

Conversion from the HF checkpoint (``audio_tower.* / multi_modal_projector.*
/ language_model.*``) is exact — parity-tested against the torch oracle in
``tests/test_qwen2audio.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..encoders.whisper import _EncLayer, _t
from ..mllm.llm import LLM, LLMConfig
from ..mllm.llm import convert_torch_state as convert_llm_state
from ..ops.mel import log_mel_spectrogram, pad_or_trim

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class AudioTowerConfig:
    """Qwen2AudioEncoderConfig equivalent (field names chosen so
    ``encoders.whisper._EncLayer`` consumes this config directly)."""

    d_model: int = 1280
    num_layers: int = 32
    num_heads: int = 20
    ffn_dim: int = 5120
    num_mel_bins: int = 128
    max_source_positions: int = 1500

    @classmethod
    def from_hf(cls, hf):
        return cls(d_model=hf.d_model, num_layers=hf.encoder_layers,
                   num_heads=hf.encoder_attention_heads,
                   ffn_dim=hf.encoder_ffn_dim,
                   num_mel_bins=hf.num_mel_bins,
                   max_source_positions=hf.max_source_positions)

    @property
    def n_frames(self) -> int:  # required mel length (conv stride 2)
        return 2 * self.max_source_positions


def audio_token_count(n_valid_frames: int) -> int:
    """Mel frames -> number of ``<|AUDIO|>`` placeholder tokens
    (processing_qwen2_audio.Qwen2AudioProcessor.__call__ /
    ``_get_feat_extract_output_lengths``: conv stride 2 then pool stride 2)."""
    input_length = (n_valid_frames - 1) // 2 + 1
    return (input_length - 2) // 2 + 1


class Qwen2AudioTower(nn.Module):
    """Whisper-style encoder + avg-pool(2) + final LayerNorm
    (modeling_qwen2_audio.Qwen2AudioEncoder.forward). ``valid_frames``
    (B,) masks padded mel frames out of every attention layer exactly as
    the HF ForConditionalGeneration forward does (padding_mask at the
    post-conv resolution, additive dtype-min bias)."""

    cfg: AudioTowerConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, mel: jnp.ndarray,
                 valid_frames: jnp.ndarray | None = None) -> jnp.ndarray:
        c = self.cfg
        x = mel.transpose(0, 2, 1)  # (B, T, n_mels)
        x = jax.nn.gelu(nn.Conv(c.d_model, kernel_size=(3,), padding=[(1, 1)],
                                name="conv1", precision=self.precision)(x),
                        approximate=False)
        x = jax.nn.gelu(nn.Conv(c.d_model, kernel_size=(3,), strides=(2,),
                                padding=[(1, 1)], name="conv2",
                                precision=self.precision)(x),
                        approximate=False)
        pos = self.param("embed_positions", nn.initializers.normal(0.02),
                         (c.max_source_positions, c.d_model))
        x = x + pos[None, : x.shape[1]]
        bias = None
        if valid_frames is not None:
            feat_len = (valid_frames - 1) // 2 + 1  # post-conv valid length
            key_ok = jnp.arange(x.shape[1])[None] < feat_len[:, None]
            bias = jnp.where(key_ok, 0.0, -1e30)[:, None, None, :]
        for i in range(c.num_layers):
            x = _EncLayer(c, self.precision, name=f"layer_{i}")(x, bias)
        B, T, D = x.shape
        x = x.reshape(B, T // 2, 2, D).mean(axis=2)  # AvgPool1d(2, stride=2)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)


def convert_qwen2audio_state(tower_cfg: AudioTowerConfig, llm_cfg: LLMConfig,
                             sd: dict) -> dict:
    """HF Qwen2AudioForConditionalGeneration state dict -> our tree
    {tower, projector, llm}."""

    def dense(prefix, use_bias=True):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if use_bias:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    tower: dict = {
        "conv1": {"kernel": _t(sd["audio_tower.conv1.weight"]).transpose(2, 1, 0),
                  "bias": _t(sd["audio_tower.conv1.bias"])},
        "conv2": {"kernel": _t(sd["audio_tower.conv2.weight"]).transpose(2, 1, 0),
                  "bias": _t(sd["audio_tower.conv2.bias"])},
        "embed_positions": _t(sd["audio_tower.embed_positions.weight"]),
        "layer_norm": ln("audio_tower.layer_norm"),
    }
    for i in range(tower_cfg.num_layers):
        pre = f"audio_tower.layers.{i}"
        tower[f"layer_{i}"] = {
            "self_attn_q": dense(f"{pre}.self_attn.q_proj"),
            "self_attn_k": dense(f"{pre}.self_attn.k_proj", use_bias=False),
            "self_attn_v": dense(f"{pre}.self_attn.v_proj"),
            "self_attn_out": dense(f"{pre}.self_attn.out_proj"),
            "self_attn_layer_norm": ln(f"{pre}.self_attn_layer_norm"),
            "final_layer_norm": ln(f"{pre}.final_layer_norm"),
            "fc1": dense(f"{pre}.fc1"), "fc2": dense(f"{pre}.fc2"),
        }

    lsd = {k[len("language_model."):]: v for k, v in sd.items()
           if k.startswith("language_model.")}
    return {
        "tower": jax.tree_util.tree_map(jnp.asarray, tower),
        "projector": jax.tree_util.tree_map(
            jnp.asarray, dense("multi_modal_projector.linear")),
        "llm": convert_llm_state(llm_cfg, lsd),
    }


class Qwen2Audio:
    """Batched TPU Qwen2-Audio: encode → splice → LLM."""

    def __init__(self, tower_cfg: AudioTowerConfig, llm_cfg: LLMConfig,
                 params: dict, audio_token_index: int):
        self.tower_cfg = tower_cfg
        self.llm_cfg = llm_cfg
        self.params = params
        self.audio_token_index = audio_token_index
        self._tower = Qwen2AudioTower(tower_cfg)
        self._llm = LLM(llm_cfg)

        def encode(p, mel, valid_frames):
            feats = self._tower.apply({"params": p["tower"]}, mel,
                                      valid_frames)
            return jnp.einsum("btd,df->btf", feats, p["projector"]["kernel"],
                              precision=_PRECISION) + p["projector"]["bias"]

        self._encode = jax.jit(encode)
        self._forward = jax.jit(
            lambda p, emb, mask: self._llm.apply(
                {"params": p["llm"]}, emb, attention_mask=mask))

    @classmethod
    def from_hf_torch(cls, hf_model) -> "Qwen2Audio":
        cfg = hf_model.config
        tower_cfg = AudioTowerConfig.from_hf(cfg.audio_config)
        llm_cfg = LLMConfig.from_hf(cfg.text_config)
        params = convert_qwen2audio_state(tower_cfg, llm_cfg,
                                          hf_model.state_dict())
        return cls(tower_cfg, llm_cfg, params, cfg.audio_token_index)

    def audio_features(self, mel: np.ndarray,
                       valid_frames: np.ndarray | None = None) -> np.ndarray:
        """(B, n_mels, 2*max_source_positions) log-mels -> (B, T_out, H_llm).
        ``valid_frames`` (B,) = un-padded mel frame counts (HF
        feature_attention_mask.sum(-1))."""
        assert mel.shape[-1] == self.tower_cfg.n_frames, mel.shape
        if valid_frames is None:
            valid_frames = np.full(mel.shape[0], mel.shape[-1], np.int32)
        return np.asarray(self._encode(self.params, jnp.asarray(mel),
                                       jnp.asarray(valid_frames, jnp.int32)))

    def splice_embeds(self, input_ids: np.ndarray,
                      feats: np.ndarray) -> np.ndarray:
        """Token embeddings with audio features scattered at the
        ``<|AUDIO|>`` positions (HF masked-scatter semantics: row b's audio
        placeholder positions receive feats[b] in order)."""
        table = np.asarray(self.params["llm"]["embed_tokens"]["embedding"])
        emb = table[input_ids].astype(np.float32)
        for b in range(input_ids.shape[0]):
            pos = np.where(input_ids[b] == self.audio_token_index)[0]
            emb[b, pos] = feats[b, : len(pos)]
        return emb

    def forward_logits(self, input_ids: np.ndarray, mel: np.ndarray,
                       attention_mask: np.ndarray,
                       valid_frames: np.ndarray | None = None) -> np.ndarray:
        """Parity path: logits over the full (prompt) sequence."""
        feats = self.audio_features(mel, valid_frames)
        emb = self.splice_embeds(input_ids, feats)
        return np.asarray(self._forward(self.params, jnp.asarray(emb),
                                        jnp.asarray(attention_mask)))

    def generate_batch(self, ids_list: list[np.ndarray], mels: np.ndarray,
                       tokenizer, *, valid_frames: np.ndarray | None = None,
                       max_new_tokens: int = 512,
                       temperature: float = 0.0, top_p: float = 0.9,
                       prng_key=None) -> list[str]:
        """Right-pad ragged prompts, splice per-row audio features, decode
        with the shared engine. mels: (B, n_mels, n_frames)."""
        from ..mllm.generate import bucket_len, generate

        B = len(ids_list)
        S = bucket_len(max(len(x) for x in ids_list))
        ids = np.zeros((B, S), np.int32)  # pad id 0 (masked out of attention)
        mask = np.zeros((B, S), np.int32)
        for i, x in enumerate(ids_list):
            ids[i, : len(x)] = x
            mask[i, : len(x)] = 1
        feats = self.audio_features(mels, valid_frames)
        emb = self.splice_embeds(ids, feats)
        emb = emb * mask[..., None]  # pad rows carry no stale audio embeds
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


class Qwen2AudioCaller:
    """The unified wrapper the preference pipelines consume.

    Implements BOTH protocols: the reference's sample-wise
    ``func_calling_sample(audio_path, video_path, prompt, input_type)``
    (utils/qwen2audio.py:41-76) and the batched
    ``caller(samples, prompts) -> responses`` that ``PreferenceJudge``
    uses (samples carry ``wav`` float32 16 kHz arrays or ``audio_path``).
    """

    def __init__(self, model_path: str | None = None, *, model=None,
                 tokenizer=None, batch: int = 4, max_new_tokens: int = 512,
                 chat_template: str | None = None):
        if model is None:
            from transformers import (AutoProcessor,
                                      Qwen2AudioForConditionalGeneration)

            hf = Qwen2AudioForConditionalGeneration.from_pretrained(model_path)
            model = Qwen2Audio.from_hf_torch(hf)
            del hf
            proc = AutoProcessor.from_pretrained(model_path)
            tokenizer = proc.tokenizer
            chat_template = chat_template or getattr(proc, "chat_template",
                                                     None)
        self.model = model
        self.tok = tokenizer
        self.batch = batch
        self.max_new_tokens = max_new_tokens
        self.chat_template = chat_template
        self._audio_token = "<|AUDIO|>"
        self._bos, self._eos = "<|audio_bos|>", "<|audio_eos|>"

    # ---- prompt assembly (processing_qwen2_audio expansion semantics) ----
    def _template_text(self, prompt: str) -> str:
        conv = [{"role": "user", "content": [
            {"type": "audio", "audio_url": "local"},
            {"type": "text", "text": prompt}]}]
        if self.chat_template:
            return self.tok.apply_chat_template(
                conv, chat_template=self.chat_template,
                add_generation_prompt=True, tokenize=False)
        return f"{self._bos}{self._audio_token}{self._eos}{prompt}"

    def prompt_ids(self, prompt: str, n_valid_frames: int) -> np.ndarray:
        text = self._template_text(prompt)
        n_tok = audio_token_count(n_valid_frames)
        text = text.replace(self._audio_token, self._audio_token * n_tok, 1)
        return np.asarray(self.tok(text).input_ids, np.int32)

    def _load_wav(self, sample: dict) -> np.ndarray:
        if "wav" in sample:
            return np.asarray(sample["wav"], np.float32)
        from ..io.wav import read_wav_16k

        return read_wav_16k(sample["audio_path"])

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        n_frames = self.model.tower_cfg.n_frames
        n_mels = self.model.tower_cfg.num_mel_bins
        chunk = n_frames * 160  # 30 s at the whisper hop
        out: list[str] = [""] * len(samples)
        order = list(range(len(samples)))
        for i in range(0, len(order), self.batch):
            grp = order[i: i + self.batch]
            wavs = [self._load_wav(samples[j]) for j in grp]
            valid = [min(n_frames, -(-len(w) // 160)) for w in wavs]
            padded = np.stack([pad_or_trim(w, chunk) for w in wavs])
            mel = np.asarray(log_mel_spectrogram(jnp.asarray(padded),
                                                 n_mels=n_mels))
            ids = [self.prompt_ids(prompts[j], v)
                   for j, v in zip(grp, valid)]
            texts = self.model.generate_batch(
                ids, mel, self.tok,
                valid_frames=np.asarray(valid, np.int32),
                max_new_tokens=self.max_new_tokens)
            for j, t in zip(grp, texts):
                # reference response flattening (utils/qwen2audio.py:74)
                out[j] = t.replace("\n", " ").replace("\t", " ").strip()
        return out

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        """Reference-exact single-sample entry (audio-only model — the
        reference wrapper ignores video_path/input_type too)."""
        return self([{"audio_path": audio_path}], [prompt])[0]
