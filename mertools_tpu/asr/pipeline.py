"""Whisper ASR transcript pipeline (wenetruntime replacement).

Reference: ``MER2024/main-asr.py:11-33`` runs the wenet C++ decoder per wav
and writes ``transcription.csv`` (columns name,sentence); punctuation
refinement is a second pass (``:37-59``), and human-checked transcripts win
in the merge step (``:63-93``).

Here the whole batch runs on TPU: native wav read -> on-device log-mel ->
Whisper encoder -> KV-cached greedy decode (asr/decode.py), B clips per
compile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..encoders.whisper import WhisperConfig, WhisperModel
from ..ops.mel import CHUNK_SAMPLES, log_mel_spectrogram
from .decode import greedy_decode

# Whisper multilingual special tokens (tokenizer-independent ids for the
# openai vocab family, overridable per checkpoint via the tokenizer).
SOT = 50258
TOK_TRANSCRIBE = 50359
TOK_NOTIMESTAMPS = 50363
LANG_BASE = 50259  # <|en|>; language id = LANG_BASE + lang_index


class WhisperASR:
    def __init__(self, cfg: WhisperConfig, params, tokenizer=None,
                 batch_size: int = 8, max_new_tokens: int = 128,
                 prompt: tuple | None = None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_new_tokens = max_new_tokens
        if prompt is None:
            if tokenizer is not None:
                prompt = tuple(tokenizer.convert_tokens_to_ids(
                    ["<|startoftranscript|>", "<|zh|>", "<|transcribe|>",
                     "<|notimestamps|>"]))
            else:
                prompt = (SOT, LANG_BASE + 1, TOK_TRANSCRIBE, TOK_NOTIMESTAMPS)
        self.prompt = tuple(int(t) for t in prompt)
        self._params = jax.device_put(params)
        model = WhisperModel(cfg)

        on_tpu = jax.devices()[0].platform == "tpu"

        @jax.jit
        def encode(p, wavs):
            if on_tpu:  # fused Pallas frontend (ops/mel_pallas.py)
                from ..ops.mel_pallas import log_mel_spectrogram_fused
                mel = log_mel_spectrogram_fused(wavs)
            else:
                mel = log_mel_spectrogram(wavs)       # (B, 80, 3000)
            return model.apply({"params": p}, mel, method=model.encode)

        self._encode = encode

    def transcribe_batch(self, wavs: list[np.ndarray]) -> list[list[int]]:
        """wavs: list of 16 kHz float32 arrays -> generated token ids."""
        B = self.batch_size
        out: list[list[int]] = []
        for i in range(0, len(wavs), B):
            group = wavs[i: i + B]
            batch = np.zeros((B, CHUNK_SAMPLES), np.float32)
            for r, w in enumerate(group):
                batch[r, : min(len(w), CHUNK_SAMPLES)] = w[:CHUNK_SAMPLES]
            enc = self._encode(self._params, jnp.asarray(batch))
            prompt = np.tile(np.asarray(self.prompt, np.int32), (B, 1))
            tokens = np.asarray(greedy_decode(
                self.cfg, self._params, enc, jnp.asarray(prompt),
                len(self.prompt), self.max_new_tokens))
            for r in range(len(group)):
                toks = tokens[r, len(self.prompt):]
                stop = np.nonzero(toks == self.cfg.eos_token_id)[0]
                out.append(toks[: stop[0]].tolist() if len(stop) else
                           toks.tolist())
        return out

    def transcribe(self, wavs: list[np.ndarray]) -> list[str]:
        token_lists = self.transcribe_batch(wavs)
        if self.tokenizer is None:
            raise ValueError("pass a tokenizer to decode to text")
        return [self.tokenizer.decode(t, skip_special_tokens=True).strip()
                for t in token_lists]
