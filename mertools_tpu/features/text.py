"""Batched text feature extraction.

Reference semantics (``extract_text_huggingface.py``): per transcript —
tokenize, forward with output_hidden_states, sum the last-4 layers (LLMs: -1
only, per MER2023's layer_ids option), slice away special tokens via the
decode-round-trip span probe (``find_start_end_pos:95-120``), FRA = per-token
(T, D), UTT = token mean; empty transcripts produce zeros.

TPU-native: sentences are tokenized up front, bucketed by token length and
forwarded in batches with attention masks. FRA level ships the per-token
(T, D) features (they ARE the product); UTT level applies the span trim +
token mean ON DEVICE so only (B, D) crosses the host link — the link-bound
dev platform measures ~25 MB of hidden states per 64x128 batch otherwise.
Masked batching equals per-sentence forwards exactly (BERT attention masks
padded keys; padded rows are discarded).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..encoders.bert import BertConfig, BertEncoder


def find_token_span(tokenizer, probe: str = "今天天气真好") -> tuple[int, int | None]:
    """Reference's decode-round-trip special-token span detection
    (find_start_end_pos). Returns (start, end) for python slicing."""
    ids = tokenizer(probe)["input_ids"]
    start = 0
    for start in range(0, 3):
        out = tokenizer.decode(ids[start:]).replace(" ", "")
        if out == probe:
            return start, None
        if out.startswith(probe):
            break
    for end in range(-1, -3, -1):
        if tokenizer.decode(ids[start:end]).replace(" ", "") == probe:
            break
    assert tokenizer.decode(ids[start:end]).replace(" ", "") == probe
    return start, end


DEFAULT_TOKEN_BUCKETS = (16, 32, 64, 128, 256, 512)


def _utt_pool(feats, mask, start, end0):
    """On-device span trim + token mean: rows average features[start:
    n_valid+end0] (end0 <= 0); an empty span yields zeros (the reference's
    empty-transcript rule, extract_text_huggingface.py:236-249)."""
    n = jnp.sum(mask, axis=1)                       # valid tokens per row
    e = n + end0
    idx = jnp.arange(feats.shape[1])
    sel = ((idx[None, :] >= start) & (idx[None, :] < e[:, None])
           ).astype(feats.dtype)
    cnt = jnp.sum(sel, axis=1)
    s = jnp.einsum("btd,bt->bd", feats, sel,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.where(cnt[:, None] > 0, s / jnp.maximum(cnt, 1)[:, None], 0.0)


@dataclass
class TextExtractor:
    cfg: BertConfig
    params: dict
    layer_ids: tuple = (-4, -3, -2, -1)
    buckets: tuple = DEFAULT_TOKEN_BUCKETS
    batch_size: int = 64
    precision: object = jax.lax.Precision.HIGHEST
    compute_dtype: str | None = None   # "bf16": production mode (see audio)
    encoder_cls: object = None         # non-BERT zoo (encoders/text_zoo.py)

    def __post_init__(self):
        precision = (jax.lax.Precision.DEFAULT
                     if self.compute_dtype == "bf16" else self.precision)
        enc = (self.encoder_cls or BertEncoder)(self.cfg, precision=precision)

        @jax.jit
        def fwd(params, ids, mask):
            hs = enc.apply({"params": params}, ids, mask)
            return sum(hs[i] for i in self.layer_ids).astype(jnp.float32)

        @jax.jit
        def fwd_utt(params, ids, mask, start, end0):
            return _utt_pool(fwd(params, ids, mask), mask, start, end0)

        self._fwd = fwd
        self._fwd_utt = fwd_utt
        params = self.params
        if self.compute_dtype == "bf16":
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16), params)
        self._params = jax.device_put(params)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def extract(self, token_ids: dict[str, list[int]], span=(1, -1),
                level: str = "FRA") -> dict[str, np.ndarray]:
        """token_ids: name -> tokenizer input_ids (already includes special
        tokens). span: (start, end) from :func:`find_token_span`."""
        start, end = span
        utt = level.upper().startswith("UTT")
        max_len = self.buckets[-1]
        jobs = sorted(token_ids.items(), key=lambda kv: len(kv[1]))
        out: dict[str, np.ndarray] = {}
        D = self.cfg.hidden_size

        i = 0
        pending = []   # dispatch-then-collect (overlap copies with compute)
        while i < len(jobs):
            group = jobs[i: i + self.batch_size]
            bucket = self._bucket(max(len(t) for _, t in group))
            group = [(n, t[:max_len]) for n, t in group]
            i += len(group)

            ids = np.zeros((len(group), bucket), np.int32)
            mask = np.zeros((len(group), bucket), np.int32)
            for r, (_, toks) in enumerate(group):
                ids[r, : len(toks)] = toks
                mask[r, : len(toks)] = 1
            if utt:  # span trim + token mean on device: only (B, D) ships
                res = self._fwd_utt(self._params, jnp.asarray(ids),
                                    jnp.asarray(mask),
                                    jnp.int32(start), jnp.int32(end or 0))
            else:
                res = self._fwd(self._params, jnp.asarray(ids),
                                jnp.asarray(mask))
            pending.append((group, res))
        for group, res in pending:
            feats = np.asarray(res)
            for r, (name, toks) in enumerate(group):
                if utt:
                    out[name] = feats[r]
                    continue
                e = len(toks) + (end or 0)
                emb = feats[r, start:e]
                if len(emb) == 0:
                    # empty transcripts -> zeros (reference :236-249)
                    emb = np.zeros((1, D), np.float32)
                out[name] = emb
        return out


@dataclass
class CausalLMTextExtractor:
    """Decoder-only LM text features (the reference's LLM branch —
    extract_text_huggingface.py runs Baichuan/LLaMA-class models with
    .half() and sums the last 4 hidden states; token span has no trailing
    special token, so span=(start, 0))."""

    cfg: object            # mllm.llm.LLMConfig
    params: dict
    layer_ids: tuple = (-4, -3, -2, -1)
    buckets: tuple = DEFAULT_TOKEN_BUCKETS
    batch_size: int = 16
    compute_dtype: str | None = "bf16"   # reference uses fp16 for LLMs

    def __post_init__(self):
        from ..mllm.llm import LLM

        model = LLM(self.cfg)
        cast = ((lambda x: x.astype(jnp.bfloat16))
                if self.compute_dtype == "bf16" else (lambda x: x))

        @jax.jit
        def fwd(params, ids, mask):
            embeds = cast(params["embed_tokens"]["embedding"])[ids]
            _, hs = model.apply({"params": params}, embeds, mask,
                                output_hidden_states=True)
            return sum(hs[i] for i in self.layer_ids).astype(jnp.float32)

        @jax.jit
        def fwd_utt(params, ids, mask, start, end0):
            return _utt_pool(fwd(params, ids, mask), mask, start, end0)

        self._fwd = fwd
        self._fwd_utt = fwd_utt
        params = self.params
        if self.compute_dtype == "bf16":
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16), params)
        self._params = jax.device_put(params)

    _bucket = TextExtractor._bucket
    extract = TextExtractor.extract
