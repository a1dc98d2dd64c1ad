"""Batched text feature extraction.

Reference semantics (``extract_text_huggingface.py``): per transcript —
tokenize, forward with output_hidden_states, sum the last-4 layers (LLMs: -1
only, per MER2023's layer_ids option), slice away special tokens via the
decode-round-trip span probe (``find_start_end_pos:95-120``), FRA = per-token
(T, D), UTT = token mean; empty transcripts produce zeros.

TPU-native: sentences are tokenized up front, bucketed by token length and
forwarded in batches with attention masks; the span trim happens on the host
slices. Masked batching equals per-sentence forwards exactly (BERT attention
masks padded keys; padded rows are discarded).
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

        self._fwd = fwd
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
            pending.append((group, self._fwd(self._params, jnp.asarray(ids),
                                             jnp.asarray(mask))))
        for group, res in pending:
            feats = np.asarray(res)
            for r, (name, toks) in enumerate(group):
                e = len(toks) + (end or 0)
                emb = feats[r, start:e]
                if len(emb) == 0:
                    emb = np.zeros((1, D), np.float32)
                out[name] = (emb.mean(axis=0) if level.upper().startswith("UTT")
                             else emb)
        # empty transcripts -> zeros (reference :236-249)
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

        self._fwd = fwd
        params = self.params
        if self.compute_dtype == "bf16":
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16), params)
        self._params = jax.device_put(params)

    _bucket = TextExtractor._bucket
    extract = TextExtractor.extract
