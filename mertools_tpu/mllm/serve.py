"""Continuous-batching LLM serving engine (vLLM-equivalent scheduling).

The reference serves OV-label extraction through vLLM's continuous batching
(``MER2025/MER2025_Track23/evaluation.py:16-21``). This module provides the
TPU-native equivalent: a slot-based engine where

- the KV cache is a static (layers, n_slots, max_len, heads, head_dim)
  buffer resident on device,
- decode runs in CHUNKS: one jitted ``lax.while_loop`` advances every
  active slot by up to ``chunk`` tokens with tokens/positions/masks/
  sampling state living entirely on device — the host syncs ONCE per
  chunk (a (n_slots, chunk) token matrix), not once per token. Autoregressive
  decode at small batch is bound by HBM parameter reads, and on a
  high-latency host link a per-token ``np.asarray`` would bound it at
  link RTT instead (measured ~50x under roofline) — chunking amortizes
  the round-trip across ``chunk`` tokens,
- finished slots free immediately after the chunk that finished them and
  new requests prefill into free slots between chunks (per-bucket prefill
  compile),

so ragged request streams keep the chip busy without re-padding the whole
batch to the longest request — the continuous-batching property. Greedy at
temperature 0 (deterministic extraction); on-device top-p sampling +
repetition penalty otherwise (the reference's SamplingParams).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import w8_einsum
from .generate import (_lora_dense, _mlp, _prec_for, _qkv, _rms, _rotary,
                       _sample, cast_llm_params_bf16)

_P = jax.lax.Precision.HIGHEST


def _step_inner(cfg, params, toks, positions, write_idx, kv_mask,
                k_cache, v_cache):
    """One decode token for every slot (traced inside the chunk loop).

    toks (B,), positions (B,) rotary positions, write_idx (B,) cache slots to
    write, kv_mask (B, L) attendable entries.
    k/v_cache: (layers, B, L, nkv, hd). Returns (next_logits (B, V), caches).
    """
    nh, nkv = cfg.num_heads, cfg.num_kv_heads
    H = cfg.hidden_size
    hd = H // nh
    B = toks.shape[0]
    rows = jnp.arange(B)

    x = params["embed_tokens"]["embedding"][toks]
    prec = _prec_for(x)
    for i in range(cfg.num_layers):
        lp = params[f"layer_{i}"]
        xn = _rms(lp["input_layernorm"], x, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, xn)
        q = _rotary(q, positions, cfg.rope_theta)
        k = _rotary(k, positions, cfg.rope_theta)
        k_cache = k_cache.at[i, rows, write_idx].set(k)
        v_cache = v_cache.at[i, rows, write_idx].set(v)
        kk, vv = k_cache[i], v_cache[i]
        if nkv != nh:
            # grouped GQA attention against the unrepeated cache (see
            # generate._step): decode is cache-bandwidth-bound
            g = nh // nkv
            qg = q.reshape(B, nkv, g, hd)
            logits = jnp.einsum("bkgd,blkd->bkgl", qg, kk,
                                precision=prec) / np.sqrt(hd)
            logits = jnp.where(kv_mask[:, None, None, :], logits, -1e30)
            w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
            att = jnp.einsum("bkgl,blkd->bkgd", w, vv,
                             precision=prec).reshape(B, nh, hd)
        else:
            logits = jnp.einsum("bnd,blnd->bnl", q, kk,
                                precision=prec) / np.sqrt(hd)
            logits = jnp.where(kv_mask[:, None, :], logits, -1e30)
            w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
            att = jnp.einsum("bnl,blnd->bnd", w, vv, precision=prec)
        x = x + _lora_dense(lp["o_proj"], att.reshape(B, H))
        xn = _rms(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        x = x + _mlp(lp, xn)
    x = _rms(params["norm"], x, cfg.rms_norm_eps)
    logits = w8_einsum("bd,dv->bv", x, params["lm_head"]["kernel"],
                       precision=prec).astype(jnp.float32)
    # inactive rows write garbage at their (non-advancing) write_idx — the
    # kv_mask bit there stays False, and admission resets the row's mask,
    # so the garbage is never attendable
    return logits, k_cache, v_cache


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "temperature", "top_p",
                                    "repetition_penalty", "eos", "max_len"),
                   donate_argnames=("k_cache", "v_cache", "seen", "next_tok",
                                    "cur_len", "write_at", "kv_mask",
                                    "active", "gen_count"))
def _decode_chunk(cfg, params, next_tok, cur_len, write_at, kv_mask,
                  k_cache, v_cache, active, gen_count, key, seen, max_new, *,
                  n_steps: int, temperature: float, top_p: float,
                  repetition_penalty: float, eos: int, max_len: int):
    """Advance every active slot by up to ``n_steps`` tokens on device.

    A ``lax.while_loop`` (early exit when every slot finishes) whose carry
    holds ALL per-slot decode state: current token, rotary position,
    physical write index, attendable-KV mask, generated-token count,
    sampling key and (optionally) the repetition-penalty seen counts. Slots
    that hit EOS / their token budget / the cache end deactivate in-loop;
    the host learns about it from the returned (B, n_steps) token matrix
    (-1 marks not-generated) — ONE device->host transfer per chunk.
    ``max_new`` is a PER-SLOT (B,) int32 budget (round 5: per-request
    max_new_tokens, the vLLM SamplingParams.max_tokens equivalent).

    ALL per-slot state is device-resident between chunks (round 4): the
    final carry is returned and fed back verbatim, so a chunk costs one
    dispatch + one small download, no state re-uploads (each re-upload is
    a host-link RTT; on the dev tunnel those RTTs, not compute, separated
    the engine from the batched-scan path).

    Returns (out_tokens, k_cache, v_cache, seen, key, state) with state =
    (next_tok, cur_len, write_at, kv_mask, active, gen_count).
    """
    B = next_tok.shape[0]
    rows = jnp.arange(B)
    use_pen = repetition_penalty != 1.0
    out0 = jnp.full((B, n_steps), -1, jnp.int32)

    def cond(c):
        return (c[0] < n_steps) & jnp.any(c[7])

    def body(c):
        (i, toks, cur, wat, mask, kc, vc, act, gcnt, out, k, sn) = c
        ai = act.astype(jnp.int32)
        # this step's token becomes attendable for its own attention
        mask_cur = mask.at[rows, wat].set(act)
        logits, kc, vc = _step_inner(cfg, params, toks, cur, wat,
                                     mask_cur, kc, vc)
        k, k1 = jax.random.split(k)
        if use_pen:
            nxt = _sample(logits, k1, temperature, top_p, sn,
                          repetition_penalty)
            sn = sn.at[rows, nxt].add(ai)
        else:
            nxt = _sample(logits, k1, temperature, top_p)
        out = out.at[:, i].set(jnp.where(act, nxt, -1))
        # persist the new token's mask bit only for rows that generated one
        mask = jnp.where(act[:, None], mask_cur, mask)
        cur = cur + ai
        wat = wat + ai
        gcnt = gcnt + ai
        hit = (nxt == eos) | (gcnt >= max_new) | (wat >= max_len)
        act = act & ~hit
        toks = jnp.where(act, nxt, toks)
        return (i + 1, toks, cur, wat, mask, kc, vc, act, gcnt, out, k, sn)

    carry = (jnp.int32(0), next_tok, cur_len, write_at, kv_mask,
             k_cache, v_cache, active, gen_count, out0, key, seen)
    carry = jax.lax.while_loop(cond, body, carry)
    state = (carry[1], carry[2], carry[3], carry[4], carry[7], carry[8])
    return carry[9], carry[5], carry[6], carry[11], carry[10], state


@functools.partial(jax.jit,
                   static_argnames=("cfg", "temperature", "top_p",
                                    "repetition_penalty", "eos", "bucket"),
                   donate_argnames=("k_cache", "v_cache", "seen", "next_tok",
                                    "cur_len", "write_at", "kv_mask",
                                    "active", "gen_count", "max_new_slots"))
def _admit_fused(cfg, params, input_ids, inputs_embeds, attn_mask, slots,
                 row_len, pen_ids, pen_mask, k_cache, v_cache,
                 next_tok, cur_len, write_at, kv_mask, active, gen_count,
                 key, seen, req_max_new, max_new_slots,
                 prefix=None, prefix_ids=None, *,
                 bucket: int, temperature: float, top_p: float,
                 repetition_penalty: float, eos: int):
    """One-dispatch admission: prefill a same-bucket group (from token ids
    when ``inputs_embeds`` is None, else from embeddings), sample each
    row's first token, scatter the group's suffix KV into its slots, and
    update ALL device-resident per-slot state in place (donated).

    ``slots`` carries n_slots for dummy pow2-padding rows — every scatter
    with an out-of-bounds index drops, so dummies touch nothing.

    Returns (first_tokens (B,), caches, state..., seen, key).
    """
    from .generate import prefill

    n_slots, max_len = kv_mask.shape
    P = prefix[0].shape[1] if prefix is not None else 0
    if inputs_embeds is None:
        emb = params["embed_tokens"]["embedding"][input_ids]
        emb = emb * attn_mask[..., None].astype(emb.dtype)
    else:
        emb = inputs_embeds
    logits, k, v, _ = prefill(cfg, params, emb, attn_mask,
                              P + emb.shape[1], prefix=prefix)

    key, k1 = jax.random.split(key)
    if repetition_penalty != 1.0:
        valid = (slots < n_slots)
        safe = jnp.minimum(slots, n_slots - 1)
        seen = seen.at[slots].set(0)                     # OOB rows drop
        counts = pen_mask * valid[:, None].astype(jnp.int32)
        seen = seen.at[slots[:, None], pen_ids].add(counts)
        if prefix_ids is not None:
            B = slots.shape[0]
            pre = jnp.broadcast_to(prefix_ids[None],
                                   (B, prefix_ids.shape[0]))
            seen = seen.at[slots[:, None], pre].add(
                valid[:, None].astype(jnp.int32))
        toks = _sample(logits, k1, temperature, top_p, seen[safe],
                       repetition_penalty)
        seen = seen.at[slots, toks].add(1)
    else:
        toks = _sample(logits, k1, temperature, top_p)

    # suffix KV -> the group's slot cache regions ([0, P) holds the prefix)
    k_cache = k_cache.at[:, slots, P: P + bucket].set(k[:, :, P:])
    v_cache = v_cache.at[:, slots, P: P + bucket].set(v[:, :, P:])

    # per-slot state rows (OOB dummy rows drop everywhere)
    row_mask = jnp.arange(max_len)[None, :] < row_len[:, None]
    kv_mask = kv_mask.at[slots].set(row_mask)
    cur_len = cur_len.at[slots].set(row_len)
    write_at = write_at.at[slots].set(P + bucket)
    next_tok = next_tok.at[slots].set(toks)
    gen_count = gen_count.at[slots].set(1)
    max_new_slots = max_new_slots.at[slots].set(req_max_new)
    # a slot whose FIRST token already ends it (EOS / max_new <= 1) never
    # activates — mirrors the host-side _Request.done decision
    live = (toks != eos) & (req_max_new > 1)
    active = active.at[slots].set(live)
    state = (next_tok, cur_len, write_at, kv_mask, active, gen_count,
             max_new_slots)
    return toks, k_cache, v_cache, state, seen, key


@dataclass
class _Request:
    rid: int
    n_prompt: int
    tokens: list = field(default_factory=list)
    done: bool = False
    max_new: int = 1 << 30  # per-request token budget (engine default)


class ContinuousBatcher:
    """Continuous-batching engine over the converted LLM params. Greedy at
    temperature 0 (default); otherwise on-device top-p sampling with the
    HF-style repetition penalty — the reference's vLLM SamplingParams
    (temperature=0.7, top_p=0.8, repetition_penalty=1.05,
    evaluation.py:16-21)."""

    def __init__(self, cfg, params, n_slots: int = 8, max_len: int = 512,
                 eos_token_id: int = 2, max_new_tokens: int = 128,
                 prefill_buckets: tuple = (32, 64, 128, 256),
                 admit_batched: bool = True, temperature: float = 0.0,
                 top_p: float = 0.9, repetition_penalty: float = 1.0,
                 seed: int = 0, chunk: int = 32,
                 compute_dtype: str | None = None,
                 prefix=None, prefix_token_ids=None):
        self.cfg = cfg
        if compute_dtype == "bf16":
            # production serving mode (the reference's vLLM-fp16 class):
            # bf16 weights halve decode's HBM traffic, bf16 activations take
            # the native MXU path for prefill; composes with w8-packed trees
            params = cast_llm_params_bf16(params)
        self._emb_dtype = (jnp.bfloat16 if compute_dtype == "bf16"
                           else jnp.float32)
        self.params = jax.device_put(params)
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self.repetition_penalty = float(repetition_penalty)
        # penalty off: a (1,1) dummy keeps _decode_chunk's signature static
        # without carrying the (n_slots, vocab) seen matrix through the loop
        self.seen = (jnp.zeros((n_slots, cfg.vocab_size), jnp.int32)
                     if repetition_penalty != 1.0
                     else jnp.zeros((1, 1), jnp.int32))
        # tokens decoded per jitted chunk (host syncs once per chunk); slots
        # that finish mid-chunk idle until the chunk ends, so workloads with
        # very short replies may prefer a smaller chunk
        assert max_new_tokens >= 1, \
            "ContinuousBatcher needs max_new_tokens >= 1 (admission always " \
            "samples the first token; generate(max_new_tokens=0) returns " \
            "an empty matrix instead)"
        self.chunk = max(1, int(chunk))
        self._key = jax.random.PRNGKey(seed)
        self.n_slots = n_slots
        self.max_len = max_len
        self.eos = eos_token_id
        self.max_new = max_new_tokens
        self.admit_batched = admit_batched
        # shared-prompt-prefix KV (generate.prefill_prefix): occupies
        # [0, P) of EVERY slot's cache permanently; prompts submit as
        # suffixes (the vLLM prefix-caching analogue for the engine)
        self.P = 0
        self.prefix = self.prefix_ids = None
        if prefix is not None:
            kp = jnp.asarray(prefix[0], self._emb_dtype)
            vp = jnp.asarray(prefix[1], self._emb_dtype)
            self.prefix = (kp, vp)
            self.P = kp.shape[1]
            if prefix_token_ids is not None:
                self.prefix_ids = jnp.asarray(
                    np.asarray(prefix_token_ids, np.int64))
        self.buckets = tuple(b for b in prefill_buckets
                             if self.P + b + max_new_tokens <= max_len) or (
            max_len - max_new_tokens - self.P,)
        assert self.buckets[-1] >= 1, \
            "max_len too small for the prefix + max_new_tokens budget"
        nh = cfg.num_kv_heads
        hd = cfg.hidden_size // cfg.num_heads
        self.k_cache = jnp.zeros((cfg.num_layers, n_slots, max_len, nh, hd),
                                 self._emb_dtype)
        self.v_cache = jnp.zeros_like(self.k_cache)
        if self.P:
            self.k_cache = self.k_cache.at[:, :, : self.P].set(
                self.prefix[0][:, None])
            self.v_cache = self.v_cache.at[:, :, : self.P].set(
                self.prefix[1][:, None])
        self.kv_mask = np.zeros((n_slots, max_len), bool)
        self.cur_len = np.zeros(n_slots, np.int32)      # logical positions
        self.write_at = np.zeros(n_slots, np.int32)     # physical next index
        self.next_tok = np.zeros(n_slots, np.int32)
        self.active = np.zeros(n_slots, bool)
        # device-resident twin of the decode state: fed to and returned by
        # the fused admission/chunk jits (donated), so steady-state serving
        # never re-uploads per-slot state. The np arrays above are host
        # MIRRORS maintained by replaying the chunk's token matrix — used
        # only for scheduling/bookkeeping decisions.
        self._dev = {
            "next_tok": jnp.zeros(n_slots, jnp.int32),
            "cur_len": jnp.zeros(n_slots, jnp.int32),
            "write_at": jnp.zeros(n_slots, jnp.int32),
            "kv_mask": jnp.zeros((n_slots, max_len), bool),
            "active": jnp.zeros(n_slots, bool),
            "gen_count": jnp.zeros(n_slots, jnp.int32),
            # per-slot token budget (round 5: per-request max_new_tokens,
            # the vLLM SamplingParams.max_tokens equivalent)
            "max_new": jnp.full(n_slots, max_new_tokens, jnp.int32),
        }
        self.slot_req: list = [None] * n_slots
        self._next_rid = 0
        self.queue: list = []
        self.finished: dict = {}
        self._pending_admits: list = []

    # -- request admission ---------------------------------------------------
    def submit(self, prompt_embeds: np.ndarray | None = None,
               prompt_ids=None, max_new_tokens: int | None = None) -> int:
        """Queue a request. Two forms:

        * ``submit(prompt_ids=ids)`` — TOKEN-ID submission (preferred for
          text-only prompts): admission embeds on device from the LLM's
          own table, so only (S,) int32 crosses the host link. ``ids``
          also seed the repetition penalty.
        * ``submit(embeds, prompt_ids=...)`` — embedding submission for
          prompts with spliced AV features. ``prompt_ids`` (S,) seeds the
          repetition penalty (vLLM semantics: prompt + output); omit for
          penalty-free serving.

        ``max_new_tokens`` caps THIS request's output (per-request
        SamplingParams.max_tokens); None = the engine default. Must not
        exceed the engine's ``max_new_tokens`` (the cache budget reserves
        that much room per slot).

        Returns request id."""
        rid = self._next_rid
        self._next_rid += 1
        mn = self.max_new if max_new_tokens is None else int(max_new_tokens)
        assert 1 <= mn <= self.max_new, \
            f"per-request max_new_tokens {mn} outside [1, {self.max_new}]"
        pids = None if prompt_ids is None else np.asarray(prompt_ids,
                                                          np.int64)
        if prompt_embeds is None:
            assert pids is not None, "submit() needs embeds or prompt_ids"
            self.queue.append((rid, None, pids, mn))
        else:
            self.queue.append((rid, np.asarray(prompt_embeds, np.float32),
                               pids, mn))
        return rid

    def _bucket(self, n):
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _admit(self):
        free = [s for s in range(self.n_slots) if not self.active[s]]
        if not (free and self.queue):
            return
        take = min(len(free), len(self.queue))
        pending = []  # (slot, rid, emb|None truncated, ids|None, bucket, mn)
        for slot in free[:take]:
            rid, emb, pids, mn = self.queue.pop(0)
            n = len(emb) if emb is not None else len(pids)
            S = min(n, self.max_len - self.max_new - self.P)
            pad = self._bucket(S)
            S = min(S, pad)  # prompts beyond the largest bucket truncate
            pending.append((slot, rid,
                            None if emb is None else emb[:S],
                            None if pids is None else pids[:S], pad, mn))
        if self.admit_batched:
            # one prefill per (kind, bucket) for ALL admitted requests:
            # B=1 serial prefills leave the MXU idle exactly when the queue
            # is deepest (the submit-all-then-run extraction workload). B
            # pads to a power of two so compile count stays
            # O(kinds x buckets x log n_slots).
            for kind, bucket in sorted({(p[2] is None, p[4])
                                        for p in pending}):
                grp = [p for p in pending
                       if (p[2] is None) == kind and p[4] == bucket]
                self._admit_group(grp, bucket)
        else:
            for p in pending:
                self._admit_group([p], p[4])

    @staticmethod
    def _pow2(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    def _admit_group(self, grp, bucket):
        """Admit a same-bucket group with ONE fused device call
        (_admit_fused): prefill (token-id groups embed on device, so only
        int32 ids cross the host link), first-token sampling, KV scatter,
        and device-state updates happen in a single dispatch."""
        H = self.cfg.hidden_size
        B = self._pow2(len(grp)) if self.admit_batched else 1
        from_ids = grp[0][2] is None
        m = np.zeros((B, bucket), np.int32)
        ids = np.zeros((B, bucket), np.int64)
        cmask = np.zeros((B, bucket), np.int32)
        e = None if from_ids else np.zeros((B, bucket, H), np.float32)
        # padded dummy rows carry slot index n_slots (OOB -> every device
        # scatter drops them)
        slots_pad = np.full(B, self.n_slots, np.int64)
        row_len = np.zeros(B, np.int32)
        req_mn = np.full(B, self.max_new, np.int32)
        P = self.P
        for b, (slot, _, emb, pids, _, mn) in enumerate(grp):
            slots_pad[b] = slot
            req_mn[b] = mn
            S = len(emb) if emb is not None else len(pids)
            row_len[b] = P + S
            if pids is not None:
                ids[b, : len(pids)] = pids
                cmask[b, : len(pids)] = 1
            if from_ids:
                m[b, : len(pids)] = 1
            else:
                e[b, : len(emb)] = emb
                m[b, : len(emb)] = 1
        for b in range(len(grp), B):
            m[b, 0] = 1  # dummy padding rows (discarded)
        d = self._dev
        toks, self.k_cache, self.v_cache, state, self.seen, self._key = \
            _admit_fused(
                self.cfg, self.params,
                None if not from_ids else jnp.asarray(ids.astype(np.int32)),
                None if from_ids else jnp.asarray(e, self._emb_dtype),
                jnp.asarray(m), jnp.asarray(slots_pad),
                jnp.asarray(row_len), jnp.asarray(ids),
                jnp.asarray(cmask), self.k_cache, self.v_cache,
                d["next_tok"], d["cur_len"], d["write_at"], d["kv_mask"],
                d["active"], d["gen_count"], self._key, self.seen,
                jnp.asarray(req_mn), d["max_new"],
                prefix=self.prefix, prefix_ids=self.prefix_ids,
                bucket=bucket, temperature=self.temperature,
                top_p=self.top_p,
                repetition_penalty=self.repetition_penalty,
                eos=self.eos)
        (d["next_tok"], d["cur_len"], d["write_at"], d["kv_mask"],
         d["active"], d["gen_count"], d["max_new"]) = state
        # DON'T download the first tokens yet: that sync would stall the
        # host between the admission dispatch and the chunk dispatch (a
        # full host-link RTT while the device sits idle). Device state is
        # already correct; host bookkeeping that needs the token values is
        # deferred to _resolve_admits(), which runs after the next chunk
        # is in flight. Slots are optimistically active until then (a
        # first-token EOS deactivated them on DEVICE already via `live`).
        for b, (slot, rid, emb, pids, _, mn) in enumerate(grp):
            S = len(emb) if emb is not None else len(pids)
            self.kv_mask[slot] = False
            self.kv_mask[slot, : P + S] = True
            self.cur_len[slot] = P + S
            self.write_at[slot] = P + bucket  # physical: prompt pad then gen
            self.active[slot] = True
        self._pending_admits.append((toks, list(grp)))

    def _resolve_admits(self):
        """Materialize deferred admission tokens and finish the host-side
        request bookkeeping (must run before replaying a chunk's output)."""
        for toks, grp in self._pending_admits:
            first = np.asarray(toks)[: len(grp)]
            for b, (slot, rid, emb, pids, _, mn) in enumerate(grp):
                S = len(emb) if emb is not None else len(pids)
                tok = int(first[b])
                self.next_tok[slot] = tok
                # the admission token counts toward max_new (generate()
                # emits the prefill-sampled token first): max_new <= 1
                # finishes here, matching generate(max_new_tokens=1)
                req = _Request(rid, S, tokens=[tok], max_new=mn,
                               done=tok == self.eos or mn <= 1)
                self.slot_req[slot] = req
                if req.done:
                    self._finish(slot)
        self._pending_admits = []

    def _finish(self, slot):
        req = self.slot_req[slot]
        toks = req.tokens
        if toks and toks[-1] == self.eos:
            toks = toks[:-1]
        self.finished[req.rid] = toks
        self.active[slot] = False
        self.slot_req[slot] = None

    # -- engine loop -----------------------------------------------------------
    def step(self):
        """Admit waiting requests, then decode up to ``chunk`` tokens for the
        active slots in ONE jitted device loop (host sync once per chunk).
        Per-slot state stays device-resident across admissions and chunks
        (uploaded never, downloaded never — only the token matrix comes
        back)."""
        self._admit()
        if not self.active.any():
            self._resolve_admits()
            return
        d = self._dev
        out, self.k_cache, self.v_cache, self.seen, self._key, state = \
            _decode_chunk(
                self.cfg, self.params,
                d["next_tok"], d["cur_len"], d["write_at"], d["kv_mask"],
                self.k_cache, self.v_cache, d["active"], d["gen_count"],
                self._key, self.seen, d["max_new"],
                n_steps=self.chunk, temperature=self.temperature,
                top_p=self.top_p,
                repetition_penalty=self.repetition_penalty,
                eos=self.eos, max_len=self.max_len)
        (d["next_tok"], d["cur_len"], d["write_at"], d["kv_mask"],
         d["active"], d["gen_count"]) = state
        # the chunk is in flight; NOW pay the admission-token download
        # (overlaps device compute) and finish admission bookkeeping
        self._resolve_admits()
        outs = np.asarray(out)  # the one host sync per chunk
        # replay the device loop's (deterministic) control transitions so the
        # host mirrors (kv_mask/cur_len/write_at/active/requests) stay exact
        for i in range(outs.shape[1]):
            col = outs[:, i]
            if (col < 0).all():
                break  # loop early-exited: every slot was inactive
            for slot in range(self.n_slots):
                tok = int(col[slot])
                if tok < 0 or not self.active[slot]:
                    continue
                self.kv_mask[slot, self.write_at[slot]] = True
                self.cur_len[slot] += 1
                self.write_at[slot] += 1
                req = self.slot_req[slot]
                req.tokens.append(tok)
                if (tok == self.eos or len(req.tokens) >= req.max_new
                        or self.write_at[slot] >= self.max_len):
                    self._finish(slot)
                else:
                    self.next_tok[slot] = tok

    def run(self) -> dict:
        """Drain the queue; returns {rid: [token, ...]} (EOS-stripped)."""
        while self.queue or self.active.any():
            self.step()
        out, self.finished = self.finished, {}
        return out
