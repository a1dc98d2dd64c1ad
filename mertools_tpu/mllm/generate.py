"""KV-cached autoregressive generation for the Flax LLM (LoRA-aware).

Replaces the reference's ``llama_model.generate`` calls
(``my_affectgpt/conversation/conversation_video.py:200-260``: num_beams=1,
do_sample, top_p=0.9, max_new_tokens up to 1200) and vLLM's batched decode
used for open-vocabulary label extraction
(``MER2025/MER2025_Track23/evaluation.py:16-77``).

Design: pure functions over the converted/trained parameter pytree (the same
params drive the Flax ``LLM`` module, which tests use as the oracle).
``prefill`` runs the prompt (token or spliced AV embeddings) in ONE forward
and captures per-layer K/V into static-size caches; ``decode`` is a
``lax.scan`` over steps — greedy when temperature == 0, top-p sampling
otherwise. Right-padded batches: pad slots are masked out of attention and
rotary positions count only valid tokens, so ragged prompts batch under one
compile (continuous-batching-style utilization without an engine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import quantize_weight_w8, w8_einsum

_P = jax.lax.Precision.HIGHEST

_W8_KERNELS = ("q_proj", "k_proj", "v_proj", "o_proj",
               "gate_proj", "up_proj", "down_proj")


def _prec_for(x):
    """Dtype-driven matmul precision: f32 activations keep HIGHEST (the
    parity contract for the judge/oracle paths); bf16 activations (the
    production serving mode, `cast_llm_params_bf16`) take the native bf16
    MXU path — HIGHEST would silently upcast every matmul to 6-pass f32."""
    return _P if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def cast_llm_params_bf16(params: dict) -> dict:
    """Production serving cast: float leaves -> bf16 (halves the HBM weight
    traffic that bounds decode AND switches every matmul to the bf16 MXU
    path via ``_prec_for``); int8 w8 codes pass through, so this composes
    with ``quantize_llm_params_w8``. The reference serves fp16 (vLLM /
    ``.half()``), so bf16 is its numeric class, not a new deviation."""
    return jax.tree_util.tree_map(
        lambda x: (x.astype(jnp.bfloat16)
                   if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else x), params)


def batch_generate_texts(cfg, params, emb_table, ids_by_key: dict, tok, *,
                         batch: int = 8, max_new_tokens: int = 64,
                         temperature: float = 0.0, top_p: float = 0.9,
                         top_k: int = 0, repetition_penalty: float = 1.0,
                         kv_int8: bool = False, seed: int = 0,
                         shared_prefix: bool = True, min_prefix: int = 16,
                         progress=None) -> dict:
    """Length-sorted, bucket-padded batched decoding of many prompts.

    The vLLM-style scheduling shared by the OV-extraction / translation /
    synonym CLIs: process keys in prompt-length order (minimal padding
    waste), round the padded length up to a 64-token bucket and pad ragged
    final batches with dummy rows (one compile per (batch, bucket) class —
    unbucketed, every distinct batch max-length costs a fresh XLA compile).

    ``shared_prefix``: the longest common token prefix across ALL prompts
    (these CLIs prepend one few-shot template to every clip) is prefilled
    ONCE and reused via the KV prefix cache (vLLM prefix-caching
    analogue) when it is at least ``min_prefix`` tokens; results equal
    the uncached path exactly. Returns {key: decoded text}, EOS stripped.
    """
    import jax
    import jax.numpy as jnp

    order = sorted(ids_by_key, key=lambda k: len(ids_by_key[k]))

    P = 0
    prefix = pre_ids_arr = None
    if shared_prefix and len(order) > 1:
        P = common_token_prefix([ids_by_key[k] for k in order],
                                min_prefix=min_prefix)
        if P:
            pre_ids = list(ids_by_key[order[0]])[:P]
            prefix = prefill_prefix(cfg, params,
                                    jnp.asarray(emb_table[pre_ids]))
            pre_ids_arr = jnp.asarray(np.asarray(pre_ids, np.int64))
            if progress:
                progress(f"  shared prefix: {P} tokens prefilled once")

    out = {}
    for i in range(0, len(order), batch):
        group = order[i: i + batch]
        ids_list = [ids_by_key[k][P:] for k in group]
        S = bucket_len(max(len(x) for x in ids_list))
        B = batch
        embeds = np.zeros((B, S, cfg.hidden_size), np.float32)
        mask = np.zeros((B, S), np.int32)
        pids = np.zeros((B, S), np.int64)
        for b, ids in enumerate(ids_list):
            embeds[b, : len(ids)] = emb_table[ids]
            mask[b, : len(ids)] = 1
            pids[b, : len(ids)] = ids
        for b in range(len(group), B):
            mask[b, 0] = 1  # dummy rows decode garbage that is discarded
        tokens = np.asarray(generate(
            cfg, params, jnp.asarray(embeds), jnp.asarray(mask),
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, top_k=top_k,
            repetition_penalty=repetition_penalty,
            eos_token_id=int(tok.eos_token_id), kv_int8=kv_int8,
            prng_key=jax.random.PRNGKey(seed * 100003 + i),
            prompt_token_ids=(jnp.asarray(pids)
                              if repetition_penalty != 1.0 else None),
            prefix=prefix,
            prefix_token_ids=(pre_ids_arr
                              if repetition_penalty != 1.0 else None)))
        for b, k in enumerate(group):
            toks = tokens[b]
            stop = np.nonzero(toks == tok.eos_token_id)[0]
            out[k] = tok.decode(toks[: stop[0]] if len(stop) else toks,
                                skip_special_tokens=True)
        if progress:
            progress(f"  {len(out)}/{len(ids_by_key)}")
    return out


def common_token_prefix(ids_lists, min_prefix: int = 16) -> int:
    """Longest common token prefix across prompts, capped so every prompt
    keeps at least one suffix token (the last-logit position); 0 when the
    result is shorter than ``min_prefix`` or there is only one prompt."""
    if len(ids_lists) < 2:
        return 0
    first = list(ids_lists[0])
    P = len(first)
    for ids in ids_lists[1:]:
        m = min(P, len(ids))
        j = 0
        while j < m and ids[j] == first[j]:
            j += 1
        P = j
        if P < min_prefix:
            return 0
    P = min(P, min(len(ids) for ids in ids_lists) - 1)
    return P if P >= min_prefix else 0


def bucket_len(n: int, mult: int = 64, cap: int | None = None) -> int:
    """Round a ragged length up to a bucket (multiple of ``mult``) so batches
    of varying prompt/feature lengths reuse a handful of compiled shapes
    instead of triggering one XLA compile per distinct length. Pad positions
    carry mask 0 everywhere in this module, so bucketed padding is
    output-invariant."""
    b = max(mult, ((n + mult - 1) // mult) * mult)
    return min(b, cap) if cap is not None else b


def quantize_llm_params_w8(params: dict, lm_head: bool = True) -> dict:
    """Pack the LLM's large kernels as weight-only int8 (serving mode).

    Autoregressive decode at small batch is bound by streaming the weights
    from HBM each step; int8 storage halves that traffic vs bf16. Norms,
    biases, embeddings and LoRA deltas stay in full precision; every
    function in this module transparently accepts the packed tree."""
    out = {}
    for name, sub in params.items():
        if name.startswith("layer_"):
            lp = {}
            for pn, pp in sub.items():
                if pn in _W8_KERNELS:
                    q = dict(pp)
                    q["kernel"] = quantize_weight_w8(pp["kernel"])
                    lp[pn] = q
                else:
                    lp[pn] = pp
            out[name] = lp
        elif name == "lm_head" and lm_head:
            out[name] = {**sub, "kernel": quantize_weight_w8(sub["kernel"])}
        else:
            out[name] = sub
    return out


def _quant_kv(t):
    """Per-token-per-head symmetric int8 KV quantization: t (..., d) ->
    (int8 codes, f32 scale (..., 1)) with t ~= codes * scale. Halves the
    cache-read bandwidth and memory that bound long-context decode."""
    s = jnp.maximum(jnp.max(jnp.abs(t.astype(jnp.float32)), -1, keepdims=True),
                    1e-8) / 127.0
    q = jnp.round(t.astype(jnp.float32) / s).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _rms(p, x, eps):
    var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * p["weight"]


def _lora_dense(p, x, alpha=16.0):
    prec = _prec_for(x)
    y = w8_einsum("...d,df->...f", x, p["kernel"], precision=prec)
    if "bias" in p:
        y = y + p["bias"]
    if "lora_a" in p:
        r = p["lora_a"].shape[-1]
        y = y + (alpha / r) * jnp.einsum("...d,dr,rf->...f", x, p["lora_a"],
                                         p["lora_b"], precision=prec)
    return y


def _rotary(x, positions, theta, mrope_section=None):
    """positions: (B, S) / (B,) standard, or (B, S, 3) / (B, 3) M-RoPE
    t/h/w ids (Qwen2.5-VL; frequency bands split per mrope_section)."""
    hd = x.shape[-1]
    inv_freq = 1.0 / (theta ** (np.arange(0, hd, 2, dtype=np.float32) / hd))
    if mrope_section is not None and positions.ndim == x.ndim - 1:
        comp = np.repeat(np.arange(3), mrope_section)
        ang = positions[..., comp].astype(jnp.float32) * inv_freq
    else:
        ang = positions[..., None].astype(jnp.float32) * inv_freq
    cos = jnp.cos(ang).astype(x.dtype)   # keep bf16 activations bf16
    sin = jnp.sin(ang).astype(x.dtype)
    if x.ndim == 4:  # (B, S, N, hd)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    else:            # (B, N, hd) single step: positions (B,)
        cos, sin = cos[:, None, :], sin[:, None, :]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


def _qkv(cfg, lp, xn):
    nh, nkv = cfg.num_heads, cfg.num_kv_heads
    hd = cfg.hidden_size // nh
    a = cfg.lora_alpha
    q = _lora_dense(lp["q_proj"], xn, a).reshape(*xn.shape[:-1], nh, hd)
    k = _lora_dense(lp["k_proj"], xn, a).reshape(*xn.shape[:-1], nkv, hd)
    v = _lora_dense(lp["v_proj"], xn, a).reshape(*xn.shape[:-1], nkv, hd)
    return q, k, v


def _mlp(lp, x, alpha=16.0):
    # LoRA deltas apply to the MLP projections too (peft target_modules
    # cover all 7 — reference affectgpt.py:111-117)
    g = _lora_dense(lp["gate_proj"], x, alpha)
    u = _lora_dense(lp["up_proj"], x, alpha)
    return _lora_dense(lp["down_proj"], jax.nn.silu(g) * u, alpha)


@functools.partial(jax.jit, static_argnames=("cfg", "cache_len", "kv_int8"))
def prefill(cfg, params, inputs_embeds, attention_mask, cache_len: int,
            kv_int8: bool = False, positions=None, prefix=None):
    """One forward over the (right-padded) prompt, capturing KV caches.

    Returns (last_logits (B, V), k_cache, v_cache (layers, B, L, nkv, hd),
    n_valid (B,)). With ``kv_int8`` the caches are ``(int8 codes, scale)``
    tuples (per-token-per-head quantization; decode reads half the bytes).
    ``positions`` overrides the cumsum default — (B, S, 3) for M-RoPE
    models (cfg.mrope_section).

    ``prefix``: ``(k_pre, v_pre)`` of shape (layers, P, nkv, hd) from
    :func:`prefill_prefix` — the SHARED prompt prefix (the OV/translate/
    judge few-shot template every prompt starts with), computed ONCE
    instead of once per row per batch. The forward runs only the suffix
    rows against [prefix; suffix] keys; the returned caches hold the
    prefix at [0, P), so decode works unchanged. Suffix attention reads
    the same key set at the same positions as a full prefill, so results
    are EXACTLY the full-prompt prefill's (tested bit-equal at HIGHEST).
    """
    B, S, H = inputs_embeds.shape
    nh, nkv = cfg.num_heads, cfg.num_kv_heads
    hd = H // nh
    mask = attention_mask.astype(jnp.int32)
    P = 0
    if prefix is not None:
        assert positions is None and cfg.mrope_section is None, \
            "shared-prefix prefill supports standard-RoPE text prompts only"
        P = prefix[0].shape[1]
    if positions is None:
        positions = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0, None) + P
    n_suffix = jnp.sum(mask, axis=1)

    causal = (jnp.arange(S)[:, None] >= jnp.arange(S)[None, :])
    bias = jnp.where(causal[None, None] & (mask[:, None, None, :] > 0),
                     0.0, -1e30)
    if P:
        # every suffix query attends the whole prefix (bias 0 columns)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (P, 0)))

    # production bf16 params (cast_llm_params_bf16): run the whole prompt
    # forward in bf16 on the native MXU path (the reference's fp16 class)
    if params["norm"]["weight"].dtype == jnp.bfloat16:
        inputs_embeds = inputs_embeds.astype(jnp.bfloat16)
    prec = _prec_for(inputs_embeds)

    ks, vs = [], []
    x = inputs_embeds
    for i in range(cfg.num_layers):
        lp = params[f"layer_{i}"]
        xn = _rms(lp["input_layernorm"], x, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, xn)
        q = _rotary(q, positions, cfg.rope_theta, cfg.mrope_section)
        k = _rotary(k, positions, cfg.rope_theta, cfg.mrope_section)
        ks.append(k)
        vs.append(v)
        if P:
            bc = lambda t: jnp.broadcast_to(
                t[i][None].astype(x.dtype), (B, P, nkv, hd))
            k = jnp.concatenate([bc(prefix[0]), k], axis=1)
            vfull = jnp.concatenate([bc(prefix[1]), v], axis=1)
        else:
            vfull = v
        if nkv != nh:
            k = jnp.repeat(k, nh // nkv, axis=2)
            vr = jnp.repeat(vfull, nh // nkv, axis=2)
        else:
            vr = vfull
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            precision=prec) / np.sqrt(hd)
        w = jax.nn.softmax((logits + bias).astype(jnp.float32), -1).astype(x.dtype)
        att = jnp.einsum("bnqk,bknd->bqnd", w, vr, precision=prec)
        x = x + _lora_dense(lp["o_proj"], att.reshape(B, S, H), cfg.lora_alpha)
        xn = _rms(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        x = x + _mlp(lp, xn, cfg.lora_alpha)

    x = _rms(params["norm"], x, cfg.rms_norm_eps)
    # logits at the LAST VALID position of each sample
    last = jnp.take_along_axis(x, (n_suffix - 1)[:, None, None], axis=1)[:, 0]
    logits = w8_einsum("bd,dv->bv", last, params["lm_head"]["kernel"],
                       precision=prec).astype(jnp.float32)

    pad = cache_len - S - P
    padkv = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    k_cache, v_cache = jnp.stack(ks), jnp.stack(vs)   # (layers, B, S, ...)
    if P:
        bcl = lambda t: jnp.broadcast_to(
            t[:, None].astype(x.dtype), (cfg.num_layers, B, P, nkv, hd))
        k_cache = jnp.concatenate([bcl(prefix[0]), k_cache], axis=2)
        v_cache = jnp.concatenate([bcl(prefix[1]), v_cache], axis=2)
    n_valid = P + n_suffix
    if kv_int8:
        kq, ksc = _quant_kv(k_cache)
        vq, vsc = _quant_kv(v_cache)
        return logits, (padkv(kq), padkv(ksc)), (padkv(vq), padkv(vsc)), n_valid
    return logits, padkv(k_cache), padkv(v_cache), n_valid


def prefill_prefix(cfg, params, prefix_embeds) -> tuple:
    """Precompute the KV of a SHARED prompt prefix once (the vLLM
    prefix-caching analogue): prefix_embeds (P, H) -> (k_pre, v_pre) of
    shape (layers, P, nkv, hd), consumed by ``prefill(prefix=...)`` /
    ``generate(prefix=...)``. The prefix must be identical across every
    prompt in the batch (tokens AND positions 0..P-1)."""
    P = prefix_embeds.shape[0]
    _, k, v, _ = prefill(cfg, params, jnp.asarray(prefix_embeds)[None],
                         jnp.ones((1, P), jnp.int32), P)
    return k[:, 0], v[:, 0]


def _step(cfg, params, tok, pos, slot, k_cache, v_cache, slot_mask):
    """One decode step. tok (B,), pos (B,) rotary positions, slot scalar
    physical cache index; slot_mask (B, L) marks attendable slots."""
    B = tok.shape[0]
    H = cfg.hidden_size
    nh, nkv = cfg.num_heads, cfg.num_kv_heads
    hd = H // nh
    x = params["embed_tokens"]["embedding"][tok]
    prec = _prec_for(x)
    for i in range(cfg.num_layers):
        lp = params[f"layer_{i}"]
        xn = _rms(lp["input_layernorm"], x, cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, xn)
        q = _rotary(q, pos, cfg.rope_theta, cfg.mrope_section)
        k = _rotary(k, pos, cfg.rope_theta, cfg.mrope_section)
        quant = isinstance(k_cache, tuple)
        if quant:
            (kq_c, ks_c), (vq_c, vs_c) = k_cache, v_cache
            kq, ksc = _quant_kv(k)
            vq, vsc = _quant_kv(v)
            upd = lambda c, t: jax.lax.dynamic_update_slice(
                c, t[None, :, None], (i, 0, slot, 0, 0))
            kq_c, ks_c = upd(kq_c, kq), upd(ks_c, ksc)
            vq_c, vs_c = upd(vq_c, vq), upd(vs_c, vsc)
            k_cache, v_cache = (kq_c, ks_c), (vq_c, vs_c)
            kk = kq_c[i].astype(x.dtype)          # (B, L, nkv, hd)
            vv = vq_c[i].astype(x.dtype)
            ks_l = ks_c[i][..., 0]                 # (B, L, nkv)
            vs_l = vs_c[i][..., 0]
        else:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k[None, :, None], (i, 0, slot, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v[None, :, None], (i, 0, slot, 0, 0))
            kk, vv = k_cache[i], v_cache[i]
        if nkv != nh:
            # grouped GQA attention: contract query groups against the
            # UNREPEATED cache — jnp.repeat would materialize nh/nkv x the
            # cache in HBM every step, and decode is cache-bandwidth-bound
            g = nh // nkv
            qg = q.reshape(B, nkv, g, hd)
            logits = jnp.einsum("bkgd,blkd->bkgl", qg, kk,
                                precision=prec) / np.sqrt(hd)
            if quant:   # fold per-token k scales into the logits
                logits = logits * ks_l.transpose(0, 2, 1)[:, :, None, :]
            logits = jnp.where(slot_mask[:, None, None, :], logits, -1e30)
            w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
            if quant:   # fold per-token v scales into the weights
                w = w * vs_l.transpose(0, 2, 1)[:, :, None, :].astype(w.dtype)
            att = jnp.einsum("bkgl,blkd->bkgd", w, vv, precision=prec)
            att = att.reshape(B, nh, hd)
        else:
            logits = jnp.einsum("bnd,blnd->bnl", q, kk,
                                precision=prec) / np.sqrt(hd)
            if quant:
                logits = logits * ks_l.transpose(0, 2, 1)
            logits = jnp.where(slot_mask[:, None, :], logits, -1e30)
            w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
            if quant:
                w = w * vs_l.transpose(0, 2, 1).astype(w.dtype)
            att = jnp.einsum("bnl,blnd->bnd", w, vv, precision=prec)
        x = x + _lora_dense(lp["o_proj"], att.reshape(B, H), cfg.lora_alpha)
        xn = _rms(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        x = x + _mlp(lp, xn, cfg.lora_alpha)
    x = _rms(params["norm"], x, cfg.rms_norm_eps)
    logits = w8_einsum("bd,dv->bv", x, params["lm_head"]["kernel"],
                       precision=prec).astype(jnp.float32)
    return logits, k_cache, v_cache


def _sample(logits, key, temperature, top_p, seen_counts=None,
            repetition_penalty=1.0, top_k=0):
    if repetition_penalty != 1.0 and seen_counts is not None:
        # HF-style: divide positive logits / multiply negative ones for any
        # token already generated (reference SamplingParams
        # repetition_penalty=1.05, evaluation.py:20)
        seen = seen_counts > 0
        logits = jnp.where(seen,
                           jnp.where(logits > 0,
                                     logits / repetition_penalty,
                                     logits * repetition_penalty),
                           logits)
    if temperature == 0.0:
        return jnp.argmax(logits, -1).astype(jnp.int32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temperature, -1)
    if top_k and top_k > 0 and top_k < probs.shape[-1]:
        # keep the k most probable tokens (vLLM/HF top_k; applied before
        # top_p, as both stacks do — qwen3 protocol uses top_k=20)
        kth = jnp.sort(probs, -1)[:, -top_k][:, None]
        probs = jnp.where(probs >= kth, probs, 0.0)
    srt = jnp.sort(probs, -1)[:, ::-1]
    cum = jnp.cumsum(srt, -1)
    # smallest set with cumulative prob >= top_p: cutoff prob per sample
    cut_idx = jnp.argmax(cum >= top_p, -1)
    cutoff = jnp.take_along_axis(srt, cut_idx[:, None], -1)
    probs = jnp.where(probs >= cutoff, probs, 0.0)
    probs = probs / jnp.sum(probs, -1, keepdims=True)
    return jax.random.categorical(key, jnp.log(probs + 1e-20), -1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens",
                                             "temperature", "top_p",
                                             "top_k", "eos_token_id",
                                             "repetition_penalty",
                                             "kv_int8"))
def generate(cfg, params, inputs_embeds, attention_mask, *,
             max_new_tokens: int = 64, temperature: float = 0.0,
             top_p: float = 0.9, top_k: int = 0, eos_token_id: int = 2,
             prng_key=None,
             repetition_penalty: float = 1.0, kv_int8: bool = False,
             prompt_token_ids=None, positions=None, prefix=None,
             prefix_token_ids=None):
    """Batched generation from (possibly AV-spliced) prompt embeddings.

    inputs_embeds (B, S, H) right-padded, attention_mask (B, S).
    Returns (B, max_new_tokens) int32, EOS-padded after first EOS.
    ``kv_int8``: per-token-per-head int8 KV cache — half the cache memory
    and read bandwidth (the long-context decode bound); ~1e-2 logit class.
    ``prompt_token_ids`` (B, S) seeds the repetition penalty with the
    prompt tokens (vLLM/HF semantics penalize prompt + output); without
    them only generated tokens are penalized (AV-spliced prompts have no
    token ids for the spliced positions).
    ``prefix``: shared-prompt-prefix KV from :func:`prefill_prefix` —
    ``inputs_embeds`` then hold only the per-prompt SUFFIXES.
    ``prefix_token_ids`` (P,) seeds the repetition penalty with the prefix
    tokens when set.
    """
    B, S, _ = inputs_embeds.shape
    P = prefix[0].shape[1] if prefix is not None else 0
    L = P + S + max_new_tokens
    logits0, k_cache, v_cache, n_valid = prefill(cfg, params, inputs_embeds,
                                                 attention_mask, L,
                                                 kv_int8=kv_int8,
                                                 positions=positions,
                                                 prefix=prefix)
    if positions is not None and cfg.mrope_section is not None:
        # M-RoPE decode: every generated token advances all three position
        # components from the prompt's max valid position (HF rope_deltas
        # semantics, modeling_qwen2_5_vl.get_rope_index)
        pmax = jnp.max(jnp.where(attention_mask[:, :, None] > 0,
                                 positions, -1), axis=(1, 2))
        mk_pos = lambda t: jnp.broadcast_to((pmax + 1 + t)[:, None], (B, 3))
    else:
        mk_pos = lambda t: n_valid + t
    key = prng_key if prng_key is not None else jax.random.PRNGKey(0)
    base_mask = attention_mask.astype(bool)
    if P:   # the prefix slots are valid for every row
        base_mask = jnp.concatenate(
            [jnp.ones((B, P), bool), base_mask], axis=1)
    slot_mask0 = jnp.pad(base_mask, ((0, 0), (0, max_new_tokens)))

    B_ = inputs_embeds.shape[0]
    # repetition_penalty is static: with no penalty (the default and every
    # greedy protocol) the (B, vocab) seen matrix is never read, so don't
    # allocate, carry, or scatter-update it at all — None is an empty
    # pytree and rides the scan carry for free
    track_seen = repetition_penalty != 1.0
    seen0 = jnp.zeros((B_, cfg.vocab_size), jnp.int32) if track_seen else None
    if prompt_token_ids is not None and track_seen:
        rows = jnp.arange(B_)[:, None]
        seen0 = seen0.at[rows, prompt_token_ids].add(
            attention_mask.astype(jnp.int32))
    if prefix_token_ids is not None and track_seen:
        seen0 = seen0.at[:, prefix_token_ids].add(1)

    k0, key = jax.random.split(key)
    first = _sample(logits0, k0, temperature, top_p, seen0,
                    repetition_penalty, top_k)
    done0 = first == eos_token_id
    if track_seen:
        seen0 = seen0.at[jnp.arange(B_), first].add(1)

    def step(carry, t):
        tok, kc, vc, done, key, slot_mask, seen = carry
        slot = P + S + t
        slot_mask = slot_mask.at[:, slot].set(True)
        pos = mk_pos(t)
        logits, kc, vc = _step(cfg, params, tok, pos, slot, kc, vc, slot_mask)
        key, k1 = jax.random.split(key)
        nxt = _sample(logits, k1, temperature, top_p, seen,
                      repetition_penalty, top_k)
        nxt = jnp.where(done, eos_token_id, nxt)
        done = jnp.logical_or(done, nxt == eos_token_id)
        if track_seen:
            seen = seen.at[jnp.arange(B_), nxt].add(1)
        return (nxt, kc, vc, done, key, slot_mask, seen), tok

    (_, _, _, _, _, _, _), toks = jax.lax.scan(
        step, (first, k_cache, v_cache, done0, key, slot_mask0, seen0),
        jnp.arange(max_new_tokens))
    return jnp.swapaxes(toks, 0, 1)  # (B, max_new)
