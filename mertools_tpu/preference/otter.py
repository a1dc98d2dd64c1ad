"""Otter (OTTER-Video-LLaMA7B-DenseCaption) zero-shot judge — the
Flamingo family: perceiver resampler + GATED CROSS-ATTENTION inside the LM.

Reference: ``MER2026/MER2026_Track3/utils/otter.py`` wrapping the vendored
``MER2025_Track23/Otter/otter/modeling_otter.py``:

- CLIP ViT-L last_hidden_state (no post-LN), CLS dropped (:719-738);
  16 frames enter as ONE media with F=16 (wrapper :88-94);
- **perceiver resampler** (:130-238): 64 latents, 6 blocks; each block's
  queries cross-attend [frames; latents] (kv includes the latents!), with
  optional learned frame/media-time embeddings, softmax stabilized by
  amax subtraction, bias-free projections, final LayerNorm;
- **gated cross-attention** (:239-445): before every
  ``cross_attn_every_n_layers``-th LLaMA layer, text cross-attends the
  media latents through tanh-gated attention + tanh-gated GELU FFN;
  the media mask derives from ``media_locations = input_ids ==
  media_token_id`` (text_time cumsum; only-attend-immediate);
- NO embedding splice — ``<image>`` stays a regular token; conditioning
  is purely the cross-attention;
- wrapper protocol (:84-124): prompt ``"<image>User: {prompt}
  GPT:<answer>"``, 16 uniform frames, ``max_new_tokens=512, num_beams=3,
  no_repeat_ngram_size=3, bad_words_ids=["User:","GPT1:","GFT:","GPT:"]``,
  response split on ``<answer>`` / ``<|endofchunk|>``.

TPU-native re-design: jitted prefill/step with the cross-attention K/V of
the 64 latents precomputed once; HOST-side logit post-processing gives the
reference's bad-words and no-repeat-3-gram semantics exactly. The caller
defaults decode with ``num_beams=3`` through the HF-semantics beam engine
(``mllm/beam.HFBeam``, HF-EXACT in tests/test_beam.py) with the processors
applied inside the beam loop — the full reference protocol
(utils/otter.py:103-111). ``num_beams=1`` falls back to the greedy/top-p
host loop.

Parity vs a hand-assembled torch oracle in tests/test_otter.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..encoders.vit_clip import CLIPVisionConfig
from ..mllm.generate import _lora_dense, _mlp, _qkv, _rms, _rotary
from ..mllm.llm import LLMConfig
from ..mllm.llm import convert_torch_state as convert_llm_state
from .videollava import (IMAGE_MEAN, IMAGE_STD, CLIPHiddenTower,
                         _convert_tower)

_P = jax.lax.Precision.HIGHEST

PROMPT_PATTERN = "<image>User: {} GPT:<answer>"
BAD_WORDS = ["User:", "GPT1:", "GFT:", "GPT:"]


@dataclass(frozen=True)
class PerceiverConfig:
    dim: int = 1024
    depth: int = 6
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 64
    ff_mult: int = 4


def _ln(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def perceiver_apply(cfg: PerceiverConfig, p: dict,
                    frames: jnp.ndarray) -> jnp.ndarray:
    """(B, F, v, D) frame features -> (B, num_latents, D). T_img == 1 (the
    wrapper's only media shape)."""
    B, F, v, D = frames.shape
    x = frames
    if "frame_embs" in p:
        x = x + p["frame_embs"][:F][None, :, None, :]
    x = x.reshape(B, F * v, D)
    if "media_time_embs" in p:
        x = x + p["media_time_embs"][0][None]
    lat = jnp.broadcast_to(p["latents"], (B, cfg.num_latents, D))
    nh, hd = cfg.heads, cfg.dim_head
    for i in range(cfg.depth):
        lp = p[f"block_{i}"]
        xm = _ln(lp["norm_media"], x)
        qn = _ln(lp["norm_latents"], lat)
        q = jnp.einsum("bnd,dk->bnk", qn, lp["to_q"], precision=_P)
        kv_in = jnp.concatenate([xm, qn], axis=1)
        kv = jnp.einsum("bmd,dk->bmk", kv_in, lp["to_kv"], precision=_P)
        k, vv = jnp.split(kv, 2, axis=-1)
        q = q.reshape(B, -1, nh, hd) * hd ** -0.5
        k = k.reshape(B, -1, nh, hd)
        vv = vv.reshape(B, -1, nh, hd)
        sim = jnp.einsum("bind,bjnd->bnij", q, k, precision=_P)
        sim = sim - jax.lax.stop_gradient(sim.max(-1, keepdims=True))
        att = jax.nn.softmax(sim, axis=-1)
        o = jnp.einsum("bnij,bjnd->bind", att, vv, precision=_P)
        o = jnp.einsum("bnk,kd->bnd", o.reshape(B, -1, nh * hd),
                       lp["to_out"], precision=_P)
        lat = lat + o
        h = _ln(lp["ff_ln"], lat)
        h = jnp.einsum("bnd,dk->bnk", h, lp["ff1"], precision=_P)
        h = jax.nn.gelu(h, approximate=False)
        h = jnp.einsum("bnk,kd->bnd", h, lp["ff2"], precision=_P)
        lat = lat + h
    return _ln(p["norm"], lat)


def _cross_block(cp, x, media_k, media_v, cross_mask, zero_mask, heads, hd):
    """Gated cross-attention (modeling_otter.py:263-445). x (B, S, D) or
    (B, D); media_k/v (B, M, nh, hd); cross_mask (B, S, M) bool or None
    (None = attend all); zero_mask (B, S) bool rows whose attention output
    is zeroed (no preceding media)."""
    single = x.ndim == 2
    if single:
        x = x[:, None]
    B, S, D = x.shape
    xn = _ln(cp["norm"], x)
    q = jnp.einsum("bsd,dk->bsk", xn, cp["to_q"], precision=_P)
    q = q.reshape(B, S, heads, hd) * hd ** -0.5
    sim = jnp.einsum("bsnd,bmnd->bnsm", q, media_k, precision=_P)
    if cross_mask is not None:
        sim = jnp.where(cross_mask[:, None], sim, -1e30)
    sim = sim - jax.lax.stop_gradient(sim.max(-1, keepdims=True))
    att = jax.nn.softmax(sim, axis=-1)
    if zero_mask is not None:
        att = jnp.where(zero_mask[:, None, :, None], 0.0, att)
    o = jnp.einsum("bnsm,bmnd->bsnd", att, media_v, precision=_P)
    o = jnp.einsum("bsk,kd->bsd", o.reshape(B, S, heads * hd),
                   cp["to_out"], precision=_P)
    x = x + o * jnp.tanh(cp["attn_gate"])
    h = _ln(cp["ff_ln"], x)
    h = jnp.einsum("bsd,dk->bsk", h, cp["ff1"], precision=_P)
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.einsum("bsk,kd->bsd", h, cp["ff2"], precision=_P)
    x = x + h * jnp.tanh(cp["ff_gate"])
    return x[:, 0] if single else x


class Otter:
    """Batched TPU Otter. ``params``: {tower, perceiver, llm,
    cross_{i} for conditioned layers}."""

    def __init__(self, vcfg: CLIPVisionConfig, pcfg: PerceiverConfig,
                 llm_cfg: LLMConfig, params: dict, *,
                 media_token_id: int, cross_attn_every_n_layers: int = 4,
                 cross_heads: int = 8, cross_dim_head: int = 64):
        self.vcfg = vcfg
        self.pcfg = pcfg
        self.llm_cfg = llm_cfg
        self.params = params
        self.media_token_id = media_token_id
        self.cross_layers = [i for i in range(llm_cfg.num_layers)
                             if (i + 1) % cross_attn_every_n_layers == 0]
        self.cross_heads = cross_heads
        self.cross_dim_head = cross_dim_head
        self._tower = CLIPHiddenTower(vcfg, vcfg.num_hidden_layers)

        def encode_media(p, pixels):
            """(B*F, H, W, 3) -> per-cross-layer (k, v) over 64 latents."""
            h = self._tower.apply({"params": p["tower"]}, pixels)[:, 1:]
            B = pixels.shape[0] // self.n_frames
            h = h.reshape(B, self.n_frames, h.shape[1], h.shape[2])
            lat = perceiver_apply(pcfg, p["perceiver"], h)  # (B, 64, D)
            kvs = {}
            for i in self.cross_layers:
                cp = p[f"cross_{i}"]
                kv = jnp.einsum("bmd,dk->bmk", lat, cp["to_kv"],
                                precision=_P)
                k, v = jnp.split(kv, 2, axis=-1)
                kvs[i] = (k.reshape(*k.shape[:2], cross_heads,
                                    cross_dim_head),
                          v.reshape(*v.shape[:2], cross_heads,
                                    cross_dim_head))
            return kvs

        self.n_frames = None  # set per-call (static under jit by shape)
        self._encode_media = jax.jit(encode_media)
        self._prefill = jax.jit(self._prefill_fn,
                                static_argnames=("cache_len",))
        self._step = jax.jit(self._step_fn)

        def beam_step(p, tok, pos, slot, k_cache, v_cache, slot_mask,
                      media_kvs, beam_idx):
            # reorder the KV caches by flat beam index (HF reorder_cache);
            # media K/V are identical across an element's beams, no reorder
            k_cache = jnp.take(k_cache, beam_idx, axis=1)
            v_cache = jnp.take(v_cache, beam_idx, axis=1)
            return self._step_fn(p, tok, pos, slot, k_cache, v_cache,
                                 slot_mask, media_kvs)

        self._beam_step = jax.jit(beam_step)

    # ---- LM with gated cross-attention ----

    def _prefill_fn(self, p, input_ids, attention_mask, media_kvs,
                    cache_len: int):
        cfg = self.llm_cfg
        B, S = input_ids.shape
        H = cfg.hidden_size
        nh, nkv = cfg.num_heads, cfg.num_kv_heads
        hd = H // nh
        mask = attention_mask.astype(jnp.int32)
        positions = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0, None)
        n_valid = jnp.sum(mask, axis=1)
        causal = (jnp.arange(S)[:, None] >= jnp.arange(S)[None, :])
        bias = jnp.where(causal[None, None] & (mask[:, None, None, :] > 0),
                         0.0, -1e30)
        # media masking (modeling:297-331): text_time vs media_time == 1
        media_loc = input_ids == self.media_token_id
        text_time = jnp.cumsum(media_loc.astype(jnp.int32), axis=1)
        n_lat = self.pcfg.num_latents
        cross_mask = jnp.broadcast_to((text_time == 1)[:, :, None],
                                      (B, S, n_lat))
        zero_mask = text_time == 0

        x = p["llm"]["embed_tokens"]["embedding"][input_ids]
        ks, vs = [], []
        for i in range(cfg.num_layers):
            if i in self.cross_layers:
                x = _cross_block(p[f"cross_{i}"], x, *media_kvs[i],
                                 cross_mask, zero_mask, self.cross_heads,
                                 self.cross_dim_head)
            lp = p["llm"][f"layer_{i}"]
            xn = _rms(lp["input_layernorm"], x, cfg.rms_norm_eps)
            q, k, v = _qkv(cfg, lp, xn)
            q = _rotary(q, positions, cfg.rope_theta)
            k = _rotary(k, positions, cfg.rope_theta)
            ks.append(k)
            vs.append(v)
            kr = jnp.repeat(k, nh // nkv, axis=2) if nkv != nh else k
            vr = jnp.repeat(v, nh // nkv, axis=2) if nkv != nh else v
            logits = jnp.einsum("bqnd,bknd->bnqk", q, kr,
                                precision=_P) / np.sqrt(hd)
            w = jax.nn.softmax((logits + bias).astype(jnp.float32), -1
                               ).astype(x.dtype)
            att = jnp.einsum("bnqk,bknd->bqnd", w, vr, precision=_P)
            x = x + _lora_dense(lp["o_proj"], att.reshape(B, S, H),
                                cfg.lora_alpha)
            xn = _rms(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
            x = x + _mlp(lp, xn, cfg.lora_alpha)
        x = _rms(p["llm"]["norm"], x, cfg.rms_norm_eps)
        last = jnp.take_along_axis(x, (n_valid - 1)[:, None, None],
                                   axis=1)[:, 0]
        logits = jnp.einsum("bd,dv->bv", last, p["llm"]["lm_head"]["kernel"],
                            precision=_P)
        pad = cache_len - S
        padkv = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, pad),
                                      (0, 0), (0, 0)))
        return logits, padkv(jnp.stack(ks)), padkv(jnp.stack(vs)), n_valid

    def _step_fn(self, p, tok, pos, slot, k_cache, v_cache, slot_mask,
                 media_kvs):
        cfg = self.llm_cfg
        B = tok.shape[0]
        H = cfg.hidden_size
        nh, nkv = cfg.num_heads, cfg.num_kv_heads
        hd = H // nh
        x = p["llm"]["embed_tokens"]["embedding"][tok]
        for i in range(cfg.num_layers):
            if i in self.cross_layers:
                # generated tokens all follow the single media: full attend
                x = _cross_block(p[f"cross_{i}"], x, *media_kvs[i],
                                 None, None, self.cross_heads,
                                 self.cross_dim_head)
            lp = p["llm"][f"layer_{i}"]
            xn = _rms(lp["input_layernorm"], x, cfg.rms_norm_eps)
            q, k, v = _qkv(cfg, lp, xn)
            q = _rotary(q, pos, cfg.rope_theta)
            k = _rotary(k, pos, cfg.rope_theta)
            k_cache = jax.lax.dynamic_update_slice(  # noqa: F841 (rebound)
                k_cache, k[None, :, None], (i, 0, slot, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v[None, :, None], (i, 0, slot, 0, 0))
            kk, vv = k_cache[i], v_cache[i]
            if nkv != nh:
                kk = jnp.repeat(kk, nh // nkv, axis=2)
                vv = jnp.repeat(vv, nh // nkv, axis=2)
            logits = jnp.einsum("bnd,blnd->bnl", q, kk,
                                precision=_P) / np.sqrt(hd)
            logits = jnp.where(slot_mask[:, None], logits, -1e30)
            w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
            att = jnp.einsum("bnl,blnd->bnd", w, vv, precision=_P)
            x = x + _lora_dense(lp["o_proj"], att.reshape(B, H),
                                cfg.lora_alpha)
            xn = _rms(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
            x = x + _mlp(lp, xn, cfg.lora_alpha)
        x = _rms(p["llm"]["norm"], x, cfg.rms_norm_eps)
        logits = jnp.einsum("bd,dv->bv", x, p["llm"]["lm_head"]["kernel"],
                            precision=_P)
        return logits, k_cache, v_cache

    def media_kvs(self, pixels: np.ndarray) -> dict:
        """(B, F, H, W, 3) normalized frames -> per-layer latents K/V."""
        B, F = pixels.shape[:2]
        self.n_frames = F
        return self._encode_media(self.params, jnp.asarray(
            pixels.reshape((B * F,) + pixels.shape[2:])))

    def generate_batch(self, ids_list: list, pixels: np.ndarray, tokenizer,
                       *, max_new_tokens: int = 512,
                       temperature: float = 0.0, top_p: float = 0.9,
                       num_beams: int = 1, length_penalty: float = 1.0,
                       bad_words_ids: list | None = None,
                       no_repeat_ngram_size: int = 0, seed: int = 0,
                       prng_key=None) -> list[str]:
        """Right-pad, prefill, host-loop decode with the reference's
        bad-words and no-repeat-ngram logit processing applied exactly
        (HF LogitsProcessor semantics on the host); ``num_beams>1`` runs
        HF-semantics beam search with the same processors inside the loop
        (the utils/otter.py:103-111 protocol)."""
        if num_beams > 1:
            return self._beam_generate_batch(
                ids_list, pixels, tokenizer, max_new_tokens=max_new_tokens,
                temperature=temperature, top_p=top_p, num_beams=num_beams,
                length_penalty=length_penalty, bad_words_ids=bad_words_ids,
                no_repeat_ngram_size=no_repeat_ngram_size, seed=seed)
        B = len(ids_list)
        S = max(len(x) for x in ids_list)
        ids = np.zeros((B, S), np.int32)
        mask = np.zeros((B, S), np.int32)
        for i, x in enumerate(ids_list):
            ids[i, : len(x)] = x
            mask[i, : len(x)] = 1
        media_kvs = self.media_kvs(pixels)
        cache_len = S + max_new_tokens
        logits, k_cache, v_cache, n_valid = self._prefill(
            self.params, jnp.asarray(ids), jnp.asarray(mask), media_kvs,
            cache_len=cache_len)
        eos = tokenizer.eos_token_id
        seqs = [list(x) for x in ids_list]
        out_ids = [[] for _ in range(B)]
        done = [False] * B
        slot_mask_np = np.zeros((B, cache_len), bool)
        slot_mask_np[:, :S] = mask.astype(bool)
        pos = jnp.asarray(np.sum(mask, 1))
        key = prng_key
        for step in range(max_new_tokens):
            lg = np.array(logits, np.float32)   # writable host copy
            for b in range(B):
                lg[b] = _process_logits(lg[b], seqs[b], bad_words_ids,
                                        no_repeat_ngram_size)
            if temperature == 0.0:
                nxt = lg.argmax(-1)
            else:
                probs = _host_top_p(lg / temperature, top_p)
                key, sub = jax.random.split(key)
                nxt = np.array([
                    np.random.default_rng(
                        int(jax.random.randint(sub, (), 0, 2**31 - 1)) + b
                    ).choice(len(probs[b]), p=probs[b]) for b in range(B)])
            for b in range(B):
                if not done[b]:
                    out_ids[b].append(int(nxt[b]))
                    seqs[b].append(int(nxt[b]))
                    if eos is not None and int(nxt[b]) == eos:
                        done[b] = True
            if all(done):
                break
            slot = S + step
            slot_mask_np[:, slot] = True
            logits, k_cache, v_cache = self._step(
                self.params, jnp.asarray(nxt.astype(np.int32)), pos, slot,
                k_cache, v_cache, jnp.asarray(slot_mask_np), media_kvs)
            pos = pos + 1
        out = []
        for b in range(B):
            row = out_ids[b]
            if eos is not None and row and row[-1] == eos:
                row = row[:-1]
            out.append(tokenizer.decode(row, skip_special_tokens=True))
        return out

    def _beam_generate_batch(self, ids_list, pixels, tokenizer, *,
                             max_new_tokens, temperature, top_p, num_beams,
                             length_penalty, bad_words_ids,
                             no_repeat_ngram_size, seed):
        """HF-semantics beam search (mllm/beam.HFBeam) over the Flamingo
        LM: prompts repeat per beam, the media latent K/V are shared within
        an element's beams, caches reorder by flat beam index each step."""
        from ..mllm.beam import HFBeam

        B = len(ids_list)
        N = num_beams
        S = max(len(x) for x in ids_list)
        ids = np.zeros((B, S), np.int32)
        mask = np.zeros((B, S), np.int32)
        for i, x in enumerate(ids_list):
            ids[i, : len(x)] = x
            mask[i, : len(x)] = 1
        media_kvs = self.media_kvs(pixels)
        cache_len = S + max_new_tokens
        # prefill ONCE per prompt (beams share it), replicate for the steps
        logits, k_cache, v_cache, n_valid = self._prefill(
            self.params, jnp.asarray(ids), jnp.asarray(mask), media_kvs,
            cache_len=cache_len)
        k_cache = jnp.repeat(k_cache, N, axis=1)
        v_cache = jnp.repeat(v_cache, N, axis=1)
        logits = jnp.repeat(logits, N, axis=0)
        n_valid = jnp.repeat(n_valid, N, axis=0)
        mask_r = np.repeat(mask, N, axis=0)
        media_kvs = jax.tree_util.tree_map(
            lambda t: jnp.repeat(t, N, axis=0), media_kvs)
        eos = tokenizer.eos_token_id

        def process_fn(seq, lp):
            return _process_logits(lp, list(seq), bad_words_ids,
                                   no_repeat_ngram_size)

        eng = HFBeam(B, N, self.llm_cfg.vocab_size, max_new_tokens,
                     eos if eos is not None else -1,
                     length_penalty=length_penalty,
                     do_sample=temperature > 0, temperature=temperature,
                     top_p=top_p, seed=seed,
                     prompts=[list(map(int, x)) for x in ids_list],
                     process_fn=process_fn)
        slot_mask_np = np.zeros((B * N, cache_len), bool)
        slot_mask_np[:, :S] = mask_r.astype(bool)
        for t in range(max_new_tokens):
            nxt, beam_idx, done = eng.step(np.asarray(logits, np.float32))
            if done:
                break
            slot = S + t
            slot_mask_np[:, slot] = True
            logits, k_cache, v_cache = self._beam_step(
                self.params, jnp.asarray(nxt), n_valid + t, slot,
                k_cache, v_cache, jnp.asarray(slot_mask_np), media_kvs,
                jnp.asarray(beam_idx))
        out = []
        for row in eng.final():
            if eos is not None and row and row[-1] == eos:
                row = row[:-1]
            out.append(tokenizer.decode(row, skip_special_tokens=True))
        return out


def _process_logits(lg, seq, bad_words_ids, no_repeat_ngram_size):
    """HF NoBadWords + NoRepeatNGram semantics for one row."""
    if bad_words_ids:
        for bw in bad_words_ids:
            if len(bw) == 1:
                lg[bw[0]] = -np.inf
            elif len(bw) > 1 and len(seq) >= len(bw) - 1 and \
                    seq[-(len(bw) - 1):] == bw[:-1]:
                lg[bw[-1]] = -np.inf
    n = no_repeat_ngram_size
    if n > 0 and len(seq) >= n - 1:
        prefix = tuple(seq[-(n - 1):]) if n > 1 else ()
        for j in range(len(seq) - n + 1):
            if tuple(seq[j: j + n - 1]) == prefix:
                lg[seq[j + n - 1]] = -np.inf
    return lg


def _host_top_p(lg, top_p):
    e = np.exp(lg - lg.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    out = np.zeros_like(probs)
    for b in range(len(probs)):
        order = np.argsort(probs[b])[::-1]
        cum = np.cumsum(probs[b][order])
        keep = cum - probs[b][order] < top_p
        keep[0] = True
        p = np.zeros_like(probs[b])
        p[order[keep]] = probs[b][order[keep]]
        out[b] = p / p.sum()
    return out


def convert_otter_state(vcfg: CLIPVisionConfig, pcfg: PerceiverConfig,
                        llm_cfg: LLMConfig, sd: dict,
                        cross_layers: list[int]) -> dict:
    """OtterForConditionalGeneration state dict -> our tree. Key layout:
    ``vision_encoder.vision_model.*``, ``perceiver.*``,
    ``lang_encoder.model.layers.N.*`` (plain LLaMA) +
    ``lang_encoder.gated_cross_attn_layers.N.*``, ``lang_encoder.lm_head``."""
    def t(x):
        return np.asarray(x.detach().cpu().numpy()
                          if hasattr(x, "detach") else x)

    params: dict = {
        "tower": _convert_tower(vcfg, sd, "vision_encoder",
                                vcfg.num_hidden_layers)}
    pp: dict = {"latents": t(sd["perceiver.latents"]),
                "norm": {"scale": t(sd["perceiver.norm.weight"]),
                         "bias": t(sd["perceiver.norm.bias"])}}
    if "perceiver.frame_embs" in sd:
        pp["frame_embs"] = t(sd["perceiver.frame_embs"])
    if "perceiver.media_time_embs" in sd:
        pp["media_time_embs"] = t(sd["perceiver.media_time_embs"])
    for i in range(pcfg.depth):
        b = f"perceiver.layers.{i}"
        pp[f"block_{i}"] = {
            "norm_media": {"scale": t(sd[f"{b}.norm_media.weight"]),
                           "bias": t(sd[f"{b}.norm_media.bias"])},
            "norm_latents": {"scale": t(sd[f"{b}.norm_latents.weight"]),
                             "bias": t(sd[f"{b}.norm_latents.bias"])},
            "to_q": t(sd[f"{b}.to_q.weight"]).T,
            "to_kv": t(sd[f"{b}.to_kv.weight"]).T,
            "to_out": t(sd[f"{b}.to_out.weight"]).T,
            "ff_ln": {"scale": t(sd[f"{b}.feed_forward.0.weight"]),
                      "bias": t(sd[f"{b}.feed_forward.0.bias"])},
            "ff1": t(sd[f"{b}.feed_forward.1.weight"]).T,
            "ff2": t(sd[f"{b}.feed_forward.3.weight"]).T,
        }
    params["perceiver"] = pp
    for j, i in enumerate(cross_layers):
        b = f"lang_encoder.gated_cross_attn_layers.{j}"
        params[f"cross_{i}"] = {
            "norm": {"scale": t(sd[f"{b}.attn.norm.weight"]),
                     "bias": t(sd[f"{b}.attn.norm.bias"])},
            "to_q": t(sd[f"{b}.attn.to_q.weight"]).T,
            "to_kv": t(sd[f"{b}.attn.to_kv.weight"]).T,
            "to_out": t(sd[f"{b}.attn.to_out.weight"]).T,
            "attn_gate": t(sd[f"{b}.attn_gate"]).reshape(()),
            "ff_ln": {"scale": t(sd[f"{b}.feed_forward.0.weight"]),
                      "bias": t(sd[f"{b}.feed_forward.0.bias"])},
            "ff1": t(sd[f"{b}.feed_forward.1.weight"]).T,
            "ff2": t(sd[f"{b}.feed_forward.3.weight"]).T,
            "ff_gate": t(sd[f"{b}.ff_gate"]).reshape(()),
        }
    lsd = {k.removeprefix("lang_encoder."): v for k, v in sd.items()
           if k.startswith("lang_encoder.")
           and "gated_cross_attn" not in k}
    params["llm"] = convert_llm_state(llm_cfg, lsd)
    return jax.tree_util.tree_map(jnp.asarray, params)


class OtterCaller:
    """Unified judge wrapper (utils/otter.py protocol: 16 frames, the
    ``<image>User: ... GPT:<answer>`` prompt, ``num_beams=3`` HF beam
    search with bad-words + no-repeat-3-gram processors,
    ``<answer>``/``<|endofchunk|>`` response parsing)."""

    def __init__(self, model: Otter, tokenizer, *, batch: int = 2,
                 n_frames: int = 16, max_new_tokens: int = 512,
                 temperature: float = 0.0, top_p: float = 0.9,
                 num_beams: int = 3, length_penalty: float = 1.0,
                 seed: int = 0):
        self.model = model
        self.tok = tokenizer
        self.batch = batch
        self.n_frames = n_frames
        self.max_new_tokens = max_new_tokens
        self.temperature = float(temperature)
        self.top_p = top_p
        self.num_beams = int(num_beams)
        self.length_penalty = float(length_penalty)
        self.seed = seed
        self.bad_words_ids = [
            tokenizer(w, add_special_tokens=False).input_ids
            for w in BAD_WORDS]

    @classmethod
    def from_checkpoint(cls, model_path: str, **kw) -> "OtterCaller":
        """Assemble from the OTTER-Video-LLaMA7B checkpoint dir
        (config.json + torch bins + tokenizer — utils/otter.py:39)."""
        import json
        import os

        import torch
        from transformers import AutoTokenizer, LlamaConfig

        from ..encoders.vit_clip import CLIPVisionConfig as VC
        from transformers import CLIPVisionConfig as HFC

        with open(os.path.join(model_path, "config.json")) as f:
            cfg = json.load(f)
        sd = {}
        for fn in sorted(os.listdir(model_path)):
            if fn.endswith(".bin") or fn.endswith(".pt"):
                d = torch.load(os.path.join(model_path, fn),
                               map_location="cpu")
                sd.update(d.get("model", d))
        vcfg = VC.from_hf(HFC(**cfg["vision_config"]), projection_dim=1)
        tcfg = cfg["text_config"]
        llm_cfg = LLMConfig.from_hf(LlamaConfig(**tcfg))
        every = cfg.get("cross_attn_every_n_layers", 4)
        cross_layers = [i for i in range(llm_cfg.num_layers)
                        if (i + 1) % every == 0]
        pcfg = PerceiverConfig(dim=vcfg.hidden_size)
        params = convert_otter_state(vcfg, pcfg, llm_cfg, sd, cross_layers)
        tok = AutoTokenizer.from_pretrained(model_path)
        media_id = tok.encode("<image>")[-1]
        model = Otter(vcfg, pcfg, llm_cfg, params, media_token_id=media_id,
                      cross_attn_every_n_layers=every)
        return cls(model, tok, **kw)

    def _load_frames(self, sample: dict) -> np.ndarray:
        if "frames" in sample:
            frames = np.asarray(sample["frames"])
        else:
            from ..io import video as vio

            frames = vio.decode_frames(sample["video_path"])
        # utils/otter.py:59-74: frame_step = total // num_frames
        step = max(1, len(frames) // self.n_frames)
        idx = [min(i * step, len(frames) - 1) for i in range(self.n_frames)]
        return frames[idx]

    def preprocess(self, frames: np.ndarray) -> np.ndarray:
        """CLIPImageProcessor defaults: shortest-edge 224 resize + center
        crop + CLIP norm."""
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

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        out: list[str] = [""] * len(samples)
        key = (jax.random.PRNGKey(self.seed)
               if self.temperature > 0 else None)
        for i in range(0, len(samples), self.batch):
            grp = list(range(i, min(i + self.batch, len(samples))))
            pixels = np.stack([self.preprocess(self._load_frames(samples[j]))
                               for j in grp])
            ids = [np.asarray(self.tok(PROMPT_PATTERN.format(prompts[j])
                                       ).input_ids, np.int32)
                   for j in grp]
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            texts = self.model.generate_batch(
                ids, pixels, self.tok, max_new_tokens=self.max_new_tokens,
                temperature=self.temperature, top_p=self.top_p,
                num_beams=self.num_beams,
                length_penalty=self.length_penalty,
                bad_words_ids=self.bad_words_ids, no_repeat_ngram_size=3,
                seed=self.seed * 1000003 + i, prng_key=sub)
            for j, txt in zip(grp, texts):
                # utils/otter.py:113-124 response parsing
                txt = (txt.split("<answer>")[-1].strip()
                       .split("<|endofchunk|>")[0].strip()
                       .lstrip('"').rstrip('"'))
                out[j] = txt.replace("\n", " ").replace("\t", " ").strip()
        return out

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        return self([{"video_path": video_path}], [prompt])[0]
