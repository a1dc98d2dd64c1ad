"""Continuous-batching engine: outputs must equal per-request greedy
generation, under staggered admission and ragged prompt lengths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.mllm.generate import generate
from mertools_tpu.mllm.llm import LLM, LLMConfig
from mertools_tpu.mllm.serve import ContinuousBatcher


@pytest.fixture(scope="module")
def engine_llm():
    cfg = LLMConfig(vocab_size=89, hidden_size=32, num_layers=2, num_heads=4,
                    num_kv_heads=2, intermediate_size=64)
    model = LLM(cfg)

    def both(mdl, embeds, ids):
        mdl.embed(ids)
        return mdl(embeds)

    params = model.init(jax.random.PRNGKey(5),
                        np.zeros((1, 4, 32), np.float32),
                        np.zeros((1, 1), np.int32), method=both)["params"]
    return cfg, params


def _ref(cfg, params, emb, max_new, eos):
    out = np.asarray(generate(cfg, params, jnp.asarray(emb[None]),
                              jnp.ones((1, len(emb)), jnp.int32),
                              max_new_tokens=max_new, eos_token_id=eos))[0]
    stop = np.nonzero(out == eos)[0]
    return out[: stop[0]].tolist() if len(stop) else out.tolist()


@pytest.mark.parametrize("admit_batched", [True, False])
def test_engine_matches_generate(engine_llm, rng, admit_batched):
    """Batched admission (one prefill per bucket across freed slots, B padded
    to a power of two) must produce byte-identical results to serial B=1
    admission and to per-request generation."""
    cfg, params = engine_llm
    eos = 88
    prompts = [rng.normal(size=(n, 32)).astype(np.float32) * 0.1
               for n in (5, 11, 3, 17, 8)]
    refs = [_ref(cfg, params, p, 10, eos) for p in prompts]

    eng = ContinuousBatcher(cfg, params, n_slots=4, max_len=64,
                            eos_token_id=eos, max_new_tokens=10,
                            prefill_buckets=(8, 16, 32),
                            admit_batched=admit_batched)
    rids = [eng.submit(p) for p in prompts]
    out = eng.run()
    for rid, ref in zip(rids, refs):
        assert out[rid] == ref, (rid, out[rid], ref)


def test_engine_staggered_admission(engine_llm, rng):
    cfg, params = engine_llm
    eos = 88
    a = rng.normal(size=(6, 32)).astype(np.float32) * 0.1
    b = rng.normal(size=(9, 32)).astype(np.float32) * 0.1
    c = rng.normal(size=(4, 32)).astype(np.float32) * 0.1
    refs = {0: _ref(cfg, params, a, 8, eos), 1: _ref(cfg, params, b, 8, eos),
            2: _ref(cfg, params, c, 8, eos)}

    eng = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                            eos_token_id=eos, max_new_tokens=8,
                            prefill_buckets=(8, 16))
    eng.submit(a)
    eng.submit(b)
    eng.step()
    eng.step()
    eng.submit(c)  # lands when a slot frees, mid-flight
    while eng.queue or eng.active.any():
        eng.step()
    for rid, ref in refs.items():
        assert eng.finished[rid] == ref, (rid, eng.finished[rid], ref)


def test_engine_w8_packed_params(engine_llm, rng):
    """ContinuousBatcher over a w8-packed tree == generate() over the same
    packed tree (packed math is identical in both paths)."""
    from mertools_tpu.mllm.generate import quantize_llm_params_w8

    cfg, params = engine_llm
    eos = 88
    packed = quantize_llm_params_w8(params)
    prompts = [rng.normal(size=(n, 32)).astype(np.float32) * 0.1
               for n in (5, 9)]
    refs = [_ref(cfg, packed, p, 8, eos) for p in prompts]

    eng = ContinuousBatcher(cfg, packed, n_slots=2, max_len=32,
                            eos_token_id=eos, max_new_tokens=8,
                            prefill_buckets=(16,))
    rids = [eng.submit(p) for p in prompts]
    out = eng.run()
    for rid, ref in zip(rids, refs):
        assert out[rid] == ref, (rid, out[rid], ref)


def test_engine_shared_prefix_equals_full(engine_llm, rng):
    """Engine with a shared-prefix KV (prompts submitted as suffixes) must
    produce byte-identical results to the same engine over the full
    prompts — greedy AND with the repetition-penalty prompt seeding."""
    from mertools_tpu.mllm.generate import prefill_prefix

    cfg, params = engine_llm
    eos = 88
    table = np.asarray(params["embed_tokens"]["embedding"])
    pre = rng.integers(3, 88, size=12)
    sufs = [rng.integers(3, 88, size=n) for n in (4, 7, 2, 9)]
    prefix = prefill_prefix(cfg, params, jnp.asarray(table[pre]))

    for rp in (1.0, 1.4):
        eng_full = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                                     eos_token_id=eos, max_new_tokens=8,
                                     prefill_buckets=(8, 16, 32),
                                     temperature=0.0,
                                     repetition_penalty=rp)
        rids = []
        for suf in sufs:
            ids = np.concatenate([pre, suf])
            rids.append(eng_full.submit(
                table[ids], prompt_ids=ids if rp != 1.0 else None))
        want = eng_full.run()

        eng = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                                eos_token_id=eos, max_new_tokens=8,
                                prefill_buckets=(8, 16, 32),
                                temperature=0.0, repetition_penalty=rp,
                                prefix=prefix,
                                prefix_token_ids=pre if rp != 1.0 else None)
        rids2 = []
        for suf in sufs:
            rids2.append(eng.submit(
                table[suf], prompt_ids=suf if rp != 1.0 else None))
        got = eng.run()
        for ra, rb in zip(rids, rids2):
            assert got[rb] == want[ra], (rp, got[rb], want[ra])


def test_engine_bf16_mode(engine_llm, rng):
    """compute_dtype='bf16' (production serving, the reference's vLLM-fp16
    class): engine runs with bf16 params/caches on the DEFAULT-precision
    path, deterministically, with prefill logits in the bf16 noise class of
    the f32 path. Token-level equality with f32 is NOT asserted (different
    compiled programs at bf16 precision may tie-break differently)."""
    from mertools_tpu.mllm.generate import prefill

    cfg, params = engine_llm
    eos = 88
    prompts = [rng.normal(size=(n, 32)).astype(np.float32) * 0.1
               for n in (5, 11, 3)]

    def run():
        eng = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                                eos_token_id=eos, max_new_tokens=8,
                                prefill_buckets=(8, 16, 32),
                                compute_dtype="bf16")
        assert eng.k_cache.dtype == jnp.bfloat16
        rids = [eng.submit(p) for p in prompts]
        out = eng.run()
        return [out[r] for r in rids]

    a, b = run(), run()
    assert a == b                       # deterministic
    for toks in a:
        assert 0 < len(toks) <= 8
        assert all(0 <= t < cfg.vocab_size for t in toks)

    # prefill logits: bf16 class vs f32-HIGHEST
    from mertools_tpu.mllm.generate import cast_llm_params_bf16

    e = jnp.asarray(prompts[0][None])
    m = jnp.ones((1, 5), jnp.int32)
    lf, *_ = prefill(cfg, params, e, m, 16)
    lb, *_ = prefill(cfg, cast_llm_params_bf16(params), e, m, 16)
    assert lb.dtype == jnp.float32      # sampling logits stay f32
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lf),
                               rtol=0.1, atol=0.05)


def test_engine_sampling_reproducible(engine_llm, rng):
    """temperature>0: on-device top-p sampling + repetition penalty in the
    engine (reference vLLM SamplingParams); same seed -> same tokens,
    different seed -> (almost surely) different."""
    cfg, params = engine_llm
    eos = 88
    prompts = [rng.normal(size=(n, 32)).astype(np.float32) * 0.1
               for n in (5, 9, 12)]

    def run(seed):
        eng = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                                eos_token_id=eos, max_new_tokens=8,
                                prefill_buckets=(8, 16, 32),
                                temperature=0.8, top_p=0.9,
                                repetition_penalty=1.05, seed=seed)
        rids = [eng.submit(p) for p in prompts]
        out = eng.run()
        return [out[r] for r in rids]

    a, b = run(0), run(0)
    assert a == b                      # same seed reproduces
    for toks in a:
        assert all(0 <= t < cfg.vocab_size for t in toks)
    c = run(123)
    assert a != c                      # sampling actually samples


def test_engine_prompt_ids_seed_repetition_penalty(engine_llm, rng):
    """submit(prompt_ids=...) seeds the penalty with the PROMPT tokens
    (vLLM semantics): a strong penalty on the greedy token flips the first
    sampled token when that token appeared in the prompt."""
    cfg, params = engine_llm
    eos = 88
    emb = rng.normal(size=(6, 32)).astype(np.float32) * 0.1

    # baseline greedy token without any penalty
    eng = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                            eos_token_id=eos, max_new_tokens=1,
                            prefill_buckets=(8, 16))
    rid = eng.submit(emb)
    base = eng.run()[rid][0]

    # penalizing a token NOT in the prompt changes nothing
    other = (base + 1) % cfg.vocab_size
    eng = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                            eos_token_id=eos, max_new_tokens=1,
                            prefill_buckets=(8, 16), temperature=0.0,
                            repetition_penalty=1e6)
    rid = eng.submit(emb, prompt_ids=[other] * 6)
    assert eng.run()[rid][0] == base

    # a massive penalty on the greedy token (present in the prompt) flips it
    eng = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                            eos_token_id=eos, max_new_tokens=1,
                            prefill_buckets=(8, 16), temperature=0.0,
                            repetition_penalty=1e6)
    rid = eng.submit(emb, prompt_ids=[base] * 6)
    assert eng.run()[rid][0] != base


def test_engine_token_id_submission_equals_embeds(engine_llm, rng):
    """submit(prompt_ids=ids) (device-side embedding via _prefill_from_ids
    — round 4, VERDICT #4: the host-link float upload dominated admission)
    must produce byte-identical results to submitting the gathered
    embeddings, including mixed in one engine run."""
    cfg, params = engine_llm
    eos = 88
    table = np.asarray(params["embed_tokens"]["embedding"])
    ids_list = [rng.integers(1, 88, size=n).astype(np.int64)
                for n in (5, 11, 3, 17)]

    eng_e = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                              eos_token_id=eos, max_new_tokens=10,
                              prefill_buckets=(8, 16, 32))
    rids_e = [eng_e.submit(table[ids]) for ids in ids_list]
    out_e = eng_e.run()

    eng_i = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                              eos_token_id=eos, max_new_tokens=10,
                              prefill_buckets=(8, 16, 32))
    rids_i = [eng_i.submit(prompt_ids=ids) for ids in ids_list]
    out_i = eng_i.run()
    for re_, ri in zip(rids_e, rids_i):
        assert out_e[re_] == out_i[ri], (out_e[re_], out_i[ri])

    # mixed submission styles in one engine
    eng_m = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                              eos_token_id=eos, max_new_tokens=10,
                              prefill_buckets=(8, 16, 32))
    rm = [eng_m.submit(table[ids_list[0]]),
          eng_m.submit(prompt_ids=ids_list[1]),
          eng_m.submit(prompt_ids=ids_list[2]),
          eng_m.submit(table[ids_list[3]])]
    out_m = eng_m.run()
    for rid, ref_rid in zip(rm, rids_e):
        assert out_m[rid] == out_e[ref_rid]


def test_engine_token_id_submission_with_penalty_and_prefix(engine_llm, rng):
    """ids submission composes with the repetition penalty (ids seed the
    seen counts) and the shared-prefix cache."""
    from mertools_tpu.mllm.generate import prefill_prefix

    cfg, params = engine_llm
    eos = 88
    table = np.asarray(params["embed_tokens"]["embedding"])
    pre_ids = rng.integers(1, 88, size=6).astype(np.int64)
    prefix = prefill_prefix(cfg, params, table[pre_ids].astype(np.float32))
    ids_list = [rng.integers(1, 88, size=n).astype(np.int64) for n in (7, 9)]

    def run(use_ids):
        eng = ContinuousBatcher(cfg, params, n_slots=2, max_len=64,
                                eos_token_id=eos, max_new_tokens=8,
                                prefill_buckets=(8, 16),
                                repetition_penalty=1.3,
                                prefix=prefix, prefix_token_ids=pre_ids)
        rids = [eng.submit(prompt_ids=ids) if use_ids
                else eng.submit(table[ids], prompt_ids=ids)
                for ids in ids_list]
        out = eng.run()
        return [out[r] for r in rids]

    assert run(True) == run(False)


def test_engine_per_request_max_new(engine_llm, rng):
    """Round 5: per-request max_new_tokens (vLLM SamplingParams.max_tokens).
    Mixed budgets must cap each request exactly, match generate() at the
    same budget, and admission during decode must respect new budgets."""
    cfg, params = engine_llm
    eos = -1  # never fires: lengths are decided by the budgets alone
    prompts = [rng.normal(size=(n, 32)).astype(np.float32) * 0.1
               for n in (5, 9, 3, 12, 7, 4)]
    budgets = [3, 10, 1, 7, 10, 5]
    eng = ContinuousBatcher(cfg, params, n_slots=3, max_len=64,
                            eos_token_id=eos, max_new_tokens=10,
                            prefill_buckets=(16,), chunk=4)
    rids = [eng.submit(prompts[i], max_new_tokens=budgets[i])
            for i in range(3)]
    nxt = 3
    while nxt < len(prompts) or eng.queue or eng.active.any():
        if nxt < len(prompts):  # admission interleaved with decoding
            rids.append(eng.submit(prompts[nxt],
                                   max_new_tokens=budgets[nxt]))
            nxt += 1
        eng.step()
    out = dict(eng.finished)
    for rid, b, p in zip(rids, budgets, prompts):
        assert len(out[rid]) == b, (rid, len(out[rid]), b)
        ref = _ref(cfg, params, p, b, 88)[:b]
        assert out[rid] == ref, (rid, out[rid], ref)
    # budgets outside [1, engine max_new] are rejected
    with pytest.raises(AssertionError):
        eng.submit(prompts[0], max_new_tokens=0)
    with pytest.raises(AssertionError):
        eng.submit(prompts[0], max_new_tokens=11)
