"""HF-EXACT parity for the beam engine (mllm/beam.py) vs transformers'
vectorized beam search — the decode protocol two Track3 judges require
(Otter num_beams=3 + processors, utils/otter.py:103-111; SALMONN
num_beams=4 beam sampling, SALMONN/model.py:118-132)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mertools_tpu.mllm.beam import HFBeam, beam_generate
from mertools_tpu.mllm.llm import LLMConfig, convert_torch_state


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=64, max_position_embeddings=256,
                      attention_dropout=0.0, eos_token_id=2, pad_token_id=0)
    torch.manual_seed(11)
    hf = LlamaForCausalLM(cfg).eval()
    ours_cfg = LLMConfig.from_hf(hf.config)
    params = convert_torch_state(ours_cfg, hf.state_dict())
    return hf, ours_cfg, params


def _hf_beam_tokens(hf, ids, max_new, num_beams, length_penalty=1.0,
                    eos_token_id=2, **kw):
    """HF beam search over token prompts -> per-row generated ids with
    trailing pads stripped (pad_token_id=0)."""
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.as_tensor(ids, dtype=torch.long),
            attention_mask=torch.ones_like(
                torch.as_tensor(ids, dtype=torch.long)),
            max_new_tokens=max_new, num_beams=num_beams, do_sample=False,
            length_penalty=length_penalty, early_stopping=False,
            eos_token_id=eos_token_id, pad_token_id=0, **kw)
    gen = out[:, np.asarray(ids).shape[1]:].numpy()
    return gen


def _ours_beam_tokens(ours_cfg, params, ids, max_new, num_beams,
                      length_penalty=1.0, eos_token_id=2, process_fn=None):
    table = np.asarray(params["embed_tokens"]["embedding"])
    emb = table[np.asarray(ids)]
    mask = np.ones(np.asarray(ids).shape, np.int32)
    return beam_generate(
        ours_cfg, params, jnp.asarray(emb), jnp.asarray(mask),
        num_beams=num_beams, max_new_tokens=max_new,
        eos_token_id=eos_token_id, length_penalty=length_penalty,
        prompt_token_ids=[list(map(int, r)) for r in np.asarray(ids)],
        process_fn=process_fn)


def _assert_rows_match(ours_rows, hf_gen, pad=0):
    for b, row in enumerate(ours_rows):
        want = hf_gen[b]
        assert row == want[: len(row)].tolist(), (b, row, want.tolist())
        assert (want[len(row):] == pad).all(), (b, row, want.tolist())


@pytest.mark.parametrize("length_penalty", [1.0, 2.0, 0.0])
def test_beam_greedy_matches_hf(hf_and_ours, length_penalty):
    hf, ours_cfg, params = hf_and_ours
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 64, size=(2, 6))
    hf_gen = _hf_beam_tokens(hf, ids, 10, 3, length_penalty)
    ours = _ours_beam_tokens(ours_cfg, params, ids, 10, 3, length_penalty)
    _assert_rows_match(ours, hf_gen)


def test_beam_eos_path_matches_hf(hf_and_ours):
    """Force the EOS fold path: pick the 3rd greedy-beam token as the EOS id
    so hypotheses finish mid-stream on both sides."""
    hf, ours_cfg, params = hf_and_ours
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 64, size=(1, 5))
    probe = _hf_beam_tokens(hf, ids, 6, 3, eos_token_id=63)
    eos = int(probe[0, 2])
    if eos == 0:  # pad collision would make stripping ambiguous
        eos = int(probe[0, 1]) or int(probe[0, 0])
    hf_gen = _hf_beam_tokens(hf, ids, 10, 3, eos_token_id=eos)
    ours = _ours_beam_tokens(ours_cfg, params, ids, 10, 3,
                             eos_token_id=eos)
    _assert_rows_match(ours, hf_gen)
    assert any(eos in r for r in ours)  # the path was actually exercised


def test_beam_inputs_embeds_matches_hf(hf_and_ours):
    """Embedding prompts (the SALMONN/AffectGPT splice shape):
    decoder_prompt_len == 0 on both sides."""
    hf, ours_cfg, params = hf_and_ours
    rng = np.random.default_rng(2)
    ids = rng.integers(3, 64, size=(2, 7))
    table_t = hf.get_input_embeddings().weight.detach()
    emb_t = table_t[torch.as_tensor(ids, dtype=torch.long)]
    with torch.no_grad():
        out = hf.generate(
            inputs_embeds=emb_t,
            attention_mask=torch.ones(ids.shape, dtype=torch.long),
            max_new_tokens=8, num_beams=4, do_sample=False,
            length_penalty=1.0, early_stopping=False, eos_token_id=2,
            pad_token_id=0)
    hf_gen = out.numpy()  # generated-only for inputs_embeds prompts
    table = np.asarray(params["embed_tokens"]["embedding"])
    ours = beam_generate(
        ours_cfg, params, jnp.asarray(table[ids]),
        jnp.ones(ids.shape, jnp.int32), num_beams=4, max_new_tokens=8,
        eos_token_id=2)
    _assert_rows_match(ours, hf_gen)


def test_beam_processors_match_hf(hf_and_ours):
    """The full Otter protocol semantics: bad-words + no-repeat-3-gram
    processors inside the beam loop, vs HF's NoBadWordsLogitsProcessor +
    NoRepeatNGramLogitsProcessor."""
    from mertools_tpu.preference.otter import _process_logits

    hf, ours_cfg, params = hf_and_ours
    rng = np.random.default_rng(3)
    ids = rng.integers(3, 64, size=(1, 6))
    # ban the unconstrained first two generated tokens + one 2-token pair
    probe = _hf_beam_tokens(hf, ids, 4, 3)
    bad = [[int(probe[0, 0])], [int(probe[0, 1])],
           [int(probe[0, 2]), int(probe[0, 3])]]
    hf_gen = _hf_beam_tokens(hf, ids, 12, 3, bad_words_ids=bad,
                             no_repeat_ngram_size=3)

    def process_fn(seq, lp):
        return _process_logits(lp, list(seq), bad, 3)

    ours = _ours_beam_tokens(ours_cfg, params, ids, 12, 3,
                             process_fn=process_fn)
    _assert_rows_match(ours, hf_gen)
    for b1 in bad[:2]:
        assert b1[0] not in ours[0]


def test_beam_batched_equals_per_sample(hf_and_ours):
    """Ragged right-padded batch rows must equal solo runs (pad slots
    invisible through prefill + the beam steps)."""
    hf, ours_cfg, params = hf_and_ours
    rng = np.random.default_rng(4)
    table = np.asarray(params["embed_tokens"]["embedding"])
    rows = [rng.integers(3, 64, size=n) for n in (4, 9)]
    S = 9
    emb = np.zeros((2, S, table.shape[1]), np.float32)
    mask = np.zeros((2, S), np.int32)
    for i, r in enumerate(rows):
        emb[i, : len(r)] = table[r]
        mask[i, : len(r)] = 1
    both = beam_generate(ours_cfg, params, jnp.asarray(emb),
                         jnp.asarray(mask), num_beams=3, max_new_tokens=8,
                         eos_token_id=2)
    for i, r in enumerate(rows):
        solo = beam_generate(ours_cfg, params,
                             jnp.asarray(table[r][None]),
                             jnp.ones((1, len(r)), jnp.int32), num_beams=3,
                             max_new_tokens=8, eos_token_id=2)
        assert both[i] == solo[0], (i, both[i], solo[0])


def test_beam_sampling_reproducible(hf_and_ours):
    """SALMONN protocol shape (num_beams=4, do_sample, top_p=0.9,
    temperature=1.0): same seed reproduces, another seed diverges."""
    hf, ours_cfg, params = hf_and_ours
    rng = np.random.default_rng(5)
    ids = rng.integers(3, 64, size=(2, 5))
    table = np.asarray(params["embed_tokens"]["embedding"])

    def run(seed):
        return beam_generate(
            ours_cfg, params, jnp.asarray(table[ids]),
            jnp.ones(ids.shape, jnp.int32), num_beams=4, max_new_tokens=8,
            eos_token_id=2, do_sample=True, temperature=1.0, top_p=0.9,
            min_new_tokens=1, seed=seed)

    a, b = run(0), run(0)
    assert a == b
    for row in a:
        assert all(0 <= t < 64 for t in row)
        assert row[0] != 2                      # min_new_tokens=1 EOS ban
    assert run(123) != a


def test_hfbeam_engine_top_p_warp():
    """The top-p warper must keep the smallest descending set with mass
    >= top_p (HF TopPLogitsWarper, min_tokens_to_keep=1)."""
    from mertools_tpu.mllm.beam import _top_p_warp

    scores = np.log(np.array([[0.5, 0.3, 0.15, 0.05]], np.float32))
    out = _top_p_warp(scores, 0.8)
    assert np.isfinite(out[0, :2]).all()
    assert np.isneginf(out[0, 2:]).all()
    # degenerate top_p keeps at least one token
    out1 = _top_p_warp(scores, 1e-9)
    assert np.isfinite(out1[0, 0]) and np.isneginf(out1[0, 1:]).all()


def test_hfbeam_engine_sample_fallback():
    """Fewer nonzero-probability candidates than beams_to_keep must not
    crash the sampler (top_p can collapse the distribution)."""
    eng = HFBeam(1, 4, 8, 4, eos_token_id=7, do_sample=True,
                 temperature=1.0, top_p=1e-9, seed=0)
    logits = np.zeros((4, 8), np.float32)
    logits[:, 3] = 50.0                        # one dominant token
    nxt, src, done = eng.step(logits)
    assert nxt.shape == (4,) and src.shape == (4,)
