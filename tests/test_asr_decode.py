"""KV-cached greedy decode vs full-sequence forward (oracle) + ASR pipeline.

The step decoder must produce exactly the tokens that repeated
full-sequence argmax decoding produces (same params, same math).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.asr.decode import greedy_decode
from mertools_tpu.encoders.whisper import (WhisperConfig, WhisperModel,
                                           whisper_logits)


@pytest.fixture(scope="module")
def tiny_whisper():
    cfg = WhisperConfig(d_model=32, encoder_layers=2, decoder_layers=2,
                        num_heads=4, ffn_dim=64, vocab_size=73,
                        max_source_positions=40, max_target_positions=32,
                        decoder_start_token_id=70, eos_token_id=71)
    model = WhisperModel(cfg)
    mel = np.zeros((1, 80, 80), np.float32)
    ids = np.zeros((1, 4), np.int32)
    params = model.init(jax.random.PRNGKey(3), mel, ids)["params"]
    return cfg, model, params


def _ref_greedy(cfg, model, params, mel, prompt, max_new):
    """Oracle: re-run the full decoder every step, argmax the last position."""
    tokens = list(prompt)
    for _ in range(max_new):
        ids = np.asarray(tokens, np.int32)[None]
        logits = np.asarray(whisper_logits(model, params,
                                           jnp.asarray(mel), jnp.asarray(ids)))
        nxt = int(logits[0, -1].argmax())
        tokens.append(nxt)
        if nxt == cfg.eos_token_id:
            break
    return tokens[len(prompt):]


def test_cached_decode_matches_full_forward(tiny_whisper, rng):
    cfg, model, params = tiny_whisper
    mel = rng.normal(size=(1, 80, 80)).astype(np.float32)
    prompt = [cfg.decoder_start_token_id, 5, 6]
    max_new = 10

    ref = _ref_greedy(cfg, model, params, mel, prompt, max_new)

    enc = model.apply({"params": params}, jnp.asarray(mel),
                      method=model.encode)
    out = np.asarray(greedy_decode(cfg, params, enc,
                                   jnp.asarray([prompt], jnp.int32),
                                   len(prompt), max_new))
    got = out[0, len(prompt):]
    stop = np.nonzero(got == cfg.eos_token_id)[0]
    got = got[: stop[0] + 1].tolist() if len(stop) else got.tolist()
    ref_t = ref if ref and ref[-1] == cfg.eos_token_id else ref
    assert got[: len(ref_t)] == ref_t, (got, ref_t)


def test_batch_decode_matches_single(tiny_whisper, rng):
    cfg, model, params = tiny_whisper
    mels = rng.normal(size=(2, 80, 80)).astype(np.float32)
    prompt = np.asarray([[cfg.decoder_start_token_id, 3, 4]] * 2, np.int32)
    enc = model.apply({"params": params}, jnp.asarray(mels),
                      method=model.encode)
    both = np.asarray(greedy_decode(cfg, params, enc, jnp.asarray(prompt),
                                    3, 8))
    for b in range(2):
        solo = np.asarray(greedy_decode(
            cfg, params, enc[b: b + 1], jnp.asarray(prompt[b: b + 1]), 3, 8))
        np.testing.assert_array_equal(both[b], solo[0])


def test_suppress_mask(tiny_whisper, rng):
    cfg, model, params = tiny_whisper
    mel = rng.normal(size=(1, 80, 80)).astype(np.float32)
    enc = model.apply({"params": params}, jnp.asarray(mel),
                      method=model.encode)
    prompt = jnp.asarray([[cfg.decoder_start_token_id]], jnp.int32)
    free = np.asarray(greedy_decode(cfg, params, enc, prompt, 1, 6))
    banned = int(free[0, 1])
    if banned == cfg.eos_token_id:
        pytest.skip("first token is EOS; nothing to suppress")
    mask = np.zeros(cfg.vocab_size, bool)
    mask[banned] = True
    sup = np.asarray(greedy_decode(cfg, params, enc, prompt, 1, 6,
                                   suppress_mask=jnp.asarray(mask)))
    assert banned not in sup[0, 1:]


def test_asr_cli_merge_and_punctuate(tmp_path):
    from mertools_tpu.cli.main_asr import main
    new = tmp_path / "new.csv"
    new.write_text("name,sentence\na,hello there\nb,你好\n", encoding="utf-8")
    chk = tmp_path / "check.csv"
    chk.write_text("name,chinese\nb,你好吗\n", encoding="utf-8")
    out = tmp_path / "merged.csv"
    main(["merge", f"--new_path={new}", f"--check_path={chk}",
          f"--merge_path={out}"])
    text = out.read_text(encoding="utf-8")
    assert "你好吗" in text and "hello there" in text

    ref = tmp_path / "refined.csv"
    main(["punctuate", f"--old_path={new}", f"--new_path={ref}"])
    assert "hello there。" in ref.read_text(encoding="utf-8")


def test_restore_punctuation_content_guard():
    """LLM punctuation restoration accepts only outputs whose
    punctuation-stripped text matches the input (the paddlespeech
    TextExecutor contract, main-asr.py:37-59); others fall back to the
    rule-based period append. Empty rows stay empty."""
    from mertools_tpu.cli.main_asr import restore_punctuation

    sents = ["how are you doing today", "我 很 好", "", "keep me"]
    decoded = {
        0: "How are you doing, today?",     # accepted (case/punct only)
        1: "我，很好。",                       # accepted (spacing/punct only)
        3: "keep me but with extra words",  # REJECTED: words changed
    }
    out, accepted = restore_punctuation(sents, decoded)
    assert out[0] == "How are you doing, today?"
    assert out[1] == "我，很好。"
    assert out[2] == ""
    assert out[3] == "keep me。"   # rejected -> rule fallback
    assert accepted == 2


def test_asr_cli_punctuate_llm(tmp_path):
    """punctuate --model end-to-end over a real tiny HF checkpoint
    (replaces the reference's paddlespeech model, main-asr.py:37-51)."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import (PreTrainedTokenizerFast, Qwen2Config,
                              Qwen2ForCausalLM)

    d = str(tmp_path / "llm")
    vocab = {"<eos>": 0, "<pad>": 1}
    for w in ("add punctuation marks to the following transcript do not "
              "remove or change any words only insert answer with "
              "punctuated hello there you good".split()):
        vocab.setdefault(w, len(vocab))
    for ch in "abcdefghijklmnopqrstuvwxyz.,:?! ":
        vocab.setdefault(ch, len(vocab))
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token="<pad>"))
    tok.pre_tokenizer = pre_tokenizers.Split(" ", behavior="removed")
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>",
                                   pad_token="<pad>")
    fast.save_pretrained(d)
    Qwen2ForCausalLM(Qwen2Config(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=512)).save_pretrained(d)

    from mertools_tpu.cli.main_asr import main
    old = tmp_path / "old.csv"
    old.write_text("name,sentence\na,hello there\nb,\n", encoding="utf-8")
    ref = tmp_path / "refined.csv"
    main(["punctuate", f"--old_path={old}", f"--new_path={ref}",
          f"--model={d}", "--batch=2", "--max_new_tokens=6"])
    import csv
    with open(ref, newline="", encoding="utf-8") as f:
        rows = {r["name"]: r["sentence"] for r in csv.DictReader(f)}
    # the random tiny model fails the content guard -> rule fallback; the
    # point is the full load->convert->batched-decode->guard path runs
    assert rows["a"].startswith("hello there") or rows["a"].rstrip("。") == ""
    assert "hello there" in rows["a"]
    assert rows["b"] == ""
