"""Chat/inference wrapper + OV extraction/scoring CLIs on tiny models."""

import numpy as np
import pytest

import jax

from mertools_tpu.mllm import AffectGPT, AffectGPTConfig, LLMConfig, QFormerConfig
from mertools_tpu.mllm.chat import Chat


class FakeTokenizer:
    """Byte-ish word tokenizer over a tiny closed vocab."""

    def __init__(self, vocab_size=96):
        self.vocab_size = vocab_size
        self.eos_token_id = 2

    def encode(self, text, add_special_tokens=True):
        return [3 + (hash(w) % (self.vocab_size - 3)) for w in text.split()]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids if i != self.eos_token_id)


@pytest.fixture(scope="module")
def tiny_mllm():
    cfg = AffectGPTConfig(
        llm=LLMConfig(vocab_size=96, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=4, intermediate_size=64,
                      lora_r=2),
        video_qformer=QFormerConfig(num_queries=4, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        audio_qformer=QFormerConfig(num_queries=2, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        video_dim=12, audio_dim=10, max_video_frames=8)
    model = AffectGPT(cfg)
    B, S = 2, 24
    batch = {
        "video_feats": np.zeros((B, 8, 12), np.float32),
        "audio_feats": np.zeros((B, 6, 10), np.float32),
        "input_ids": np.zeros((B, S), np.int32),
        "splice_start": np.zeros(B, np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "labels": np.full((B, S), -100, np.int64),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    return model, params


def test_chat_answer_batch(tiny_mllm, rng):
    model, params = tiny_mllm
    chat = Chat(model, params, FakeTokenizer(), max_new_tokens=6,
                temperature=0.0)
    samples = [
        {"video_feats": rng.normal(size=(5, 12)).astype(np.float32),
         "audio_feats": rng.normal(size=(4, 10)).astype(np.float32),
         "subtitle": "i am fine"},
        {"video_feats": rng.normal(size=(8, 12)).astype(np.float32),
         "audio_feats": rng.normal(size=(6, 10)).astype(np.float32),
         "subtitle": ""},
    ]
    answers = chat.answer_batch(samples)
    assert len(answers) == 2
    assert all(isinstance(a, str) for a in answers)


def test_chat_av_tokens_affect_answer(tiny_mllm, rng):
    """Different AV inputs with identical prompts must change the spliced
    prompt embeddings at the placeholder positions — proves the splice is
    live. (Generated TEXT can legitimately coincide: a tiny random LLM's
    greedy decode collapses to a degenerate token, and Q-Former layernorms
    wash out input scaling.)"""
    import jax

    model, params = tiny_mllm
    chat = Chat(model, params, FakeTokenizer(), max_new_tokens=8,
                temperature=0.0)

    def batch_for(feats):
        ids, mask, starts = chat._encode_prompts([("same words", None)])
        return {"video_feats": feats[0][None], "audio_feats": feats[1][None],
                "input_ids": ids, "splice_start": starts}

    f1 = (rng.normal(size=(5, 12)).astype(np.float32),
          rng.normal(size=(4, 10)).astype(np.float32))
    f2 = (rng.normal(size=(5, 12)).astype(np.float32),
          rng.normal(size=(4, 10)).astype(np.float32))
    e1 = np.asarray(chat._embed_fn(chat.params, batch_for(f1)))
    e2 = np.asarray(chat._embed_fn(chat.params, batch_for(f2)))
    start = int(batch_for(f1)["splice_start"][0])
    n_av = model.num_av_tokens
    # spliced region differs, the rest of the prompt is identical
    assert not np.allclose(e1[0, start: start + n_av],
                           e2[0, start: start + n_av])
    np.testing.assert_allclose(e1[0, : start], e2[0, : start], atol=1e-6)


def test_ov_postprocess():
    from mertools_tpu.cli.ovlabel_extraction import postprocess_openset
    assert postprocess_openset("Happy, Excited!\nother stuff") == \
        "happy, excited"
    assert postprocess_openset("  sad;  angry , sad ") == "sad, angry"
    assert postprocess_openset("") == ""
    # reference-shaped bracketed lists (prompt few-shots, qwen.py:272-281)
    # + func_postprocess_qwen prefix stripping (:15-30)
    assert postprocess_openset("Output: [happy, sad, angry]") == \
        "happy, sad, angry"
    assert postprocess_openset("[]") == ""
    assert postprocess_openset("输出: [worried]") == "worried"
    assert postprocess_openset(
        "Here is the list:\n[calm, relaxed] hope that helps") == \
        "calm, relaxed"
    # the LAST bracketed group is the answer: models echo few-shot examples
    # or bracket a preamble before answering
    assert postprocess_openset(
        "Based on the [provided] clues: [happy, sad]") == "happy, sad"
    assert postprocess_openset(
        "Input: x; Output: [] Input: y; Output: [angry]") == "angry"


def test_ov_encode_prompt_chat_template():
    """Chat/instruct tokenizers get apply_chat_template (qwen.py:69-77);
    plain tokenizers fall back to raw encoding."""
    from mertools_tpu.cli.ovlabel_extraction import (EXTRACT_PROMPT,
                                                     encode_prompt)

    class PlainTok:
        chat_template = None

        def encode(self, text):
            return [len(w) for w in text.split()]

    class ChatTok(PlainTok):
        chat_template = "{{messages}}"

        def apply_chat_template(self, messages, tokenize,
                                add_generation_prompt):
            assert tokenize and add_generation_prompt
            assert messages[0]["role"] == "user"
            return [0] + [len(w) for w in messages[0]["content"].split()]

    reason = "He smiles broadly"
    plain = encode_prompt(PlainTok(), reason)
    chat = encode_prompt(ChatTok(), reason)
    assert chat == [0] + plain
    assert "expert in the field of emotions" in EXTRACT_PROMPT


def test_main_ov_mer2024(tmp_path):
    from mertools_tpu.cli.main_ov import main
    gt = tmp_path / "gt.csv"
    gt.write_text('name,openset\nc0,"happy, excited"\nc1,sad\n',
                  encoding="utf-8")
    pred = tmp_path / "pred.csv"
    pred.write_text('name,openset\nc0,"joyful, excited"\nc1,sad\n',
                    encoding="utf-8")
    syn = tmp_path / "syn"
    syn.mkdir()
    np.save(syn / "c0.npy",
            np.array([["happy", "joyful"], ["excited"]], dtype=object),
            allow_pickle=True)
    np.save(syn / "c1.npy", np.array([["sad"]], dtype=object),
            allow_pickle=True)
    scores = main(["mer2024", f"--gt_csv={gt}", f"--pred_csv={pred}",
                   f"--synonym_root={syn}"])
    assert scores["accuracy"] == 1.0 and scores["recall"] == 1.0
