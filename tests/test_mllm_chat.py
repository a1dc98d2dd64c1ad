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
    """Different AV inputs with identical prompts must (generically) change
    the generated tokens — proves the splice is live."""
    model, params = tiny_mllm
    chat = Chat(model, params, FakeTokenizer(), max_new_tokens=8,
                temperature=0.0)

    def sample(scale):
        return {"video_feats": (rng.normal(size=(5, 12)) * scale
                                ).astype(np.float32),
                "audio_feats": (rng.normal(size=(4, 10)) * scale
                                ).astype(np.float32),
                "subtitle": "same words"}

    a = chat.answer_batch([sample(1.0)])
    b = chat.answer_batch([sample(40.0)])
    assert a != b


def test_ov_postprocess():
    from mertools_tpu.cli.ovlabel_extraction import postprocess_openset
    assert postprocess_openset("Happy, Excited!\nother stuff") == \
        "happy, excited"
    assert postprocess_openset("  sad;  angry , sad ") == "sad, angry"
    assert postprocess_openset("") == ""


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
