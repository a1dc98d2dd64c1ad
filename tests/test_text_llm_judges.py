"""Text-only preference judges (utils/qwen25.py / utils/qwen3.py protocols)
on the TPU LLM stack, plus top_k sampling support."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.mllm.llm import LLM, LLMConfig
from mertools_tpu.preference.text_llm import (Qwen25TextJudge, Qwen3TextJudge,
                                              func_postprocess_qwen)


def test_func_postprocess_qwen_reference_semantics():
    # each prefix stripped once, in order (utils/qwen25.py:42-59)
    assert func_postprocess_qwen("Output: a1") == "a1"
    assert func_postprocess_qwen("输出：same") == "same"
    assert func_postprocess_qwen("让我们来翻译一下：hello") == "hello"
    assert func_postprocess_qwen("  a2 \n more ") == "a2  more"
    # unlisted prefixes survive
    assert func_postprocess_qwen("Answer: a1") == "Answer: a1"
    # colon only stripped after a prefix pass
    assert func_postprocess_qwen(": x") == "x"


def test_qwen3_think_split():
    j = Qwen3TextJudge.__new__(Qwen3TextJudge)  # no model needed
    assert j._postprocess("<think>blah blah</think>\nOutput: a2") == "a2"
    assert j._postprocess("no thinking here: a1") == "no thinking here: a1"


def test_sample_top_k_one_is_greedy():
    from mertools_tpu.mllm.generate import _sample

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 50)).astype(np.float32))
    greedy = np.asarray(_sample(logits, jax.random.PRNGKey(0), 0.0, 0.9))
    topk1 = np.asarray(_sample(logits, jax.random.PRNGKey(1), 1.3, 0.99,
                               top_k=1))
    np.testing.assert_array_equal(greedy, topk1)


class _FakeTok:
    """Minimal tokenizer: maps bytes of the prompt to small ids."""

    eos_token_id = 88
    chat_template = None

    def __init__(self, vocab=89):
        self.vocab = vocab

    def encode(self, text):
        return [(1 + (b % (self.vocab - 2))) for b in text.encode()][:12]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{int(i)}" for i in ids)


@pytest.fixture(scope="module")
def tiny_preloaded():
    cfg = LLMConfig(vocab_size=89, hidden_size=32, num_layers=2, num_heads=4,
                    num_kv_heads=2, intermediate_size=64)
    model = LLM(cfg)

    def both(mdl, embeds, ids):
        mdl.embed(ids)
        return mdl(embeds)

    params = model.init(jax.random.PRNGKey(3),
                        np.zeros((1, 4, 32), np.float32),
                        np.zeros((1, 1), np.int32), method=both)["params"]
    emb = np.asarray(params["embed_tokens"]["embedding"])
    return cfg, params, emb, _FakeTok()


def test_qwen25_judge_protocol_and_reproducibility(tiny_preloaded):
    j = Qwen25TextJudge(None, batch=4, seed=0, _preloaded=tiny_preloaded,
                        max_tokens=6)
    # reference SamplingParams (utils/qwen25.py:28-34)
    assert j.temperature == 0.7 and j.top_p == 0.8
    assert j.repetition_penalty == 1.05
    prompts = ["which is better, a1 or a2?", "same?"]
    out1 = j.get_completion_qwen_batch(prompts)
    out2 = j.get_completion_qwen_bacth(prompts)  # reference spelling alias
    assert out1 == out2 and len(out1) == 2
    assert all(isinstance(t, str) for t in out1)
    # temperature ablation cases (utils/qwen25.py:27-34)
    assert Qwen25TextJudge.__new__(Qwen25TextJudge)._TEMPERATURES["case3"] \
        == 1.3


def test_qwen3_judge_protocol(tiny_preloaded):
    j = Qwen3TextJudge(None, batch=4, seed=1, _preloaded=tiny_preloaded,
                       max_tokens=6)
    # reference SamplingParams (utils/qwen3.py:29)
    assert j.temperature == 0.6 and j.top_p == 0.95 and j.top_k == 20
    out = j(["judge this"])
    assert len(out) == 1 and isinstance(out[0], str)
