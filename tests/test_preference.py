"""Preference judging: postprocess normalization, 2/3-class metrics, and the
batched-judge pipelines over a stub caller."""

import numpy as np
import pytest

from mertools_tpu.preference.judge import (PreferenceJudge,
                                           postprocess_preference,
                                           preference_metric)


def test_postprocess_rules():
    resp = ["a1 is better", "A2", "same quality", "I think a2 wins over a1",
            "no idea", "", "the answer: same"]
    assert postprocess_preference(resp) == [
        "a1", "a2", "same", "a2", "same", "same", "same"]


def test_two_class_metric_drops_ties_and_maps_same():
    gt = ["a1", "a2", "same", "a1"]
    pred = ["a1", "same", "a1", "a2"]
    f, acc = preference_metric(gt, pred, "twoclass")
    # rows kept: (a1,a1), (a2,same->a1), (a1,a2) -> acc 1/3
    np.testing.assert_allclose(acc, 1 / 3)


def test_three_class_metric_perfect():
    gt = ["a1", "a2", "same"]
    f, acc = preference_metric(gt, gt, "threeclass")
    assert f == 1.0 and acc == 1.0


def test_judge_pipelines():
    calls = []

    def caller(samples, prompts):
        calls.append(prompts)
        out = []
        for s, p in zip(samples, prompts):
            if "detailed description" in p:
                out.append(f"describing {s['a1'][:3]}")
            else:
                out.append("a2 definitely")
        return out

    judge = PreferenceJudge(caller)
    samples = [{"a1": "happy person", "a2": "sad person"},
               {"a1": "angry", "a2": "calm"}]
    labels = judge.judge_normal(samples)
    assert labels == ["a2", "a2"]
    assert "a1: \"happy person\"" in calls[0][0]

    labels, desc = judge.judge_cot(samples)
    assert labels == ["a2", "a2"]
    assert desc[0].startswith("describing")
    # compare prompt embeds the generated description
    assert "describing" in calls[-1][0]


def test_dpo_score_cli(tmp_path):
    from mertools_tpu.cli.main_dpo import main
    npz = tmp_path / "r.npz"
    np.savez_compressed(npz, gt_labels=["a1", "a2", "same"],
                        pred_labels=["a1", "a1", "same"],
                        descriptions=[])
    f, acc = main(["score", f"--result_npz={npz}", "--metric=twoclass"])
    np.testing.assert_allclose(acc, 0.5)
    f3, acc3 = main(["score", f"--result_npz={npz}", "--metric=threeclass"])
    np.testing.assert_allclose(acc3, 2 / 3)


def test_judge_cot2_cot3_text_llm_variants():
    """cot2/'S3' (text LLM compares) and cot3/'S4' (text LLM reasons then a
    final pass extracts the answer) — main_dpo_sample.py:123-241."""
    from mertools_tpu.preference.judge import (EXTRACT_ANSWER_PROMPT,
                                               REASONING_PROMPT,
                                               PreferenceJudge)

    def mllm(samples, prompts):
        return [f"describes {s['a1'][:4]}" for s in samples]

    text_calls = []

    def text_llm(prompts):
        text_calls.append(prompts)
        out = []
        for p in prompts:
            if "reasoning process." in p and "along with" in p:
                out.append("Thinking hard... the answer is a1 because x.")
            elif "Based on the provided decription" in p:
                out.append("a1")
            else:
                out.append("same honestly")
        return out

    judge = PreferenceJudge(mllm)
    samples = [{"a1": "happy person", "a2": "sad person"}]

    labels, desc = judge.judge_cot2(samples, text_llm)
    assert labels == ["same"]
    assert "describes happ" in text_calls[-1][0]   # description threaded in

    labels, reasons = judge.judge_cot3(samples, text_llm)
    assert labels == ["a1"]
    assert "answer is a1" in reasons[0]
    # step-5 prompt embeds the flattened step-4 reasoning
    assert "Thinking hard" in text_calls[-1][0]
    assert EXTRACT_ANSWER_PROMPT.startswith("Based on the provided decription")
    assert "along with the reasoning process." in REASONING_PROMPT
