"""Emotion-preference (DPO-style) judging — MER2026 Track3 equivalent.

Reference (``MER2026/MER2026_Track3/main_dpo_sample.py:17-206`` +
``utils/common.py:34-107``): for each clip with two candidate descriptions
(a1, a2), an MLLM judges which better matches the audio/video, either in one
call ("normal") or via a describe-then-compare chain-of-thought pipeline;
responses are normalized to {a1, a2, same}; scoring is 2-class (ties
dropped, pred 'same' -> 'a1') or 3-class weighted-F1 + accuracy.

The reference wraps ~21 external MLLM APIs with a unified
``func_calling_sample(audio, video, prompt, input_type)`` — here the caller
protocol is ``fn(sample: dict, prompt: str) -> str`` and an AffectGPT-backed
caller judges whole BATCHES on TPU.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

# Reference-exact prompt templates (main_dpo_sample.py:39-45,71,105-111) —
# wording (including the reference's phrasing quirks) is what the judged
# models were evaluated with, so it is part of the behavioral contract.
NORMAL_PROMPT = (
    'We provide two descriptions for a given input: a1: "{a1}". a2: "{a2}". '
    "Please determinate which one is better aligned with the input content. "
    "If both of them equally align with the input content, please output "
    "'same'. Therefore, the output should be a1, a2, or same. Please direct "
    "output the answer without additional reasoning process.")

DESCRIBE_PROMPT = ("Please provide a detailed description to a given input, "
                   "especially focusing on their emotions.")

COMPARE_PROMPT = (
    'We provide a ground truth description: {description} We also provide '
    'two predicted descriptions: a1: "{a1}". a2: "{a2}". Please determinate '
    "which one is better aligned with the ground truth description. If both "
    "of them equally align with the input content, please output 'same'. "
    "Therefore, the output should be a1, a2, or same. Please direct output "
    "the answer without additional reasoning process.")

# cot3 step 4 (:183-189): answer WITH the reasoning process
REASONING_PROMPT = (
    'We provide a ground truth description: {description} We also provide '
    'two predicted descriptions: a1: "{a1}". a2: "{a2}". Please determinate '
    "which one is better aligned with the ground truth description. If both "
    "of them equally align with the input content, please output 'same'. "
    "Please output the answer along with the reasoning process.")

# cot3 step 5 (:226-227); the reference's f-string keeps the continuation
# line's indentation (and the 'decription' spelling) inside the prompt
EXTRACT_ANSWER_PROMPT = (
    'Based on the provided decription:  "{reason}", please determinate '
    "which one is better aligned with the ground truth description. "
    "        The output should be a1, a2, or same. Please direct output "
    "the answer without additional reasoning process.")


def postprocess_preference(responses: Sequence[str]) -> list[str]:
    """Normalize free-text judgments to {a1, a2, same}
    (utils/common.py:34-50): prefix match first, then earliest mention,
    'same' as the undecidable fallback."""
    out = []
    for response in responses:
        r = (response or "").lower()
        if r.startswith("a1"):
            out.append("a1")
        elif r.startswith("a2"):
            out.append("a2")
        elif r.startswith("same"):
            out.append("same")
        else:
            keys = ["a1", "a2", "same"]
            poses = [r.find(k) for k in keys]
            poses = [10000 if p == -1 else p for p in poses]
            out.append(keys[int(np.argmin(poses))] if min(poses) < 10000
                       else "same")
    return out


def preference_metric(gt_labels: Sequence[str], pred_labels: Sequence[str],
                      metric: str = "twoclass") -> tuple[float, float]:
    """(weighted-F1, accuracy). twoclass drops 'same' GT rows and maps
    pred 'same' -> 'a1' (utils/common.py:86-107)."""
    from sklearn.metrics import accuracy_score, f1_score

    if metric == "twoclass":
        gt, pred = [], []
        for g, p in zip(gt_labels, pred_labels):
            if g == "same":
                continue
            gt.append({"a1": 0, "a2": 1}[g])
            pred.append({"a1": 0, "a2": 1}.get(p, 0))
    elif metric == "threeclass":
        idx = {"a1": 0, "a2": 1, "same": 2}
        gt = [idx[g] for g in gt_labels]
        pred = [idx[p] for p in pred_labels]
    else:
        raise ValueError(metric)
    return (float(f1_score(gt, pred, average="weighted")),
            float(accuracy_score(gt, pred)))


class PreferenceJudge:
    """Judging pipelines over a batched caller.

    caller(samples: list[dict], prompts: list[str]) -> list[str] — the
    TPU-batched equivalent of the per-model ``func_calling_sample`` wrappers.
    """

    def __init__(self, caller: Callable[[list, list], list]):
        self.caller = caller

    def judge_normal(self, samples: list[dict]) -> list[str]:
        """samples need keys a1, a2 + whatever the caller consumes."""
        prompts = [NORMAL_PROMPT.format(a1=s["a1"], a2=s["a2"])
                   for s in samples]
        return postprocess_preference(self.caller(samples, prompts))

    def judge_cot(self, samples: list[dict]) -> tuple[list[str], list[str]]:
        """Describe -> compare (main_dpo_sample.py:57-120). Returns
        (labels, descriptions)."""
        desc = self.caller(samples, [DESCRIBE_PROMPT] * len(samples))
        # step 2 flattens the step-1 description (main_dpo_sample.py:100)
        clean = [(d or "").replace("\n", " ").replace("\t", " ").strip()
                 for d in desc]
        prompts = [COMPARE_PROMPT.format(description=d, a1=s["a1"],
                                         a2=s["a2"])
                   for d, s in zip(clean, samples)]
        return postprocess_preference(self.caller(samples, prompts)), desc

    def judge_cot2(self, samples: list[dict], text_caller
                   ) -> tuple[list[str], list[str]]:
        """cot2 / 'S3': MLLM describes, a TEXT LLM compares
        (cot_step3_description_batchcalling, main_dpo_sample.py:123-163 —
        same compare prompt as step 2, answered by the text model).
        text_caller(prompts: list[str]) -> list[str]."""
        desc = self.caller(samples, [DESCRIBE_PROMPT] * len(samples))
        clean = [(d or "").replace("\n", " ").replace("\t", " ").strip()
                 for d in desc]
        prompts = [COMPARE_PROMPT.format(description=d, a1=s["a1"],
                                         a2=s["a2"])
                   for d, s in zip(clean, samples)]
        return postprocess_preference(text_caller(prompts)), desc

    def judge_cot3(self, samples: list[dict], text_caller
                   ) -> tuple[list[str], list[str]]:
        """cot3 / 'S4': MLLM describes, the text LLM answers WITH its
        reasoning (cot_step4, :166-204), then a final text pass extracts
        the bare answer from that reasoning (cot_step5, :206-241)."""
        desc = self.caller(samples, [DESCRIBE_PROMPT] * len(samples))
        clean = [(d or "").replace("\n", " ").replace("\t", " ").strip()
                 for d in desc]
        prompts = [REASONING_PROMPT.format(description=d, a1=s["a1"],
                                           a2=s["a2"])
                   for d, s in zip(clean, samples)]
        reasons = text_caller(prompts)
        rclean = [(r or "").replace("\n", " ").replace("\t", " ").strip()
                  for r in reasons]
        prompts = [EXTRACT_ANSWER_PROMPT.format(reason=r) for r in rclean]
        return postprocess_preference(text_caller(prompts)), reasons


def mllm_caller(chat, seed: int = 0) -> Callable[[list, list], list]:
    """Batched caller backed by the AffectGPT Chat wrapper (mllm/chat.py):
    samples carry video_feats/audio_feats/subtitle. ``seed`` differentiates
    sampled judging rounds (reference --totalround repeat calling): each
    call advances the PRNG stream."""
    import itertools

    import jax

    counter = itertools.count()

    def call(samples, prompts):
        items = [{**s, "question": p} for s, p in zip(samples, prompts)]
        key = jax.random.PRNGKey(seed * 100003 + next(counter))
        return chat.answer_batch(items, prng_key=key)

    return call
