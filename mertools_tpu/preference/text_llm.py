"""Text-only preference judges: the reference's ``utils/qwen25.py`` and
``utils/qwen3.py`` wrappers (MER2026_Track3), re-hosted on the TPU LLM stack.

Both reference wrappers are plain vLLM causal-LM callers used by the CoT
pipeline steps 3-5 (``main_dpo_sample.py:120-241``): chat-template the
prompt batch, sample with a family-specific ``SamplingParams``, and apply
``func_postprocess_qwen`` prefix stripping. The TPU equivalents run the
same protocol through :func:`mertools_tpu.mllm.generate.batch_generate_texts`
(continuous-bucketed batched decode):

- **qwen25** (``utils/qwen25.py:20-39``): temperature cases — None/'case1'
  -> (0.7, top_p 0.8, repetition_penalty 1.05, max 512 tokens);
  'case2' -> temperature 1.0; 'case3' -> 1.3 (the reference's temperature
  ablation).
- **qwen3** (``utils/qwen3.py:19-32``): temperature 0.6, top_p 0.95,
  top_k 20; chat template rendered with ``enable_thinking=True`` and the
  response split on ``</think>`` (``:66-71``) so only the post-thinking
  text survives.
"""

from __future__ import annotations

import numpy as np

# reference func_postprocess_qwen (utils/qwen25.py:42-59 == qwen3.py:35-52):
# strip each prefix once in this order, then a colon, then newlines
_PREFIXES = ("输入", "输出", "翻译", "让我们来翻译一下：",
             "output", "Output", "input", "Input")


def func_postprocess_qwen(response: str) -> str:
    """Reference-exact response cleanup (utils/qwen25.py:42-59)."""
    response = response.strip()
    for pre in _PREFIXES:
        if response.startswith(pre):
            response = response[len(pre):]
    response = response.strip()
    for pre in (":", "："):
        if response.startswith(pre):
            response = response[len(pre):]
    response = response.strip()
    response = response.replace("\n", "")
    return response.strip()


def load_text_llm(model_path: str):
    """HF causal-LM checkpoint -> (cfg, params, emb_table, tokenizer) on
    the TPU LLM stack (one conversion shared by every text judge)."""
    from transformers import AutoModelForCausalLM, AutoTokenizer

    from ..mllm.llm import LLMConfig, convert_torch_state

    hf = AutoModelForCausalLM.from_pretrained(model_path)
    cfg = LLMConfig.from_hf(hf.config)
    params = convert_torch_state(cfg, hf.state_dict())
    del hf
    tok = AutoTokenizer.from_pretrained(model_path)
    emb = np.asarray(params["embed_tokens"]["embedding"])
    return cfg, params, emb, tok


class _TextJudge:
    """Shared batched chat-prompt decode; subclasses pin the protocol."""

    temperature: float
    top_p: float
    top_k: int = 0
    repetition_penalty: float = 1.0
    max_tokens: int = 512
    enable_thinking: bool = False

    def __init__(self, model_path: str, batch: int = 8, seed: int = 0,
                 max_tokens: int | None = None, _preloaded=None):
        if _preloaded is not None:  # tests inject a tiny converted model
            self.cfg, self.params, self.emb, self.tok = _preloaded
        else:
            self.cfg, self.params, self.emb, self.tok = \
                load_text_llm(model_path)
        self.batch = batch
        self.seed = seed
        if max_tokens is not None:
            self.max_tokens = max_tokens

    def _encode(self, prompt: str) -> list:
        conv = [{"role": "user", "content": prompt}]
        if getattr(self.tok, "chat_template", None):
            kw = {}
            if self.enable_thinking:
                kw["enable_thinking"] = True  # qwen3.py:66-70
            try:
                return self.tok.apply_chat_template(
                    conv, tokenize=True, add_generation_prompt=True, **kw)
            except (TypeError, ValueError):
                # templates without the flag (non-qwen3 checkpoints)
                return self.tok.apply_chat_template(
                    conv, tokenize=True, add_generation_prompt=True)
        return self.tok.encode(prompt)

    def _postprocess(self, text: str) -> str:
        return func_postprocess_qwen(text)

    def get_completion_qwen_batch(self, prompts: list) -> list:
        """Reference ``get_completion_qwen_bacth`` (sic) semantics: batch
        chat-template -> sample -> postprocess, order preserved."""
        from ..mllm.generate import batch_generate_texts

        ids = {i: self._encode(p) for i, p in enumerate(prompts)}
        out = batch_generate_texts(
            self.cfg, self.params, self.emb, ids, self.tok,
            batch=self.batch, max_new_tokens=self.max_tokens,
            temperature=self.temperature, top_p=self.top_p,
            top_k=self.top_k, repetition_penalty=self.repetition_penalty,
            seed=self.seed)
        return [self._postprocess(out[i]) for i in range(len(prompts))]

    # vLLM-wrapper spelling used by the reference pipelines
    get_completion_qwen_bacth = get_completion_qwen_batch

    def __call__(self, prompts: list) -> list:
        return self.get_completion_qwen_batch(prompts)


class Qwen25TextJudge(_TextJudge):
    """``utils/qwen25.py`` protocol (vLLM SamplingParams at :28-34)."""

    top_p = 0.8
    repetition_penalty = 1.05
    max_tokens = 512

    _TEMPERATURES = {None: 0.7, "case1": 0.7, "case2": 1.0, "case3": 1.3}

    def __init__(self, model_path: str, temperature=None, **kw):
        # the reference's temperature-ablation cases; floats pass through
        self.temperature = (float(temperature)
                            if isinstance(temperature, (int, float))
                            else self._TEMPERATURES[temperature])
        super().__init__(model_path, **kw)


class Qwen3TextJudge(_TextJudge):
    """``utils/qwen3.py`` protocol: thinking mode + </think> split
    (:29, :66-71). max_tokens defaults far below the reference's 32768 —
    pass ``max_tokens`` to raise it (decode cost is linear in it)."""

    temperature = 0.6
    top_p = 0.95
    top_k = 20
    max_tokens = 1024
    enable_thinking = True

    def _postprocess(self, text: str) -> str:
        return func_postprocess_qwen(text.split("</think>")[-1])
