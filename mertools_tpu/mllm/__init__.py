from .affectgpt import AffectGPT, AffectGPTConfig, trainable_labels  # noqa: F401
from .llm import LLM, LLMConfig, lm_loss  # noqa: F401
from .qformer import QFormer, QFormerConfig  # noqa: F401
from .runner import Runner, RunnerConfig  # noqa: F401
