from .affectgpt import (AffectGPT, AffectGPTConfig, stream_plan,  # noqa: F401
                        trainable_labels)
from .convert_affectgpt import (apply_checkpoint,  # noqa: F401
                                convert_affectgpt_checkpoint)
from .llm import LLM, LLMConfig, lm_loss  # noqa: F401
from .qformer import QFormer, QFormerConfig  # noqa: F401
from .runner import Runner, RunnerConfig  # noqa: F401
