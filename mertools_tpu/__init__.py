"""mertools_tpu — a TPU-native multimodal emotion recognition framework.

Re-implements the capabilities of the MERTools family (MER2023..MER2026 +
MERBench) as an idiomatic JAX/XLA/Pallas/pjit stack:

- ``core``     : config registry, device mesh / sharding, PRNG, globals.
- ``ops``      : alignment/resampling ops, audio frontends, losses, metrics,
                 Pallas kernels for the preprocessing hot loops.
- ``data``     : feature store (per-clip ``.npy`` layout compatible with the
                 reference), label archives, CV splits, static-shape batching.
- ``models``   : the fusion-model zoo (attention/tfn/lmf/misa/mmim/mfn/...)
                 in Flax with a single ``(features, emos, vals, interloss)``
                 contract.
- ``encoders`` : Flax pretrained-encoder implementations (HuBERT-style audio,
                 BERT-style text, ViT/CLIP visual) + torch weight converters.
- ``features`` : batched, bucketed feature-extraction pipeline.
- ``parallel`` : mesh construction and data/model-parallel sharding rules.
- ``train``    : jitted train/eval steps, cross-validation driver, random
                 hyperparameter search.
- ``mllm``     : AffectGPT-equivalent multimodal LLM stack.

Reference behavior is documented per-module with ``file:line`` citations into
``zeroQiaoba/MERTools``; the implementations are new TPU-first designs.
"""

__version__ = "0.1.0"
