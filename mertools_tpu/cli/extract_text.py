"""Text feature-extraction CLI (``extract_text_huggingface.py`` equivalent).

    python -m mertools_tpu.cli.extract_text --model_name=chinese-macbert-base \
        --trans_path=.../transcription.csv --save_dir=.../features \
        --feature_level=UTTERANCE --language=chinese

CSV columns follow the reference: ``name`` + ``chinese``/``english``.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import pandas as pd


def main(argv=None):
    from ..core.cache import enable_persistent_cache
    enable_persistent_cache()
    from ..encoders.bert import from_hf_torch
    from ..encoders.text_zoo import MODEL_TYPE_DISPATCH
    from ..features.text import TextExtractor, find_token_span

    p = argparse.ArgumentParser("extract_text")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--dataset", type=str, default=None,
                   help="resolve dirs from the path registry (run.sh style)")
    p.add_argument("--trans_path", type=str, default=None)
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--feature_level", type=str, default="UTTERANCE",
                   choices=["UTTERANCE", "FRAME"])
    p.add_argument("--language", type=str, default="chinese")
    p.add_argument("--pretrain_dir", type=str, default=None)
    p.add_argument("--layer_ids", type=str, default="-4,-3,-2,-1")
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=[None, "bf16"])
    p.add_argument("--gpu", type=int, default=0, help="ignored (TPU)")
    p.add_argument("--profile", type=str, default=None,
                   help="jax.profiler trace dir for the extraction loop")
    p.add_argument("--finetuned_ckpt", type=str, default=None,
                   help="orbax dir of a fine-tuned backbone saved by "
                        "main_release --savemodel (BERT-family path)")
    args = p.parse_args(argv)

    from ..core.config import resolve_dataset_args
    resolve_dataset_args(args, trans_path="transcriptions", save_dir="features")

    from transformers import AutoConfig, AutoModel, AutoTokenizer

    path = (os.path.join(args.pretrain_dir, args.model_name)
            if args.pretrain_dir else args.model_name)
    layer_ids = tuple(int(x) for x in args.layer_ids.split(","))

    # THUDM chatglm checkpoints: weights convert via pure key remap (no
    # remote modeling code); only the sentencepiece tokenizer class is remote
    # (reference extract_text_huggingface.py:165-200 trusts it wholesale).
    import json
    cfg_json = os.path.join(path, "config.json")
    local_type = None
    if os.path.isdir(path) and os.path.exists(cfg_json):
        with open(cfg_json) as f:
            local_type = json.load(f).get("model_type")
    if local_type == "chatglm":
        from ..encoders.text_zoo import GlmEncoder, from_chatglm_checkpoint_dir
        tokenizer = AutoTokenizer.from_pretrained(path, trust_remote_code=True)
        cfg, params = from_chatglm_checkpoint_dir(path)
        ex = TextExtractor(cfg, params, layer_ids=layer_ids,
                           compute_dtype=args.compute_dtype,
                           encoder_cls=GlmEncoder)
        return _run_extraction(args, tokenizer, ex, cfg)

    tokenizer = AutoTokenizer.from_pretrained(path)
    hf_cfg = AutoConfig.from_pretrained(path)
    if hf_cfg.model_type in ("llama", "qwen2", "mistral", "baichuan"):
        # decoder-only LLM branch (reference LLM path, .half())
        from transformers import AutoModelForCausalLM

        from ..features.text import CausalLMTextExtractor
        from ..mllm.llm import LLMConfig, convert_torch_state

        hf = AutoModelForCausalLM.from_pretrained(path)
        cfg = LLMConfig.from_hf(hf.config)
        params = convert_torch_state(cfg, hf.state_dict())
        del hf
        ex = CausalLMTextExtractor(cfg, params, layer_ids=layer_ids)
    elif hf_cfg.model_type in MODEL_TYPE_DISPATCH:
        convert, encoder_cls = MODEL_TYPE_DISPATCH[hf_cfg.model_type]
        hf = AutoModel.from_pretrained(path)
        cfg, params = convert(hf)
        del hf
        ex = TextExtractor(cfg, params, layer_ids=layer_ids,
                           compute_dtype=args.compute_dtype,
                           encoder_cls=encoder_cls)
    else:
        cfg, params = from_hf_torch(AutoModel.from_pretrained(path))
        if args.finetuned_ckpt:
            # orbax tree saved by main_release --savemodel (fine-tuned e2e
            # text backbone) replaces the converted HF weights
            import orbax.checkpoint as ocp

            from ..core.trees import check_tree_like as _check_finetuned_tree

            restored = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(args.finetuned_ckpt))
            _check_finetuned_tree(restored, params, "--finetuned_ckpt")
            params = restored
            print(f"loaded fine-tuned backbone from {args.finetuned_ckpt}")
        ex = TextExtractor(cfg, params, layer_ids=layer_ids,
                           compute_dtype=args.compute_dtype)
    return _run_extraction(args, tokenizer, ex, cfg)


def _run_extraction(args, tokenizer, ex, cfg):
    from ..features.text import find_token_span

    span = find_token_span(tokenizer)

    level = "UTT" if args.feature_level == "UTTERANCE" else "FRA"
    out_dir = os.path.join(args.save_dir, f"{args.model_name}-{level}")
    os.makedirs(out_dir, exist_ok=True)

    df = pd.read_csv(args.trans_path)
    token_ids, empty = {}, []
    for _, row in df.iterrows():
        name = str(row["name"])
        if os.path.exists(os.path.join(out_dir, name + ".npy")):
            continue
        sentence = row.get(args.language)
        if pd.isna(sentence) or len(str(sentence)) == 0:
            empty.append(name)
        else:
            token_ids[name] = tokenizer(str(sentence))["input_ids"]

    import contextlib

    from ..core.profiling import trace

    t0 = time.time()
    with trace(args.profile) if args.profile else contextlib.nullcontext():
        feats = ex.extract(token_ids, span=span, level=level)
    D = cfg.hidden_size
    for name in empty:  # reference: zeros for empty transcripts
        feats[name] = (np.zeros(D, np.float32) if level == "UTT"
                       else np.zeros((1, D), np.float32))
    for name, feat in feats.items():
        np.save(os.path.join(out_dir, name + ".npy"), feat)
    print(f"{len(feats)} clips in {time.time() - t0:.1f}s -> {out_dir}")


if __name__ == "__main__":
    main()
