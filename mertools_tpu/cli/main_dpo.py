"""Preference-judging CLI (``MER2026/MER2026_Track3/main_dpo_sample.py``
equivalent).

    python -m mertools_tpu.cli.main_dpo judge --label_csv=labels.csv \
        --ckpt=.../mllm_checkpoint --tokenizer=... \
        --video_feat_dir=... --audio_feat_dir=... \
        --save_npz=result.npz [--pipeline=normal|cot]

    python -m mertools_tpu.cli.main_dpo score --result_npz=result.npz \
        [--metric=twoclass|threeclass]

label_csv columns: name, a1, a2[, preference]. Judging runs the
AffectGPT-backed batched judge; scoring reproduces the 2/3-class WAF+ACC
metrics (utils/common.py:67-107). Idempotent: existing save_npz is skipped
(main_dpo_sample.py:19-20).
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def cmd_judge(args):
    from ..core.cache import enable_persistent_cache
    enable_persistent_cache()
    if os.path.exists(args.save_npz):
        print(f"{args.save_npz} exists, skip (idempotent)")
        return

    from transformers import AutoTokenizer

    from ..mllm.chat import Chat
    from ..mllm.runner import restore_model
    from ..preference.judge import PreferenceJudge, mllm_caller

    model, params = restore_model(args.ckpt)
    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    chat = Chat(model, params, tok, max_new_tokens=args.max_new_tokens,
                temperature=args.temperature)

    text_caller = None
    if args.pipeline in ("cot2", "cot3"):
        # the text-LLM variants judge with a separate language model
        # (cot_step3/4/5 route through get_completion_qwen_bacth)
        from transformers import AutoModelForCausalLM

        from ..mllm.generate import batch_generate_texts
        from ..mllm.llm import LLMConfig, convert_torch_state

        assert args.llm, f"--pipeline={args.pipeline} needs --llm"
        hf = AutoModelForCausalLM.from_pretrained(args.llm)
        lcfg = LLMConfig.from_hf(hf.config)
        lparams = convert_torch_state(lcfg, hf.state_dict())
        del hf
        ltok = AutoTokenizer.from_pretrained(args.llm)
        lemb = np.asarray(lparams["embed_tokens"]["embedding"])

        def text_caller(prompts):
            def enc(prm):
                if getattr(ltok, "chat_template", None):
                    return ltok.apply_chat_template(
                        [{"role": "user", "content": prm}], tokenize=True,
                        add_generation_prompt=True)
                return ltok.encode(prm)

            ids = {i: enc(prm) for i, prm in enumerate(prompts)}
            out = batch_generate_texts(lcfg, lparams, lemb, ids, ltok,
                                       batch=args.batch,
                                       max_new_tokens=args.max_new_tokens)
            return [out[i] for i in range(len(prompts))]

    with open(args.label_csv, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))

    def load_feat(d, name):
        x = np.load(os.path.join(d, name + ".npy")).astype(np.float32)
        return x[None] if x.ndim == 1 else x

    for rnd in range(1, args.rounds + 1):
        if args.rounds > 1:
            base, ext = os.path.splitext(args.save_npz)
            save_npz = f"{base}-round{rnd}{ext or '.npz'}"
            if os.path.exists(save_npz):   # idempotent per round
                print(f"round {rnd}: {save_npz} exists, skipping")
                continue
        else:
            save_npz = args.save_npz
        # a fresh PRNG stream per round (meaningful with --temperature > 0)
        judge = PreferenceJudge(mllm_caller(chat, seed=rnd))
        gt_labels, pred_labels, descriptions = [], [], []
        for i in range(0, len(rows), args.batch):
            group = rows[i: i + args.batch]
            samples = [{
                "a1": (r["a1"] or "").replace("\n", " ")
                    .replace("\t", " ").strip(),
                "a2": (r["a2"] or "").replace("\n", " ")
                    .replace("\t", " ").strip(),
                "video_feats": load_feat(args.video_feat_dir, r["name"]),
                "audio_feats": load_feat(args.audio_feat_dir, r["name"]),
            } for r in group]
            if args.pipeline == "cot":
                labels, desc = judge.judge_cot(samples)
                descriptions.extend(desc)
            elif args.pipeline == "cot2":
                labels, desc = judge.judge_cot2(samples, text_caller)
                descriptions.extend(desc)
            elif args.pipeline == "cot3":
                labels, desc = judge.judge_cot3(samples, text_caller)
                descriptions.extend(desc)
            else:
                labels = judge.judge_normal(samples)
            pred_labels.extend(labels)
            gt_labels.extend(r.get("preference", "tie") for r in group)
            print(f"  round {rnd}: {len(pred_labels)}/{len(rows)}")

        np.savez_compressed(save_npz, gt_labels=gt_labels,
                            pred_labels=pred_labels,
                            descriptions=descriptions)
        print(f"wrote {save_npz}")


def cmd_score(args):
    from ..preference.judge import preference_metric

    data = np.load(args.result_npz, allow_pickle=True)
    gt = [str(x) for x in data["gt_labels"]]
    pred = [str(x) for x in data["pred_labels"]]
    f, acc = preference_metric(gt, pred, args.metric)
    print(f"{args.metric}: WAF={f:.4f} ACC={acc:.4f}")
    return f, acc


def main(argv=None):
    p = argparse.ArgumentParser("main_dpo")
    sub = p.add_subparsers(dest="cmd", required=True)

    j = sub.add_parser("judge")
    j.add_argument("--label_csv", required=True)
    j.add_argument("--ckpt", required=True)
    j.add_argument("--tokenizer", required=True)
    j.add_argument("--video_feat_dir", required=True)
    j.add_argument("--audio_feat_dir", required=True)
    j.add_argument("--save_npz", required=True)
    j.add_argument("--pipeline", default="normal",
                   choices=["normal", "cot", "cot2", "cot3"],
                   help="reference prompt settings S1-S4 "
                        "(main_dpo_sample.py:17-241): normal=direct, "
                        "cot=MLLM describe+compare, cot2=text-LLM compare, "
                        "cot3=text-LLM reason then extract")
    j.add_argument("--llm", default=None,
                   help="HF causal-LM checkpoint for cot2/cot3 text judging")
    j.add_argument("--batch", type=int, default=8)
    j.add_argument("--max_new_tokens", type=int, default=64)
    j.add_argument("--temperature", type=float, default=0.0,
                   help="sampled judging; >0 makes --rounds meaningful")
    j.add_argument("--rounds", type=int, default=1,
                   help="repeat calling times (reference --totalround; "
                        "round-tagged npz outputs, idempotent per round)")
    j.set_defaults(fn=cmd_judge)

    s = sub.add_parser("score")
    s.add_argument("--result_npz", required=True)
    s.add_argument("--metric", default="twoclass",
                   choices=["twoclass", "threeclass"])
    s.set_defaults(fn=cmd_score)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
