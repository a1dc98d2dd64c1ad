"""Preference-judging CLI (``MER2026/MER2026_Track3/main_dpo_sample.py``
equivalent).

    python -m mertools_tpu.cli.main_dpo judge --label_csv=labels.csv \
        --ckpt=.../mllm_checkpoint --tokenizer=... \
        --video_feat_dir=... --audio_feat_dir=... \
        --save_npz=result.npz [--pipeline=normal|cot]

    python -m mertools_tpu.cli.main_dpo score --result_npz=result.npz \
        [--metric=twoclass|threeclass]

label_csv columns: name, a1, a2[, preference]. ``--judge`` selects the
model family (the reference's per-model ``utils/*.py`` wrappers):
``affectgpt`` (our trained MLLM over feature stores, batched on TPU),
``qwen2audio``/``qwenaudio``/``salmonn`` (audio-LLMs over raw wavs),
``qwen25vl``/``videollava``/``llavanextvideo``/``llamavid``/``videochat``/
``videochat2``/``mplugowl``/``otter``/``pllava``/``vita``/``chatunivi``/
``videochatgpt`` (video-LLMs over raw mp4s), ``qwen25omni`` (thinker with
--input_type audio|video|audiovideo), ``gpt``/``gemini`` (API callers with
the reference's retry semantics). cot2/cot3 pipelines take a text-LLM
judge via ``--llm``/``--llm_family`` (utils/{qwen25,qwen3}.py protocols) —
together all 20 of the reference's utils/*.py wrapper families are
dispatchable. Decode defaults are PER JUDGE, matching each wrapper's
published protocol (see JUDGE_DECODE_DEFAULTS); explicit
--temperature/--max_new_tokens override. Scoring reproduces the 2/3-class
WAF+ACC metrics (utils/common.py:67-107). Idempotent: existing save_npz is
skipped (main_dpo_sample.py:19-20).
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np

# Per-judge reference decode protocols (MER2026_Track3/utils/*.py call
# sites), applied when --temperature/--max_new_tokens are not passed.
# Judge-internal knobs (top_p/top_k/num_beams) are hardwired in each
# caller per its wrapper. temperature 0.0 = the wrapper decodes greedily
# (or with deterministic beams).
JUDGE_DECODE_DEFAULTS: dict[str, dict] = {
    "affectgpt": dict(temperature=0.0, max_new_tokens=64),
    "qwen2audio": dict(temperature=0.0, max_new_tokens=512),       # :68
    "qwen25vl": dict(temperature=0.0, max_new_tokens=512),         # :81
    "qwen25omni": dict(temperature=0.0, max_new_tokens=512),       # :190
    "videollava": dict(temperature=0.1, max_new_tokens=1024),      # :72-74
    "llavanextvideo": dict(temperature=0.0, max_new_tokens=512),   # :57
    "llamavid": dict(temperature=0.5, max_new_tokens=512),         # :129-132
    "videochat": dict(temperature=1.0, max_new_tokens=1000),       # :54-64
    "videochat2": dict(temperature=1.0, max_new_tokens=1000),      # :24-25
    "mplugowl": dict(temperature=1.0, max_new_tokens=512),  # top_k5 :56-58
    "otter": dict(temperature=0.0, max_new_tokens=512),     # beam3 :107-108
    "pllava": dict(temperature=1.0, max_new_tokens=200),           # :66-77
    "qwenaudio": dict(temperature=1.0, max_new_tokens=256),  # model.chat :40
    "salmonn": dict(temperature=1.0, max_new_tokens=300),  # beam-sample :46
    "vita": dict(temperature=0.0, max_new_tokens=1024),            # :221-227
    "chatunivi": dict(temperature=0.2, max_new_tokens=1024),       # :123,159
    "videochatgpt": dict(temperature=0.2, max_new_tokens=512),     # :34-35
    "gpt": dict(temperature=0.0, max_new_tokens=512),
    "gemini": dict(temperature=0.0, max_new_tokens=512),
}


def apply_judge_decode_defaults(args) -> None:
    """Fill --temperature/--max_new_tokens (argparse default None) from the
    judge's published protocol (VERDICT round-3 #9: ``main_dpo --judge X``
    with no flags reproduces utils/X.py semantics)."""
    d = JUDGE_DECODE_DEFAULTS.get(getattr(args, "judge", None), {})
    if getattr(args, "temperature", None) is None:
        args.temperature = d.get("temperature", 0.0)
    if getattr(args, "max_new_tokens", None) is None:
        args.max_new_tokens = d.get("max_new_tokens", 64)


def _make_caller_factory(args):
    """Returns (caller_factory(round) -> caller, sample_builder(row) -> dict).

    ``--judge`` selects the model family (the reference's 21 utils/*.py
    wrappers behind one flag): affectgpt (our trained MLLM over feature
    stores), qwen2audio (HF checkpoint, raw wavs), gpt / gemini (API
    callers over raw media)."""
    def load_feat(d, name):
        x = np.load(os.path.join(d, name + ".npy")).astype(np.float32)
        return x[None] if x.ndim == 1 else x

    if args.judge == "affectgpt":
        from transformers import AutoTokenizer

        from ..mllm.chat import Chat
        from ..mllm.runner import restore_model
        from ..preference.judge import mllm_caller

        assert args.ckpt and args.video_feat_dir and args.audio_feat_dir
        model, params = restore_model(args.ckpt)
        tok = AutoTokenizer.from_pretrained(args.tokenizer)
        chat = Chat(model, params, tok, max_new_tokens=args.max_new_tokens,
                    temperature=args.temperature)
        sample = lambda r: {
            "video_feats": load_feat(args.video_feat_dir, r["name"]),
            "audio_feats": load_feat(args.audio_feat_dir, r["name"])}
        return (lambda rnd: mllm_caller(chat, seed=rnd)), sample

    if args.judge == "qwen2audio":
        from ..preference.qwen2audio import Qwen2AudioCaller

        assert args.ckpt and args.audio_dir, "--judge qwen2audio needs " \
            "--ckpt (HF checkpoint) and --audio_dir (16 kHz wavs)"
        caller = Qwen2AudioCaller(args.ckpt, batch=args.batch,
                                  max_new_tokens=args.max_new_tokens)
        sample = lambda r: {
            "audio_path": os.path.join(args.audio_dir, r["name"] + ".wav")}
        return (lambda rnd: caller), sample

    if args.judge == "qwen25vl":
        from ..preference.qwen25vl import Qwen25VLCaller

        assert args.ckpt and args.video_dir, "--judge qwen25vl needs " \
            "--ckpt (HF checkpoint) and --video_dir (mp4s)"
        caller = Qwen25VLCaller(args.ckpt, batch=args.batch,
                                max_new_tokens=args.max_new_tokens)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge == "videollava":
        from ..preference.videollava import VideoLlavaCaller

        assert args.ckpt and args.video_dir, "--judge videollava needs " \
            "--ckpt (HF checkpoint) and --video_dir (mp4s)"
        # reference protocol: do_sample=True, temperature=0.1
        # (main-video.py:106-108) — the judge default; --temperature 0
        # forces greedy
        caller = VideoLlavaCaller(args.ckpt, batch=args.batch,
                                  max_new_tokens=args.max_new_tokens,
                                  temperature=args.temperature,
                                  seed=args.seed)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge == "qwen25omni":
        from ..preference.qwen25omni import Qwen25OmniCaller

        assert args.ckpt and (args.audio_dir or args.video_dir), \
            "--judge qwen25omni needs --ckpt and --audio_dir/--video_dir"
        omni = Qwen25OmniCaller(args.ckpt, batch=args.batch,
                                max_new_tokens=args.max_new_tokens)
        caller = lambda samples, prompts: omni(samples, prompts,
                                               input_type=args.input_type)
        caller.func_calling_sample = omni.func_calling_sample
        sample = lambda r: {
            "audio_path": (os.path.join(args.audio_dir, r["name"] + ".wav")
                           if args.audio_dir else None),
            "video_path": (os.path.join(args.video_dir, r["name"] + ".mp4")
                           if args.video_dir else None)}
        return (lambda rnd: caller), sample

    if args.judge == "llavanextvideo":
        from ..preference.llavanextvideo import LlavaNextVideoCaller

        assert args.ckpt and args.video_dir, "--judge llavanextvideo " \
            "needs --ckpt (HF checkpoint) and --video_dir (mp4s)"
        caller = LlavaNextVideoCaller(args.ckpt, batch=args.batch,
                                      max_new_tokens=args.max_new_tokens,
                                      temperature=args.temperature,
                                      seed=args.seed)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge == "llamavid":
        from ..preference.llamavid import LlamaVidCaller

        assert args.ckpt and args.video_dir and args.bert, \
            "--judge llamavid needs --ckpt (LLaMA-VID checkpoint dir), " \
            "--bert (bert-base-uncased tokenizer) and --video_dir (mp4s)"
        # reference protocol: do_sample temperature 0.5, top_p 0.7,
        # max_new 512 (utils/llamavid.py:126-132) — the judge default;
        # --temperature 0 forces greedy
        caller = LlamaVidCaller.from_checkpoint(
            args.ckpt, args.bert, batch=args.batch,
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, seed=args.seed)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge == "videochat2":
        from ..preference.videochat2 import VideoChat2Caller

        assert args.ckpt and args.video_dir and args.bert and \
            args.vit_qformer and args.vicuna, \
            "--judge videochat2 needs --ckpt (stage3 pth), --vit_qformer " \
            "(umt_l16_qformer.pth), --vicuna, --bert, --video_dir"
        # reference protocol: do_sample temperature 1.0, top_p 0.9
        # (conversation.py:60-75) — the judge default; --temperature 0
        # forces greedy
        caller = VideoChat2Caller.from_checkpoints(
            args.ckpt, args.vit_qformer, args.vicuna, args.bert,
            batch=args.batch, max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, seed=args.seed)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge == "mplugowl":
        from ..preference.mplugowl import MplugOwlCaller

        assert args.ckpt and args.video_dir, "--judge mplugowl needs " \
            "--ckpt (mplug-owl-llama-7b-video dir) and --video_dir (mp4s)"
        # reference protocol: do_sample, top_k=5 (utils/mplugowl.py:52-57);
        # --temperature 0 stays greedy
        caller = MplugOwlCaller.from_checkpoint(
            args.ckpt, batch=args.batch,
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, seed=args.seed)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge == "videochat":
        from ..preference.videochat import VideoChatCaller

        assert args.ckpt and args.video_dir and args.vit_qformer and \
            args.vicuna and args.blip2_qformer, \
            "--judge videochat needs --ckpt (videochat_7b.pth), " \
            "--vit_qformer (eva_vit_g.pth), --blip2_qformer " \
            "(blip2_pretrained_flant5xxl.pth), --vicuna, --video_dir"
        caller = VideoChatCaller.from_checkpoints(
            args.ckpt, args.vit_qformer, args.blip2_qformer, args.vicuna,
            batch=args.batch, max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, seed=args.seed)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge == "otter":
        from ..preference.otter import OtterCaller

        assert args.ckpt and args.video_dir, "--judge otter needs " \
            "--ckpt (OTTER-Video-LLaMA7B dir) and --video_dir (mp4s)"
        # reference protocol: num_beams=3 beam search + bad-words +
        # no-repeat-3-gram (utils/otter.py:104-111) — the caller default
        # (HF-semantics beam engine, mllm/beam.py)
        caller = OtterCaller.from_checkpoint(
            args.ckpt, batch=args.batch,
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, seed=args.seed)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge == "qwenaudio":
        import json

        import torch
        from transformers import AutoTokenizer

        from ..mllm.llm import LLMConfig
        from ..preference.qwenaudio import (QwenAudio, QwenAudioCaller,
                                            QwenAudioTowerConfig,
                                            convert_qwenaudio_state)

        assert args.ckpt and args.audio_dir, "--judge qwenaudio needs " \
            "--ckpt (qwen-audio-chat dir) and --audio_dir (16 kHz wavs)"
        with open(os.path.join(args.ckpt, "config.json")) as f:
            cfg = json.load(f)
        sd = {}
        for fn in sorted(os.listdir(args.ckpt)):
            if fn.endswith(".bin"):
                sd.update(torch.load(os.path.join(args.ckpt, fn),
                                     map_location="cpu"))
        au = cfg.get("audio", {})
        tcfg = QwenAudioTowerConfig(
            n_mels=au.get("n_mels", 80), n_ctx=au.get("n_ctx", 1500),
            n_state=au.get("n_state", 1280), n_head=au.get("n_head", 20),
            n_layer=au.get("n_layer", 32),
            output_dim=au.get("output_dim", cfg["hidden_size"]))
        llm_cfg = LLMConfig(
            vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"] // 2,
            attention_bias=True,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-6),
            rope_theta=cfg.get("rotary_emb_base", 10000.0))
        params = convert_qwenaudio_state(tcfg, llm_cfg, sd)
        model = QwenAudio(tcfg, llm_cfg, params)
        tok = AutoTokenizer.from_pretrained(args.ckpt,
                                            trust_remote_code=True)
        caller = QwenAudioCaller(
            model, tok, batch=args.batch,
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, seed=args.seed,
            audio_pad_id=au.get("audio_pad_id", 151851))
        sample = lambda r: {
            "audio_path": os.path.join(args.audio_dir, r["name"] + ".wav")}
        return (lambda rnd: caller), sample

    if args.judge == "pllava":
        from ..preference.pllava import PllavaCaller

        assert args.ckpt and args.video_dir, "--judge pllava needs " \
            "--ckpt (HF-Llava-shaped PLLaVA checkpoint) and --video_dir"
        # reference protocol: 16 frames, sampled t=1.0, max_new 200
        # (utils/pllava.py:100-107); --temperature 0 stays greedy
        from transformers import AutoProcessor, LlavaForConditionalGeneration

        from ..preference.pllava import Pllava

        hf = LlavaForConditionalGeneration.from_pretrained(args.ckpt)
        model = Pllava.from_hf_torch(hf)
        del hf
        proc = AutoProcessor.from_pretrained(args.ckpt)
        caller = PllavaCaller(model=model, tokenizer=proc.tokenizer,
                              batch=args.batch,
                              max_new_tokens=args.max_new_tokens,
                              temperature=args.temperature, seed=args.seed)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge == "salmonn":
        from ..preference.salmonn import SalmonnCaller

        assert args.ckpt and args.audio_dir, "--judge salmonn needs " \
            "--ckpt (SALMONN trainables) and --audio_dir (16 kHz wavs); " \
            "frozen towers via --whisper/--beats/--vicuna"
        assert args.whisper and args.beats and args.vicuna, \
            "--judge salmonn needs --whisper --beats --vicuna tower paths"
        # reference protocol: num_beams=4 beam SAMPLING at temperature 1.0,
        # max_length 300 (SALMONN/model.py:118-132, utils/salmonn.py:46) —
        # the judge default; --temperature 0 decodes deterministic beams
        caller = SalmonnCaller.from_checkpoints(
            args.ckpt, args.whisper, args.beats, args.vicuna,
            batch=args.batch, max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, seed=args.seed)
        sample = lambda r: {
            "audio_path": os.path.join(args.audio_dir, r["name"] + ".wav")}
        return (lambda rnd: caller), sample

    if args.judge == "vita":
        from ..preference.vita import VitaCaller

        assert args.ckpt and args.video_dir, "--judge vita needs " \
            "--ckpt (VITA checkpoint dir) and --video_dir"
        # reference protocol: greedy (do_sample=False), max_new 1024,
        # 1 fps / min 4 / max 100 frames (utils/vita.py:43-51, 216-231)
        caller = VitaCaller.from_checkpoint(
            args.ckpt, batch=args.batch,
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, seed=args.seed)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge == "chatunivi":
        from ..preference.chatunivi import ChatUniViCaller

        assert args.ckpt and args.video_dir, "--judge chatunivi needs " \
            "--ckpt (Chat-UniVi checkpoint dir) and --video_dir (mp4s)"
        # reference protocol: 1 fps <=100 frames, "simple" conversation,
        # do_sample temperature 0.2, max_new 1024 (utils/chatunivi.py)
        caller = ChatUniViCaller(args.ckpt, batch=args.batch,
                                 max_new_tokens=args.max_new_tokens,
                                 temperature=args.temperature,
                                 seed=args.seed)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge == "videochatgpt":
        from ..preference.videochatgpt import VideoChatGPTCaller

        assert args.ckpt and args.video_dir, "--judge videochatgpt needs " \
            "--ckpt (Video-ChatGPT checkpoint dir) and --video_dir (mp4s)"
        # reference protocol: 100 segment-midpoint frames, spatio-temporal
        # 356 tokens, temperature 0.2, max_new 512 (utils/videochatgpt.py)
        caller = VideoChatGPTCaller(args.ckpt, batch=args.batch,
                                    max_new_tokens=args.max_new_tokens,
                                    temperature=args.temperature,
                                    seed=args.seed)
        sample = lambda r: {
            "video_path": os.path.join(args.video_dir, r["name"] + ".mp4")}
        return (lambda rnd: caller), sample

    if args.judge in ("gpt", "gemini"):
        from ..preference.api_callers import GeminiCaller, GPTCaller

        cls = GPTCaller if args.judge == "gpt" else GeminiCaller
        caller = cls(args.model_name)
        sample = lambda r: {
            "audio_path": (os.path.join(args.audio_dir, r["name"] + ".wav")
                           if args.audio_dir else None),
            "video_path": (os.path.join(args.video_dir, r["name"] + ".mp4")
                           if args.video_dir else None),
            "input_type": args.input_type}
        return (lambda rnd: caller), sample

    raise ValueError(args.judge)


def cmd_judge(args):
    from ..core.cache import enable_persistent_cache
    enable_persistent_cache()
    # remember whether the user set --temperature before judge defaults
    # fill it in — the cot2/cot3 TEXT judge follows its own utils/qwen*.py
    # protocol unless explicitly overridden
    explicit_temperature = args.temperature
    apply_judge_decode_defaults(args)
    if os.path.exists(args.save_npz):
        print(f"{args.save_npz} exists, skip (idempotent)")
        return

    from ..preference.judge import PreferenceJudge

    caller_factory, build_sample = _make_caller_factory(args)

    text_caller = None
    if args.pipeline in ("cot2", "cot3"):
        # the text-LLM variants judge with a separate language model
        # (cot_step3/4/5 route through get_completion_qwen_bacth)
        assert args.llm, f"--pipeline={args.pipeline} needs --llm"
        if args.llm_family == "qwen25":
            # utils/qwen25.py protocol: t=0.7/1.0/1.3 cases, top_p 0.8,
            # repetition_penalty 1.05
            from ..preference.text_llm import Qwen25TextJudge

            text_caller = Qwen25TextJudge(
                args.llm, temperature=(explicit_temperature or None),
                batch=args.batch, seed=args.seed)
        elif args.llm_family == "qwen3":
            # utils/qwen3.py protocol: thinking mode, t=0.6, top_p 0.95,
            # top_k 20, </think> split
            from ..preference.text_llm import Qwen3TextJudge

            text_caller = Qwen3TextJudge(
                args.llm, batch=args.batch, seed=args.seed,
                max_tokens=max(args.max_new_tokens, 256))
        else:  # plain greedy judging with the given checkpoint
            from ..preference.text_llm import _TextJudge

            class _Plain(_TextJudge):
                temperature = 0.0
                top_p = 0.9

            text_caller = _Plain(args.llm, batch=args.batch,
                                 max_tokens=args.max_new_tokens)

    with open(args.label_csv, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))

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
        judge = PreferenceJudge(caller_factory(rnd))
        gt_labels, pred_labels, descriptions = [], [], []
        for i in range(0, len(rows), args.batch):
            group = rows[i: i + args.batch]
            samples = [{
                "a1": (r["a1"] or "").replace("\n", " ")
                    .replace("\t", " ").strip(),
                "a2": (r["a2"] or "").replace("\n", " ")
                    .replace("\t", " ").strip(),
                **build_sample(r),
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
    j.add_argument("--judge", default="affectgpt",
                   choices=["affectgpt", "qwen2audio", "qwen25vl",
                            "qwen25omni", "videollava", "llavanextvideo",
                            "llamavid", "videochat", "videochat2",
                            "mplugowl", "otter", "pllava", "qwenaudio",
                            "salmonn", "vita", "chatunivi", "videochatgpt",
                            "gpt", "gemini"],
                   help="judge model family (the reference's per-model "
                        "utils/*.py wrappers); decode defaults follow the "
                        "selected wrapper's protocol (JUDGE_DECODE_DEFAULTS)")
    j.add_argument("--whisper", default=None,
                   help="salmonn: Whisper HF checkpoint (frozen tower)")
    j.add_argument("--beats", default=None,
                   help="salmonn: BEATs fairseq checkpoint (frozen tower)")
    j.add_argument("--vicuna", default=None,
                   help="salmonn: Vicuna HF checkpoint (frozen LLM)")
    j.add_argument("--bert", default=None,
                   help="llamavid/videochat2: bert-base-uncased tokenizer "
                        "path (the text-Q-Former's tokenizer)")
    j.add_argument("--vit_qformer", default=None,
                   help="videochat2: umt_l16_qformer.pth; videochat: "
                        "eva_vit_g.pth (frozen towers)")
    j.add_argument("--blip2_qformer", default=None,
                   help="videochat: blip2_pretrained_flant5xxl.pth")
    j.add_argument("--ckpt", default=None,
                   help="affectgpt: trained checkpoint dir; qwen2audio: "
                        "HF checkpoint path")
    j.add_argument("--tokenizer", default=None)
    j.add_argument("--video_feat_dir", default=None)
    j.add_argument("--audio_feat_dir", default=None)
    j.add_argument("--audio_dir", default=None,
                   help="raw 16 kHz wavs (qwen2audio / gpt audio judging)")
    j.add_argument("--video_dir", default=None,
                   help="raw mp4s (gpt / gemini video judging)")
    j.add_argument("--model_name", default="gpt-4.1-mini",
                   help="API model name for --judge gpt/gemini")
    j.add_argument("--input_type", default="video",
                   choices=["video", "audio", "audiovideo"])
    j.add_argument("--save_npz", required=True)
    j.add_argument("--pipeline", default="normal",
                   choices=["normal", "cot", "cot2", "cot3"],
                   help="reference prompt settings S1-S4 "
                        "(main_dpo_sample.py:17-241): normal=direct, "
                        "cot=MLLM describe+compare, cot2=text-LLM compare, "
                        "cot3=text-LLM reason then extract")
    j.add_argument("--llm", default=None,
                   help="HF causal-LM checkpoint for cot2/cot3 text judging")
    j.add_argument("--llm_family", default="plain",
                   choices=["plain", "qwen25", "qwen3"],
                   help="text-LLM judge protocol for cot2/cot3: qwen25 = "
                        "utils/qwen25.py sampling (0.7/0.8/rp1.05; "
                        "--temperature overrides for the ablation cases), "
                        "qwen3 = utils/qwen3.py thinking mode "
                        "(0.6/0.95/top_k20, </think> split)")
    j.add_argument("--batch", type=int, default=8)
    j.add_argument("--max_new_tokens", type=int, default=None,
                   help="default: the selected judge's reference protocol "
                        "(JUDGE_DECODE_DEFAULTS)")
    j.add_argument("--temperature", type=float, default=None,
                   help="sampled judging; >0 makes --rounds meaningful; "
                        "default: the selected judge's reference protocol "
                        "(e.g. salmonn 1.0 beam-sampling, videollava 0.1, "
                        "videochatgpt/chatunivi 0.2, vita/otter greedy); "
                        "pass 0 to force greedy")
    j.add_argument("--seed", type=int, default=0,
                   help="PRNG seed for sampled judging")
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
