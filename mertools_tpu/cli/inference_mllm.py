"""MLLM inference CLI (``inference_hybird.py`` equivalent).

    python -m mertools_tpu.cli.inference_mllm --ckpt=.../checkpoints \
        --video_feat_dir=.../clip-vit-large-FRA --audio_feat_dir=.../hubert-FRA \
        --subtitle_csv=transcription.csv --save_path=name2reason.npz \
        --tokenizer=/path/to/llm

Reads per-clip frame/audio features from the feature store (the offline
extraction pipeline's output), restores the trained AffectGPT state (orbax),
and generates an emotion-reason description per clip in BATCHES on TPU —
replacing the reference's per-sample decode loop
(``inference_hybird.py:214-254``). Writes ``name2reason.npz`` exactly like
the reference (``:259-260``).
"""

from __future__ import annotations

import argparse
import csv
import glob
import os

import numpy as np


def read_subtitles(path: str | None) -> dict:
    if not path or not os.path.exists(path):
        return {}
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    key = "sentence" if rows and "sentence" in rows[0] else "chinese"
    return {r["name"]: (r.get(key) or "") for r in rows}


def main(argv=None):
    from ..core.cache import enable_persistent_cache
    enable_persistent_cache()

    p = argparse.ArgumentParser("inference_mllm")
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--video_feat_dir", default=None,
                   help="offline feature store (or use --face_dir + encoder)")
    p.add_argument("--audio_feat_dir", default=None)
    # raw-input mode (reference inference_hybird.py:214-254 online encoding)
    p.add_argument("--face_dir", default=None,
                   help="per-clip face npy dir; encoded online")
    p.add_argument("--audio_dir", default=None,
                   help="per-clip 16 kHz wav dir; encoded online")
    p.add_argument("--visual_encoder", default="CLIP_VIT_LARGE",
                   help="registry name (encoder.py registry equivalents)")
    p.add_argument("--acoustic_encoder", default="HUBERT_LARGE")
    p.add_argument("--visual_pretrain", default=None)
    p.add_argument("--acoustic_pretrain", default=None)
    p.add_argument("--random_init_encoders", action="store_true",
                   help="tiny random encoders (smoke without checkpoints)")
    # multi-stream feature stores (models saved with face_or_frame set);
    # unset streams fall back to --video_feat_dir
    p.add_argument("--face_feat_dir", default=None)
    p.add_argument("--frame_feat_dir", default=None)
    p.add_argument("--image_feat_dir", default=None)
    p.add_argument("--subtitle_csv", default=None)
    p.add_argument("--question", "--outside_user_message", default=None,
                   help="override the default question (reference "
                        "outside_user_message, inference_hybird.py:123)")
    p.add_argument("--save_path", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--max_video_frames", type=int, default=64)
    p.add_argument("--max_audio_frames", type=int, default=64)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 LLM decode (the reference's fp16-autocast "
                        "class): bf16 LLM weights on the native MXU path")
    p.add_argument("--kv_int8", action="store_true",
                   help="int8 KV cache for generation (half the cache "
                        "memory/bandwidth; ~1e-2 logit class)")
    # epoch sweep (inference_hybird.py:33-84): overlay trainable-only
    # checkpoint_{N} dirs from a Runner output_dir onto the base model
    p.add_argument("--run_dir", default=None,
                   help="Runner output_dir with checkpoint_N subdirs")
    p.add_argument("--test_epoch", default=None)
    p.add_argument("--test_epochs", default=None, help="'a-b' range")
    p.add_argument("--skip_epoch", type=int, default=1)
    args = p.parse_args(argv)

    import jax
    from transformers import AutoTokenizer

    from ..mllm.chat import Chat
    from ..mllm.runner import (epoch_checkpoints, overlay_trainable,
                               restore_model)

    model, params = restore_model(args.ckpt)
    if args.bf16:
        # decode-path precision is dtype-driven (mllm/generate._prec_for):
        # casting the LLM subtree switches generation to the bf16 MXU path
        # while the encoder/Q-Former splice stays at its own precision
        import jax

        from ..mllm.generate import cast_llm_params_bf16
        params = dict(params)
        params["llm"] = jax.jit(cast_llm_params_bf16)(params["llm"])
    tok = AutoTokenizer.from_pretrained(args.tokenizer)

    if args.run_dir:
        sweep = epoch_checkpoints(args.run_dir, args.test_epoch,
                                  args.test_epochs, args.skip_epoch)
    else:
        sweep = [(None, None)]

    raw_mode = args.face_dir is not None or args.audio_dir is not None
    if raw_mode:
        assert args.face_dir and args.audio_dir, \
            "raw mode needs both --face_dir and --audio_dir"
        from ..mllm.encoders import (build_acoustic_encoder,
                                     build_visual_encoder)
        venc, _ = build_visual_encoder(args.visual_encoder,
                                       args.visual_pretrain,
                                       args.random_init_encoders,
                                       max_frames=args.max_video_frames)
        aenc, _ = build_acoustic_encoder(args.acoustic_encoder,
                                         args.acoustic_pretrain,
                                         args.random_init_encoders)
        list_dir = args.face_dir
    else:
        assert args.video_feat_dir and args.audio_feat_dir, \
            "feature-store mode needs --video_feat_dir and --audio_feat_dir"
        list_dir = args.video_feat_dir

    subtitles = read_subtitles(args.subtitle_csv)
    files = sorted(glob.glob(os.path.join(list_dir, "*.npy")))
    names = [os.path.splitext(os.path.basename(f))[0] for f in files]

    def load_feat(d, name, cap):
        x = np.load(os.path.join(d, name + ".npy")).astype(np.float32)
        if x.ndim == 1:
            x = x[None]
        if len(x) > cap:
            idx = np.linspace(0, len(x) - 1, cap).astype(int)
            x = x[idx]
        return x

    from ..io import wav as wav_io

    # frozen encoders are epoch-independent: cache features across the sweep
    _feat_cache: dict[str, tuple] = {}

    def raw_feats(group):
        todo_names = [n for n in group if n not in _feat_cache]
        if todo_names:
            faces = {n: np.load(os.path.join(args.face_dir, n + ".npy"))
                     for n in todo_names}
            wavs = {n: wav_io.read_wav_16k(
                os.path.join(args.audio_dir, n + ".wav"))
                for n in todo_names}
            vf, af = venc(faces), aenc(wavs)
            for n in todo_names:
                _feat_cache[n] = (vf[n], af[n])
        return ({n: _feat_cache[n][0] for n in group},
                {n: _feat_cache[n][1] for n in group})

    for epoch, ckpt_path in sweep:
        if ckpt_path is not None:
            eparams, _ = overlay_trainable(params, ckpt_path)
            base, ext = os.path.splitext(args.save_path)
            save_path = f"{base}_epoch{epoch}{ext or '.npz'}"
            print(f"== epoch {epoch} ({ckpt_path}) -> {save_path}")
        else:
            eparams, save_path = params, args.save_path
        chat = Chat(model, eparams, tok, max_new_tokens=args.max_new_tokens,
                    temperature=args.temperature, kv_int8=args.kv_int8)

        name2reason = {}
        if os.path.exists(save_path):  # idempotent resume (reference :209)
            old = np.load(save_path, allow_pickle=True)
            name2reason = dict(old["name2reason"].item()) \
                if "name2reason" in old else {}
        todo = [n for n in names if n not in name2reason]
        print(f"{len(todo)} clips to process ({len(name2reason)} cached)")

        streams = None
        if model.cfg.face_or_frame is not None:
            from ..mllm.affectgpt import stream_plan

            _, streams = stream_plan(model.cfg.face_or_frame)
            stream_dir = {
                "audio": args.audio_feat_dir,
                "face": args.face_feat_dir or args.video_feat_dir,
                "frame": args.frame_feat_dir or args.video_feat_dir,
                "image": args.image_feat_dir or args.video_feat_dir}

        def feat_keys(n, vfeats=None, afeats=None):
            """Per-sample feature dict: legacy AV pair or per-stream keys."""
            if streams is None:
                if vfeats is not None:
                    return {"video_feats": vfeats[n].astype(np.float32),
                            "audio_feats": afeats[n].astype(np.float32)}
                return {"video_feats": load_feat(args.video_feat_dir, n,
                                                 args.max_video_frames),
                        "audio_feats": load_feat(args.audio_feat_dir, n,
                                                 args.max_audio_frames)}
            out = {}
            for s in streams:
                if vfeats is not None:  # raw mode: online-encoded features
                    x = afeats[n] if s == "audio" else vfeats[n]
                    out[f"{s}_feats"] = np.asarray(x, np.float32)
                else:
                    cap = (args.max_audio_frames if s == "audio"
                           else args.max_video_frames)
                    out[f"{s}_feats"] = load_feat(stream_dir[s], n, cap)
            return out

        from concurrent.futures import ThreadPoolExecutor

        from ..core.profiling import trace

        def load_group(group):
            """Feature reads for one batch (npy IO releases the GIL, so
            this overlaps with the device generating the previous batch —
            same prefetch pattern as the extraction CLIs)."""
            if raw_mode:
                vfeats, afeats = raw_feats(group)
                return [{**feat_keys(n, vfeats, afeats),
                         "subtitle": subtitles.get(n, ""),
                         "question": args.question} for n in group]
            return [{**feat_keys(n),
                     "subtitle": subtitles.get(n, ""),
                     "question": args.question} for n in group]

        groups = [todo[i: i + args.batch]
                  for i in range(0, len(todo), args.batch)]
        with trace(), ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(load_group, groups[0]) if groups else None
            for gi, group in enumerate(groups):
                samples = nxt.result()
                nxt = (pool.submit(load_group, groups[gi + 1])
                       if gi + 1 < len(groups) else None)
                answers = chat.answer_batch(samples)
                for n, a in zip(group, answers):
                    name2reason[n] = a
                np.savez_compressed(save_path, name2reason=name2reason)
                print(f"  {len(name2reason)}/{len(names)} done")

        print(f"wrote {save_path}")


if __name__ == "__main__":
    main()
