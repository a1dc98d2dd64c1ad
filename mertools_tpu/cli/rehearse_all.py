"""One-command real-checkpoint rehearsal driver (VERDICT r4 next #6a).

REHEARSAL.md's per-family recipe, executable: point ``--root`` at a
directory laid out as below (on a networked host with real checkpoints and
reference-produced artifacts), and every family that has its inputs present
runs convert → extract → parity and lands in ONE PASS/FAIL/SKIP table.
Families with missing inputs SKIP with the reason; any FAIL exits 1.

Expected layout under ``--root`` (families are discovered, not required)::

    checkpoints/<model_name>/        one dir per HF/fairseq/funasr ckpt,
                                     named with the reference's canonical
                                     model names (globals.py:11-136)
    checkpoints/judges/<judge>/      per-judge checkpoint dirs
    audio/*.wav                      16 kHz mono wavs
    transcription.csv                name,sentence (text families)
    faces/<vid>.npy                  (T,112,112,3) BGR face stores
    videos/<vid>.mp4                 raw clips (judge rehearsal)
    reference_features/<store>/      torch-produced stores from the
                                     reference's extract_*_huggingface.py,
                                     e.g. chinese-hubert-large-UTT/
    reference_responses/<judge>.csv  name,response from the reference's
                                     utils/<judge>.py wrapper, greedy
    ov/gt.csv ov/pred.csv ov/synonyms/   MER2024-OV anchor inputs
                                     (main-ov.py:115-120: avg 0.5398)

Feature stores compare at ``--tol`` (default the BASELINE.json 1e-3);
judges compare TOKEN-EXACT. Chat-UniVi carries a structural asterisk
(PARITY §2.7): the reference's k=1 event centers are decided by
``rand()*1e-6`` noise (Chat-UniVi/ChatUniVi/model/cluster.py:143-145), so
a chatunivi response mismatch on real clips is NOT a converter bug until
reproduced with the deterministic tie-break on both sides.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

# reference canonical model-name prefixes -> extraction CLI family
# (MERBench/toolkit/globals.py:11-136 naming)
_AUDIO_PREFIXES = (
    "chinese-hubert", "hubert", "wav2vec2", "chinese-wav2vec2", "wavlm",
    "data2vec-audio", "whisper", "vggish", "wav2vec-large", "emotion2vec")
_TEXT_PREFIXES = (
    "chinese-macbert", "chinese-roberta", "bert", "roberta", "macbert",
    "deberta", "electra", "xlnet", "albert", "sentence", "llama", "baichuan",
    "chatglm", "falcon", "bloom", "moss", "opt-", "stablelm", "vicuna")
_VISION_PREFIXES = (
    "clip-vit", "eva02", "EVA02", "siglip", "dinov2", "data2vec-vision",
    "videomae", "manet", "emonet", "resnet", "senet", "msceleb", "ferplus")

_JUDGES = (
    "qwen2audio", "qwen25vl", "qwen25omni", "videollava", "llavanextvideo",
    "llamavid", "videochat", "videochat2", "mplugowl", "otter", "pllava",
    "qwenaudio", "salmonn", "vita", "chatunivi", "videochatgpt")

OV_ANCHOR = 0.5398  # MER2024/main-ov.py:119


def _family_for(model: str) -> str | None:
    low = model.lower()
    for p in _AUDIO_PREFIXES:
        if low.startswith(p.lower()):
            return "audio"
    for p in _TEXT_PREFIXES:
        if low.startswith(p.lower()):
            return "text"
    for p in _VISION_PREFIXES:
        if low.startswith(p.lower()):
            return "vision"
    return None


def _store_model(store: str) -> tuple[str, str]:
    """'chinese-hubert-large-UTT' -> ('chinese-hubert-large', 'UTTERANCE')."""
    for suf, level in (("-UTT", "UTTERANCE"), ("-FRA", "FRAME")):
        if store.endswith(suf):
            return store[: -len(suf)], level
    return store, "UTTERANCE"


def _run(argv: list[str], timeout: int) -> tuple[bool, str]:
    r = subprocess.run([sys.executable, "-m"] + argv, capture_output=True,
                       text=True, timeout=timeout)
    tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
    return r.returncode == 0, " | ".join(tail)


def rehearse(root: str, tol: float = 1e-3, ov_tol: float = 1e-3,
             limit: int = 0, timeout: int = 3600,
             out_dir: str | None = None) -> list[dict]:
    rows: list[dict] = []
    ckpts = os.path.join(root, "checkpoints")
    ref_feats = os.path.join(root, "reference_features")
    out_dir = out_dir or tempfile.mkdtemp(prefix="rehearse_")

    # ---- feature-store families --------------------------------------------
    stores = sorted(os.listdir(ref_feats)) if os.path.isdir(ref_feats) else []
    for store in stores:
        model, level = _store_model(store)
        fam = _family_for(model)
        row = {"family": f"feature:{model}", "status": "SKIP", "detail": ""}
        rows.append(row)
        if fam is None:
            row["detail"] = "unknown model family (name not in prefix table)"
            continue
        ck = os.path.join(ckpts, model)
        if not os.path.isdir(ckpts) or not os.path.isdir(ck):
            # the extract CLIs resolve names under --pretrain_dir themselves
            ck = ckpts
        data_args = {
            "audio": ["--audio_dir", os.path.join(root, "audio")],
            "text": ["--trans_path", os.path.join(root, "transcription.csv")],
            "vision": ["--face_dir", os.path.join(root, "faces")],
        }[fam]
        probe = data_args[1]
        if not os.path.exists(probe):
            row["detail"] = f"missing input {probe}"
            continue
        if not os.path.isdir(ckpts):
            row["detail"] = "missing checkpoints/"
            continue
        save = os.path.join(out_dir, "features")
        ok, msg = _run(
            [f"mertools_tpu.cli.extract_{fam}", "--model_name", model,
             "--pretrain_dir", ckpts, "--save_dir", save,
             "--feature_level", level] + data_args, timeout)
        if not ok:
            row["status"], row["detail"] = "FAIL", f"extract: {msg}"
            continue
        ours = os.path.join(save, store)
        if not os.path.isdir(ours) and os.path.isdir(save):
            # the CLI may suffix the store name differently
            cands = [d for d in os.listdir(save) if d.startswith(model)]
            ours = os.path.join(save, cands[0]) if cands else ours
        argv = ["mertools_tpu.cli.parity_check",
                "--reference_store", os.path.join(ref_feats, store),
                "--our_store", ours, "--tol", str(tol)]
        if limit:
            argv += ["--limit", str(limit)]
        ok, msg = _run(argv, timeout)
        row["status"] = "PASS" if ok else "FAIL"
        row["detail"] = msg

    # ---- judges (token-exact) ----------------------------------------------
    resp_dir = os.path.join(root, "reference_responses")
    resps = sorted(os.listdir(resp_dir)) if os.path.isdir(resp_dir) else []
    for fn in resps:
        judge = os.path.splitext(fn)[0]
        row = {"family": f"judge:{judge}", "status": "SKIP", "detail": ""}
        rows.append(row)
        if judge not in _JUDGES:
            row["detail"] = f"unknown judge (known: {', '.join(_JUDGES)})"
            continue
        jck = os.path.join(ckpts, "judges", judge)
        vids = os.path.join(root, "videos")
        if not os.path.isdir(jck):
            row["detail"] = f"missing {jck}"
            continue
        if not os.path.isdir(vids):
            row["detail"] = "missing videos/"
            continue
        argv = ["mertools_tpu.cli.parity_check", "--judge", judge,
                "--ckpt", jck, "--video_dir", vids,
                "--reference_responses", os.path.join(resp_dir, fn)]
        if limit:
            argv += ["--limit", str(limit)]
        ok, msg = _run(argv, timeout)
        row["status"] = "PASS" if ok else "FAIL"
        row["detail"] = msg
        if judge == "chatunivi" and not ok:
            row["detail"] += (" [structural asterisk: reference k=1 event "
                              "centers are rand()*1e-6 tie-broken — see "
                              "PARITY §2.7 before calling this a bug]")

    # ---- MER2024-OV anchor (0.5398) ----------------------------------------
    ov = os.path.join(root, "ov")
    row = {"family": "ov:mer2024-anchor", "status": "SKIP", "detail": ""}
    rows.append(row)
    gt, pred = os.path.join(ov, "gt.csv"), os.path.join(ov, "pred.csv")
    syn = os.path.join(ov, "synonyms")
    if all(os.path.exists(p) for p in (gt, pred, syn)):
        r = subprocess.run(
            [sys.executable, "-m", "mertools_tpu.cli.main_ov", "mer2024",
             "--gt_csv", gt, "--pred_csv", pred, "--synonym_root", syn],
            capture_output=True, text=True, timeout=timeout)
        score = None
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                score = json.loads(line).get("avg_score")
                break
            except (json.JSONDecodeError, AttributeError):
                continue
        if r.returncode != 0 or score is None:
            row["status"] = "FAIL"
            row["detail"] = (r.stdout + r.stderr).strip().splitlines()[-1]
        else:
            ok = abs(score - OV_ANCHOR) < ov_tol
            row["status"] = "PASS" if ok else "FAIL"
            row["detail"] = f"avg_score {score:.4f} vs anchor {OV_ANCHOR}"
    else:
        row["detail"] = "missing ov/{gt.csv,pred.csv,synonyms}"
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--root", required=True)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--ov_tol", type=float, default=1e-3)
    p.add_argument("--limit", type=int, default=0,
                   help="clips per family (0 = all)")
    p.add_argument("--timeout", type=int, default=3600,
                   help="seconds per family step")
    p.add_argument("--out_dir", default=None)
    args = p.parse_args(argv)

    rows = rehearse(args.root, tol=args.tol, ov_tol=args.ov_tol,
                    limit=args.limit, timeout=args.timeout,
                    out_dir=args.out_dir)
    w = max((len(r["family"]) for r in rows), default=10)
    print(f"\n{'family':<{w}}  status  detail")
    for r in rows:
        print(f"{r['family']:<{w}}  {r['status']:<6}  {r['detail'][:120]}")
    counts = {s: sum(1 for r in rows if r["status"] == s)
              for s in ("PASS", "FAIL", "SKIP")}
    print(json.dumps({"rehearsal": counts, "rows": rows}))
    return 1 if counts["FAIL"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
