"""Handcrafted acoustic feature CLI (openSMILE-/librosa-equivalent driver).

Replaces ``MERBench/feature_extraction/audio/handcrafted_feature_extractor.py``
which launches one openSMILE subprocess (or librosa call) per wav, optionally
over a ProcessPoolExecutor. Here whole buckets of clips run as one batched
jitted computation on device.

    python -m mertools_tpu.cli.extract_handcrafted --feature_set=IS09 \
        --feature_level=UTTERANCE --audio_dir=.../audio --save_dir=.../features

Store layout matches the reference worker (``handcrafted_feature_extractor.py
:50-59``): UTTERANCE -> (D,) npy; FRAME -> (T, D) npy.
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np

OPENSMILE_SETS = ("IS09", "IS10", "IS13", "eGeMAPS")
LIBROSA_SETS = ("mel_spec", "mfcc")


def _buckets(items, edges):
    out = {e: [] for e in edges}
    for name, wav in items:
        for e in edges:
            if len(wav) <= e:
                out[e].append((name, wav))
                break
        else:
            out[edges[-1]].append((name, wav[: edges[-1]]))
    return out


def extract_batch(names_wavs, feature_set: str, level: str, sr: int,
                  batch: int = 32):
    """Bucketed batched extraction. Returns {name: np.ndarray}."""
    import jax.numpy as jnp

    from ..ops import handcrafted as hc

    edges = [sr * s for s in (2, 4, 6, 8, 12, 20, 30)]
    results = {}
    for edge, group in _buckets(names_wavs, edges).items():
        for i in range(0, len(group), batch):
            part = group[i: i + batch]
            B = len(part)
            wavs = np.zeros((B, edge), np.float32)
            lengths = np.zeros(B, np.int64)
            for j, (_, w) in enumerate(part):
                wavs[j, : len(w)] = w
                lengths[j] = len(w)
            if feature_set in OPENSMILE_SETS:
                if level == "UTTERANCE":
                    feats = np.asarray(hc.handcrafted_utt(
                        jnp.asarray(wavs), jnp.asarray(lengths), sr, feature_set))
                    for j, (name, _) in enumerate(part):
                        results[name] = feats[j]
                else:
                    feats, mask = hc.handcrafted_frame(
                        jnp.asarray(wavs), jnp.asarray(lengths), sr, feature_set)
                    feats, mask = np.asarray(feats), np.asarray(mask)
                    for j, (name, _) in enumerate(part):
                        results[name] = feats[j][mask[j]]
            else:
                fn = (hc.mel_spec_librosa if feature_set == "mel_spec"
                      else hc.mfcc_librosa)
                feats = np.asarray(fn(jnp.asarray(wavs), sr))
                hop = int(0.010 * sr)
                for j, (name, _) in enumerate(part):
                    nf = max(int(lengths[j] // hop) + 1, 1)
                    results[name] = feats[j][: nf]
    return results


def main(argv=None):
    from ..core.cache import enable_persistent_cache
    enable_persistent_cache()
    from ..io import wav as wav_io

    p = argparse.ArgumentParser("extract_handcrafted")
    p.add_argument("--feature_set", type=str, required=True,
                   choices=OPENSMILE_SETS + LIBROSA_SETS)
    p.add_argument("--feature_level", type=str, default="UTTERANCE",
                   choices=["UTTERANCE", "FRAME"])
    p.add_argument("--dataset", type=str, default=None,
                   help="resolve dirs from the path registry (run.sh style)")
    p.add_argument("--audio_dir", type=str, default=None)
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args(argv)

    from ..core.config import resolve_dataset_args
    resolve_dataset_args(args, audio_dir="audio", save_dir="features")

    level_tag = "UTT" if args.feature_level == "UTTERANCE" else "FRA"
    out_dir = os.path.join(args.save_dir, f"{args.feature_set}-{level_tag}")
    os.makedirs(out_dir, exist_ok=True)

    files = sorted(glob.glob(os.path.join(args.audio_dir, "*.wav")))
    print(f"extracting {len(files)} wavs -> {out_dir}")
    t0 = time.time()
    chunk = 512
    done = 0
    for i in range(0, len(files), chunk):
        items = []
        for f in files[i: i + chunk]:
            name = os.path.splitext(os.path.basename(f))[0]
            if os.path.exists(os.path.join(out_dir, name + ".npy")):
                continue
            if args.sr == 16000:
                items.append((name, wav_io.read_wav_16k(f)))
            else:
                w, file_sr = wav_io.read_wav(f)
                items.append((name, wav_io.resample(w, file_sr, args.sr)))
        if not items:
            continue
        feats = extract_batch(items, args.feature_set, args.feature_level,
                              args.sr, args.batch)
        for name, feat in feats.items():
            np.save(os.path.join(out_dir, name + ".npy"), feat)
        done += len(items)
        print(f"  {done} clips, {done / (time.time() - t0):.2f} clips/sec")
    print(f"Total time used: {time.time() - t0:.1f}s.")


if __name__ == "__main__":
    main()
