"""Visual feature-extraction CLI (``extract_vision_huggingface.py`` equivalent).

    python -m mertools_tpu.cli.extract_vision --model_name=clip-vit-large-patch14 \
        --face_dir=.../openface_face --save_dir=.../features \
        --feature_level=UTTERANCE

``face_dir`` holds per-clip ``{name}.npy`` face arrays (T, 112, 112, 3) BGR
uint8 as produced by the OpenFace compression step.
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np


def main(argv=None):
    from ..core.cache import enable_persistent_cache
    enable_persistent_cache()
    from ..encoders.vit_clip import from_hf_torch
    from ..features.vision import VisionExtractor

    p = argparse.ArgumentParser("extract_vision")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--face_dir", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--feature_level", type=str, default="UTTERANCE",
                   choices=["UTTERANCE", "FRAME"])
    p.add_argument("--pretrain_dir", type=str, default=None)
    p.add_argument("--max_frames", type=int, default=64)
    p.add_argument("--gpu", type=int, default=0, help="ignored (TPU)")
    args = p.parse_args(argv)

    from transformers import CLIPVisionModelWithProjection

    path = (os.path.join(args.pretrain_dir, args.model_name)
            if args.pretrain_dir else args.model_name)
    cfg, params = from_hf_torch(CLIPVisionModelWithProjection.from_pretrained(path))
    ex = VisionExtractor(cfg, params, max_frames=args.max_frames)

    level = "UTT" if args.feature_level == "UTTERANCE" else "FRA"
    out_dir = os.path.join(args.save_dir, f"{args.model_name}-{level}")
    os.makedirs(out_dir, exist_ok=True)

    files = sorted(glob.glob(os.path.join(args.face_dir, "*.npy")))
    t0 = time.time()
    chunk = 64
    done = 0
    for i in range(0, len(files), chunk):
        faces = {}
        for f in files[i: i + chunk]:
            name = os.path.splitext(os.path.basename(f))[0]
            if os.path.exists(os.path.join(out_dir, name + ".npy")):
                continue
            faces[name] = np.load(f)
        if not faces:
            continue
        feats = ex.extract(faces, level=level)
        for name, feat in feats.items():
            np.save(os.path.join(out_dir, name + ".npy"), feat)
        done += len(faces)
        print(f"  {done} clips, {done / (time.time() - t0):.2f} clips/sec")
    print(f"Total time used: {time.time() - t0:.1f}s.")


if __name__ == "__main__":
    main()
