"""Visual feature-extraction CLI (``extract_vision_huggingface.py`` +
``extract_{manet,ferplus,msceleb,imagenet}_embedding.py`` equivalent).

    python -m mertools_tpu.cli.extract_vision --model_name=clip-vit-large-patch14 \
        --face_dir=.../openface_face --save_dir=.../features \
        --feature_level=UTTERANCE

``face_dir`` holds per-clip ``{name}.npy`` face arrays (T, 112, 112, 3) BGR
uint8 as produced by the OpenFace compression step. Model families:

- ``clip-*``                      -> CLIP image features
- ``dinov2-*`` / ``data2vec-vision-*`` / ``eva02-*`` -> token-summed ViT
- ``videomae-*``                  -> 16-frame tubelet segment features
- ``manet``                       -> 1024-d RAF-DB FER embedding
- ``resnet50-ferplus`` / ``senet50-ferplus`` / ``*-msceleb`` / ``*-imagenet``
                                  -> CNN global-pool embeddings
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np


def _finetuned_override(args, params):
    """--finetuned_ckpt: orbax tree saved by main_release --savemodel
    (fine-tuned e2e / videomae_pretrain backbone) replaces the converted
    HF weights (reference extract_sun_videomae.py workflow)."""
    if getattr(args, "finetuned_ckpt", None):
        import orbax.checkpoint as ocp

        from ..core.trees import check_tree_like as _check_finetuned_tree

        restored = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.finetuned_ckpt))
        _check_finetuned_tree(restored, params, "--finetuned_ckpt")
        params = restored
        print(f"loaded fine-tuned backbone from {args.finetuned_ckpt}")
    return params


def build_extractor(args):
    """Dispatch model_name -> (extractor, needs checkpoint dir)."""
    name = args.model_name.lower()
    path = (os.path.join(args.pretrain_dir, args.model_name)
            if args.pretrain_dir else args.model_name)

    if "videomae" in name:
        from transformers import VideoMAEModel

        from ..encoders.vit import from_hf_videomae
        from ..features.vision_zoo import VideoMAEExtractor
        cfg, params = from_hf_videomae(VideoMAEModel.from_pretrained(path))
        return VideoMAEExtractor(cfg, _finetuned_override(args, params),
                                 compute_dtype=args.compute_dtype)
    if "dinov2" in name or "dino2" in name:
        import dataclasses

        from transformers import Dinov2Model

        from ..encoders.vit import from_hf_dinov2
        from ..features.vision_zoo import vit_token_sum_extractor
        cfg, params = from_hf_dinov2(Dinov2Model.from_pretrained(path))
        if args.tome_r:   # ToMe production mode (arXiv:2210.09461)
            cfg = dataclasses.replace(cfg, tome_r=args.tome_r)
        return vit_token_sum_extractor(cfg, params,
                                       compute_dtype=args.compute_dtype)
    if "data2vec" in name or "beit" in name:
        from transformers import Data2VecVisionModel

        from ..encoders.vit import from_hf_beit
        from ..features.vision_zoo import vit_token_sum_extractor
        cfg, params = from_hf_beit(Data2VecVisionModel.from_pretrained(path))
        return vit_token_sum_extractor(cfg, params,
                                       compute_dtype=args.compute_dtype)
    if "eva-clip-g" in name or "eva_clip_g" in name:
        import dataclasses

        import torch

        from ..encoders.vit import from_eva_clip_g_checkpoint
        from ..features.vision_zoo import eva_clip_g_token_mean_extractor
        ckpt = path if path.endswith(".pth") else path + ".pth"
        sd = torch.load(ckpt, map_location="cpu", weights_only=True)
        cfg, params = from_eva_clip_g_checkpoint(dict(sd))
        if args.tome_r:
            cfg = dataclasses.replace(cfg, tome_r=args.tome_r)
        return eva_clip_g_token_mean_extractor(cfg, params,
                                               max_frames=args.max_frames,
                                               compute_dtype=args.compute_dtype)
    if "siglip" in name:
        import dataclasses

        from transformers import SiglipVisionModel

        from ..encoders.siglip import from_hf_torch as siglip_from_hf
        from ..features.vision_zoo import siglip_token_mean_extractor
        cfg, params = siglip_from_hf(SiglipVisionModel.from_pretrained(path))
        if args.tome_r:
            cfg = dataclasses.replace(cfg, tome_r=args.tome_r)
        return siglip_token_mean_extractor(cfg, params,
                                           max_frames=args.max_frames,
                                           compute_dtype=args.compute_dtype)
    if "emonet" in name:
        import torch

        from ..encoders.emonet import EmoNet, convert_torch_emonet
        from ..features.vision_zoo import FrameStreamExtractor, PreprocessSpec
        ckpt = torch.load(os.path.join(path, "emonet_8.pth"),
                          map_location="cpu", weights_only=False)
        params = convert_torch_emonet(dict(ckpt))
        enc = EmoNet()

        def forward(p_, pix):
            return enc.apply({"params": p_}, pix)

        # ToTensor only, 256x256 (extract_emonet_embedding.py transform)
        return FrameStreamExtractor(forward, params,
                                    PreprocessSpec(image_size=256),
                                    batch_size=16)
    if "manet" in name:
        import torch

        from ..encoders.resnet import convert_torch_manet
        from ..features.vision_zoo import manet_extractor
        sd = torch.load(os.path.join(path, "manet.pth"), map_location="cpu",
                        weights_only=False)
        sd = sd.get("state_dict", sd)
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        return manet_extractor(convert_torch_manet(sd))
    if "ferplus" in name or "msceleb" in name or "imagenet" in name:
        import torch

        from ..encoders.resnet import (ResNetConfig, convert_torch_resnet,
                                       resnet50_config, senet50_config)
        from ..features.vision_zoo import ferplus_spec, resnet_embed_extractor
        cfg = senet50_config() if name.startswith("senet") else resnet50_config()
        sd = torch.load(path + ".pth", map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        # MatConvNet FER meta means (pixel scale); imagenet-style fallback
        mean = (131.0912, 103.8827, 91.4953) if "ferplus" in name or \
            "msceleb" in name else (123.675, 116.28, 103.53)
        return resnet_embed_extractor(cfg, convert_torch_resnet(cfg, sd),
                                      ferplus_spec(mean))
    # default: CLIP family
    import dataclasses

    from transformers import CLIPVisionModelWithProjection

    from ..encoders.vit_clip import from_hf_torch
    from ..features.vision import VisionExtractor
    cfg, params = from_hf_torch(CLIPVisionModelWithProjection.from_pretrained(path))
    if args.tome_r:   # ToMe production mode (CLS contract unchanged)
        cfg = dataclasses.replace(cfg, tome_r=args.tome_r)
    return VisionExtractor(cfg, _finetuned_override(args, params),
                           max_frames=args.max_frames,
                           compute_dtype=args.compute_dtype)


def main(argv=None):
    from ..core.cache import enable_persistent_cache
    enable_persistent_cache()

    p = argparse.ArgumentParser("extract_vision")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--dataset", type=str, default=None,
                   help="resolve dirs from the path registry (run.sh style)")
    p.add_argument("--face_dir", type=str, default=None)
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--feature_level", type=str, default="UTTERANCE",
                   choices=["UTTERANCE", "FRAME"])
    p.add_argument("--pretrain_dir", type=str, default=None)
    p.add_argument("--max_frames", type=int, default=64)
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=[None, "bf16", "int8"],
                   help="bf16: production mode, all ViT-family paths; "
                        "int8: dynamic w8a8 (CLIP path)")
    p.add_argument("--tome_r", type=int, default=0,
                   help="Token Merging r per layer (CLIP/DINOv2/SigLIP/"
                        "EVA-CLIP-G paths; production accelerator, "
                        "approximate features)")
    p.add_argument("--gpu", type=int, default=0, help="ignored (TPU)")
    p.add_argument("--profile", type=str, default=None,
                   help="jax.profiler trace dir for the extraction loop")
    p.add_argument("--finetuned_ckpt", type=str, default=None,
                   help="orbax dir of a fine-tuned backbone saved by "
                        "main_release --savemodel (videomae/clip paths)")
    args = p.parse_args(argv)

    from ..core.config import resolve_dataset_args
    resolve_dataset_args(args, face_dir="openface_face", save_dir="features")

    ex = build_extractor(args)

    level = "UTT" if args.feature_level == "UTTERANCE" else "FRA"
    out_dir = os.path.join(args.save_dir, f"{args.model_name}-{level}")
    os.makedirs(out_dir, exist_ok=True)

    import contextlib

    from ..core.profiling import trace

    files = sorted(glob.glob(os.path.join(args.face_dir, "*.npy")))
    t0 = time.time()
    chunk = 64
    done = 0
    prof = trace(args.profile) if args.profile else contextlib.nullcontext()
    with prof:
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
