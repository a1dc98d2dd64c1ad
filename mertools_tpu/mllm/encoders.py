"""Frozen-encoder registry for the AffectGPT raw-input path.

The reference registers frozen visual/acoustic encoders by name
(``my_affectgpt/models/encoder.py``: ``@registry.register_visual_encoder``
/ ``register_acoustic_encoder``) and its inference path encodes raw media
on the fly (``inference_hybird.py:214-254``). This module provides the same
names backed by the TPU extraction pipelines; each builder returns
``(encode_fn, hidden_size)`` where

- visual ``encode_fn(faces: {name: (T,112,112,3) BGR uint8}) -> {name: (T', D)}``
  (per-frame embeddings — reference ``[b t h]``),
- acoustic ``encode_fn(wavs: {name: 16 kHz waveform}) -> {name: (t, D)}``
  with t = 8 ImageBind-style 2 s clips per utterance, each pooled to one
  vector exactly like the reference (last-4 hidden-state **mean**, then
  frame mean — encoder.py:336-352,377-393,418-434).

Builders take ``(pretrain_path, random_init)``; ``random_init=True`` builds
a tiny randomly initialized encoder (smoke tests / benchmarks without
checkpoints).
"""

from __future__ import annotations

import numpy as np

from ..core.registry import registry

VISUAL_KIND = "mllm_visual_encoder"
ACOUSTIC_KIND = "mllm_acoustic_encoder"

CLIP_SAMPLES = 2 * 16000


def build_visual_encoder(name: str, pretrain_path: str | None = None,
                         random_init: bool = False, max_frames: int = 64):
    return registry.get(VISUAL_KIND, name)(pretrain_path, random_init,
                                           max_frames)


def build_acoustic_encoder(name: str, pretrain_path: str | None = None,
                           random_init: bool = False, **kw):
    return registry.get(ACOUSTIC_KIND, name)(pretrain_path, random_init, **kw)


def _fra(extractor):
    return lambda media: extractor.extract(media, level="FRA")


# ------------------------------------------------------------------ visual


@registry.register(VISUAL_KIND, "CLIP_VIT_LARGE")
def _clip_vit_large(path, random_init, max_frames):
    """get_image_features per frame (encoder.py:197-208)."""
    import jax

    from ..encoders.vit_clip import (CLIPVisionConfig, CLIPVisionEncoder,
                                     from_hf_torch)
    from ..features.vision import VisionExtractor

    if random_init:
        cfg = CLIPVisionConfig(hidden_size=32, num_hidden_layers=2,
                               num_attention_heads=4, intermediate_size=64,
                               image_size=28, patch_size=14,
                               projection_dim=24)
        params = CLIPVisionEncoder(cfg).init(
            jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
        )["params"]
    else:
        from transformers import CLIPVisionModelWithProjection

        cfg, params = from_hf_torch(
            CLIPVisionModelWithProjection.from_pretrained(path))
    ex = VisionExtractor(cfg, params, max_frames=max_frames)
    return _fra(ex), cfg.projection_dim


@registry.register(VISUAL_KIND, "DINO2_LARGE")
def _dino2_large(path, random_init, max_frames):
    """last-hidden token MEAN per frame (encoder.py:233-246)."""
    import jax

    from ..encoders.vit import ViTEncoder, dinov2_config, from_hf_dinov2
    from ..features.vision_zoo import (IMAGENET_DEFAULT, FrameStreamExtractor,
                                       PreprocessSpec)

    if random_init:
        cfg = dinov2_config(hidden_size=32, num_layers=2, num_heads=4,
                            intermediate_size=64, image_size=28)
        params = ViTEncoder(cfg).init(
            jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
        )["params"]
    else:
        from transformers import Dinov2Model

        cfg, params = from_hf_dinov2(Dinov2Model.from_pretrained(path))
    enc = ViTEncoder(cfg)
    spec = PreprocessSpec(image_size=cfg.image_size,
                          mean=IMAGENET_DEFAULT[0], std=IMAGENET_DEFAULT[1])

    def forward(p, pix):
        return enc.apply({"params": p}, pix).mean(axis=1)

    ex = FrameStreamExtractor(forward, params, spec, max_frames=max_frames)
    return _fra(ex), cfg.hidden_size


@registry.register(VISUAL_KIND, "SigLIP_SO")
def _siglip_so(path, random_init, max_frames):
    """last-hidden token mean per frame (encoder.py:269-281)."""
    import jax

    from ..encoders.siglip import (SiglipVisionConfig, SiglipVisionEncoder,
                                   from_hf_torch)
    from ..features.vision_zoo import siglip_token_mean_extractor

    if random_init:
        cfg = SiglipVisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                                 intermediate_size=64, image_size=28,
                                 patch_size=14, use_head=False)
        params = SiglipVisionEncoder(cfg).init(
            jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
        )["params"]
    else:
        from transformers import SiglipVisionModel

        cfg, params = from_hf_torch(SiglipVisionModel.from_pretrained(path))
    ex = siglip_token_mean_extractor(cfg, params, max_frames=max_frames)
    return _fra(ex), cfg.hidden_size


@registry.register(VISUAL_KIND, "EVA_CLIP_G_NO_QFORMER")
def _eva_clip_g_no_qformer(path, random_init, max_frames):
    """ln_vision + token mean per frame (encoder.py:160-174)."""
    import jax

    from ..encoders.vit import (ViTEncoder, eva_clip_g_config,
                                from_eva_clip_g_checkpoint)
    from ..features.vision_zoo import eva_clip_g_token_mean_extractor

    if random_init:
        cfg = eva_clip_g_config(hidden_size=32, num_layers=2, num_heads=4,
                                intermediate_size=64, image_size=28)
        params = ViTEncoder(cfg).init(
            jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
        )["params"]
    else:
        import torch

        ckpt = path if path.endswith(".pth") else path + ".pth"
        sd = torch.load(ckpt, map_location="cpu", weights_only=True)
        cfg, params = from_eva_clip_g_checkpoint(dict(sd))
    ex = eva_clip_g_token_mean_extractor(cfg, params, max_frames=max_frames)
    return _fra(ex), cfg.hidden_size


@registry.register(VISUAL_KIND, "EVA_CLIP_G")
def _eva_clip_g(path, random_init, max_frames):
    """EVA-ViT-g + ln_vision + frozen BLIP-2 Q-Former: each frame compressed
    to 32 query tokens (encoder.py:43-120); output (T*32, 768) per clip.

    ``path``: dict-like or ':'-joined pair 'eva_vit_g.pth:blip2_qformer.pth'
    (the reference's PATH_TO_VISUAL EVA_CLIP_G + VIT_QFORMER files).
    """
    import jax
    import jax.numpy as jnp

    from ..encoders.vit import (ViTEncoder, eva_clip_g_config,
                                from_eva_clip_g_checkpoint)
    from ..features.vision_zoo import (FrameStreamExtractor, PreprocessSpec)
    from .qformer import QFormer, QFormerConfig, from_blip2_qformer

    ln_vision = None
    if random_init:
        cfg = eva_clip_g_config(hidden_size=32, num_layers=2, num_heads=4,
                                intermediate_size=64, image_size=28)
        params = ViTEncoder(cfg).init(
            jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
        )["params"]
        qcfg = QFormerConfig.blip2(num_layers=2, num_queries=4,
                                   hidden_size=16, num_heads=2,
                                   intermediate_size=32)
        qformer = QFormer(qcfg)
        qparams = qformer.init(jax.random.PRNGKey(1),
                               np.zeros((1, 5, 32), np.float32))["params"]
    else:
        import torch

        vit_path, qf_path = path.split(":")
        sd = torch.load(vit_path, map_location="cpu", weights_only=True)
        cfg, params = from_eva_clip_g_checkpoint(dict(sd))
        qsd = dict(torch.load(qf_path, map_location="cpu",
                              weights_only=True))
        qsd = qsd.get("model", qsd)
        qcfg, qparams = from_blip2_qformer(qsd)
        if "ln_vision.weight" in qsd:   # BLIP-2 ckpt carries ln_vision
            ln_vision = {"scale": np.asarray(qsd["ln_vision.weight"]),
                         "bias": np.asarray(qsd["ln_vision.bias"])}
        qformer = QFormer(qcfg)
    enc = ViTEncoder(cfg)
    clip_stats = ((0.48145466, 0.4578275, 0.40821073),
                  (0.26862954, 0.26130258, 0.27577711))
    spec = PreprocessSpec(image_size=cfg.image_size, mean=clip_stats[0],
                          std=clip_stats[1])
    full = {"vit": params, "qformer": qparams}

    def forward(p, pix):
        tokens = enc.apply({"params": p["vit"]}, pix)    # (B, 1+N, D)
        mu = tokens.mean(-1, keepdims=True)
        var = jnp.square(tokens - mu).mean(-1, keepdims=True)
        tokens = (tokens - mu) / jnp.sqrt(var + 1e-5)
        if ln_vision is not None:
            tokens = tokens * jnp.asarray(ln_vision["scale"]) \
                + jnp.asarray(ln_vision["bias"])
        q = qformer.apply({"params": p["qformer"]}, tokens)  # (B, nq, H)
        return q.reshape(tokens.shape[0], -1)            # flat per frame

    ex = FrameStreamExtractor(forward, full, spec, batch_size=8,
                              max_frames=max_frames)
    nq, qh = qformer.cfg.num_queries, qformer.cfg.hidden_size

    def encode(faces: dict) -> dict:
        out = ex.extract(faces, level="FRA")
        # (T, nq*H) -> (T*nq, H): the reference flattens frame-major query
        # tokens before the video Q-Former (affectgpt.py:357-406)
        return {n: v.reshape(-1, qh) for n, v in out.items()}

    return encode, qh


# ---------------------------------------------------------------- acoustic


def _clip_pooled_wav2vec2(cfg, params, do_normalize=True, batch_clips=2,
                          clips_per_video=8, clip_samples=CLIP_SAMPLES):
    """wavs -> 8 x 2 s clips -> encoder -> last-4 hidden MEAN -> frame mean
    -> (8, D) per utterance (encoder.py:336-352; note MEAN, not the MERBench
    extractors' last-4 SUM). ``clip_samples`` is the production 2 s window;
    tests shrink it (XLA:CPU compiles of long-seq attention are minutes)."""
    import jax
    import jax.numpy as jnp

    from ..encoders.wav2vec2 import Wav2Vec2Encoder
    from ..features.audio import normalize_wav
    from ..ops.fbank import sample_audio_clips

    enc = Wav2Vec2Encoder(cfg)
    params = jax.device_put(params)

    @jax.jit
    def fwd(p, clips):                       # (B, S, samples)
        B, S = clips.shape[:2]
        flat = clips.reshape(B * S, -1)
        hs = enc.apply({"params": p}, flat)
        k = min(4, len(hs))                  # last-4 MEAN (all if shallower)
        feat = sum(hs[-i] for i in range(1, k + 1)) / k
        return feat.mean(axis=1).reshape(B, S, -1)

    def encode(wavs: dict) -> dict:
        names = list(wavs)
        out = {}
        for i in range(0, len(names), batch_clips):
            group = names[i: i + batch_clips]
            batch = np.zeros((batch_clips, clips_per_video, clip_samples),
                             np.float32)
            for r, n in enumerate(group):
                clips = sample_audio_clips(
                    wavs[n], clip_duration=clip_samples / 16000.0,
                    clips_per_video=clips_per_video)
                if do_normalize:
                    clips = np.stack([normalize_wav(c) for c in clips])
                batch[r] = clips
            emb = np.asarray(fwd(params, jnp.asarray(batch)))
            for r, n in enumerate(group):
                out[n] = emb[r]
        return out

    return encode


def _wav2vec2_family(path, random_init, size="large", do_normalize=True,
                     clip_samples=CLIP_SAMPLES):
    import jax

    from ..encoders.wav2vec2 import (Wav2Vec2Config, Wav2Vec2Encoder,
                                     from_hf_torch)

    if random_init:
        cfg = Wav2Vec2Config(hidden_size=32, num_hidden_layers=2,
                             num_attention_heads=4, intermediate_size=64,
                             conv_dim=(16, 16), conv_kernel=(10, 3),
                             conv_stride=(5, 2),
                             num_conv_pos_embeddings=16,
                             num_conv_pos_embedding_groups=2)
        params = Wav2Vec2Encoder(cfg).init(
            jax.random.PRNGKey(0), np.zeros((1, 4000), np.float32))["params"]
    else:
        from transformers import AutoModel

        cfg, params = from_hf_torch(AutoModel.from_pretrained(path))
    return (_clip_pooled_wav2vec2(cfg, params, do_normalize=do_normalize,
                                  clip_samples=clip_samples),
            cfg.hidden_size)


@registry.register(ACOUSTIC_KIND, "HUBERT_LARGE")
def _hubert_large(path, random_init, **kw):
    return _wav2vec2_family(path, random_init, **kw)


@registry.register(ACOUSTIC_KIND, "WAVLM_LARGE")
def _wavlm_large(path, random_init, **kw):
    return _wav2vec2_family(path, random_init, **kw)


@registry.register(ACOUSTIC_KIND, "DATA2VEC_BASE")
def _data2vec_base(path, random_init, **kw):
    return _wav2vec2_family(path, random_init, size="base", **kw)


@registry.register(ACOUSTIC_KIND, "IMAGEBIND")
def _imagebind(path, random_init, **kw):
    """per-clip normalized 1024-d ImageBind embeddings (encoder.py:306-311)."""
    import jax

    from ..encoders.imagebind import (ImageBindAudioConfig,
                                      ImageBindAudioEncoder,
                                      from_imagebind_checkpoint)
    from ..features.audio import ImageBindAudioExtractor

    if random_init:
        cfg = ImageBindAudioConfig(embed_dim=32, num_blocks=2, num_heads=4,
                                   out_embed_dim=48)
        params = ImageBindAudioEncoder(cfg).init(
            jax.random.PRNGKey(0),
            np.zeros((1, cfg.num_mel_bins, cfg.target_len), np.float32)
        )["params"]
    else:
        import torch

        ckpt = path if path.endswith(".pth") else path + ".pth"
        sd = torch.load(ckpt, map_location="cpu", weights_only=True)
        cfg, params = from_imagebind_checkpoint(dict(sd))
    ex = ImageBindAudioExtractor(cfg, params)
    return _fra(ex), cfg.out_embed_dim
