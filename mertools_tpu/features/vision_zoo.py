"""Batched extraction pipelines for the full visual encoder zoo.

Reference per-model semantics (``MERBench/feature_extraction/visual/
extract_vision_huggingface.py:104-169`` and the ``extract_{manet,ferplus,
msceleb,imagenet,emonet}_embedding.py`` scripts):

- CLIP family      : per-frame ``get_image_features`` (features/vision.py)
- data2vec-vision  : per-frame last-hidden **sum over all tokens** (:124-133)
- DINOv2           : 64-frame uniform resample, token sum (:136-145)
- VideoMAE         : 16-frame resample -> per-tubelet-segment patch mean
                     (:147-159) -> (8, D) per clip
- MANet / ResNet-FER (ferplus/msceleb/imagenet): per-frame CNN embedding,
  model-specific torchvision transform stacks
- UTT level = temporal mean (:183-189)

All pipelines pool frames across clips into fixed-size device batches with
on-device preprocessing (resize/normalize inside jit), instead of the
reference's per-video python loops.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..encoders.resnet import MANet, ResNet, ResNetConfig
from ..encoders.vit import ViTConfig, ViTEncoder

IMAGENET_DEFAULT = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
IMAGENET_STANDARD = ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))


@dataclass(frozen=True)
class PreprocessSpec:
    """On-device uint8-BGR -> model-input preprocessing.

    resize_short + center_crop mirrors torchvision Resize(256)+CenterCrop(224)
    (extract_ferplus_embedding.py:69-75); otherwise direct resize to
    image_size (extract_manet_embedding.py:63-64 / HF processors).
    """
    image_size: int = 224
    mean: tuple = (0.0, 0.0, 0.0)
    std: tuple = (1.0, 1.0, 1.0)
    scale: float = 1.0 / 255.0       # uint8 -> [0,1]; FER mcn models use 1.0
    bgr_to_rgb: bool = True
    resize_short: int = 0            # >0: resize short side then center-crop
    method: str = "bicubic"


def preprocess_device(frames: jnp.ndarray, spec: PreprocessSpec) -> jnp.ndarray:
    """(N, H, W, 3) uint8 -> (N, S, S, 3) float32, fully on device
    (separable-matmul resize, affine folded; == the jax.image.resize
    pipeline — ops/image.py exactness tests)."""
    from ..ops.image import fused_face_preprocess

    return fused_face_preprocess(frames, spec.image_size, spec.mean,
                                 spec.std, scale=spec.scale,
                                 bgr_to_rgb=spec.bgr_to_rgb,
                                 resize_short=spec.resize_short,
                                 method=spec.method)


def resample_frames_uniform(n_frames: int, max_frames: int) -> np.ndarray:
    if n_frames <= max_frames:
        return np.arange(n_frames)
    step = n_frames / max_frames
    return np.minimum((np.arange(max_frames) * step).astype(np.int64),
                      n_frames - 1)


class FrameStreamExtractor:
    """Generic per-frame backend: frames of many clips stream through one
    jitted (preprocess -> encode) step in fixed-size batches.

    ``mesh``: optional jax.sharding.Mesh — params replicate, frame batches
    shard over the 'data' axis (multi-chip extraction, XLA collectives)."""

    def __init__(self, forward, params, spec: PreprocessSpec,
                 batch_size: int = 64, max_frames: int | None = None,
                 mesh=None, compute_dtype: str | None = None):
        self.spec = spec
        self.max_frames = max_frames
        if compute_dtype == "bf16":   # production mode (see features/audio)
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16), params)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            batch_size = -(-batch_size // n_data) * n_data
            self._params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)
            self._batch_sharding = NamedSharding(mesh, P("data", None, None,
                                                         None))
        else:
            self._params = jax.device_put(params)
            self._batch_sharding = None
        self.batch_size = batch_size
        cast = ((lambda x: x.astype(jnp.bfloat16))
                if compute_dtype == "bf16" else (lambda x: x))

        def core(p, frames):
            out = forward(p, cast(preprocess_device(frames, spec)))
            return out.astype(jnp.float32)

        # UTT: per-clip scatter-add fused into the forward dispatch (one
        # device call per batch; only the pooled (n_clips, D) ships)
        self._step = jax.jit(core)
        self._step_acc = jax.jit(
            lambda p, frames, acc, ids: acc.at[ids].add(core(p, frames)))

    def extract(self, faces: dict[str, np.ndarray], level: str = "FRA"
                ) -> dict[str, np.ndarray]:
        jobs, counts = [], {}
        for name, arr in faces.items():
            idx = (np.arange(len(arr)) if self.max_frames is None
                   else resample_frames_uniform(len(arr), self.max_frames))
            if len(idx) == 0:
                raise ValueError(f"clip {name!r} has no frames to pool "
                                 "(empty face array)")
            counts[name] = len(idx)
            for fi, ai in enumerate(idx):
                jobs.append((name, fi, arr[ai]))
        utt = level.upper().startswith("UTT")
        slot = {n: i for i, n in enumerate(faces)}
        scrap = len(faces)          # pad rows accumulate into a junk slot
        acc = None
        results = {n: {} for n in faces}
        bs = self.batch_size
        h, w = jobs[0][2].shape[:2]
        # dispatch-then-collect (overlap host->device copies with compute)
        pending = []
        for i in range(0, len(jobs), bs):
            group = jobs[i: i + bs]
            batch = np.zeros((bs, h, w, 3), np.uint8)
            for r, (_, _, frame) in enumerate(group):
                batch[r] = frame
            dev_batch = (jax.device_put(batch, self._batch_sharding)
                         if self._batch_sharding is not None
                         else jnp.asarray(batch))
            if utt:   # per-clip frame mean on device: ship (n_clips, D)
                ids = np.full((bs,), scrap, np.int32)
                for r, (name, _, _) in enumerate(group):
                    ids[r] = slot[name]
                if acc is None:
                    shp = jax.eval_shape(self._step, self._params,
                                         dev_batch).shape
                    acc = jnp.zeros((scrap + 1,) + shp[1:], jnp.float32)
                acc = self._step_acc(self._params, dev_batch, acc,
                                     jnp.asarray(ids))
            else:
                pending.append((group, self._step(self._params, dev_batch)))
        if utt:
            arr = np.asarray(acc)
            return {n: arr[slot[n]] / counts[n] for n in faces}
        for group, res in pending:
            emb = np.asarray(res)
            for r, (name, fi, _) in enumerate(group):
                results[name][fi] = emb[r]
        out = {}
        for name in faces:
            feat = np.stack([results[name][fi] for fi in range(counts[name])])
            out[name] = feat
        return out


def _prec(compute_dtype):
    return (jax.lax.Precision.DEFAULT if compute_dtype == "bf16"
            else jax.lax.Precision.HIGHEST)


# ----------------------------------------------------------------- backends


def vit_token_sum_extractor(cfg: ViTConfig, params, spec=None,
                            batch_size=64, max_frames=None,
                            compute_dtype=None):
    """data2vec-vision / DINOv2 / EVA-02: token-summed last hidden state
    per frame (extract_vision_huggingface.py:130-145). With ``cfg.tome_r``
    (Token Merging production mode) the sum is size-weighted so it
    approximates the original-token-count sum."""
    if spec is None:
        stats = IMAGENET_DEFAULT if cfg.arch == "dinov2" else IMAGENET_STANDARD
        spec = PreprocessSpec(image_size=cfg.image_size, mean=stats[0],
                              std=stats[1])
    enc = ViTEncoder(cfg, precision=_prec(compute_dtype))
    if max_frames is None and cfg.arch == "dinov2":
        max_frames = 64  # reference pre-samples 64 frames (:136)

    def forward(p, pix):
        out = enc.apply({"params": p}, pix)
        if cfg.tome_r > 0:
            tokens, sizes = out
            return jnp.einsum("bnd,bn->bd", tokens, sizes)
        return out.sum(axis=1)

    return FrameStreamExtractor(forward, params, spec, batch_size, max_frames,
                                compute_dtype=compute_dtype)


def eva_clip_g_token_mean_extractor(cfg: ViTConfig, params, ln_vision=None,
                                    batch_size=16, max_frames=64,
                                    compute_dtype=None):
    """EVA_CLIP_G_NO_QFORMER: ``ln_vision(visual_encoder(image)).mean(tokens)``
    (MER2025_Track23 my_affectgpt/models/encoder.py:160-174). ``ln_vision``
    is a plain LayerNorm over 1408 features — identity affine unless a BLIP-2
    Q-Former checkpoint provides weights (pass ``{"scale", "bias"}``).
    BLIP-2 preprocessing = OpenAI-CLIP normalization stats."""
    clip_stats = ((0.48145466, 0.4578275, 0.40821073),
                  (0.26862954, 0.26130258, 0.27577711))
    spec = PreprocessSpec(image_size=cfg.image_size, mean=clip_stats[0],
                          std=clip_stats[1])
    enc = ViTEncoder(cfg, precision=_prec(compute_dtype))

    def forward(p, pix):
        out = enc.apply({"params": p}, pix)
        tokens, sizes = out if cfg.tome_r > 0 else (out, None)
        mu = tokens.mean(-1, keepdims=True)
        var = jnp.square(tokens - mu).mean(-1, keepdims=True)
        normed = (tokens - mu) / jnp.sqrt(var + 1e-5)
        if ln_vision is not None:
            normed = normed * ln_vision["scale"] + ln_vision["bias"]
        if sizes is not None:   # ToMe: size-weighted token mean
            return (jnp.einsum("bnd,bn->bd", normed, sizes)
                    / sizes.sum(-1, keepdims=True))
        return normed.mean(axis=1)

    return FrameStreamExtractor(forward, params, spec, batch_size, max_frames,
                                compute_dtype=compute_dtype)


def siglip_token_mean_extractor(cfg, params, batch_size=32, max_frames=64,
                                compute_dtype=None):
    """SigLIP_SO: per-frame last-hidden-state **mean over tokens**
    (MER2025_Track23 my_affectgpt/models/encoder.py:269-281; the HF
    SiglipImageProcessor resizes to (S, S) and normalizes with 0.5/0.5)."""
    from ..encoders.siglip import SiglipVisionEncoder
    spec = PreprocessSpec(image_size=cfg.image_size,
                          mean=IMAGENET_STANDARD[0], std=IMAGENET_STANDARD[1])
    enc = SiglipVisionEncoder(cfg, precision=_prec(compute_dtype))

    def forward(p, pix):
        out = enc.apply({"params": p}, pix)
        if cfg.tome_r > 0:   # size-weighted token mean under Token Merging
            t, s = out["last_hidden"], out["sizes"]
            return jnp.einsum("bnd,bn->bd", t, s) / s.sum(-1, keepdims=True)
        return out["last_hidden"].mean(axis=1)

    return FrameStreamExtractor(forward, params, spec, batch_size, max_frames,
                                compute_dtype=compute_dtype)


def resnet_embed_extractor(cfg: ResNetConfig, params, spec: PreprocessSpec,
                           batch_size=64):
    enc = ResNet(cfg)

    def forward(p, pix):
        return enc.apply({"params": p}, pix)

    return FrameStreamExtractor(forward, params, spec, batch_size)


def manet_extractor(params, batch_size=32):
    """MANet RAF-DB embedding: Resize(224) + ToTensor only
    (extract_manet_embedding.py:63-64) -> 1024-d."""
    enc = MANet()
    spec = PreprocessSpec(image_size=224)

    def forward(p, pix):
        return enc.apply({"params": p}, pix)

    return FrameStreamExtractor(forward, params, spec, batch_size)


def ferplus_spec(mean, std=(1.0, 1.0, 1.0), image_size=224):
    """MatConvNet FER models: Resize(256)+CenterCrop, pixel scale 255,
    channel-mean subtraction (extract_ferplus_embedding.py:64-75)."""
    return PreprocessSpec(image_size=image_size, mean=tuple(mean),
                          std=tuple(std), scale=1.0, resize_short=256)


class VideoMAEExtractor:
    """Clip-level: 16-frame uniform resample -> tubelet tokens -> per-segment
    patch mean (B, T/tubelet, D) (extract_vision_huggingface.py:147-159)."""

    def __init__(self, cfg: ViTConfig, params, spec=None, batch_size=8,
                 compute_dtype: str | None = None):
        assert cfg.num_frames > 0
        self.cfg = cfg
        self.batch_size = batch_size
        self.spec = spec or PreprocessSpec(image_size=cfg.image_size,
                                           mean=IMAGENET_STANDARD[0],
                                           std=IMAGENET_STANDARD[1])
        enc = ViTEncoder(cfg, precision=_prec(compute_dtype))
        if compute_dtype == "bf16":
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16), params)
        cast = ((lambda x: x.astype(jnp.bfloat16))
                if compute_dtype == "bf16" else (lambda x: x))
        self._params = jax.device_put(params)
        n_seg = cfg.num_frames // cfg.tubelet_size
        patches = cfg.grid * cfg.grid

        @jax.jit
        def step(p, clips):  # (B, T, H, W, 3) uint8
            B, T = clips.shape[0], clips.shape[1]
            flat = clips.reshape((B * T,) + clips.shape[2:])
            pix = cast(preprocess_device(flat, self.spec))
            pix = pix.reshape(B, T, self.cfg.image_size, self.cfg.image_size, 3)
            tokens = enc.apply({"params": p}, pix)          # (B, n_seg*patches, D)
            tokens = tokens.reshape(B, n_seg, patches, -1)
            return tokens.mean(axis=2).astype(jnp.float32)   # (B, n_seg, D)

        self._step = step

    def extract(self, faces: dict[str, np.ndarray], level: str = "FRA"
                ) -> dict[str, np.ndarray]:
        names = list(faces)
        T = self.cfg.num_frames
        out = {}
        pending = []   # dispatch-then-collect (overlap copies with compute)
        for i in range(0, len(names), self.batch_size):
            group = names[i: i + self.batch_size]
            h, w = faces[group[0]].shape[1:3]
            batch = np.zeros((self.batch_size, T, h, w, 3), np.uint8)
            for r, name in enumerate(group):
                arr = faces[name]
                idx = resample_frames_uniform(len(arr), T)
                # short clips: repeat-pad to 16 frames like the reference's
                # resample (continuous index clamp)
                idx = np.resize(idx, T) if len(idx) < T else idx
                batch[r] = arr[idx]
            pending.append((group, self._step(self._params, jnp.asarray(batch))))
        for group, res in pending:
            segs = np.asarray(res)
            for r, name in enumerate(group):
                out[name] = (segs[r].mean(0)
                             if level.upper().startswith("UTT") else segs[r])
        return out
