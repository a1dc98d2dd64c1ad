"""End-to-end fine-tuning model: raw pretrained encoder + MLP head.

Reference (``MER2025/MER2025_Track23/toolkit/models/e2e_model.py:7-76``):
fine-tune a raw encoder end-to-end with the standard fusion contract
``(features, emos_out, vals_out, interloss)``. Pooling rules:

- text : sum of last-4 hidden states, attention-masked mean over tokens
- audio: (B, 8 segments, 32000 samples) -> flatten to (B*8) clips ->
  last-4-sum, time-mean, segment-mean
- video: CLIP image features frame-mean, or VideoMAE per-segment patch mean
  then segment mean

The backbone learns at 1/10 of the head lr in the reference's ``lr_adjust=
case2`` regime (``MERBench/main-release.py:204-213``) — expressed here as an
optax label tree (:func:`e2e_param_labels`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .modules import MLPEncoder


@dataclass(frozen=True)
class E2EConfig:
    modality: str            # audio | text | video_clip | video_mae
    feat_dim: int            # backbone output dim
    hidden_dim: int = 256
    dropout: float = 0.3
    output_dim1: int = 6
    output_dim2: int = 1
    # on-device preprocessing for compact uint8 video batches (videos_u8):
    image_size: int = 224
    pixel_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    pixel_std: tuple = (0.26862954, 0.26130258, 0.27577711)


def preprocess_video_u8(v, image_size: int, mean, std):
    """(B, T, h, w, 3) uint8 BGR -> (B, T, S, S, 3) normalized float32, fully
    inside jit (separable-matmul resize, ops/image.py — identical numerics to
    the jax.image.resize pipeline). Keeping video batches uint8 at source
    resolution cuts HBM by 16-32x vs precomputed float frames."""
    from ..ops.image import fused_face_preprocess

    B, T = v.shape[0], v.shape[1]
    x = fused_face_preprocess(v.reshape((B * T,) + v.shape[2:]),
                              image_size, mean, std)
    return x.reshape(B, T, image_size, image_size, 3)


class E2EModel(nn.Module):
    cfg: E2EConfig
    backbone: Any            # Flax encoder module (see pooling contract)

    def _video_batch(self, batch):
        c = self.cfg
        if "videos_u8" in batch:
            return preprocess_video_u8(batch["videos_u8"], c.image_size,
                                       c.pixel_mean, c.pixel_std)
        return batch["videos"]

    def _pool(self, batch):
        c = self.cfg
        if c.modality == "text":
            hs = self.backbone(batch["input_ids"],
                               batch.get("attention_mask"))
            x = sum(hs[-4:])                              # (B, S, D)
            m = batch["attention_mask"][..., None].astype(x.dtype)
            return (x * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        if c.modality == "audio":
            a = batch["audios"]                           # (B, seg, samples)
            B, seg, pts = a.shape
            hs = self.backbone(a.reshape(B * seg, pts), None)
            x = sum(hs[-4:]).mean(axis=1)                 # (B*seg, D)
            return x.reshape(B, seg, -1).mean(axis=1)
        if c.modality == "video_clip":
            v = self._video_batch(batch)                  # (B, T, H, W, 3)
            B, T = v.shape[0], v.shape[1]
            out = self.backbone(v.reshape((B * T,) + v.shape[2:]))
            emb = out["image_embeds"] if isinstance(out, dict) else out
            return emb.reshape(B, T, -1).mean(axis=1)
        if c.modality == "video_mae":
            tokens = self.backbone(self._video_batch(batch))
            vc = self.backbone.cfg
            n_seg = vc.num_frames // vc.tubelet_size
            patches = vc.grid * vc.grid
            return tokens.reshape(tokens.shape[0], n_seg, patches,
                                  -1).mean(axis=(1, 2))
        raise ValueError(c.modality)

    @nn.compact
    def __call__(self, batch, train: bool = False):
        c = self.cfg
        feats = self._pool(batch)
        h = MLPEncoder(c.hidden_dim, c.dropout, name="encoder")(
            feats, train=train)
        from .modules import SimpleClassifierHeads

        emos, vals = SimpleClassifierHeads(c.output_dim1, c.output_dim2,
                                           name="heads")(h)
        return h, emos, vals, jnp.asarray(0.0)


def e2e_param_labels(params: dict) -> dict:
    """'head' for encoder/fc_out params, 'backbone' otherwise — drives the
    reference's 1/10-backbone-lr optimizer split via optax.multi_transform."""

    def label(path, _):
        names = [getattr(k, "key", str(k)) for k in path]
        head = names and names[0] in ("encoder", "heads")
        return "head" if head else "backbone"

    return jax.tree_util.tree_map_with_path(label, params)


class VideoMAEPretrain(nn.Module):
    """Masked video pretraining (``videomae_pretrain.py:10-37`` /
    VideoMAEForPreTraining): tube-mask a fraction of tokens, reconstruct
    normalized patch pixels with a small decoder, MSE on masked tokens.

    Returns the fusion contract with interloss = reconstruction loss so the
    CV trainer drives it unchanged.
    """
    backbone: Any            # ViTEncoder with a videomae config
    decoder_dim: int = 192
    decoder_layers: int = 2
    decoder_heads: int = 4
    mask_ratio: float = 0.9
    output_dim1: int = 0     # optional joint heads so the CV driver's
    output_dim2: int = 0     # metric machinery stays live during pretraining
    # compact-u8 normalization: MUST match the float build_video default
    # (CLIP stats) so compact and precomputed layouts train identically
    pixel_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    pixel_std: tuple = (0.26862954, 0.26130258, 0.27577711)

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from ..encoders.vit import ViTConfig, _Block

        vc = self.backbone.cfg
        if "videos_u8" in batch:                         # compact uint8 path
            videos = preprocess_video_u8(batch["videos_u8"], vc.image_size,
                                         self.pixel_mean, self.pixel_std)
        else:
            videos = batch["videos"]                     # (B, T, H, W, 3)
        B = videos.shape[0]
        tokens = self.backbone(videos)                   # (B, N, D)
        N = tokens.shape[1]

        # deterministic tube mask per sample (seeded by batch['mask_seed'])
        n_mask = int(N * self.mask_ratio)
        seed = batch.get("mask_seed", 0)
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        scores = jax.random.uniform(key, (B, N))
        ranks = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
        mask = ranks < n_mask                            # n_mask True per row

        dec_cfg = ViTConfig(hidden_size=self.decoder_dim,
                            num_layers=self.decoder_layers,
                            num_heads=self.decoder_heads,
                            intermediate_size=self.decoder_dim * 4,
                            use_cls_token=False, pos_embed="none",
                            final_layernorm=True)
        x = nn.Dense(self.decoder_dim, name="dec_in")(tokens)
        mtok = self.param("mask_token", nn.initializers.normal(0.02),
                          (self.decoder_dim,))
        x = jnp.where(mask[..., None], mtok, x)
        pe = self.param("dec_pos", nn.initializers.normal(0.02),
                        (N, self.decoder_dim))
        x = x + pe[None]
        for i in range(self.decoder_layers):
            x = _Block(dec_cfg, name=f"dec_block_{i}")(x)
        x = nn.LayerNorm(name="dec_norm")(x)

        patch_dim = vc.tubelet_size * vc.patch_size * vc.patch_size * 3
        pred = nn.Dense(patch_dim, name="dec_out")(x)    # (B, N, patch_dim)

        # target: per-patch normalized pixels (VideoMAE norm_pix_loss)
        tgt = _patchify(videos, vc)
        mu = tgt.mean(-1, keepdims=True)
        sd = tgt.std(-1, keepdims=True) + 1e-6
        tgt = (tgt - mu) / sd
        err = ((pred - tgt) ** 2).mean(-1)
        loss = (err * mask).sum() / jnp.maximum(mask.sum(), 1)

        feats = tokens.mean(axis=1)
        from .modules import SimpleClassifierHeads

        emos, vals = SimpleClassifierHeads(self.output_dim1,
                                           self.output_dim2,
                                           name="heads")(feats)
        return feats, emos, vals, loss


def _patchify(videos, vc):
    """(B, T, H, W, 3) -> (B, N, tubelet*p*p*3) in tubelet-major order
    matching the 3D conv token order."""
    B, T, H, W, _ = videos.shape
    p, tb = vc.patch_size, vc.tubelet_size
    x = videos.astype(jnp.float32).reshape(
        B, T // tb, tb, H // p, p, W // p, p, 3)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, (T // tb) * (H // p) * (W // p), tb * p * p * 3)


# ---------------------------------------------------------------------------
# driver integration (reference Track23 toolkit/models/__init__.py:21-61
# routes model='e2e_model' through load_e2e_pretrain_model)
# ---------------------------------------------------------------------------
def e2e_modality(e2e_name: str) -> str:
    from ..core import globals_mer as G

    if e2e_name in G.WHOLE_AUDIO or "tiny-audio" in e2e_name:
        return "audio"
    if e2e_name in G.WHOLE_TEXT or "tiny-text" in e2e_name:
        return "text"
    if e2e_name in G.WHOLE_IMAGE or "tiny-video" in e2e_name:
        return "video_clip"
    raise ValueError(f"unknown e2e_name {e2e_name!r}")


def build_e2e_model(args):
    """args.e2e_name -> (E2EModel, pretrained backbone params or None)."""
    import os

    name = args.e2e_name
    modality = e2e_modality(name)
    pretrain = args.get("pretrain_dir") if hasattr(args, "get") else None
    path = os.path.join(pretrain, name) if pretrain else name
    backbone_params = None

    if modality == "audio":
        from ..encoders.wav2vec2 import (Wav2Vec2Config, Wav2Vec2Encoder,
                                         from_hf_torch)

        if "tiny" in name:
            bcfg = Wav2Vec2Config(hidden_size=16, num_hidden_layers=4,
                                  num_attention_heads=2, intermediate_size=32,
                                  conv_dim=(8, 8), conv_kernel=(10, 3),
                                  conv_stride=(5, 2),
                                  num_conv_pos_embeddings=16,
                                  num_conv_pos_embedding_groups=2)
        else:
            from transformers import AutoModel

            bcfg, backbone_params = from_hf_torch(AutoModel.from_pretrained(path))
        backbone = Wav2Vec2Encoder(bcfg)
        feat_dim = bcfg.hidden_size
    elif modality == "text":
        from ..encoders.bert import BertConfig, BertEncoder, from_hf_torch

        if "tiny" in name:
            bcfg = BertConfig(vocab_size=64, hidden_size=16,
                              num_hidden_layers=4, num_attention_heads=2,
                              intermediate_size=32,
                              max_position_embeddings=64)
        else:
            from transformers import AutoModel

            bcfg, backbone_params = from_hf_torch(AutoModel.from_pretrained(path))
        backbone = BertEncoder(bcfg)
        feat_dim = bcfg.hidden_size
    else:
        from ..encoders.vit_clip import (CLIPVisionConfig, CLIPVisionEncoder,
                                         from_hf_torch)

        if "tiny" in name:
            bcfg = CLIPVisionConfig(hidden_size=16, num_hidden_layers=2,
                                    num_attention_heads=2,
                                    intermediate_size=32, image_size=32,
                                    patch_size=16, projection_dim=12)
        else:
            from transformers import CLIPVisionModelWithProjection

            bcfg, backbone_params = from_hf_torch(
                CLIPVisionModelWithProjection.from_pretrained(path))
        backbone = _CLIPEmbedWrapper(CLIPVisionEncoder(bcfg))
        feat_dim = bcfg.projection_dim

    cfg = E2EConfig(
        modality=modality, feat_dim=feat_dim,
        hidden_dim=args.get("hidden_dim") or 128,
        dropout=args.get("dropout") if args.get("dropout") is not None else 0.3,
        output_dim1=args.get("output_dim1") or 6,
        output_dim2=args.get("output_dim2")
        if args.get("output_dim2") is not None else 1,
        image_size=getattr(bcfg, "image_size", 224))
    return E2EModel(cfg, backbone), backbone_params


class _CLIPEmbedWrapper(nn.Module):
    inner: Any

    @nn.compact
    def __call__(self, pixels):
        return self.inner(pixels)["image_embeds"]


class _E2EFactory:
    """Registry shim: get_model(args) -> configured E2EModel."""

    @classmethod
    def from_args(cls, args):
        model, backbone_params = build_e2e_model(args)
        # pretrained backbone params are merged by the trainer after init
        # (train/loop.py e2e branch); stash them on args for pickup
        args["_e2e_backbone_params"] = backbone_params
        return model


from ..core.registry import registry  # noqa: E402

registry.register_model("e2e_model")(_E2EFactory)


class _VideoMAEPretrainFactory:
    """Registry shim for model='videomae_pretrain' (videomae_pretrain.py):
    masked-video pretraining driven by the same CV loop."""

    @classmethod
    def from_args(cls, args):
        from ..encoders.vit import ViTEncoder, videomae_config

        name = args.e2e_name or ""
        pretrain = args.get("pretrain_dir")
        if "tiny" in name or not name:
            vcfg = videomae_config(hidden_size=24, num_layers=1, num_heads=2,
                                   intermediate_size=48, image_size=32,
                                   patch_size=16, num_frames=4,
                                   tubelet_size=2)
            args["_e2e_backbone_params"] = None
        else:
            import os

            from transformers import VideoMAEModel

            from ..encoders.vit import from_hf_videomae

            path = os.path.join(pretrain, name) if pretrain else name
            vcfg, bp = from_hf_videomae(VideoMAEModel.from_pretrained(path))
            args["_e2e_backbone_params"] = bp
        return VideoMAEPretrain(
            ViTEncoder(vcfg),
            mask_ratio=float(args.get("mae_mask_ratio") or 0.9),
            output_dim1=args.get("output_dim1") or 0,
            output_dim2=args.get("output_dim2") or 0)


registry.register_model("videomae_pretrain")(_VideoMAEPretrainFactory)
