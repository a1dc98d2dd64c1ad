"""ImageBind audio branch: kaldi-fbank numerics, clip sampling, bias-kv
attention parity vs torch, converter naming, extraction pipeline.

Reference semantics: MER2025_Track23 my_affectgpt/models/ImageBind/data.py
(waveform2melspec / load_audio) and models/imagebind_model.py (audio trunk,
get_audio_feature)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.encoders.imagebind import (ImageBindAudioConfig,
                                             ImageBindAudioEncoder,
                                             convert_torch_state)
from mertools_tpu.ops import fbank as F


# --------------------------------------------------------------- numpy oracle


def _np_kaldi_fbank(wav, num_mel_bins=128):
    """Independent loop-based implementation of torchaudio.compliance.kaldi
    fbank(htk_compat=True, window='hanning', dither=0, frame 25ms/10ms,
    use_energy=False) for the test oracle."""
    n = len(wav)
    m = 1 + (n - 400) // 160
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(400) / 399.0)
    # mel banks
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    lo, hi = mel(20.0), mel(8000.0)
    delta = (hi - lo) / (num_mel_bins + 1)
    banks = np.zeros((num_mel_bins, 257))
    for b in range(num_mel_bins):
        l, c, r = lo + b * delta, lo + (b + 1) * delta, lo + (b + 2) * delta
        for i in range(256):
            fm = mel(16000.0 / 512 * i)
            banks[b, i] = max(0.0, min((fm - l) / (c - l), (r - fm) / (r - c)))
    out = np.zeros((m, num_mel_bins))
    for t in range(m):
        fr = wav[t * 160: t * 160 + 400].astype(np.float64).copy()
        fr -= fr.mean()
        pre = np.concatenate([[fr[0]], fr[:-1]])
        fr = fr - 0.97 * pre
        fr = fr * win
        spec = np.fft.rfft(fr, n=512)
        power = np.abs(spec) ** 2
        out[t] = np.log(np.maximum(power @ banks.T,
                                   np.finfo(np.float32).eps))
    return out


def test_kaldi_fbank_matches_oracle(rng):
    wav = rng.normal(size=8000).astype(np.float32) * 0.1
    ours = np.asarray(F.kaldi_fbank(jnp.asarray(wav[None]), 40))[0]
    ref = _np_kaldi_fbank(wav, 40)
    assert ours.shape == ref.shape == (48, 40)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_kaldi_fbank_tone_peak():
    t = np.arange(32000) / 16000.0
    wav = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    fb = np.asarray(F.kaldi_fbank(jnp.asarray(wav[None]), 128))[0]
    peak_bin = fb.mean(0).argmax()
    # 1 kHz on the kaldi mel grid (20..8000 Hz, 128 bins)
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    expect = (mel(1000.0) - mel(20.0)) / ((mel(8000.0) - mel(20.0)) / 129) - 1
    assert abs(peak_bin - expect) <= 2


def test_clip_sampler_reference_semantics():
    # duration > 2 s: 8 uniformly spaced starts across duration-2
    tps = F.constant_clip_timepoints(6.0)
    starts = [s for s, _ in tps]
    np.testing.assert_allclose(starts, np.arange(8) * 4.0 / 7.0)
    assert all(abs((e - s) - 2.0) < 1e-9 for s, e in tps)
    # short audio is padded to exactly 2 s -> all clips identical
    wav = np.ones(10000, np.float32)
    clips = F.sample_audio_clips(wav)
    assert clips.shape == (8, 32000)
    assert (clips == clips[0]).all()
    assert clips[0, :10000].sum() == 10000 and clips[0, 10000:].sum() == 0


def test_imagebind_melspec_shape_and_padding(rng):
    clips = rng.normal(size=(3, 32000)).astype(np.float32) * 0.05
    mels = np.asarray(F.imagebind_melspec(jnp.asarray(clips)))
    assert mels.shape == (3, 128, 204)
    # 2 s @ 16 kHz -> 198 frames; the last 6 are padded zeros -> (0-mean)/std
    pad = (0.0 - (-4.268)) / 9.138
    np.testing.assert_allclose(mels[:, :, 198:], pad, atol=1e-6)
    assert not np.allclose(mels[:, :, :198], pad)


# ------------------------------------------------------------------- encoder


def _tiny_cfg():
    return ImageBindAudioConfig(embed_dim=16, num_blocks=2, num_heads=4,
                                out_embed_dim=24, num_mel_bins=36,
                                target_len=46)


def test_bias_kv_attention_torch_parity(rng):
    import torch

    from mertools_tpu.encoders.imagebind import _BiasKVAttention

    cfg = _tiny_cfg()
    H = cfg.embed_dim
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(H, cfg.num_heads, bias=True,
                                      add_bias_kv=True,
                                      batch_first=False).eval()
    x = rng.normal(size=(2, 5, H)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x).transpose(0, 1)  # (L, B, H)
        ref, _ = mha(xt, xt, xt)
        ref = ref.transpose(0, 1).numpy()

    sd = {f"blk.attn.{k}": v for k, v in mha.state_dict().items()}
    w = sd["blk.attn.in_proj_weight"].numpy()
    b = sd["blk.attn.in_proj_bias"].numpy()
    params = {
        "q": {"kernel": w[:H].T, "bias": b[:H]},
        "k": {"kernel": w[H:2 * H].T, "bias": b[H:2 * H]},
        "v": {"kernel": w[2 * H:].T, "bias": b[2 * H:]},
        "bias_k": sd["blk.attn.bias_k"].numpy().reshape(-1),
        "bias_v": sd["blk.attn.bias_v"].numpy().reshape(-1),
        "out_proj": {"kernel": sd["blk.attn.out_proj.weight"].numpy().T,
                     "bias": sd["blk.attn.out_proj.bias"].numpy()},
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    out = np.asarray(_BiasKVAttention(cfg).apply({"params": params},
                                                 jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def _fake_checkpoint(cfg, rng):
    """numpy state dict with the imagebind_huge audio-subtree naming."""
    H, M = cfg.embed_dim, cfg.mlp_ratio * cfg.embed_dim
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05
    sd = {
        "modality_preprocessors.audio.rgbt_stem.proj.weight":
            r(H, 1, cfg.kernel_size, cfg.kernel_size),
        "modality_preprocessors.audio.rgbt_stem.norm_layer.weight": 1 + r(H),
        "modality_preprocessors.audio.rgbt_stem.norm_layer.bias": r(H),
        "modality_preprocessors.audio.cls_token": r(1, 1, H),
        "modality_preprocessors.audio.pos_embedding_helper.pos_embed":
            r(1, cfg.num_patches + 1, H),
        "modality_heads.audio.0.weight": 1 + r(H),
        "modality_heads.audio.0.bias": r(H),
        "modality_heads.audio.2.weight": r(cfg.out_embed_dim, H),
    }
    for i in range(cfg.num_blocks):
        bp = f"modality_trunks.audio.blocks.{i}"
        sd.update({
            f"{bp}.attn.in_proj_weight": r(3 * H, H),
            f"{bp}.attn.in_proj_bias": r(3 * H),
            f"{bp}.attn.bias_k": r(1, 1, H),
            f"{bp}.attn.bias_v": r(1, 1, H),
            f"{bp}.attn.out_proj.weight": r(H, H),
            f"{bp}.attn.out_proj.bias": r(H),
            f"{bp}.norm_1.weight": 1 + r(H), f"{bp}.norm_1.bias": r(H),
            f"{bp}.norm_2.weight": 1 + r(H), f"{bp}.norm_2.bias": r(H),
            f"{bp}.mlp.fc1.weight": r(M, H), f"{bp}.mlp.fc1.bias": r(M),
            f"{bp}.mlp.fc2.weight": r(H, M), f"{bp}.mlp.fc2.bias": r(H),
        })
    return sd


def test_converter_and_forward(rng):
    cfg = _tiny_cfg()
    params = convert_torch_state(cfg, _fake_checkpoint(cfg, rng))
    model = ImageBindAudioEncoder(cfg)
    # converted params must match the module's own structure exactly
    ref = model.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, cfg.num_mel_bins, cfg.target_len)))["params"]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    mels = rng.normal(size=(3, cfg.num_mel_bins, cfg.target_len)
                      ).astype(np.float32)
    out = model.apply({"params": params}, jnp.asarray(mels))
    emb = np.asarray(out["embed"])
    assert emb.shape == (3, cfg.out_embed_dim)
    # postprocessor: L2-normalized x logit_scale
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1),
                               cfg.logit_scale, rtol=1e-5)
    assert np.asarray(out["feature"]).shape == (3, cfg.embed_dim)


def test_extractor_pipeline(rng):
    from mertools_tpu.features.audio import ImageBindAudioExtractor

    cfg = _tiny_cfg()
    model = ImageBindAudioEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.num_mel_bins, cfg.target_len))
                        )["params"]
    ex = ImageBindAudioExtractor(cfg, params, batch_clips=2)
    wavs = {"a": rng.normal(size=50000).astype(np.float32) * 0.1,
            "b": rng.normal(size=12000).astype(np.float32) * 0.1,
            "c": rng.normal(size=90000).astype(np.float32) * 0.1}
    fra = ex.extract(wavs, level="FRA")
    assert fra["a"].shape == (8, cfg.out_embed_dim)
    utt = ex.extract(wavs, level="UTT")
    np.testing.assert_allclose(utt["c"], fra["c"].mean(0), rtol=1e-4,
                               atol=1e-5)
    # short audio (<2 s): every clip identical -> FRA rows all equal
    np.testing.assert_allclose(fra["b"][0], fra["b"][7], rtol=1e-5,
                               atol=1e-6)


# ----------------------------------------------------- full-model torch oracle


def _build_torch_imagebind(cfg, seed=0):
    """Reduced-size torch re-implementation of the ORIGINAL ImageBind audio
    pipeline (facebookresearch/ImageBind imagebind_model.py: PatchEmbedGeneric
    -> SimpleTransformer BlockWithMasking(nn.MultiheadAttention
    add_bias_kv=True) -> Sequential(LayerNorm, SelectElement(0), Linear)
    head -> Normalize x logit_scale), with the CHECKPOINT's exact state-dict
    naming so the converter path is what gets tested (VERDICT Next #9)."""
    import torch
    import torch.nn as nn

    D, NH = cfg.embed_dim, cfg.num_heads

    class Stem(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Conv2d(1, D, cfg.kernel_size, cfg.stride,
                                  bias=False)
            self.norm_layer = nn.LayerNorm(D, eps=1e-6)

    class PosHelper(nn.Module):
        def __init__(self):
            super().__init__()
            self.pos_embed = nn.Parameter(
                torch.randn(1, cfg.num_patches + 1, D) * 0.02)

    class Pre(nn.Module):
        def __init__(self):
            super().__init__()
            self.rgbt_stem = Stem()
            self.cls_token = nn.Parameter(torch.zeros(1, 1, D))
            self.pos_embedding_helper = PosHelper()

    class Mlp(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(D, D * cfg.mlp_ratio)
            self.fc2 = nn.Linear(D * cfg.mlp_ratio, D)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = nn.MultiheadAttention(D, NH, add_bias_kv=True)
            self.norm_1 = nn.LayerNorm(D, eps=cfg.layer_norm_eps)
            self.norm_2 = nn.LayerNorm(D, eps=cfg.layer_norm_eps)
            self.mlp = Mlp()

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = nn.ModuleList(
                [Block() for _ in range(cfg.num_blocks)])

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(seed)
            self.modality_preprocessors = nn.ModuleDict({"audio": Pre()})
            self.modality_trunks = nn.ModuleDict({"audio": Trunk()})
            self.modality_heads = nn.ModuleDict({"audio": nn.Sequential(
                nn.LayerNorm(D, eps=1e-6), nn.Identity(),
                nn.Linear(D, cfg.out_embed_dim, bias=False))})
            with torch.no_grad():   # non-degenerate cls/pos/biases
                self.modality_preprocessors["audio"].cls_token.normal_(0, .02)
                for b in self.modality_trunks["audio"].blocks:
                    b.attn.bias_k.normal_(0, 0.02)
                    b.attn.bias_v.normal_(0, 0.02)

        def forward(self, mels):
            import torch.nn.functional as TF

            pre = self.modality_preprocessors["audio"]
            x = pre.rgbt_stem.proj(mels[:, None])          # (B, D, gm, gt)
            x = x.flatten(2).transpose(1, 2)               # (B, N, D)
            x = pre.rgbt_stem.norm_layer(x)
            B = x.shape[0]
            cls = pre.cls_token.expand(B, -1, -1)
            x = torch.cat([cls, x], dim=1)
            x = x + pre.pos_embedding_helper.pos_embed
            for blk in self.modality_trunks["audio"].blocks:
                h = blk.norm_1(x).transpose(0, 1)          # (L, B, D)
                a, _ = blk.attn(h, h, h, need_weights=False)
                x = x + a.transpose(0, 1)
                h = blk.norm_2(x)
                x = x + blk.mlp.fc2(TF.gelu(blk.mlp.fc1(h)))
            head = self.modality_heads["audio"]
            x = head[0](x)
            feat = x[:, 0]
            emb = head[2](feat)
            return TF.normalize(emb, dim=-1) * cfg.logit_scale, feat

    return Model().eval()


def test_full_model_torch_oracle(rng):
    """Converted checkpoint -> our encoder == the original-architecture
    torch pipeline end-to-end (trunk + head + normalize x logit_scale)."""
    import torch

    cfg = _tiny_cfg()
    model_t = _build_torch_imagebind(cfg)
    params = convert_torch_state(cfg, model_t.state_dict())
    model_j = ImageBindAudioEncoder(cfg)

    mels = rng.normal(size=(3, cfg.num_mel_bins, cfg.target_len)
                      ).astype(np.float32)
    with torch.no_grad():
        ref_emb, ref_feat = model_t(torch.tensor(mels))
    out = model_j.apply({"params": params}, jnp.asarray(mels))
    np.testing.assert_allclose(np.asarray(out["feature"]),
                               ref_feat.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["embed"]),
                               ref_emb.numpy(), atol=2e-4)


def test_full_pipeline_with_clip_sampler_torch_oracle(rng):
    """wav -> fbank mel images -> 2 s clip sampler -> trunk -> per-clip
    embeds: our extractor vs the torch oracle fed OUR mel clips (fbank has
    its own independent numpy oracle above; data.py:120-240 composition)."""
    import torch

    from mertools_tpu.features.audio import ImageBindAudioExtractor

    cfg = _tiny_cfg()
    model_t = _build_torch_imagebind(cfg)
    params = convert_torch_state(cfg, model_t.state_dict())

    ex = ImageBindAudioExtractor(cfg, params, batch_clips=4)
    wav = rng.normal(size=50000).astype(np.float32) * 0.1
    fra = ex.extract({"w": wav}, level="FRA")["w"]       # (8, out)

    clips = F.sample_audio_clips(wav)                    # reference sampler
    mels = np.asarray(F.imagebind_melspec(
        jnp.asarray(clips), cfg.num_mel_bins, cfg.target_len))
    with torch.no_grad():
        ref, _ = model_t(torch.tensor(mels))
    np.testing.assert_allclose(fra, ref.numpy(), atol=3e-4)
