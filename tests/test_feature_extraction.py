"""Batched audio extraction parity vs the reference per-clip execution model
AND vs the actual torch pipeline."""

import math

import numpy as np
import torch

from mertools_tpu.features import audio as fa


def tiny_hubert():
    from transformers import HubertConfig, HubertModel

    cfg = HubertConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=48, conv_dim=(16, 16), conv_kernel=(10, 3),
        conv_stride=(5, 2), num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        feat_extract_norm="group", do_stable_layer_norm=False,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0)
    torch.manual_seed(0)
    return HubertModel(cfg).eval()


def torch_reference_pipeline(hf, wav, max_segment):
    """The reference's exact torch path (extract_audio_huggingface.py:93-108)."""
    w = torch.tensor(fa.normalize_wav(wav))[None]
    if w.shape[1] > max_segment:
        tgt = math.ceil(w.shape[1] / max_segment) * max_segment
        b = torch.zeros(1, tgt)
        b[:, : w.shape[1]] = w
        w = b.view(-1, max_segment)
    with torch.no_grad():
        hs = hf(w, output_hidden_states=True).hidden_states
    feat = torch.stack(hs)[[-4, -3, -2, -1]].sum(dim=0)
    return feat.reshape(-1, feat.shape[-1]).numpy()


def test_batched_extraction_matches_torch_reference():
    from mertools_tpu.encoders import wav2vec2 as w2v

    hf = tiny_hubert()
    cfg, params = w2v.from_hf_torch(hf)
    max_segment = 400  # tiny so multi-segment clips are exercised

    rng = np.random.default_rng(0)
    wavs = {f"clip{i}": rng.normal(size=int(L)).astype(np.float32)
            for i, L in enumerate([150, 290, 400, 555, 1333, 80])}

    ex = fa.AudioExtractor(cfg, params, max_segment=max_segment,
                           buckets=(128, 256, 400), sample_budget=1600)
    fra = ex.extract(wavs, level="FRA")
    utt = ex.extract(wavs, level="UTT")

    for name, wav in wavs.items():
        ref = torch_reference_pipeline(hf, wav, max_segment)
        assert fra[name].shape == ref.shape, (name, fra[name].shape, ref.shape)
        err = np.abs(fra[name] - ref).max()
        assert err < 1e-3, (name, err)  # the BASELINE parity contract
        np.testing.assert_allclose(utt[name], ref.mean(0), atol=1e-3)


def test_reference_single_clip_oracle_matches_torch():
    from mertools_tpu.encoders import wav2vec2 as w2v

    hf = tiny_hubert()
    cfg, params = w2v.from_hf_torch(hf)
    rng = np.random.default_rng(1)
    for L in (333, 950):
        wav = rng.normal(size=L).astype(np.float32)
        ours = fa.reference_single_clip(cfg, params, wav, max_segment=400)
        ref = torch_reference_pipeline(hf, wav, 400)
        assert np.abs(ours - ref).max() < 1e-3


def test_segmentize_rules():
    w = np.arange(10, dtype=np.float32)
    assert fa.segmentize(w, 16)[0][1] == 10  # short clip: exact length
    segs = fa.segmentize(np.arange(20, dtype=np.float32), 8)
    assert len(segs) == 3
    assert all(s[1] == 8 for s in segs)  # padded tail counts as valid
    assert segs[2][0][4:].sum() == 0  # zero padding


def test_int16_transfer_matches_f32_path():
    """transfer_dtype='int16' (PCM16 wire format, on-device normalization)
    matches the f32 path: bit-class-exact for int16 sources (the whole-clip
    normalization is scale-invariant), multi-segment padding rules intact."""
    from mertools_tpu.encoders import wav2vec2 as w2v

    hf = tiny_hubert()
    cfg, params = w2v.from_hf_torch(hf)
    max_segment = 400

    rng = np.random.default_rng(1)
    # PCM16 sources, incl. a multi-segment clip (1333 > 400)
    wavs16 = {f"c{i}": (rng.normal(size=int(L)) * 3000).astype(np.int16)
              for i, L in enumerate([150, 400, 555, 1333])}
    wavs_f = {n: w.astype(np.float32) / 32768.0 for n, w in wavs16.items()}

    kw = dict(max_segment=max_segment, buckets=(128, 256, 400),
              sample_budget=1600)
    ref = fa.AudioExtractor(cfg, params, **kw).extract(wavs_f, level="FRA")
    got = fa.AudioExtractor(cfg, params, transfer_dtype="int16",
                            **kw).extract(wavs16, level="FRA")
    for name in wavs16:
        assert got[name].shape == ref[name].shape
        err = np.abs(got[name] - ref[name]).max()
        assert err < 1e-4, (name, err)

    # f32 inputs round-trip through the int16 wire format within the
    # PCM16 noise floor
    got_f = fa.AudioExtractor(cfg, params, transfer_dtype="int16",
                              **kw).extract(wavs_f, level="UTT")
    ref_u = fa.AudioExtractor(cfg, params, **kw).extract(wavs_f, level="UTT")
    for name in wavs16:
        np.testing.assert_allclose(got_f[name], ref_u[name], atol=1e-3)
