"""VGGish + wav2vec-1.0 encoders: frontend math, shapes, torch converter
parity for the VGG stack (oracle built in-test with torchvggish naming)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.encoders import audio_zoo as Z


def test_vggish_patch_shapes(rng):
    wav = rng.normal(size=(2, 32000)).astype(np.float32)  # 2 s
    patches = np.asarray(Z.vggish_log_mel_patches(jnp.asarray(wav)))
    assert patches.shape == (2, 2, 96, 64)  # two 0.96 s patches
    short = rng.normal(size=(1, 8000)).astype(np.float32)  # 0.5 s
    p2 = np.asarray(Z.vggish_log_mel_patches(jnp.asarray(short)))
    assert p2.shape == (1, 1, 96, 64)  # padded to one patch


def test_vggish_mel_matrix_bands():
    m = Z.vggish_mel_matrix()
    assert m.shape == (257, 64)
    assert (m >= 0).all()
    freqs = np.linspace(0, 8000, 257)
    active = m.sum(1) > 0
    assert freqs[active].min() >= 100 and freqs[active].max() <= 7600


def test_vggish_torch_parity(rng):
    import torch
    import torch.nn as nn

    class TorchVGGish(nn.Module):
        """torchvggish module layout (features Sequential + embeddings)."""

        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(1, 64, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
                nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
                nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(),
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
                nn.Conv2d(256, 512, 3, padding=1), nn.ReLU(),
                nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2))
            self.embeddings = nn.Sequential(
                nn.Linear(512 * 24, 4096), nn.ReLU(),
                nn.Linear(4096, 4096), nn.ReLU(),
                nn.Linear(4096, 128), nn.ReLU())
            # remap names to match torchvggish indices (relu/pool unnamed)

        def forward(self, x):
            x = self.features(x)
            x = x.permute(0, 2, 3, 1).contiguous()  # torchvggish transpose
            x = x.reshape(x.shape[0], -1)
            return self.embeddings(x)

    torch.manual_seed(0)
    model = TorchVGGish().eval()
    # rename Sequential indices to torchvggish convention
    sd = {}
    conv_idx = [0, 3, 6, 8, 11, 13]
    seq_idx = [0, 3, 6, 8, 11, 13]
    for tgt, src in zip(conv_idx, seq_idx):
        sd[f"features.{tgt}.weight"] = model.features[src].weight
        sd[f"features.{tgt}.bias"] = model.features[src].bias
    for tgt, src in zip([0, 2, 4], [0, 2, 4]):
        sd[f"embeddings.{tgt}.weight"] = model.embeddings[src].weight
        sd[f"embeddings.{tgt}.bias"] = model.embeddings[src].bias

    params = Z.vggish_from_torch(sd)
    x = rng.normal(size=(2, 96, 64)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)[:, None]).numpy()
    out = np.asarray(Z.VGGish().apply({"params": params}, jnp.asarray(x)))
    # NCHW-flatten order differs between torchvggish (permute 0,2,3,1) and
    # our NHWC reshape: torchvggish permutes to NHWC before flatten, so
    # orders MATCH only if our transpose mirrors it.
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_wav2vec1_shapes(rng):
    cfg = Z.Wav2Vec1Config(
        enc_layers=((16, 10, 5), (16, 8, 4)),
        ctx_layers=((16, 3), (16, 3)))
    model = Z.Wav2Vec1(cfg)
    wav = rng.normal(size=(2, 4000)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), wav)["params"]
    out = model.apply({"params": params}, wav)
    assert out["z"].shape == out["c"].shape
    assert out["z"].shape[-1] == 16
    assert np.isfinite(np.asarray(out["c"])).all()
    # z is log-compressed: nonnegative
    assert (np.asarray(out["z"]) >= 0).all()


def test_wav2vec1_masked_norm_pad_invariance(rng):
    """Right-padded batched execution must bit-match per-clip execution:
    the fairseq instance norms span the whole time axis, so the masked
    moments + post-relu pad zeroing must reproduce unpadded statistics."""
    import jax
    import jax.numpy as jnp

    from mertools_tpu.encoders.audio_zoo import (Wav2Vec1, Wav2Vec1Config,
                                                 w2v1_out_lengths)

    cfg = Wav2Vec1Config(enc_layers=((16, 10, 5), (16, 8, 4)),
                         ctx_layers=((16, 3), (16, 3)))
    model = Wav2Vec1(cfg)
    wavs = [rng.normal(size=(n,)).astype(np.float32) for n in (3000, 4096)]
    params = model.init(jax.random.PRNGKey(0), wavs[0][None])["params"]

    T = 4096
    batch = np.zeros((2, T), np.float32)
    lens = np.array([3000, 4096], np.int32)
    for r, w in enumerate(wavs):
        batch[r, : len(w)] = w
    out = model.apply({"params": params}, jnp.asarray(batch),
                      jnp.asarray(lens))
    out_lens = w2v1_out_lengths(lens, cfg)
    for r, w in enumerate(wavs):
        ref = model.apply({"params": params}, jnp.asarray(w[None]))
        for key in ("z", "c"):
            got = np.asarray(out[key][r, : out_lens[r]])
            want = np.asarray(ref[key][0])
            assert got.shape == want.shape, (key, got.shape, want.shape)
            np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_vggish_extractor_trims_to_true_patches(rng):
    """Bucketed batching: per-clip patch counts derive from the TRUE wav
    length and the kept patches match unpadded execution."""
    import jax

    from mertools_tpu.encoders.audio_zoo import VGGish, vggish_extract
    from mertools_tpu.features.audio import VGGishExtractor

    params = VGGish().init(jax.random.PRNGKey(0),
                           np.zeros((1, 96, 64), np.float32))["params"]
    wavs = {"a": rng.normal(size=(16000,)).astype(np.float32),
            "b": rng.normal(size=(31000,)).astype(np.float32)}
    ex = VGGishExtractor(params, buckets=(32000,))
    feats = ex.extract(wavs, level="FRA")
    assert feats["a"].shape == (1, 128)   # 0.96 s patches at 16 kHz
    assert feats["b"].shape == (2, 128)
    ref = np.asarray(vggish_extract(params, wavs["a"][None]))[0]
    np.testing.assert_allclose(feats["a"], ref[:1], atol=2e-5, rtol=1e-4)
    utt = ex.extract(wavs, level="UTTERANCE")
    assert utt["b"].shape == (128,)
    np.testing.assert_allclose(utt["b"], feats["b"].mean(0), rtol=1e-6)


def test_extract_audio_cli_vggish_and_wav2vec1(tmp_path, rng):
    """CLI dispatch: vggish single store; wav2vec-1.0 z/c dual stores."""
    import struct

    from mertools_tpu.cli.extract_audio import main

    audio = tmp_path / "audio"
    audio.mkdir()

    def write_wav(path, wav, sr=16000):
        pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2,
                                          2, 16))
            f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)

    for n in ("c0", "c1"):
        write_wav(str(audio / f"{n}.wav"),
                  rng.normal(size=(18000,)).astype(np.float32) * 0.1)

    main(["--model_name=vggish", "--random_init",
          f"--audio_dir={audio}", f"--save_dir={tmp_path}/f",
          "--feature_level=UTTERANCE"])
    a = np.load(tmp_path / "f" / "vggish-UTT" / "c0.npy")
    assert a.shape == (128,)

    main(["--model_name=wav2vec-large", "--random_init",
          f"--audio_dir={audio}", f"--save_dir={tmp_path}/f",
          "--feature_level=FRAME"])
    z = np.load(tmp_path / "f" / "wav2vec-large-z-FRA" / "c0.npy")
    c = np.load(tmp_path / "f" / "wav2vec-large-c-FRA" / "c0.npy")
    assert z.ndim == 2 and c.shape == z.shape
