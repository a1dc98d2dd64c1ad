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
