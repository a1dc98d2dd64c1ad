"""emotion2vec (data2vec-2.0 audio) conversion + forward parity.

funasr is unavailable in this environment, so the oracle below re-creates
the published fairseq ``data2vec-multi`` audio module structure in torch —
with the exact state-dict key layout of the emotion2vec checkpoint
(``modality_encoders.AUDIO.local_encoder.conv_layers.N.{0,2.1}``,
``relative_positional_encoder.N.0``, ``context_encoder.blocks.M`` + main
``blocks.K`` with fused-qkv attention, final ``norm``) — on a tiny config,
and checks that :func:`convert_funasr_state` + the Flax forward reproduce
it to float32 precision.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from mertools_tpu.encoders import emotion2vec as e2v

TINY = e2v.Emotion2VecConfig(
    conv_layers=((24, 10, 5), (24, 3, 2), (24, 2, 2)),
    hidden_size=32, prenet_depth=2, depth=3, num_heads=4, mlp_ratio=2,
    conv_pos_depth=2, conv_pos_width=10, conv_pos_groups=4)


class TransposeLast(nn.Module):
    def forward(self, x):
        return x.transpose(-2, -1)


class SamePad(nn.Module):
    def __init__(self, k):
        super().__init__()
        self.remove = 1 if k % 2 == 0 else 0

    def forward(self, x):
        return x[:, :, : -self.remove] if self.remove else x


class Block(nn.Module):
    def __init__(self, H, nh, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(H)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(H, 3 * H)
        self.attn.proj = nn.Linear(H, H)
        self.norm2 = nn.LayerNorm(H)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(H, mlp_ratio * H)
        self.mlp.fc2 = nn.Linear(mlp_ratio * H, H)
        self.nh = nh

    def forward(self, x):
        B, T, H = x.shape
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(B, T, 3, self.nh, H // self.nh)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q * (H // self.nh) ** -0.5) @ k.transpose(-2, -1)
        o = (att.softmax(-1) @ v).transpose(1, 2).reshape(B, T, H)
        x = x + self.attn.proj(o)
        y = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(y)))


class Oracle(nn.Module):
    """data2vec-multi audio inference path, emotion2vec key layout."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        audio = nn.Module()
        convs = nn.ModuleList()
        in_d = 1
        for dim, k, s in cfg.conv_layers:
            seq = nn.Sequential(
                nn.Conv1d(in_d, dim, k, stride=s, bias=cfg.conv_bias),
                nn.Dropout(0.0),
                nn.Sequential(TransposeLast(), nn.LayerNorm(dim),
                              TransposeLast()),
                nn.GELU())
            convs.append(seq)
            in_d = dim
        audio.local_encoder = nn.Module()
        audio.local_encoder.conv_layers = convs
        audio.project_features = nn.Linear(in_d, cfg.hidden_size)
        k = max(3, cfg.conv_pos_width // cfg.conv_pos_depth)
        audio.relative_positional_encoder = nn.ModuleList([
            nn.Sequential(
                nn.Conv1d(cfg.hidden_size, cfg.hidden_size, k,
                          padding=k // 2, groups=cfg.conv_pos_groups),
                SamePad(k), TransposeLast(),
                nn.LayerNorm(cfg.hidden_size, elementwise_affine=False),
                TransposeLast(), nn.GELU())
            for _ in range(cfg.conv_pos_depth)])
        audio.context_encoder = nn.Module()
        audio.context_encoder.blocks = nn.ModuleList(
            [Block(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio)
             for _ in range(cfg.prenet_depth)])
        self.modality_encoders = nn.ModuleDict({"AUDIO": audio})
        self.blocks = nn.ModuleList(
            [Block(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio)
             for _ in range(cfg.depth)])
        self.norm = nn.LayerNorm(cfg.hidden_size)

    def forward(self, wav):
        # funasr: per-utterance layer_norm on the raw samples
        x = F.layer_norm(wav, wav.shape[1:])
        h = x.unsqueeze(1)
        audio = self.modality_encoders["AUDIO"]
        for seq in audio.local_encoder.conv_layers:
            h = seq(h)
        h = h.transpose(1, 2)                           # (B, T', C)
        h = audio.project_features(h)
        pos = h.transpose(1, 2)
        for seq in audio.relative_positional_encoder:
            pos = seq[0](pos)
            pos = seq[1](pos)
            pos = seq[3](pos.transpose(1, 2)).transpose(1, 2)
            pos = F.gelu(pos)
        h = h + pos.transpose(1, 2)
        for blk in audio.context_encoder.blocks:
            h = blk(h)
        for blk in self.blocks:
            h = blk(h)
        return self.norm(h)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    m = Oracle(TINY).eval()
    return m


def test_convert_and_forward_parity(oracle):
    sd = oracle.state_dict()
    cfg, params = e2v.convert_funasr_state(sd, conv_strides=(5, 2, 2), num_heads=4)
    assert cfg.prenet_depth == TINY.prenet_depth
    assert cfg.depth == TINY.depth
    assert cfg.hidden_size == TINY.hidden_size
    assert not cfg.project_ln

    rng = np.random.default_rng(0)
    wav = (0.2 * rng.normal(size=(1, 3200))).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(wav)).numpy()

    model = e2v.Emotion2Vec(cfg)
    out, mask = model.apply({"params": params}, wav,
                            np.array([wav.shape[1]]))
    out = np.asarray(out)
    assert out.shape == ref.shape
    assert np.asarray(mask).all()
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


def test_ema_and_decoder_keys_ignored(oracle):
    sd = dict(oracle.state_dict())
    sd["_ema.blocks.0.attn.qkv.weight"] = torch.zeros(1)
    sd["modality_encoders.AUDIO.decoder.proj.weight"] = torch.zeros(1)
    cfg, params = e2v.convert_funasr_state(sd, conv_strides=(5, 2, 2), num_heads=4)
    assert cfg.depth == TINY.depth


def test_ragged_batch_equals_per_clip(oracle):
    cfg, params = e2v.convert_funasr_state(oracle.state_dict(), conv_strides=(5, 2, 2), num_heads=4)
    rng = np.random.default_rng(1)
    a = (0.2 * rng.normal(size=2400)).astype(np.float32)
    b = (0.2 * rng.normal(size=3200)).astype(np.float32)
    batch = np.zeros((2, 3200), np.float32)
    batch[0, : len(a)] = a
    batch[1] = b
    lengths = np.array([len(a), len(b)])
    model = e2v.Emotion2Vec(cfg)
    both, mask = model.apply({"params": params}, batch, lengths)
    solo, smask = model.apply({"params": params}, a[None],
                              np.array([len(a)]))
    nA = int(np.asarray(mask)[0].sum())
    assert nA == int(np.asarray(smask)[0].sum())
    np.testing.assert_allclose(np.asarray(both)[0, :nA],
                               np.asarray(solo)[0, :nA],
                               atol=2e-4, rtol=2e-3)


def test_extract_audio_cli_emotion2vec(tmp_path):
    """CLI dispatch + Emotion2VecExtractor bucketed batching end-to-end."""
    import struct

    from mertools_tpu.cli.extract_audio import main

    rng = np.random.default_rng(7)
    audio = tmp_path / "audio"
    audio.mkdir()

    def write_wav(path, wav, sr=16000):
        pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2,
                                          2, 16))
            f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)

    for n, T in (("c0", 6000), ("c1", 9000)):
        write_wav(str(audio / f"{n}.wav"),
                  rng.normal(size=(T,)).astype(np.float32) * 0.1)

    main(["--model_name=emotion2vec-base", "--random_init",
          f"--audio_dir={audio}", f"--save_dir={tmp_path}/f",
          "--feature_level=FRAME"])
    a = np.load(tmp_path / "f" / "emotion2vec-base-FRA" / "c0.npy")
    b = np.load(tmp_path / "f" / "emotion2vec-base-FRA" / "c1.npy")
    assert a.ndim == 2 and a.shape[1] == 32
    assert b.shape[0] > a.shape[0]     # longer clip -> more frames

    main(["--model_name=emotion2vec-base", "--random_init",
          f"--audio_dir={audio}", f"--save_dir={tmp_path}/f",
          "--feature_level=UTTERANCE"])
    u = np.load(tmp_path / "f" / "emotion2vec-base-UTT" / "c0.npy")
    assert u.shape == (32,)
    np.testing.assert_allclose(u, a.mean(0), atol=1e-5, rtol=1e-5)


def test_nested_project_features_layout(oracle):
    # some fairseq builds save project_features as Sequential(Transpose,
    # LayerNorm, Linear): keys .1 (LN) and .2 (Linear)
    sd = dict(oracle.state_dict())
    A = "modality_encoders.AUDIO.project_features"
    w = sd.pop(f"{A}.weight")
    b = sd.pop(f"{A}.bias")
    C = w.shape[1]
    sd[f"{A}.1.weight"] = torch.ones(C)
    sd[f"{A}.1.bias"] = torch.zeros(C)
    sd[f"{A}.2.weight"] = w
    sd[f"{A}.2.bias"] = b
    cfg, params = e2v.convert_funasr_state(sd, conv_strides=(5, 2, 2), num_heads=4)
    assert cfg.project_ln
    assert "project_ln" in params
    rng = np.random.default_rng(2)
    wav = (0.2 * rng.normal(size=(1, 2400))).astype(np.float32)
    out, _ = e2v.Emotion2Vec(cfg).apply({"params": params}, wav,
                                        np.array([2400]))
    assert np.isfinite(np.asarray(out)).all()
