"""Additional audio encoders: VGGish (AudioSet) and fairseq wav2vec-1.0.

Reference usage:
- VGGish runs under TensorFlow 1.15 producing a 128-d embedding per 0.96 s
  log-mel patch (``MERBench/feature_extraction/audio/
  extract_vggish_embedding.py:16-17`` + vendored ``vggish/``). Here the
  frontend (96x64 log-mel patchification, Google params) and the VGG conv
  stack are one jitted Flax forward; weights convert from the public
  torchvggish port's state-dict naming.
- wav2vec-1.0 "z" (conv feature encoder) and "c" (context network) features
  from fairseq (``MER2023/feature_extraction/audio/
  extract_wav2vec_embedding.py:14,30-52``): two conv stacks, both returned.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST

# ---------------------------------------------------------------------------
# VGGish frontend: Google params (vggish_params.py of the public release)
# ---------------------------------------------------------------------------
VGGISH_SR = 16000
_WIN = int(0.025 * VGGISH_SR)     # 400
_HOP = int(0.010 * VGGISH_SR)     # 160
_N_MELS = 64
_PATCH_FRAMES = 96                # 0.96 s patches
_LOG_OFFSET = 0.01
_FMIN, _FMAX = 125.0, 7500.0


def _hz_to_mel_htk(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def vggish_mel_matrix(n_fft: int = 512) -> np.ndarray:
    """HTK-scale triangular filterbank, Google slaney-free variant
    (vggish/mel_features.py spectrogram_to_mel_matrix): (bins, 64)."""
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, VGGISH_SR / 2.0, n_bins)
    mel_edges = np.linspace(_hz_to_mel_htk(_FMIN), _hz_to_mel_htk(_FMAX),
                            _N_MELS + 2)
    mel_freqs = _hz_to_mel_htk(fft_freqs)
    weights = np.zeros((n_bins, _N_MELS))
    for i in range(_N_MELS):
        lo, ctr, hi = mel_edges[i: i + 3]
        lower = (mel_freqs - lo) / (ctr - lo)
        upper = (hi - mel_freqs) / (hi - ctr)
        weights[:, i] = np.maximum(0.0, np.minimum(lower, upper))
    weights[0] = 0.0
    return weights.astype(np.float32)


def vggish_log_mel_patches(wav: jnp.ndarray) -> jnp.ndarray:
    """(B, T) 16 kHz float -> (B, P, 96, 64) log-mel patches.

    Hann window 25 ms / 10 ms hop, |STFT| magnitude (not power — matches
    mel_features.py), HTK mel 125-7500 Hz, log(mel + 0.01), non-overlapping
    96-frame patches.
    """
    B, T = wav.shape
    n_fft = 512
    n_frames = max(1 + (T - _WIN) // _HOP, 1)
    idx = np.arange(n_frames)[:, None] * _HOP + np.arange(_WIN)[None, :]
    frames = wav[:, idx]
    win = jnp.asarray(np.hanning(_WIN + 1)[:-1].astype(np.float32))
    spec = jnp.abs(jnp.fft.rfft(frames * win, n=n_fft, axis=-1))
    mel = jnp.einsum("bfk,km->bfm", spec, jnp.asarray(vggish_mel_matrix(n_fft)),
                     precision=_PRECISION)
    logmel = jnp.log(mel + _LOG_OFFSET)
    P = max(n_frames // _PATCH_FRAMES, 1)
    logmel = logmel[:, : P * _PATCH_FRAMES]
    if n_frames < _PATCH_FRAMES:  # pad short clips to one patch
        pad = _PATCH_FRAMES - n_frames
        logmel = jnp.pad(logmel, ((0, 0), (0, pad), (0, 0)))
    return logmel.reshape(B, P, _PATCH_FRAMES, _N_MELS)


class VGGish(nn.Module):
    """(B, 96, 64) log-mel patch -> (B, 128) embedding (VGG conv stack +
    3 FC layers, torchvggish layer order)."""

    precision: object = _PRECISION

    @nn.compact
    def __call__(self, x):
        conv = lambda ch, name: nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                                        name=name, precision=self.precision)
        x = x[..., None]                                  # (B, 96, 64, 1)
        x = nn.relu(conv(64, "conv1")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(128, "conv2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(256, "conv3_1")(x))
        x = nn.relu(conv(256, "conv3_2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(512, "conv4_1")(x))
        x = nn.relu(conv(512, "conv4_2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))        # (B, 6, 4, 512)
        # torchvggish permutes NCHW->NHWC before flattening, which is our
        # native layout already
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc1_1", precision=self.precision)(x))
        x = nn.relu(nn.Dense(4096, name="fc1_2", precision=self.precision)(x))
        return nn.relu(nn.Dense(128, name="fc2", precision=self.precision)(x))


def vggish_from_torch(sd: dict) -> dict:
    """torchvggish naming: features.{0,3,6,8,11,13}, embeddings.{0,2,4}."""
    def cw(w):
        return np.asarray(w).transpose(2, 3, 1, 0)

    def t(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                          else x)

    conv_map = {"conv1": 0, "conv2": 3, "conv3_1": 6, "conv3_2": 8,
                "conv4_1": 11, "conv4_2": 13}
    fc_map = {"fc1_1": 0, "fc1_2": 2, "fc2": 4}
    p = {}
    for name, i in conv_map.items():
        p[name] = {"kernel": cw(t(sd[f"features.{i}.weight"])),
                   "bias": t(sd[f"features.{i}.bias"])}
    for name, i in fc_map.items():
        p[name] = {"kernel": t(sd[f"embeddings.{i}.weight"]).T,
                   "bias": t(sd[f"embeddings.{i}.bias"])}
    return p


def vggish_extract(params, wav: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, P, 128) per-patch embeddings under one jit."""
    patches = vggish_log_mel_patches(wav)
    B, P = patches.shape[:2]
    flat = patches.reshape(B * P, _PATCH_FRAMES, _N_MELS)
    emb = VGGish().apply({"params": params}, flat)
    return emb.reshape(B, P, 128)


# ---------------------------------------------------------------------------
# wav2vec 1.0 (fairseq)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Wav2Vec1Config:
    # feature encoder (z): (dim, kernel, stride) per layer
    enc_layers: tuple = ((512, 10, 5), (512, 8, 4), (512, 4, 2),
                         (512, 4, 2), (512, 4, 2))
    # context network (c): kernel per layer (stride 1)
    ctx_layers: tuple = ((512, 3), (512, 3), (512, 3), (512, 3), (512, 3),
                         (512, 3), (512, 3), (512, 3), (512, 3))
    log_compression: bool = True


class _W2V1Block(nn.Module):
    dim: int
    kernel: int
    stride: int = 1
    pad: int = 0

    @nn.compact
    def __call__(self, x, n_valid=None):
        x = nn.Conv(self.dim, (self.kernel,), strides=(self.stride,),
                    padding=[(self.pad, self.pad)], name="conv",
                    precision=_PRECISION)(x)
        # fairseq norm: instance norm over time (Fp32GroupNorm with 1 group).
        # The statistics span the WHOLE time axis, so right-padded batching
        # needs masked moments to bit-match per-clip execution (n_valid =
        # per-sample valid frames on this layer's time scale).
        if n_valid is None:
            m = None
            mean = x.mean(axis=1, keepdims=True)
            var = ((x - mean) ** 2).mean(axis=1, keepdims=True)
        else:
            t = jnp.arange(x.shape[1])[None, :, None]
            m = (t < n_valid[:, None, None]).astype(x.dtype)
            cnt = jnp.maximum(n_valid.astype(x.dtype), 1.0)[:, None, None]
            mean = (x * m).sum(axis=1, keepdims=True) / cnt
            var = (((x - mean) * m) ** 2).sum(axis=1, keepdims=True) / cnt
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        x = x * self.param("norm_scale", nn.initializers.ones, (self.dim,))
        x = x + self.param("norm_bias", nn.initializers.zeros, (self.dim,))
        x = nn.relu(x)
        if m is not None:
            # zero the pad lanes AFTER the affine+relu so the next conv's
            # boundary frames read exactly what conv zero-padding provides
            # on an unpadded clip
            x = x * m
        return x


class Wav2Vec1(nn.Module):
    """(B, T) wav -> dict(z=(B, Tz, 512), c=(B, Tz, 512)).

    The reference saves BOTH outputs into separate feature dirs
    (extract_wav2vec_embedding.py:30-52). ``lengths`` enables right-padded
    batching: per-layer valid frame counts drive masked instance norms so
    rows [0, z_len_i) match unpadded per-clip execution; use
    :func:`w2v1_out_lengths` to trim.
    """
    cfg: Wav2Vec1Config = Wav2Vec1Config()

    @nn.compact
    def __call__(self, wav, lengths=None):
        x = wav[..., None]
        n = lengths
        for i, (dim, k, s) in enumerate(self.cfg.enc_layers):
            if n is not None:
                n = jnp.maximum((n - k) // s + 1, 1)
            x = _W2V1Block(dim, k, s, name=f"enc_{i}")(x, n)
        if self.cfg.log_compression:
            x = jnp.log(1.0 + jnp.abs(x))
        z = x
        for i, (dim, k) in enumerate(self.cfg.ctx_layers):
            # pad k//2, stride 1: the time scale (and valid count) is
            # unchanged, but edge frames near the valid/pad boundary read
            # zeroed pad lanes exactly like unpadded edges read conv padding
            x = _W2V1Block(dim, k, 1, pad=k // 2, name=f"ctx_{i}")(x, n)
        return {"z": z, "c": x}


def w2v1_out_lengths(n: np.ndarray,
                     cfg: Wav2Vec1Config | None = None) -> np.ndarray:
    """Input sample counts -> z/c frame counts (valid-conv shrinkage)."""
    cfg = cfg or Wav2Vec1Config()
    n = np.asarray(n)
    for _, k, s in cfg.enc_layers:
        n = np.maximum((n - k) // s + 1, 1)
    return n


def wav2vec1_from_fairseq(sd: dict, cfg: Wav2Vec1Config | None = None) -> dict:
    """fairseq naming: feature_extractor.conv_layers.{i}.{0:conv,2:norm},
    feature_aggregator.conv_layers.{i}.{0,2}."""
    cfg = cfg or Wav2Vec1Config()

    def t(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                          else x)

    def block(prefix):
        out = {"conv": {"kernel": t(sd[f"{prefix}.0.weight"]).transpose(2, 1, 0)}}
        if f"{prefix}.0.bias" in sd:
            out["conv"]["bias"] = t(sd[f"{prefix}.0.bias"])
        out["norm_scale"] = t(sd[f"{prefix}.2.weight"]).reshape(-1)
        out["norm_bias"] = t(sd[f"{prefix}.2.bias"]).reshape(-1)
        return out

    p = {}
    for i in range(len(cfg.enc_layers)):
        p[f"enc_{i}"] = block(f"feature_extractor.conv_layers.{i}")
    for i in range(len(cfg.ctx_layers)):
        p[f"ctx_{i}"] = block(f"feature_aggregator.conv_layers.{i}")
    return p
