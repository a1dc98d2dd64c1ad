"""Native video frontend round-trip: encode synthetic frames + tone with
libmervideo, then decode frames / demux audio back and check content."""

import numpy as np
import pytest

from mertools_tpu.io import video as vio

pytestmark = pytest.mark.skipif(not vio.available(),
                                reason="libmervideo.so not built")


def _synthetic_clip(n=25, h=64, w=48):
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        frames[i, :, :, 0] = min(10 * i, 255)      # red ramp over time
        frames[i, :, : w // 2, 1] = 200            # green left half
    return frames


def test_encode_decode_roundtrip(tmp_path):
    path = str(tmp_path / "clip.mp4")
    frames = _synthetic_clip()
    t = np.arange(16000) / 16000.0
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    vio.encode_video(path, frames, fps=25.0, audio=tone, audio_sr=16000)

    info = vio.video_info(path)
    assert info["width"] == 48 and info["height"] == 64
    assert info["has_audio"]
    assert abs(info["fps"] - 25.0) < 2.0  # mp4 timebase rounding

    out = vio.decode_frames(path)
    assert out.shape[0] == 25 and out.shape[1:] == (64, 48, 3)
    # lossy codec: check the structure, not exact values
    assert out[0, :, :, 0].mean() < 60          # first frame: dark red
    assert out[-1, :, :, 0].mean() > 150        # last frame: bright red
    left_g = out[5, :, : 24, 1].mean()
    right_g = out[5, :, 24:, 1].mean()
    assert left_g > right_g + 50                # green split preserved


def test_decode_uniform_subsample(tmp_path):
    path = str(tmp_path / "clip.mp4")
    vio.encode_video(path, _synthetic_clip(n=30), fps=30.0)
    out = vio.decode_frames(path, max_frames=10)
    assert out.shape[0] == 10
    # temporal order preserved under subsampling (red ramp monotone-ish)
    reds = out[:, :, :, 0].mean(axis=(1, 2))
    assert reds[-1] > reds[0] + 100


def test_demux_audio_tone(tmp_path):
    path = str(tmp_path / "clip.mp4")
    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    vio.encode_video(path, _synthetic_clip(n=25), fps=25.0, audio=tone,
                     audio_sr=sr)
    wav, got_sr = vio.demux_audio(path)
    assert got_sr == sr
    assert len(wav) > 0.8 * sr
    # dominant frequency of the decoded audio ~ 440 Hz (AAC is lossy)
    spec = np.abs(np.fft.rfft(wav[: sr]))
    peak_hz = np.argmax(spec[10:]) + 10  # skip DC region
    assert abs(peak_hz - 440) < 15, peak_hz

    wav16 = vio.demux_audio_16k(path)
    assert wav16.dtype == np.float32 and len(wav16) > 0
