"""End-to-end smoke of the handcrafted-feature CLI (reference layout)."""

import os
import struct

import numpy as np

from mertools_tpu.cli.extract_handcrafted import main


def _write_wav(path, wav, sr=16000):
    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)


def test_cli_utt_and_frame(tmp_path):
    audio = tmp_path / "audio"
    audio.mkdir()
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    for i, f0 in enumerate([150, 220, 300]):
        wav = 0.4 * np.sin(2 * np.pi * f0 * t[: 8000 + 2000 * i])
        _write_wav(str(audio / f"clip{i}.wav"), wav)

    save = tmp_path / "features"
    main(["--feature_set=IS09", "--feature_level=UTTERANCE",
          f"--audio_dir={audio}", f"--save_dir={save}"])
    out = save / "IS09-UTT"
    files = sorted(os.listdir(out))
    assert files == ["clip0.npy", "clip1.npy", "clip2.npy"]
    feat = np.load(out / "clip0.npy")
    assert feat.shape == (384,) and np.isfinite(feat).all()

    main(["--feature_set=mfcc", "--feature_level=FRAME",
          f"--audio_dir={audio}", f"--save_dir={save}"])
    fra = np.load(save / "mfcc-FRA" / "clip1.npy")
    assert fra.ndim == 2 and fra.shape[1] == 120
