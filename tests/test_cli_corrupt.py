"""End-to-end corruption CLI over the native video frontend."""

import numpy as np
import pytest

from mertools_tpu.io import video as vio

pytestmark = pytest.mark.skipif(not vio.available(),
                                reason="libmervideo.so not built")


def test_corrupt_end_to_end(tmp_path):
    from mertools_tpu.cli.main_corrupt import main

    src = tmp_path / "video"
    src.mkdir()
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(20, 64, 64, 3), dtype=np.uint8)
    t = np.arange(16000) / 16000.0
    tone = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    vio.encode_video(str(src / "a.mp4"), frames, fps=20.0, audio=tone,
                     audio_sr=16000)

    dst = tmp_path / "corrupted"
    main([f"--video_root={src}", f"--save_root={dst}",
          "--snr_low=5", "--snr_high=5", "--blur_low=2", "--blur_high=2"])

    out = dst / "a.mp4"
    assert out.exists()
    cf = vio.decode_frames(str(out))
    assert cf.shape[0] == 20
    # blur: corrupted frames have less high-frequency energy
    def hf(x):
        d = np.diff(x.astype(np.float32), axis=2)
        return float(np.abs(d).mean())
    orig = vio.decode_frames(str(src / "a.mp4"))
    assert hf(cf) < 0.7 * hf(orig)
    # audio present and noisier than the clean tone
    wav, sr = vio.demux_audio(str(out))
    assert len(wav) > 12000
