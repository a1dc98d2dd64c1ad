"""End-to-end corruption CLI over the native video frontend.

Runs in a CHILD process (libav + jaxlib/torch in one long pytest process has
produced late-suite XLA:CPU segfaults; see test_native_video.py)."""

import subprocess
import sys
import textwrap

import pytest

from mertools_tpu.io import video as vio

pytestmark = pytest.mark.skipif(not vio.available(),
                                reason="libmervideo.so not built")


def test_corrupt_end_to_end(tmp_path):
    code = textwrap.dedent("""
        import os
        import sys
        sys.path.insert(0, "/root/repo")
        # pin cpu BEFORE any jax-importing module: the axon plugin prepends
        # itself to jax_platforms regardless of the env var, and its backend
        # init blocks forever when the tunnel is down (conftest.py recipe —
        # the child process doesn't run conftest's config.update)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from mertools_tpu.io import video as vio
        from mertools_tpu.cli.main_corrupt import main

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, size=(20, 64, 64, 3), dtype=np.uint8)
        t = np.arange(16000) / 16000.0
        tone = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        import os
        os.makedirs("video")
        vio.encode_video("video/a.mp4", frames, fps=20.0, audio=tone,
                         audio_sr=16000)
        main(["--video_root=video", "--save_root=corrupted",
              "--snr_low=5", "--snr_high=5", "--blur_low=2", "--blur_high=2"])
        assert os.path.exists("corrupted/a.mp4")
        cf = vio.decode_frames("corrupted/a.mp4")
        assert cf.shape[0] == 20

        def hf(x):
            d = np.diff(x.astype(np.float32), axis=2)
            return float(np.abs(d).mean())

        orig = vio.decode_frames("video/a.mp4")
        assert hf(cf) < 0.7 * hf(orig)
        wav, sr = vio.demux_audio("corrupted/a.mp4")
        assert len(wav) > 12000
        print("OK")
    """)
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=str(tmp_path), timeout=400)
    assert res.returncode == 0, res.stderr + res.stdout
