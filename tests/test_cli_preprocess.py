"""Preprocess CLI: audio split, label archives, face compression, checks."""

import os

import numpy as np
import pytest

from mertools_tpu.io import video as vio


def test_make_labels_roundtrip(tmp_path):
    from mertools_tpu.cli.preprocess import main
    from mertools_tpu.data.labels import read_names_labels

    csv_path = tmp_path / "labels.csv"
    csv_path.write_text(
        "name,emo,val,split\n"
        "c0,happy,1.5,train\n"
        "c1,sad,-1.0,train\n"
        "c2,neutral,,test1\n", encoding="utf-8")
    npz = tmp_path / "label-6way.npz"
    main(["make-labels", f"--label_csv={csv_path}", f"--save_path={npz}"])

    names, emos, vals = read_names_labels(str(npz), "train")
    assert sorted(names) == ["c0", "c1"]
    assert vals[names.index("c0")] == pytest.approx(1.5)
    names_t, _, vals_t = read_names_labels(str(npz), "test1")
    assert names_t == ["c2"] and vals_t[0] == -10.0  # missing-val sentinel


@pytest.mark.skipif(not vio.available(), reason="libmervideo.so not built")
def test_split_audio(tmp_path):
    # child process: libav + jaxlib in one pytest process has produced
    # late-suite XLA:CPU segfaults (see test_native_video.py)
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent("""
        import sys
        sys.path.insert(0, "/root/repo")
        import numpy as np
        from mertools_tpu.io import video as vio
        from mertools_tpu.cli.preprocess import main
        from mertools_tpu.io.wav import read_wav
        import os
        os.makedirs("video")
        frames = np.zeros((10, 32, 32, 3), np.uint8)
        t = np.arange(8000) / 16000.0
        tone = (0.4 * np.sin(2 * np.pi * 250 * t)).astype(np.float32)
        vio.encode_video("video/x.mp4", frames, fps=20.0, audio=tone,
                         audio_sr=16000)
        main(["split-audio", "--video_root=video", "--save_root=audio"])
        wav, sr = read_wav("audio/x.wav")
        assert sr == 16000 and len(wav) > 4000
        print("OK")
    """)
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=str(tmp_path), timeout=240)
    assert res.returncode == 0, res.stderr + res.stdout


def test_compress_faces_from_frame_dirs(tmp_path):
    from mertools_tpu.cli.preprocess import main

    root = tmp_path / "faces"
    (root / "clipA").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        np.save(root / "clipA" / f"{i:03d}.npy",
                rng.integers(0, 255, size=(112, 112, 3), dtype=np.uint8))
    out = tmp_path / "npy"
    main(["compress-faces", f"--face_root={root}", f"--save_root={out}"])
    arr = np.load(out / "clipA.npy")
    assert arr.shape == (4, 112, 112, 3) and arr.dtype == np.uint8


def test_check_features(tmp_path):
    from mertools_tpu.cli.preprocess import main
    from mertools_tpu.data.labels import write_label_archive

    npz = tmp_path / "labels.npz"
    write_label_archive(str(npz), {"train": {
        "a": {"emo": "happy", "val": 1.0}, "b": {"emo": "sad", "val": 0.0}}})
    feat = tmp_path / "feat"
    feat.mkdir()
    np.save(feat / "a.npy", np.ones((5, 8), np.float32))
    res = main(["check-features", f"--feature_root={feat}",
                f"--label_npz={npz}"])
    assert res["missing"] == ["b"] and res["dims"] == [8]


def test_find_false_audio(tmp_path, capsys):
    """Audio-split failure scan (func_find_false_audio, functions.py:280-286)."""
    from mertools_tpu.cli.preprocess import main

    vdir = tmp_path / "video"; adir = tmp_path / "audio"
    vdir.mkdir(); adir.mkdir()
    for n in ("a", "b", "c"):
        (vdir / f"{n}.mp4").write_bytes(b"x")
    (adir / "a.wav").write_bytes(b"x")
    missing = main(["find-false-audio", f"--video_root={vdir}",
                    f"--audio_root={adir}"])
    assert len(missing) == 2
    assert all(m.endswith(("b.wav", "c.wav")) for m in missing)
