"""extract_audio CLI: prefetch-chunked loop, idempotent skip, int16 wire,
--dataset registry resolution (run.sh style)."""

import os
import wave

import numpy as np


def _write_wav(path, n, seed):
    rng = np.random.default_rng(seed)
    w = (rng.normal(size=n) * 3000).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(w.tobytes())


def test_extract_audio_cli_end_to_end(tmp_path, monkeypatch):
    from mertools_tpu.cli.extract_audio import main

    wav_dir = tmp_path / "audio"
    wav_dir.mkdir()
    for i, n in enumerate((1600, 2400, 800)):
        _write_wav(wav_dir / f"clip{i}.wav", n, i)

    yaml = tmp_path / "paths.yaml"
    yaml.write_text("datasets:\n  TEST:\n    root: %s\n" % tmp_path)
    monkeypatch.setenv("MERTOOLS_TPU_CONFIG", str(yaml))

    # --dataset resolves audio_dir/save_dir from the registry
    main(["--model_name", "chinese-hubert-tiny", "--dataset", "TEST",
          "--random_init", "--encoder_size", "tiny",
          "--feature_level", "UTTERANCE", "--transfer_dtype", "int16",
          "--batch_budget_sec", "2"])

    out_dir = tmp_path / "features" / "chinese-hubert-tiny-UTT"
    files = sorted(os.listdir(out_dir))
    assert files == ["clip0.npy", "clip1.npy", "clip2.npy"]
    first = np.load(out_dir / "clip0.npy")
    assert first.shape == (64,) and np.isfinite(first).all()

    # idempotent re-run: existing outputs are skipped, nothing breaks,
    # content unchanged
    mtimes = {f: os.path.getmtime(out_dir / f) for f in files}
    main(["--model_name", "chinese-hubert-tiny", "--dataset", "TEST",
          "--random_init", "--encoder_size", "tiny",
          "--feature_level", "UTTERANCE"])
    for f in files:
        assert os.path.getmtime(out_dir / f) == mtimes[f]


def test_check_finetuned_tree_mismatch():
    """--finetuned_ckpt architecture validation fails loudly on structure
    or shape mismatches and passes on a like tree."""
    import numpy as np
    import pytest

    from mertools_tpu.cli.extract_audio import _check_finetuned_tree

    ref = {"a": {"kernel": np.zeros((4, 8)), "bias": np.zeros(8)}}
    ok = {"a": {"kernel": np.ones((4, 8)), "bias": np.ones(8)}}
    _check_finetuned_tree(ok, ref, "--finetuned_ckpt")
    with pytest.raises(ValueError, match="structure"):
        _check_finetuned_tree({"a": {"kernel": np.ones((4, 8))}}, ref, "x")
    with pytest.raises(ValueError, match="shapes"):
        _check_finetuned_tree(
            {"a": {"kernel": np.ones((4, 9)), "bias": np.ones(8)}}, ref, "x")
