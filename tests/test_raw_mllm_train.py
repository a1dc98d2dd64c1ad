"""Raw-media MLLM training: on-device augmentation (numpy oracle) +
online frozen-encoder training end-to-end through the train_mllm CLI.

Reference: AlproVideoTrainProcessor random-resized-crop/flip
(my_affectgpt/processors/video_processor.py:29-68) inside the train
datasets (mercaptionplus_dataset.py:25-105). VERDICT.md Next #6.
"""

import numpy as np
import pytest


def _np_crop_resize(img, box, flip, out_h, out_w):
    """Independent host oracle: bilinear sample grid, torch resize
    semantics (align_corners=False, edge clamp)."""
    T, H, W, C = img.shape
    top, left, h, w = [float(v) for v in box]
    ys = top + (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = left + (np.arange(out_w) + 0.5) * w / out_w - 0.5
    if flip:
        xs = left + left + w - 1.0 - xs
    y0 = np.clip(np.floor(ys), 0, H - 1)
    x0 = np.clip(np.floor(xs), 0, W - 1)
    wy = np.clip(ys - y0, 0, 1)[None, :, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, None, :, None]
    y0, x0 = y0.astype(int), x0.astype(int)
    y1, x1 = np.minimum(y0 + 1, H - 1), np.minimum(x0 + 1, W - 1)
    f = img.astype(np.float64)
    p00 = f[:, y0][:, :, x0]
    p01 = f[:, y0][:, :, x1]
    p10 = f[:, y1][:, :, x0]
    p11 = f[:, y1][:, :, x1]
    out = ((p00 * (1 - wx) + p01 * wx) * (1 - wy)
           + (p10 * (1 - wx) + p11 * wx) * wy)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def test_crop_resize_flip_matches_numpy_oracle():
    from mertools_tpu.mllm.augment import random_resized_crop_flip

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 3, 24, 20, 3)).astype(np.uint8)
    boxes = np.array([[2, 1, 16, 18], [0, 0, 24, 20]], np.int32)
    flips = np.array([True, False])
    got = random_resized_crop_flip(frames, boxes, flips, out_size=14)
    assert got.shape == (2, 3, 14, 14, 3)
    for b in range(2):
        ref = _np_crop_resize(frames[b], boxes[b], flips[b], 14, 14)
        # bilinear in f32 vs f64 can straddle a .5 rounding boundary
        assert np.abs(got[b].astype(int) - ref.astype(int)).max() <= 1, b


def test_sample_crop_params_respects_bounds():
    from mertools_tpu.mllm.augment import sample_crop_params

    rng = np.random.default_rng(1)
    boxes = sample_crop_params(rng, 200, 112, 112, scale=(0.5, 1.0))
    top, left, h, w = boxes.T
    assert (h > 0).all() and (w > 0).all()
    assert (top >= 0).all() and (left >= 0).all()
    assert (top + h <= 112).all() and (left + w <= 112).all()
    areas = h * w / (112 * 112)
    # aspect/rounding can nudge slightly outside [0.5, 1.0]
    assert areas.min() > 0.4 and areas.max() <= 1.01
    assert 0.55 < areas.mean() < 0.95


def test_augment_faces_groups_by_shape():
    from mertools_tpu.mllm.augment import augment_faces

    rng = np.random.default_rng(2)
    faces = {"a": rng.integers(0, 255, size=(4, 16, 16, 3)).astype(np.uint8),
             "b": rng.integers(0, 255, size=(4, 16, 16, 3)).astype(np.uint8),
             "c": rng.integers(0, 255, size=(2, 20, 16, 3)).astype(np.uint8)}
    out = augment_faces(faces, np.random.default_rng(3), out_size=16)
    assert set(out) == {"a", "b", "c"}
    assert out["a"].shape == (4, 16, 16, 3)
    assert out["c"].shape == (2, 16, 16, 3)
    assert out["a"].dtype == np.uint8
    # same clip, same rng -> deterministic
    out2 = augment_faces(faces, np.random.default_rng(3), out_size=16)
    assert all((out[k] == out2[k]).all() for k in out)


def test_train_mllm_cli_raw_media(tmp_path, capsys):
    """train_mllm with face_dir/audio_dir trains end-to-end: raw faces ->
    on-device augmentation -> frozen encoders -> AffectGPT step
    (VERDICT 'Done = train_mllm --face_dir/--audio_dir trains end-to-end')."""
    from mertools_tpu.io.wav import write_wav

    rng = np.random.default_rng(0)
    faces = tmp_path / "faces"
    wavs = tmp_path / "wavs"
    faces.mkdir(); wavs.mkdir()
    names = [f"c{i}" for i in range(8)]
    for n in names:
        np.save(faces / f"{n}.npy",
                rng.integers(0, 255, size=(6, 28, 28, 3)).astype(np.uint8))
        write_wav(str(wavs / f"{n}.wav"),
                  rng.normal(size=12000).astype(np.float32) * 0.05, 16000)
    (tmp_path / "openset.csv").write_text(
        "name,openset\n" + "\n".join(f"{n},happy" for n in names) + "\n")
    (tmp_path / "reason.csv").write_text(
        "name,reason\n" + "\n".join(f"{n},a smiling face" for n in names)
        + "\n")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
model:
  llm_checkpoint: tiny
  vocab_size: 96
  lora_r: 2
  video_queries: 4
  audio_queries: 2
  max_video_frames: 8
datasets:
  openset_csv: {tmp_path}/openset.csv
  reason_csv: {tmp_path}/reason.csv
  face_dir: {faces}
  audio_dir: {wavs}
  random_init_encoders: true
  n_frms: 4
run:
  max_epoch: 1
  iters_per_epoch: 2
  batch_size: 4
  warmup_steps: 2
  max_len: 64
  valid_frac: 0.25
  output_dir: {tmp_path}/out
""")
    from mertools_tpu.cli.train_mllm import main

    main([f"--config={cfg}"])
    logs = capsys.readouterr().out
    assert "raw-media training" in logs
    assert "val_loss" in logs
    assert (tmp_path / "out" / "checkpoint_0").exists()
