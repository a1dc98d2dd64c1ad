"""train_mllm CLI smoke: tiny config end-to-end (data -> runner -> orbax
checkpoints -> restorable model)."""

import os

import numpy as np


def test_train_mllm_smoke(tmp_path):
    rng = np.random.default_rng(0)
    fv = tmp_path / "v"; fa = tmp_path / "a"
    fv.mkdir(); fa.mkdir()
    names = [f"c{i}" for i in range(6)]
    for n in names:
        np.save(fv / f"{n}.npy", rng.normal(size=(5, 12)).astype(np.float32))
        np.save(fa / f"{n}.npy", rng.normal(size=(4, 10)).astype(np.float32))
    (tmp_path / "openset.csv").write_text(
        "name,openset\n" + "\n".join(f"{n},happy" for n in names) + "\n")
    (tmp_path / "reason.csv").write_text(
        "name,reason\n" + "\n".join(f"{n},smiling person" for n in names) + "\n")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
model:
  llm_checkpoint: tiny
  vocab_size: 96
  lora_r: 2
  video_dim: 12
  audio_dim: 10
  video_queries: 4
  audio_queries: 2
  max_video_frames: 8
datasets:
  openset_csv: {tmp_path}/openset.csv
  reason_csv: {tmp_path}/reason.csv
  video_feat_dir: {fv}
  audio_feat_dir: {fa}
run:
  max_epoch: 1
  iters_per_epoch: 3
  batch_size: 2
  warmup_steps: 2
  max_len: 64
  output_dir: {tmp_path}/out
""")
    from mertools_tpu.cli.train_mllm import main
    main([f"--config={cfg}", "--options", "run.iters_per_epoch=2"])
    out = tmp_path / "out"
    assert (out / "checkpoint_0").exists()
    assert (out / "model" / "config.json").exists()

    from mertools_tpu.mllm.runner import restore_model
    model, params = restore_model(str(out / "model"))
    assert model.cfg.llm.vocab_size == 96


def test_epoch_checkpoint_selection(tmp_path):
    """inference_hybird.py:61-84 epoch-sweep semantics."""
    import os

    import pytest

    from mertools_tpu.mllm.runner import epoch_checkpoints

    run = str(tmp_path)
    for e in (0, 1, 2, 3, 5):
        os.makedirs(os.path.join(run, f"checkpoint_{e}"))
    os.makedirs(os.path.join(run, "checkpoint_best"))  # ignored by the sweep

    # default: last epoch only
    assert epoch_checkpoints(run) == [(5, os.path.join(run, "checkpoint_5"))]
    # explicit epoch
    assert epoch_checkpoints(run, test_epoch="2") == \
        [(2, os.path.join(run, "checkpoint_2"))]
    # range with skip
    got = epoch_checkpoints(run, test_epochs="0-3", skip_epoch=2)
    assert [e for e, _ in got] == [0, 2]
    # skip is anchored at epoch 0 like the reference (inference_hybird:78-81)
    got = epoch_checkpoints(run, test_epochs="1-5", skip_epoch=2)
    assert [e for e, _ in got] == [2]   # 4 absent from the fixture
    with pytest.raises(FileNotFoundError):
        epoch_checkpoints(run, test_epoch="9")
    with pytest.raises(FileNotFoundError):
        epoch_checkpoints(str(tmp_path / "empty"))


def test_overlay_trainable_roundtrip(tmp_path, rng):
    """save_checkpoint (trainable-only) -> overlay onto a fresh base tree."""
    import numpy as np
    import orbax.checkpoint as ocp

    from mertools_tpu.mllm.runner import overlay_trainable

    base = {"llm": {"frozen_w": np.zeros((2, 2), np.float32)},
            "video_qformer": {"k": np.zeros(3, np.float32)}}
    # save_checkpoint leaves None at FROZEN LEAF positions (runner.py)
    trained = {"llm": {"frozen_w": None},
               "video_qformer": {"k": np.ones(3, np.float32)}}
    path = str(tmp_path / "checkpoint_7")
    ocp.PyTreeCheckpointer().save(path, {"params": trained, "epoch": 7},
                                  force=True)
    merged, epoch = overlay_trainable(base, path)
    assert epoch == 7
    np.testing.assert_array_equal(np.asarray(merged["video_qformer"]["k"]),
                                  np.ones(3))
    np.testing.assert_array_equal(np.asarray(merged["llm"]["frozen_w"]),
                                  np.zeros((2, 2)))


def test_runner_checkpoint_resume(tmp_path, rng):
    """Reference resume semantics (runner_base.py:353-387): save a
    trainable-only checkpoint mid-training, rebuild a fresh Runner, load,
    and continue — trainable params restored, frozen params untouched."""
    import numpy as np

    import jax

    from mertools_tpu.mllm import (AffectGPT, AffectGPTConfig, LLMConfig,
                                   QFormerConfig)
    from mertools_tpu.mllm.runner import Runner, RunnerConfig

    cfg = AffectGPTConfig(
        llm=LLMConfig(vocab_size=32, hidden_size=16, num_layers=1,
                      num_heads=2, num_kv_heads=2, intermediate_size=32),
        video_qformer=QFormerConfig(num_queries=2, hidden_size=8,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=16),
        audio_qformer=QFormerConfig(num_queries=2, hidden_size=8,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=16),
        video_dim=6, audio_dim=6, max_video_frames=4)
    model = AffectGPT(cfg)

    def batch():
        labels = np.full((2, 10), -100, np.int64)
        labels[:, -3:] = rng.integers(0, 32, size=(2, 3))
        return {"video_feats": rng.normal(size=(2, 4, 6)).astype(np.float32),
                "audio_feats": rng.normal(size=(2, 3, 6)).astype(np.float32),
                "input_ids": rng.integers(0, 32, size=(2, 10)).astype(np.int32),
                "splice_start": np.full(2, 1, np.int32),
                "attention_mask": np.ones((2, 10), np.int32),
                "labels": labels}

    params = model.init(jax.random.PRNGKey(0), batch())["params"]
    rcfg = RunnerConfig(max_epoch=1, iters_per_epoch=3, batch_size=2,
                        warmup_steps=1, output_dir=str(tmp_path))
    r1 = Runner(rcfg, model, params)
    r1.train_epoch(0, iter([batch() for _ in range(3)]))
    ckpt = r1.save_checkpoint(0)
    trained = jax.tree_util.tree_map(np.asarray, r1.state.params)

    r2 = Runner(rcfg, model, model.init(jax.random.PRNGKey(7),
                                        batch())["params"])
    epoch = r2.load_checkpoint(ckpt)
    assert epoch == 0
    # every trainable leaf equals the saved state
    from mertools_tpu.mllm.affectgpt import trainable_labels
    labels_tree = trainable_labels(trained)
    flat_t = jax.tree_util.tree_leaves_with_path(trained)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, r2.state.params)))
    flat_l = dict(jax.tree_util.tree_leaves_with_path(labels_tree))
    checked = 0
    for path, leaf in flat_t:
        if flat_l[path] == "train":
            np.testing.assert_array_equal(flat_r[path], leaf)
            checked += 1
    assert checked > 0
    # training continues from the restored state
    stats = r2.train_epoch(0, iter([batch() for _ in range(3)]))
    assert np.isfinite(stats["train_loss"])


def test_train_mllm_valid_split(tmp_path, capsys):
    """run.valid_frac holds out clips, evaluates per epoch and selects the
    best checkpoint by val loss (reference valid_splits semantics,
    runner_base.py:318-324,401-435)."""
    rng = np.random.default_rng(1)
    fv = tmp_path / "v"; fa = tmp_path / "a"
    fv.mkdir(); fa.mkdir()
    names = [f"c{i}" for i in range(8)]
    for n in names:
        np.save(fv / f"{n}.npy", rng.normal(size=(5, 12)).astype(np.float32))
        np.save(fa / f"{n}.npy", rng.normal(size=(4, 10)).astype(np.float32))
    (tmp_path / "openset.csv").write_text(
        "name,openset\n" + "\n".join(f"{n},happy" for n in names) + "\n")
    (tmp_path / "reason.csv").write_text(
        "name,reason\n" + "\n".join(f"{n},smiling person" for n in names) + "\n")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
model:
  llm_checkpoint: tiny
  vocab_size: 96
  lora_r: 2
  video_dim: 12
  audio_dim: 10
  video_queries: 4
  audio_queries: 2
  max_video_frames: 8
datasets:
  openset_csv: {tmp_path}/openset.csv
  reason_csv: {tmp_path}/reason.csv
  video_feat_dir: {fv}
  audio_feat_dir: {fa}
run:
  max_epoch: 2
  iters_per_epoch: 2
  batch_size: 2
  warmup_steps: 2
  max_len: 64
  valid_frac: 0.25
  output_dir: {tmp_path}/out
""")
    from mertools_tpu.cli.train_mllm import main
    main([f"--config={cfg}"])
    logs = capsys.readouterr().out
    assert "valid split: 2 val / 6 train clips" in logs
    assert "val_loss" in logs
    assert "best val loss" in logs
    assert (tmp_path / "out" / "checkpoint_best").exists()


def test_train_mllm_n_seq_end_to_end(tmp_path):
    """--n_seq 2 on the 8-device CPU mesh: the production sp path (ring
    attention in the LLM, batch seq padded to the 'seq' multiple) trains
    end-to-end and checkpoints."""
    rng = np.random.default_rng(1)
    fv = tmp_path / "v"; fa = tmp_path / "a"
    fv.mkdir(); fa.mkdir()
    names = [f"c{i}" for i in range(8)]
    for n in names:
        np.save(fv / f"{n}.npy", rng.normal(size=(5, 12)).astype(np.float32))
        np.save(fa / f"{n}.npy", rng.normal(size=(4, 10)).astype(np.float32))
    (tmp_path / "openset.csv").write_text(
        "name,openset\n" + "\n".join(f"{n},happy" for n in names) + "\n")
    (tmp_path / "reason.csv").write_text(
        "name,reason\n" + "\n".join(f"{n},a smiling person" for n in names)
        + "\n")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
model:
  llm_checkpoint: tiny
  vocab_size: 96
  lora_r: 2
  video_dim: 12
  audio_dim: 10
  video_queries: 4
  audio_queries: 2
  max_video_frames: 8
datasets:
  openset_csv: {tmp_path}/openset.csv
  reason_csv: {tmp_path}/reason.csv
  video_feat_dir: {fv}
  audio_feat_dir: {fa}
run:
  max_epoch: 1
  iters_per_epoch: 2
  batch_size: 4
  warmup_steps: 1
  max_len: 64
  output_dir: {tmp_path}/out
""")
    from mertools_tpu.cli.train_mllm import main
    main([f"--config={cfg}", "--n_seq", "2"])
    assert (tmp_path / "out" / "checkpoint_0").exists()


def test_build_model_remat_policy_mapping():
    """yaml `remat` / `remat_policy` / `loss_chunk` reach the configs
    (round-5 MFU levers: dots remat, chunked LM loss, no-remat+chunk)."""
    from mertools_tpu.cli.train_mllm import build_model

    base = {"llm_checkpoint": "tiny", "vocab_size": 96, "lora_r": 2,
            "video_dim": 12, "audio_dim": 10}
    m, _, _ = build_model(dict(base))
    assert m.cfg.llm.remat is False and m.cfg.loss_chunk == 0
    m, _, _ = build_model(dict(base, remat=True, remat_policy="dots",
                               loss_chunk=64))
    assert m.cfg.llm.remat is True
    assert m.cfg.llm.remat_policy == "dots"
    assert m.cfg.loss_chunk == 64
