"""Verify drive (real TPU): train_mllm CLI with valid_frac best-val
selection, frozen_* component flags, and hybird QA-type sampling.
Run from /root/repo."""
import csv
import os
import tempfile

import numpy as np

tmp = tempfile.mkdtemp()
vdir, adir = os.path.join(tmp, "v"), os.path.join(tmp, "a")
os.makedirs(vdir); os.makedirs(adir)
rng = np.random.default_rng(0)
names = [f"c{i}" for i in range(8)]
for n in names:
    np.save(os.path.join(vdir, n + ".npy"),
            rng.normal(size=(5, 12)).astype(np.float32))
    np.save(os.path.join(adir, n + ".npy"),
            rng.normal(size=(4, 10)).astype(np.float32))
with open(os.path.join(tmp, "openset.csv"), "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["name", "openset", "valence"])
    for i, n in enumerate(names):
        w.writerow([n, "['happy']", str((i - 4) / 4.0)])
with open(os.path.join(tmp, "reason.csv"), "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["name", "reason"])
    for n in names:
        w.writerow([n, "the person smiles"])

cfg_path = os.path.join(tmp, "cfg.yaml")
open(cfg_path, "w").write(f"""
model:
  llm_checkpoint: tiny
  vocab_size: 96
  lora_r: 2
  video_dim: 12
  audio_dim: 10
  video_queries: 4
  audio_queries: 2
  max_video_frames: 8
  frozen_video_Qformer: True
  frozen_audio_proj: True
datasets:
  openset_csv: {tmp}/openset.csv
  reason_csv: {tmp}/reason.csv
  video_feat_dir: {vdir}
  audio_feat_dir: {adir}
  label_type: hybird
run:
  max_epoch: 2
  iters_per_epoch: 2
  batch_size: 2
  warmup_steps: 2
  max_len: 64
  valid_frac: 0.25
  output_dir: {tmp}/out
""")

from mertools_tpu.cli.train_mllm import main
main([f"--config={cfg_path}"])
assert os.path.exists(os.path.join(tmp, "out", "checkpoint_best"))

# frozen subtrees must be absent from the trainable-only checkpoint
from mertools_tpu.mllm.runner import restore_model
import orbax.checkpoint as ocp
ck = ocp.PyTreeCheckpointer().restore(
    os.path.abspath(os.path.join(tmp, "out", "checkpoint_best")))
saved = ck["params"]
assert "video_qformer" not in saved or not saved.get("video_qformer"), \
    list(saved)
assert "audio_proj" not in saved or not saved.get("audio_proj")
assert "video_proj" in saved and saved["video_proj"]
print("trainable-only checkpoint excludes frozen subtrees:",
      sorted(k for k in saved if saved[k]))
print("OK")
