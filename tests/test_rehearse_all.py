"""rehearse_all driver mechanics (VERDICT r4 next #6a): family discovery,
subprocess wiring, PASS/FAIL/SKIP table, exit codes — on a synthetic root.
Converter CORRECTNESS is covered by the per-family oracle suites; this
pins that the one-command driver actually runs them and reports honestly.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _make_root(tmp_path, corrupt=False):
    root = tmp_path / "root"
    (root / "reference_features" / "fake-model-UTT").mkdir(parents=True)
    (root / "audio").mkdir()
    for i in range(2):
        np.save(root / "reference_features" / "fake-model-UTT" / f"c{i}.npy",
                np.full(8, 0.5 + (0.1 if corrupt and i else 0.0), np.float32))
    return root


def test_unknown_family_and_missing_inputs_skip(tmp_path):
    from mertools_tpu.cli.rehearse_all import rehearse

    root = _make_root(tmp_path)
    rows = rehearse(str(root), timeout=60)
    by = {r["family"]: r for r in rows}
    # unknown model name -> SKIP with reason, not a crash
    assert by["feature:fake-model"]["status"] == "SKIP"
    assert "unknown model family" in by["feature:fake-model"]["detail"]
    # OV anchor inputs absent -> SKIP
    assert by["ov:mer2024-anchor"]["status"] == "SKIP"


def test_store_parity_rows_pass_and_fail(tmp_path, monkeypatch):
    """Wire a known-family store through the REAL parity_check subprocess:
    equal stores PASS, a corrupted store FAILs and flips the exit code."""
    from mertools_tpu.cli import rehearse_all as ra

    root = _make_root(tmp_path)
    ours = tmp_path / "ours"
    store = "chinese-hubert-large-UTT"
    (root / "reference_features" / store).mkdir()
    (ours / store).mkdir(parents=True)
    for i in range(2):
        v = np.arange(8, dtype=np.float32) + i
        np.save(root / "reference_features" / store / f"c{i}.npy", v)
        np.save(ours / store / f"c{i}.npy", v)
    (root / "checkpoints").mkdir()

    # stub the EXTRACT step (no checkpoints exist offline) but keep the
    # real parity_check subprocess
    real_run = ra._run

    def fake_run(argv, timeout):
        if argv[0].startswith("mertools_tpu.cli.extract_"):
            return True, "extract stubbed"
        return real_run(argv, timeout)

    monkeypatch.setattr(ra, "_run", fake_run)
    rows = ra.rehearse(str(root), out_dir=str(tmp_path), timeout=120)
    # rehearse() looks for our store under out_dir/features
    assert all(r["status"] != "PASS" for r in rows
               if r["family"] == f"feature:chinese-hubert-large")

    feat_dir = tmp_path / "features"
    feat_dir.mkdir(exist_ok=True)
    os.rename(ours / store, feat_dir / store)
    rows = ra.rehearse(str(root), out_dir=str(tmp_path), timeout=120)
    by = {r["family"]: r for r in rows}
    assert by["feature:chinese-hubert-large"]["status"] == "PASS", by

    # corrupt one value beyond tol -> FAIL
    bad = np.load(feat_dir / store / "c0.npy")
    bad[0] += 1.0
    np.save(feat_dir / store / "c0.npy", bad)
    rows = ra.rehearse(str(root), out_dir=str(tmp_path), timeout=120)
    by = {r["family"]: r for r in rows}
    assert by["feature:chinese-hubert-large"]["status"] == "FAIL", by


def test_ov_anchor_row(tmp_path, monkeypatch):
    """OV inputs present -> the driver runs main_ov and compares to the
    0.5398 anchor (stubbed subprocess: the metric path has its own suite)."""
    from mertools_tpu.cli import rehearse_all as ra

    root = _make_root(tmp_path)
    ov = root / "ov"
    (ov / "synonyms").mkdir(parents=True)
    (ov / "gt.csv").write_text("name,openset\nu1,happy\n")
    (ov / "pred.csv").write_text("name,openset\nu1,happy\n")

    class _R:
        returncode = 0
        stdout = json.dumps({"avg_score": 0.5398}) + "\n"
        stderr = ""

    monkeypatch.setattr(ra.subprocess, "run", lambda *a, **k: _R())
    rows = ra.rehearse(str(root), timeout=60)
    by = {r["family"]: r for r in rows}
    assert by["ov:mer2024-anchor"]["status"] == "PASS"
    _R.stdout = json.dumps({"avg_score": 0.51}) + "\n"
    rows = ra.rehearse(str(root), timeout=60)
    by = {r["family"]: r for r in rows}
    assert by["ov:mer2024-anchor"]["status"] == "FAIL"


def test_main_exit_code_and_table(tmp_path):
    from mertools_tpu.cli.rehearse_all import main

    root = _make_root(tmp_path)
    rc = main(["--root", str(root)])
    assert rc == 0  # only SKIPs -> success (nothing failed)
