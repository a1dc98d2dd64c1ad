"""Submission generation + WAF scoring CLI."""

import numpy as np

from mertools_tpu.core.globals_mer import EMOS_MER


def test_submission_and_score(tmp_path):
    from mertools_tpu.cli.evaluation import main

    names = [f"c{i}" for i in range(6)]
    probs = np.eye(6)[np.array([0, 1, 2, 3, 4, 5])]
    npz = tmp_path / "result.npz"
    np.savez_compressed(npz, emo_probs=np.asarray(probs), names=names)

    sub = tmp_path / "sub.csv"
    main(["submission", f"--result_npz={npz}", f"--save_csv={sub}"])
    text = sub.read_text(encoding="utf-8")
    assert "name,discrete" in text and EMOS_MER[0] in text

    gt = tmp_path / "gt.csv"
    rows = ["name,discrete"] + [f"c{i},{EMOS_MER[i if i < 5 else 0]}"
                                for i in range(6)]
    gt.write_text("\n".join(rows) + "\n", encoding="utf-8")
    waf, acc = main(["score", f"--label_csv={gt}",
                     f"--submission_csv={sub}"])
    assert abs(acc - 5 / 6) < 1e-9


def test_parity_check_cli(tmp_path):
    import pytest

    from mertools_tpu.cli.parity_check import compare_stores, main

    ref = tmp_path / "ref"
    ours = tmp_path / "ours"
    ref.mkdir()
    ours.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        x = rng.normal(size=(7,)).astype(np.float32)
        np.save(ref / f"c{i}.npy", x)
        np.save(ours / f"c{i}.npy", x + (1e-5 if i < 3 else 0.0))
    s = main([f"--reference_store={ref}", f"--our_store={ours}",
              "--tol=1e-3"])
    assert s["n_compared"] == 4 and s["max_abs"] < 1e-3

    # over-tolerance clip -> exit 1
    np.save(ours / "c0.npy", np.load(ref / "c0.npy") + 0.5)
    with pytest.raises(SystemExit):
        main([f"--reference_store={ref}", f"--our_store={ours}",
              "--tol=1e-3"])


def test_submission_and_score_with_valence(tmp_path):
    """MER2023 format: submissions carry a valence column (main-release.py
    :445-455) and scoring adds valMSE + the combined WAF - 0.25*MSE
    (:457-494). Also accepts main_release's emoprobs/valpreds npz keys."""
    from mertools_tpu.cli.evaluation import main

    names = [f"c{i}" for i in range(4)]
    probs = np.eye(6)[np.array([0, 1, 2, 3])]
    vals = np.array([0.5, -0.5, 0.0, 1.0])
    npz = tmp_path / "result.npz"
    np.savez_compressed(npz, emoprobs=probs, valpreds=vals, names=names)

    sub = tmp_path / "sub.csv"
    main(["submission", f"--result_npz={npz}", f"--save_csv={sub}"])
    text = sub.read_text(encoding="utf-8")
    assert "name,discrete,valence" in text and "0.5000" in text

    gt = tmp_path / "gt.csv"
    rows = ["name,discrete,valence"] + [
        f"c{i},{EMOS_MER[i]},{v}" for i, v in enumerate([0.5, -0.5, 1.0, 1.0])]
    gt.write_text("\n".join(rows) + "\n", encoding="utf-8")
    waf, acc, mse, combined = main(["score", f"--label_csv={gt}",
                                    f"--submission_csv={sub}"])
    assert acc == 1.0 and abs(mse - 0.25) < 1e-9
    assert abs(combined - (waf - 0.25 * mse)) < 1e-12


def test_parity_check_judge_mode(tmp_path, monkeypatch):
    """Judge token-exactness mode (VERDICT r3 #10): greedy caller output
    compared string-exactly (after reference flattening) against a
    reference-produced name,response CSV; exit 1 on mismatch."""
    import csv

    import pytest

    from mertools_tpu.cli import main_dpo, parity_check

    calls = {}

    class StubCaller:
        def __call__(self, samples, prompts):
            calls.setdefault("prompts", []).extend(prompts)
            return [f"resp for {s['video_path'].rsplit('/', 1)[-1]}\n"
                    for s in samples]

    def fake_factory(args):
        assert args.temperature == 0.0  # forced greedy
        sample = lambda r: {"video_path": f"/v/{r['name']}.mp4"}
        return (lambda rnd: StubCaller()), sample

    monkeypatch.setattr(main_dpo, "_make_caller_factory", fake_factory)

    ref_csv = tmp_path / "ref.csv"
    with open(ref_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["name", "response"])
        w.writeheader()
        w.writerow({"name": "u1", "response": "resp for u1.mp4"})
        w.writerow({"name": "u2", "response": "resp\tfor u2.mp4"})

    s = parity_check.main(["--judge=videochatgpt", "--ckpt=/x",
                           "--video_dir=/v",
                           f"--reference_responses={ref_csv}",
                           "--prompt=Describe."])
    assert s["n_compared"] == 2 and not s["mismatches"]
    assert calls["prompts"] == ["Describe.", "Describe."]

    # a diverging reference response must fail with exit code 1
    with open(ref_csv, "a", newline="") as f:
        csv.DictWriter(f, fieldnames=["name", "response"]).writerow(
            {"name": "u3", "response": "something else"})
    with pytest.raises(SystemExit):
        parity_check.main(["--judge=videochatgpt", "--ckpt=/x",
                           "--video_dir=/v",
                           f"--reference_responses={ref_csv}",
                           "--prompt=Describe."])
