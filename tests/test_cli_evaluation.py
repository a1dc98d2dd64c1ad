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
