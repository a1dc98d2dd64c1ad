"""Open-vocabulary scoring CLI (``MER2024/main-ov.py`` + wheel evaluation of
``MER2025/MER2025_Track23/evaluation.py:96-120`` equivalents).

    # MER2024 set-level metric with precomputed synonym groups
    python -m mertools_tpu.cli.main_ov mer2024 --gt_csv=gt.csv \
        --pred_csv=pred.csv --synonym_root=.../synonyms

    # emotion-wheel metric (5 wheels x level1/level2)
    python -m mertools_tpu.cli.main_ov wheel --gt_csv=gt.csv \
        --pred_npz=name2openset.npz --wheel_json=wheels.json

CSV conventions follow the reference: gt column ``openset`` (list-like
string), pred column ``openset``/``pred``; synonym groups one ``{name}.npy``
per clip (main-ov.py:40-49).
"""

from __future__ import annotations

import argparse
import csv
import json
import os

import numpy as np

from ..ops.ov_metrics import (load_wheels, mer2024_ov_metric,
                              string_to_list, wheel_metric_calculation)


def _read_csv_map(path, key_col, val_col):
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    return {r[key_col]: r.get(val_col, "") for r in rows}


def _load_pred(pred_csv=None, pred_npz=None):
    if pred_csv:
        with open(pred_csv, newline="", encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        col = "openset" if rows and "openset" in rows[0] else "pred"
        return {r["name"]: r.get(col, "") for r in rows}
    data = np.load(pred_npz, allow_pickle=True)
    if "name2openset" in data:
        return dict(data["name2openset"].item())
    return dict(zip([str(n) for n in data["filenames"]],
                    [str(i) for i in data["fileitems"]]))


def cmd_mer2024(args):
    name2gt = _read_csv_map(args.gt_csv, "name", "openset")
    name2pred = _load_pred(args.pred_csv, args.pred_npz)
    name2syn = {}
    for name in name2gt:
        path = os.path.join(args.synonym_root, f"{name}.npy")
        if not os.path.exists(path):
            continue
        groups = np.load(path, allow_pickle=True).tolist()
        name2syn[name] = [[str(m).lower() for m in g] for g in groups]
    scores = mer2024_ov_metric(name2gt, name2pred, name2syn)
    print(f"accuracy: {scores['accuracy']:.4f}")
    print(f"recall: {scores['recall']:.4f}")
    print(f"avg_score: {scores['avg_score']:.4f}")
    return scores


def cmd_wheel(args):
    name2gt = _read_csv_map(args.gt_csv, "name", "openset")
    name2pred = _load_pred(args.pred_csv, args.pred_npz)
    format_mapping, raw_mapping = {}, {}
    if args.wheel_root:  # reference layout: wheel*.{csv,xlsx} dir
        wheels = load_wheels(args.wheel_root)
    else:
        with open(args.wheel_json, encoding="utf-8") as f:
            spec = json.load(f)
        wheels = spec["wheels"]
        format_mapping = spec.get("format_mapping", {})
        raw_mapping = spec.get("raw_mapping", {})
    names = [n for n in name2gt if n in name2pred]
    out = {}
    for level in ("level1", "level2"):
        f_, p_, r_ = wheel_metric_calculation(
            name2gt, name2pred, wheels, format_mapping, raw_mapping,
            level=level, process_names=names)
        out[level] = {"f": f_, "precision": p_, "recall": r_}
        print(f"{level}: F={f_:.4f} P={p_:.4f} R={r_:.4f}")
    avg = float(np.mean([out["level1"]["f"], out["level2"]["f"]]))
    print(f"avg_F: {avg:.4f}")
    out["avg_f"] = avg
    return out


def main(argv=None):
    p = argparse.ArgumentParser("main_ov")
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("mer2024")
    m.add_argument("--gt_csv", required=True)
    m.add_argument("--pred_csv", default=None)
    m.add_argument("--pred_npz", default=None)
    m.add_argument("--synonym_root", required=True)
    m.set_defaults(fn=cmd_mer2024)

    w = sub.add_parser("wheel")
    w.add_argument("--gt_csv", required=True)
    w.add_argument("--pred_csv", default=None)
    w.add_argument("--pred_npz", default=None)
    w.add_argument("--wheel_json", default=None)
    w.add_argument("--wheel_root", default=None,
                   help="dir of wheel*.{csv,xlsx} (reference layout)")
    w.set_defaults(fn=cmd_wheel)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
