"""End-to-end CLI test: synthetic feature store + labels on disk ->
main_release CLI -> npz artifacts. Exercises feature_store, labels, loaders,
hyper search, CV trainer, and artifact writing in one pass."""

import os

import numpy as np
import pytest

from mertools_tpu.data import feature_store, labels
from mertools_tpu.core.globals_mer import EMOS_MER


@pytest.fixture
def synth_store(tmp_path):
    """Build a tiny MER2023-layout dataset on disk."""
    root = tmp_path / "mer2023"
    feats_root = root / "features"
    center_rng = np.random.default_rng(42)
    centers = {m: center_rng.normal(size=(6, d)) * 3.0
               for m, d in (("a", 8), ("t", 10), ("v", 6))}

    def gen(split, n, seed):
        rng = np.random.default_rng(seed)
        corpus = {}
        for i in range(n):
            name = f"{split}_{i:04d}"
            e = int(rng.integers(0, 6))
            corpus[name] = {"emo": EMOS_MER[e], "val": float((e - 3) / 6)}
            for mod, d, store in (("a", 8, "audio-UTT"), ("t", 10, "text-UTT"),
                                  ("v", 6, "video-UTT")):
                feat = (centers[mod][e] + 0.1 * rng.normal(size=d)).astype(np.float32)
                feature_store.write_feature(str(feats_root / store), name, feat)
        return corpus

    corpora = {
        "train": gen("train", 60, 1),
        "test1": gen("test1", 20, 2),
        "test2": gen("test2", 20, 3),
        "test3": gen("test3", 20, 4),
    }
    os.makedirs(root, exist_ok=True)
    labels.write_label_archive(str(root / "label-6way.npz"), corpora)
    return root


def test_cli_end_to_end(synth_store, capsys):
    from mertools_tpu.cli.main_release import main

    save_root = str(synth_store / "saved")
    result = main([
        "--dataset=MER2023",
        "--audio_feature=audio-UTT", "--text_feature=text-UTT",
        "--video_feature=video-UTT", "--feat_type=utt",
        "--model=attention", "--lr=1e-3", "--batch_size=16", "--epochs=5",
        "--seed=0", f"--save_root={save_root}",
        f"--features_root={synth_store / 'features'}",
        f"--label_path={synth_store / 'label-6way.npz'}",
    ])
    assert result.cv["emofscore"] > 0.5  # separable data, few epochs
    res_dir = os.path.join(save_root + "-trimodal", "result")
    files = os.listdir(res_dir)
    assert any(f.startswith("cv_features:") for f in files)
    assert any(f.startswith("test1_") for f in files)
    assert any(f.startswith("test3_") for f in files)
    # artifact is loadable and carries fold-averaged logits
    test1 = [f for f in files if f.startswith("test1_")][0]
    arch = np.load(os.path.join(res_dir, test1), allow_pickle=True)
    assert arch["emoprobs"].shape == (20, 6)


def test_feature_store_roundtrip(tmp_path, rng):
    root = str(tmp_path / "store")
    feature_store.write_feature(root, "clip1", rng.normal(size=(7, 4)))
    feature_store.write_feature(root, "clip2", rng.normal(size=4))
    feats, dim = feature_store.read_features(root, ["clip1", "clip2"])
    assert feats[0].shape == (7, 4)
    assert feats[1].shape == (1, 4)  # (D,) normalizes to (1, D)
    assert dim == 4
    assert feature_store.check_completeness(root, ["clip1", "clip3"]) == ["clip3"]


def test_labels_roundtrip(tmp_path):
    path = str(tmp_path / "label.npz")
    labels.write_label_archive(path, {
        "train": {"a": {"emo": "happy", "val": 0.5}, "b": {"emo": 2, "val": ""}},
    })
    names, emos, vals = labels.read_names_labels(path, "train")
    assert names == ["a", "b"]
    assert emos.tolist() == [2, 2]
    assert vals[1] == -10.0


def test_loader_protocols():
    from mertools_tpu.core.config import Args
    from mertools_tpu.core.registry import registry

    cases = {
        "MER2023": (6, 1, "emoval", 5),
        "MELD": (7, 0, "emo", 1),
        "IEMOCAPFour": (4, 0, "emo", 5),
        "CMUMOSI": (0, 1, "emo", 1),
        "SIMS": (0, 1, "emo", 1),
        "MER2025": (6, 0, "emo", 5),
    }
    for name, (d1, d2, metric, folds) in cases.items():
        args = Args(dataset=name)
        loader = registry.get_dataset(name)(args)
        assert (args.output_dim1, args.output_dim2, args.metric_name,
                args.num_folder) == (d1, d2, metric, folds), name


def test_iemocap_session_folds():
    from mertools_tpu.core.config import Args
    from mertools_tpu.data.loaders import IEMOCAPFourLoader

    loader = IEMOCAPFourLoader(Args(dataset="IEMOCAPFour"))
    names = [f"Ses0{s}F_impro{i:02d}" for s in range(1, 6) for i in range(4)]
    folds = loader.make_folds(names, seed=0)
    assert len(folds) == 5
    for k, (tr, ev) in enumerate(folds):
        assert len(ev) == 4 and len(tr) == 16
        assert all(int(names[i][4]) - 1 == k for i in ev)


def test_sweep_driver(synth_store):
    """MERBench protocol driver: search runs then best-config repeats."""
    from mertools_tpu.cli.sweep import main as sweep_main

    sweep_main([
        "--n_search=1", "--n_repeat=1", "--",
        "--dataset=MER2023",
        "--audio_feature=audio-UTT", "--text_feature=text-UTT",
        "--video_feature=video-UTT", "--feat_type=utt",
        "--model=attention", "--batch_size=16", "--epochs=3",
        f"--save_root={synth_store / 'saved'}",
        f"--features_root={synth_store / 'features'}",
        f"--label_path={synth_store / 'label-6way.npz'}",
    ])
