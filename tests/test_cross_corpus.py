"""Cross-corpus protocols: 4-class label intersection (CROSSDIS) and
dimensional transfer (CROSSDIM), end-to-end through the CLI."""

import numpy as np
import pytest

from mertools_tpu.data import feature_store, labels


def _write_feats(feats_root, names, rng, d=6, sep_by_emo=None):
    for store in ("audio-UTT", "text-UTT", "video-UTT"):
        for i, n in enumerate(names):
            base = rng.normal(size=d)
            if sep_by_emo is not None:
                base = base * 0.1 + sep_by_emo[i] * 2.0
            feature_store.write_feature(str(feats_root / store), n,
                                        base.astype(np.float32))


@pytest.fixture
def cross_stores(tmp_path):
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4, 6)) * 2
    # source: MER2023-style with string emos incl. 2 not in the common set
    src = tmp_path / "mer2023"
    emo_names = ["happy", "sad", "neutral", "angry", "worried", "surprise"]
    corpus, vec = {}, []
    names = []
    for i in range(40):
        e = i % 6
        n = f"s{i:03d}"
        corpus[n] = {"emo": emo_names[e], "val": 0.0}
        names.append(n)
        vec.append(centers[min(e, 3)])
    labels.write_label_archive(str(src / "labels.npz") if src.mkdir() is None
                               else "", {"train": corpus})
    _write_feats(src / "features", names, rng,
                 sep_by_emo=np.stack(vec))

    # target: MELD-style with int emo indices (own order)
    tgt = tmp_path / "meld"
    tgt.mkdir()
    corpus_t, names_t, vec_t = {}, [], []
    meld_to_common = {0: 3, 1: 0, 2: 1, 3: 2}  # angry,happy,sad,neutral
    for i in range(20):
        e = i % 4
        n = f"t{i:03d}"
        corpus_t[n] = {"emo": e, "val": 0.0}
        names_t.append(n)
        vec_t.append(centers[meld_to_common[e]])
    labels.write_label_archive(str(tgt / "labels.npz"), {"test": corpus_t})
    _write_feats(tgt / "features", names_t, rng, sep_by_emo=np.stack(vec_t))
    return src, tgt


def test_crossdis_loader(cross_stores):
    src, tgt = cross_stores
    from mertools_tpu.core.config import Args
    from mertools_tpu.data.loaders import get_loader

    args = Args({"train_dataset": "MER2023", "test_dataset": "MELD",
                 "dataset": None, "feat_type": "utt", "feat_scale": 1,
                 "audio_feature": "audio-UTT", "text_feature": "text-UTT",
                 "video_feature": "video-UTT",
                 "features_root": str(src / "features"),
                 "label_path": str(src / "labels.npz"),
                 "test_features_root": str(tgt / "features"),
                 "test_label_path": str(tgt / "labels.npz")})
    loader = get_loader(args)
    assert args.output_dim1 == 4 and args.output_dim2 == 0
    train_set, folds, test_sets = loader.load(seed=0)
    # 40 source samples, 2 of 6 emotions dropped -> ~27 kept
    assert len(train_set) == 28  # 40 * 4/6 rounded by the i%6 pattern
    assert len(test_sets["test1"]) == 20
    assert set(np.unique(train_set.emos)) <= {0, 1, 2, 3}
    # label alignment: same emotion -> same feature cluster across corpora
    for e in range(4):
        tr_mean = train_set.audios[train_set.emos == e].mean(0)
        te_mean = test_sets["test1"].audios[test_sets["test1"].emos == e].mean(0)
        assert np.linalg.norm(tr_mean - te_mean) < 1.0, e


def test_crossdis_cli_end_to_end(cross_stores):
    src, tgt = cross_stores
    from mertools_tpu.cli.main_release import main

    result = main([
        "--train_dataset=MER2023", "--test_dataset=MELD",
        "--audio_feature=audio-UTT", "--text_feature=text-UTT",
        "--video_feature=video-UTT", "--feat_type=utt",
        "--model=attention", "--lr=2e-3", "--batch_size=8", "--epochs=6",
        "--seed=0", f"--save_root={src / 'saved'}",
        f"--features_root={src / 'features'}",
        f"--label_path={src / 'labels.npz'}",
        f"--test_features_root={tgt / 'features'}",
        f"--test_label_path={tgt / 'labels.npz'}",
    ])
    # separable synthetic clusters: transfer should beat chance (0.25) easily
    assert result.test_results["test1"]["emofscore"] > 0.5
