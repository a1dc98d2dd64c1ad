"""MER2024 extensions: snr-tagged feature stores (noise sweeps) and top-N
fusion via the rank lists."""

import os

import numpy as np
import pytest

from mertools_tpu.core import globals_mer as G
from mertools_tpu.core.globals_mer import EMOS_MER
from mertools_tpu.data import feature_store, labels
from mertools_tpu.data.dataset import snr_variant


def test_snr_variant_naming():
    assert snr_variant("chinese-hubert-large-UTT", "noisesnrmix") == \
        "chinese-hubert-large-noisesnrmix-UTT"
    assert snr_variant("eGeMAPS_UTT", "noisesnr5") == "eGeMAPS_noisesnr5_UTT"
    assert snr_variant("x-FRA", None) == "x-FRA"


@pytest.fixture
def snr_store(tmp_path):
    root = tmp_path / "ds"
    feats = root / "features"
    rng = np.random.default_rng(0)
    corpus = {}
    stores = ["audio-UTT", "audio-noisesnr5-UTT", "text-UTT", "video-UTT",
              "text-noisesnr5-UTT", "video-noisesnr5-UTT"]
    for i in range(12):
        name = f"train_{i:03d}"
        e = int(rng.integers(0, 6))
        corpus[name] = {"emo": EMOS_MER[e], "val": 0.0}
        for store in stores:
            # noisy features are offset by +100 so the test can tell them apart
            off = 100.0 if "noisesnr" in store else 0.0
            feature_store.write_feature(str(feats / store), name,
                                        (rng.normal(size=4) + off).astype(np.float32))
    labels.write_label_archive(str(root / "labels.npz"),
                               {"train": corpus, "test1": corpus})
    return root


def test_loader_snr_switch(snr_store):
    from mertools_tpu.core.config import Args
    from mertools_tpu.data.loaders import get_loader

    args = Args({"dataset": "MER2024", "feat_type": "utt", "feat_scale": 1,
                 "label_path": str(snr_store / "labels.npz"),
                 "features_root": str(snr_store / "features"),
                 "audio_root": str(snr_store / "features" / "audio-UTT"),
                 "text_root": str(snr_store / "features" / "text-UTT"),
                 "video_root": str(snr_store / "features" / "video-UTT"),
                 "train_snr": None, "test_snr": "noisesnr5"})
    loader = get_loader(args)
    train_set, folds, test_sets = loader.load(seed=0)
    assert train_set.audios.mean() < 50           # clean store
    assert test_sets["test1"].audios.mean() > 50  # snr-tagged store


def test_topn_dataset(tmp_path, monkeypatch):
    from mertools_tpu.data.dataset import TopNFeatureDataset

    feats = tmp_path / "features"
    rng = np.random.default_rng(1)
    names = [f"c{i}" for i in range(6)]
    # populate stores for the top-1 entries of each modality rank
    top_feats = [G.AUDIO_RANK_LOW2HIGH[-1], G.TEXT_RANK_LOW2HIGH[-1],
                 G.IMAGE_RANK_LOW2HIGH[-1]]
    for fname in top_feats:
        for n in names:
            feature_store.write_feature(
                str(feats / f"{fname}-UTT"), n,
                rng.normal(size=(3, 5)).astype(np.float32))

    ds = TopNFeatureDataset.build(names, np.zeros(6), np.zeros(6),
                                  str(feats), topn=1, modality="AVT")
    assert len(ds.feats) == 3                 # topn * 3 slots
    assert ds.feats[0].shape == (6, 5)        # UTT-pooled
    arrays = ds.arrays()
    assert set(arrays) == {"feat0", "feat1", "feat2", "emos", "vals"}


def test_topn_attention_model(rng):
    import jax

    from mertools_tpu.core.config import Args
    from mertools_tpu.models.attention_topn import AttentionTopN

    model = AttentionTopN(feat_dims=(5, 7, 6), hidden_dim=16)
    batch = {f"feat{i}": rng.normal(size=(4, d)).astype(np.float32)
             for i, d in enumerate((5, 7, 6))}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    feats, emos, vals, inter = model.apply({"params": params}, batch)
    assert emos.shape == (4, 6) and np.isfinite(np.asarray(emos)).all()
