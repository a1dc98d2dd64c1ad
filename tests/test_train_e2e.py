"""End-to-end training tests: synthetic separable data through the full CV
driver (the reference validates via metric reproduction — SURVEY.md §4)."""

import numpy as np
import pytest

from mertools_tpu.core.config import Args
from mertools_tpu.data.dataset import FeatureDataset, epoch_plan


def synth_dataset(n=120, feat_type="utt", n_classes=6, seed=0, ragged=False):
    """Class-conditional Gaussian features: trivially separable.

    Class centers are FIXED (seed 42) so datasets from different seeds share
    one distribution; ``seed`` only varies the samples.
    """
    center_rng = np.random.default_rng(42)
    centers = {m: center_rng.normal(size=(n_classes, d)) * 3.0
               for m, d in (("a", 10), ("t", 12), ("v", 8))}
    rng = np.random.default_rng(seed)
    emos = rng.integers(0, n_classes, size=n)
    vals = (emos.astype(np.float32) - n_classes / 2) / n_classes  # correlated valence
    def make(mod, dim):
        feats = []
        for e in emos:
            L = int(rng.integers(3, 12)) if ragged else 5
            feats.append((centers[mod][e] + 0.1 * rng.normal(size=(L, dim))).astype(np.float32))
        return feats
    audios, texts, videos = make("a", 10), make("t", 12), make("v", 8)
    names = [f"clip{i:04d}" for i in range(n)]
    return FeatureDataset.from_raw(names, emos, vals, audios, texts, videos,
                                   feat_type=feat_type), emos, vals


def test_epoch_plan_shapes():
    idx, mask = epoch_plan(np.arange(10), 4)
    assert idx.shape == (3, 4) and mask.shape == (3, 4)
    assert mask.sum() == 10
    # all real indices appear exactly once in masked positions
    assert sorted(idx.reshape(-1)[mask.reshape(-1).astype(bool)]) == list(range(10))


def test_epoch_plan_tiny_dataset():
    idx, mask = epoch_plan(np.arange(3), 8)
    assert idx.shape == (1, 8)
    assert mask.sum() == 3


def test_attention_forward_utt():
    import jax

    from mertools_tpu.models import get_model

    ds, _, _ = synth_dataset(16, "utt")
    args = Args(model="attention", hidden_dim=32, dropout=0.2,
                output_dim1=6, output_dim2=1, feat_type="utt")
    model = get_model(args)
    batch = {k: v[:8] for k, v in ds.arrays().items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)["params"]
    feats, emos_out, vals_out, interloss = model.apply({"params": params}, batch, train=False)
    assert feats.shape == (8, 32)
    assert emos_out.shape == (8, 6)
    assert vals_out.shape == (8, 1)
    assert float(interloss) == 0.0


def test_attention_forward_frm_align():
    import jax

    from mertools_tpu.models import get_model

    ds, _, _ = synth_dataset(16, "frm_align", ragged=True)
    assert ds.audios.ndim == 3
    assert ds.audios.shape[1] == ds.texts.shape[1] == ds.videos.shape[1]
    args = Args(model="attention", hidden_dim=16, dropout=0.0,
                output_dim1=6, output_dim2=1, feat_type="frm_align")
    model = get_model(args)
    batch = {k: v[:4] for k, v in ds.arrays().items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)["params"]
    _, emos_out, _, _ = model.apply({"params": params}, batch, train=False)
    assert emos_out.shape == (4, 6)


@pytest.mark.slow
def test_cv_training_learns_utt():
    from mertools_tpu.train import run_cv

    train_ds, _, _ = synth_dataset(100, "utt", seed=1)
    test_ds, _, _ = synth_dataset(40, "utt", seed=2)
    args = Args(model="attention", hidden_dim=32, dropout=0.2, lr=1e-3,
                l2=1e-5, grad_clip=-1.0, output_dim1=6, output_dim2=1,
                feat_type="utt", batch_size=16, epochs=12, num_folder=3,
                metric_name="emoval")
    result = run_cv(args, train_ds, {"test1": test_ds}, seed=0, verbose=False)
    assert result.cv["emofscore"] > 0.9, result.cv
    assert result.test_results["test1"]["emofscore"] > 0.9
    assert result.cv["valmse"] < 0.05
    assert len(result.best_epochs) == 3


@pytest.mark.slow
def test_cv_training_learns_frm_align():
    from mertools_tpu.train import run_cv

    train_ds, _, _ = synth_dataset(80, "frm_align", seed=3, ragged=True)
    args = Args(model="attention", hidden_dim=32, dropout=0.1, lr=2e-3,
                l2=1e-5, grad_clip=0.8, output_dim1=6, output_dim2=1,
                feat_type="frm_align", batch_size=16, epochs=15, num_folder=2,
                metric_name="emo")
    result = run_cv(args, train_ds, seed=0, verbose=False)
    assert result.cv["emofscore"] > 0.8, result.cv


def test_emo_only_dataset():
    """output_dim2=0 disables the valence head/loss (e.g. MELD-style)."""
    from mertools_tpu.train import run_cv

    train_ds, _, _ = synth_dataset(60, "utt", seed=4)
    args = Args(model="attention", hidden_dim=16, dropout=0.1, lr=1e-3,
                output_dim1=6, output_dim2=0, feat_type="utt",
                batch_size=16, epochs=3, num_folder=2, metric_name="emo")
    result = run_cv(args, train_ds, seed=0, verbose=False)
    assert "emofscore" in result.cv
    assert "valmse" not in result.cv
