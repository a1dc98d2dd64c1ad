"""Loss/metric parity tests vs torch reference semantics
(MERBench/toolkit/utils/loss.py, metric.py, dataloader/mer2023.py:137-155)."""

import numpy as np
import torch
import torch.nn.functional as F

from mertools_tpu.ops import losses, metrics


def torch_celoss(pred, target):
    """Reference CELoss: NLL(log_softmax), reduction=sum, / len(pred)."""
    logp = F.log_softmax(torch.tensor(pred), 1)
    return float(F.nll_loss(logp, torch.tensor(target).long(), reduction="sum") / len(pred))


def torch_mseloss(pred, target):
    p = torch.tensor(pred).view(-1, 1)
    t = torch.tensor(target).view(-1, 1)
    return float(F.mse_loss(p, t, reduction="sum") / len(p))


def test_cross_entropy_matches_torch(rng):
    import jax.numpy as jnp

    logits = rng.normal(size=(7, 6)).astype(np.float32)
    labels = rng.integers(0, 6, size=7)
    ours = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, torch_celoss(logits, labels), rtol=1e-5)


def test_cross_entropy_mask_ignores_padding(rng):
    import jax.numpy as jnp

    logits = rng.normal(size=(4, 6)).astype(np.float32)
    labels = rng.integers(0, 6, size=4)
    padded_logits = np.concatenate([logits, rng.normal(size=(2, 6)).astype(np.float32)])
    padded_labels = np.concatenate([labels, [0, 0]])
    mask = np.array([1, 1, 1, 1, 0, 0], dtype=np.float32)
    ours = float(losses.cross_entropy(jnp.asarray(padded_logits), jnp.asarray(padded_labels), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, torch_celoss(logits, labels), rtol=1e-5)


def test_mse_matches_torch(rng):
    import jax.numpy as jnp

    preds = rng.normal(size=(9, 1)).astype(np.float32)
    targets = rng.normal(size=(9,)).astype(np.float32)
    ours = float(losses.mse(jnp.asarray(preds), jnp.asarray(targets)))
    np.testing.assert_allclose(ours, torch_mseloss(preds, targets), rtol=1e-5)


def test_overall_metric():
    assert metrics.overall_metric(0.8, 0.4) == 0.8 - 0.25 * 0.4


def test_calculate_results_and_gain_metric(rng):
    probs = rng.normal(size=(50, 6))
    labels = rng.integers(0, 6, size=50)
    vp = rng.normal(size=50)
    vl = rng.normal(size=50)
    res = metrics.calculate_results(probs, labels, vp, vl)
    from sklearn.metrics import accuracy_score, f1_score, mean_squared_error

    preds = probs.argmax(1)
    assert res["emoacc"] == accuracy_score(labels, preds)
    assert res["emofscore"] == f1_score(labels, preds, average="weighted")
    np.testing.assert_allclose(res["valmse"], mean_squared_error(vl, vp))
    assert metrics.gain_metric(res, "emoval") == res["emofscore"] - 0.25 * res["valmse"]
    assert metrics.gain_metric(res, "emo") == res["emofscore"]
    assert metrics.gain_metric(res, "val") == -res["valmse"]


def test_average_folds(rng):
    folds = []
    for _ in range(3):
        folds.append({
            "test1_emoprobs": rng.normal(size=(10, 6)),
            "test1_emolabels": np.arange(10) % 6,
            "test1_valpreds": rng.normal(size=10),
            "test1_vallabels": np.zeros(10),
        })
    avg = metrics.average_folds(folds, "test1")
    np.testing.assert_allclose(
        avg["emoprobs"], np.stack([f["test1_emoprobs"] for f in folds]).mean(0))
    np.testing.assert_allclose(
        avg["valpreds"], np.stack([f["test1_valpreds"] for f in folds]).mean(0))
