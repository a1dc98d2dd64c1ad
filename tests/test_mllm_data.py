"""MLLM training data pipeline: CSV join, batch construction, label spans,
and an end-to-end training-convergence check through the Runner."""

import numpy as np
import pytest

import jax

from mertools_tpu.mllm import AffectGPT, AffectGPTConfig, LLMConfig, QFormerConfig
from mertools_tpu.mllm.data import CaptionDataset, batch_iterator, build_batch


class FakeTokenizer:
    eos_token_id = 2

    def encode(self, text, add_special_tokens=True):
        return [3 + (hash(w) % 90) for w in text.split()]


@pytest.fixture
def csv_store(tmp_path):
    feats_v = tmp_path / "video_feats"
    feats_a = tmp_path / "audio_feats"
    feats_v.mkdir()
    feats_a.mkdir()
    rng = np.random.default_rng(0)
    names = [f"clip{i}" for i in range(8)]
    for n in names:
        np.save(feats_v / f"{n}.npy", rng.normal(size=(6, 12)).astype(np.float32))
        np.save(feats_a / f"{n}.npy", rng.normal(size=(4, 10)).astype(np.float32))
    (tmp_path / "openset.csv").write_text(
        "name,openset\n" + "\n".join(f'{n},"happy, calm"' for n in names) +
        "\nmissing_clip,sad\n", encoding="utf-8")
    (tmp_path / "reason.csv").write_text(
        "name,reason\n" + "\n".join(f"{n},the person smiles warmly"
                                    for n in names) + "\n", encoding="utf-8")
    (tmp_path / "subtitle.csv").write_text(
        "name,english\n" + "\n".join(f"{n},i am fine" for n in names) + "\n",
        encoding="utf-8")
    return tmp_path


def test_dataset_join_skips_missing(csv_store):
    ds = CaptionDataset.from_csvs(
        str(csv_store / "openset.csv"), str(csv_store / "reason.csv"),
        str(csv_store / "subtitle.csv"), str(csv_store / "video_feats"),
        str(csv_store / "audio_feats"))
    assert len(ds) == 8  # missing_clip has no features -> dropped
    s = ds.sample(0, np.random.default_rng(0))
    assert s["video_feats"].shape == (6, 12)
    assert s["answer"] == "the person smiles warmly"


def test_build_batch_label_span(csv_store):
    ds = CaptionDataset.from_csvs(
        str(csv_store / "openset.csv"), str(csv_store / "reason.csv"),
        str(csv_store / "subtitle.csv"), str(csv_store / "video_feats"),
        str(csv_store / "audio_feats"), label_type="ovlabel")
    tok = FakeTokenizer()
    rng = np.random.default_rng(0)
    batch = build_batch([ds.sample(i, rng) for i in range(3)], tok,
                        num_av_tokens=6)
    labels = batch["labels"]
    mask = batch["attention_mask"]
    for b in range(3):
        lab_pos = np.nonzero(labels[b] != -100)[0]
        n_valid = mask[b].sum()
        # answer span is a contiguous suffix of the valid tokens, ends w/ EOS
        assert labels[b, n_valid - 1] == tok.eos_token_id
        assert (lab_pos == np.arange(lab_pos[0], n_valid)).all()
        # splice placeholder zeros present at splice_start
        st = batch["splice_start"][b]
        assert (batch["input_ids"][b, st: st + 6] == 0).all()


def test_training_loss_decreases(csv_store):
    import optax

    cfg = AffectGPTConfig(
        llm=LLMConfig(vocab_size=96, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=4, intermediate_size=64,
                      lora_r=2),
        video_qformer=QFormerConfig(num_queries=4, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        audio_qformer=QFormerConfig(num_queries=2, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        video_dim=12, audio_dim=10, max_video_frames=8)
    model = AffectGPT(cfg)
    ds = CaptionDataset.from_csvs(
        str(csv_store / "openset.csv"), str(csv_store / "reason.csv"),
        str(csv_store / "subtitle.csv"), str(csv_store / "video_feats"),
        str(csv_store / "audio_feats"))
    it = batch_iterator(ds, FakeTokenizer(), model.num_av_tokens,
                        batch_size=4, seed=0, pad_to_multiple=16)
    batch0 = next(it)
    params = model.init(jax.random.PRNGKey(0), batch0)["params"]
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, b):
        def loss_fn(pp):
            return model.apply({"params": pp}, b)[0]
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    losses = []
    for i in range(25):
        params, opt, loss = step(params, opt, next(it))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < 0.6 * np.mean(losses[:5]), losses[:3] + losses[-3:]
