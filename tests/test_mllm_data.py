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
    assert s["answer"] == "the person smiles warmly"  # description passthrough


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


def test_build_qa_full_algebra():
    """Every reference QA type (base_dataset.py:254-374) renders its exact
    question/answer template; mixed/hybird selection draws only from
    candidate types the annotation supports."""
    import numpy as np

    from mertools_tpu.mllm.data import (CaptionDataset, build_qa,
                                        IMAGE_CAPTION_PROMPTS,
                                        AUDIO_CAPTION_PROMPTS)

    ds = CaptionDataset(annotations=[], video_feat_dir="", audio_feat_dir="",
                        candidate_labels="happy, sad, angry",
                        minval=-3.0, maxval=3.0)
    rng = np.random.default_rng(0)
    ann = {"description": "smiles a lot", "ovlabel": "happy, calm",
           "onehot": "happy", "valence": "2.5", "sentiment": "",
           "caption": "a sunny park", "question": "What is shown?",
           "answer": "A park.", "a1": "desc one", "a2": "desc two",
           "p": "a2", "reward": "accept"}

    q, a = build_qa("description", ann, ds, rng)
    assert q == ("Please infer the person's emotional state and provide "
                 "your reasoning process.")
    assert a == "smiles a lot"

    q, a = build_qa("ovlabel", ann, ds, rng)
    assert a == "The character's emotional state is happy, calm."

    q, a = build_qa("onehot_w_candidates", ann, ds, rng)
    assert "happy, sad, angry" in q and a == "The most likely label is happy."

    q, a = build_qa("onehot_wo_candidates", ann, ds, rng)
    assert a == "The character's emotional state is happy."

    q, a = build_qa("valence", ann, ds, rng)
    assert "-3.0" in q and "3.0" in q
    assert a == "The valence score is 2.50."

    q, a = build_qa("sentiment", ann, ds, rng)  # derived from valence sign
    assert a == "The character's sentiment state is positive."
    q, a = build_qa("sentiment", {**ann, "sentiment": "negative"}, ds, rng)
    assert a == "The character's sentiment state is negative."

    q, a = build_qa("qa", ann, ds, rng)
    assert (q, a) == ("What is shown?", "A park.")

    q, a = build_qa("caption_image", ann, ds, rng)
    assert q in IMAGE_CAPTION_PROMPTS and a == "a sunny park"
    q, a = build_qa("caption_audio", ann, ds, rng)
    assert q in AUDIO_CAPTION_PROMPTS

    q, a = build_qa("preference", ann, ds, rng)
    assert "desc one" in q and a == "The best one is a2."
    q, a = build_qa("preference", {**ann, "p": "same"}, ds, rng)
    assert a.startswith("These two sentences describe")

    q, a = build_qa("reward", ann, ds, rng)
    assert "smiles a lot" in q and a == "accept this sentence."


def test_caption_dataset_hybird_candidates(tmp_path):
    """hybird label_type samples across the QA types the csv columns enable
    (extra columns ride on the openset csv)."""
    import csv

    import numpy as np

    from mertools_tpu.mllm.data import CaptionDataset

    vdir = tmp_path / "v"; adir = tmp_path / "a"
    vdir.mkdir(); adir.mkdir()
    rng = np.random.default_rng(0)
    np.save(vdir / "c1.npy", rng.normal(size=(4, 12)).astype(np.float32))
    np.save(adir / "c1.npy", rng.normal(size=(3, 10)).astype(np.float32))
    with open(tmp_path / "openset.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "openset", "valence"])
        w.writerow(["c1", "['happy']", "-0.8"])
    with open(tmp_path / "reason.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "reason"])
        w.writerow(["c1", "frowns deeply"])
    ds = CaptionDataset.from_csvs(
        str(tmp_path / "openset.csv"), str(tmp_path / "reason.csv"), None,
        str(vdir), str(adir), label_type="hybird")
    seen = set()
    for i in range(40):
        s = ds.sample(0, rng)
        seen.add(s["question"])
    # description + ovlabel + sentiment + valence all reachable
    assert len(seen) == 4, seen
    s = ds.sample(0, np.random.default_rng(3))
    assert isinstance(s["answer"], str) and s["answer"]
