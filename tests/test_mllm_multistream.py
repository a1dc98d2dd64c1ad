"""Multi-stream AffectGPT (face_or_frame modes): stream plan, reference-exact
fusion math (numpy oracles of affectgpt.py:442-520,615-640), multi-segment
splice, batch building, and gradient flow."""

import numpy as np
import pytest


def _cfg(face_or_frame, fusion="attention", multi_fusion="attention",
         n_multi=1, with_multi_qformer=False):
    from mertools_tpu.mllm import AffectGPTConfig, LLMConfig, QFormerConfig

    return AffectGPTConfig(
        llm=LLMConfig(vocab_size=64, hidden_size=32, num_layers=1,
                      num_heads=4, num_kv_heads=4, intermediate_size=64,
                      lora_r=2),
        video_qformer=QFormerConfig(num_queries=4, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        audio_qformer=QFormerConfig(num_queries=2, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        multi_qformer=(QFormerConfig(num_queries=3, hidden_size=16,
                                     num_layers=1, num_heads=2,
                                     intermediate_size=32)
                       if with_multi_qformer else None),
        video_dim=12, audio_dim=10, max_video_frames=8, max_audio_frames=8,
        fusion=fusion, multi_fusion=multi_fusion,
        num_multi_query_token=n_multi, face_or_frame=face_or_frame)


def _stream_batch(cfg, rng, B=2, S=24):
    """Hand-placed placeholder runs at known offsets."""
    from mertools_tpu.mllm.affectgpt import stream_plan

    segments, needed = stream_plan(cfg.face_or_frame)
    T = {"face": 6, "frame": 5, "audio": 4, "image": 3}
    D = {"face": cfg.video_dim, "frame": cfg.video_dim,
         "audio": cfg.audio_dim, "image": cfg.image_dim or cfg.video_dim}
    batch = {
        "input_ids": rng.integers(3, 64, size=(B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "labels": np.full((B, S), -100, np.int64),
    }
    batch["labels"][:, -3:] = 7
    pos = 1
    for seg in segments:
        n = cfg.segment_tokens(seg)
        batch[f"splice_{seg}"] = np.full(B, pos, np.int32)
        batch["input_ids"][:, pos: pos + n] = 0
        pos += n + 2
    assert pos < S - 4
    for s in needed:
        batch[f"{s}_feats"] = rng.normal(
            size=(B, T[s], D[s])).astype(np.float32)
        batch[f"{s}_mask"] = np.ones((B, T[s]), np.int32)
    return batch


def test_stream_plan_matches_reference_table():
    from mertools_tpu.mllm.affectgpt import stream_plan

    # base_dataset.py:150-181 get_needed_data + prompt templates :463-549
    assert stream_plan("multiface_audio_face_text") == (
        ("multi", "audio", "face"), {"face", "audio"})
    assert stream_plan("multiface_text") == (("multi",), {"face", "audio"})
    assert stream_plan("multiframe_audio_frame_text") == (
        ("multi", "audio", "frame"), {"frame", "audio"})
    assert stream_plan("faceframe") == (
        ("audio", "frame", "face"), {"face", "frame", "audio"})
    assert stream_plan("textonly") == ((), set())
    assert stream_plan("image") == (("image",), {"image"})
    segs, needed = stream_plan("multiface_audio_face_frame_text")
    assert segs == ("multi", "audio", "face", "frame")
    assert needed == {"face", "frame", "audio"}


def test_multistream_forward_and_oracle():
    """Best-setup mode (multiface_audio_face_text, attention fusion —
    train_configs/..._bestsetup_bestfusion_face_lz.yaml:16-19,55): the spliced
    embeddings must equal a numpy re-derivation of the reference formulas."""
    import jax

    from mertools_tpu.mllm import AffectGPT

    cfg = _cfg("multiface_audio_face_text")
    model = AffectGPT(cfg)
    rng = np.random.default_rng(0)
    batch = _stream_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    loss, logits = model.apply({"params": params}, batch)
    assert np.isfinite(float(loss))
    assert logits.shape == (2, 24, 64)

    embeds = np.asarray(model.apply({"params": params}, batch,
                                    method=AffectGPT.generate_step_embeds))

    def dense(p, x):
        return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    face, audio = batch["face_feats"], batch["audio_feats"]
    # encode_video_attention (:442-478): unnormalized linear scores
    f_scores = dense(params["video_attention_mlp"], face)        # (B, T, 1)
    f_pool = (face * f_scores).sum(1)                            # (B, D)
    face_tok = dense(params["video_proj"], f_pool)               # (B, H)
    a_scores = dense(params["audio_attention_mlp"], audio)
    a_pool = (audio * a_scores).sum(1)
    audio_tok = dense(params["audio_proj"], a_pool)
    # encode_multi_attention (:615-640): mean -> shared width -> 2-way mix
    vp = dense(params["multi_video_embs"], face.mean(1))
    ap = dense(params["multi_audio_embs"], audio.mean(1))
    att = dense(params["fc_att"],
                dense(params["attention_mlp"],
                      np.concatenate([vp, ap], -1)))             # (B, 2)
    fused = vp * att[:, 0:1] + ap * att[:, 1:2]
    multi_tok = dense(params["multi_proj"], fused)

    for seg, tok in (("multi", multi_tok), ("audio", audio_tok),
                     ("face", face_tok)):
        start = int(batch[f"splice_{seg}"][0])
        got = embeds[:, start]  # 1 token per segment in attention mode
        np.testing.assert_allclose(got, tok, rtol=1e-4, atol=1e-5,
                                   err_msg=seg)


def test_multistream_grads_reach_all_branches():
    import jax

    from mertools_tpu.mllm import AffectGPT, trainable_labels
    from mertools_tpu.mllm.llm import lm_loss

    cfg = _cfg("multiface_audio_face_text")
    model = AffectGPT(cfg)
    rng = np.random.default_rng(1)
    batch = _stream_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(1), batch)["params"]

    grads = jax.grad(
        lambda p: model.apply({"params": p}, batch)[0])(params)
    for name in ("video_attention_mlp", "audio_attention_mlp",
                 "attention_mlp", "fc_att", "multi_video_embs",
                 "multi_audio_embs", "multi_proj", "video_proj",
                 "audio_proj"):
        g = np.asarray(grads[name]["kernel"])
        assert np.abs(g).max() > 0, name
    labels = trainable_labels(params)
    assert labels["multi_proj"]["kernel"] == "train"
    assert labels["llm"]["layer_0"]["q_proj"]["kernel"] == "frozen"


def test_multistream_qformer_mask_invariance():
    """qformer fusion for every branch: padded tails must not leak."""
    import jax

    from mertools_tpu.mllm import AffectGPT

    cfg = _cfg("multiframe_audio_frame_text", fusion="qformer",
               multi_fusion="qformer", with_multi_qformer=True)
    model = AffectGPT(cfg)
    rng = np.random.default_rng(2)
    batch = _stream_batch(cfg, rng, S=32)
    params = model.init(jax.random.PRNGKey(2), batch)["params"]
    l1, _ = model.apply({"params": params}, batch)

    b2 = dict(batch)
    fm = batch["frame_mask"].copy()
    fm[:, 3:] = 0
    am = batch["audio_mask"].copy()
    am[:, 2:] = 0
    b2["frame_mask"], b2["audio_mask"] = fm, am
    ff = batch["frame_feats"].copy()
    ff[:, 3:] = 99.0
    af = batch["audio_feats"].copy()
    af[:, 2:] = -99.0
    b3 = dict(b2, frame_feats=ff, audio_feats=af)
    l2, _ = model.apply({"params": params}, b2)
    l3, _ = model.apply({"params": params}, b3)
    np.testing.assert_allclose(float(l2), float(l3), rtol=1e-5)
    assert abs(float(l1) - float(l2)) > 1e-7  # masking does change the loss


def test_build_stream_batch_and_iterator():
    from mertools_tpu.mllm.affectgpt import stream_plan
    from mertools_tpu.mllm.data import (FakeWordTokenizer,
                                        build_stream_batch)

    cfg = _cfg("multiface_audio_face_text")
    tok = FakeWordTokenizer(64)
    rng = np.random.default_rng(0)
    samples = [{
        "face_feats": rng.normal(size=(t, cfg.video_dim)).astype(np.float32),
        "audio_feats": rng.normal(size=(t + 1,
                                        cfg.audio_dim)).astype(np.float32),
        "subtitle": "hello there", "question": "what emotion?",
        "answer": "happy and calm"} for t in (3, 5)]
    batch = build_stream_batch(samples, tok, cfg, max_len=256)
    segments, _ = stream_plan(cfg.face_or_frame)
    for seg in segments:
        n = cfg.segment_tokens(seg)
        for b in range(2):
            s = int(batch[f"splice_{seg}"][b])
            assert (batch["input_ids"][b, s: s + n] == 0).all(), seg
    # answer span labeled, prompt -100
    ans = tok.encode("happy and calm", add_special_tokens=False)
    row = batch["labels"][0]
    lab = row[row != -100]
    assert lab[:-1].tolist() == ans and lab[-1] == tok.eos_token_id
    # ragged features padded + masked
    assert batch["face_feats"].shape == (2, 5, cfg.video_dim)
    assert batch["face_mask"][0, 3:].sum() == 0
    assert batch["audio_mask"][1].sum() == 6


def test_stream_dataset_and_chat(tmp_path):
    """CaptionDataset stream mode + Chat multi-stream generation smoke."""
    import csv
    import os

    import jax

    from mertools_tpu.mllm import AffectGPT
    from mertools_tpu.mllm.chat import Chat
    from mertools_tpu.mllm.data import CaptionDataset, FakeWordTokenizer

    cfg = _cfg("multiface_audio_face_text")
    rng = np.random.default_rng(3)
    face_dir, audio_dir = tmp_path / "face", tmp_path / "audio"
    face_dir.mkdir(), audio_dir.mkdir()
    names = ["clip1", "clip2"]
    for n in names:
        np.save(face_dir / f"{n}.npy",
                rng.normal(size=(4, cfg.video_dim)).astype(np.float32))
        np.save(audio_dir / f"{n}.npy",
                rng.normal(size=(5, cfg.audio_dim)).astype(np.float32))
    for fname, cols in (("openset.csv", ["name", "openset"]),
                        ("reason.csv", ["name", "reason"]),
                        ("subtitle.csv", ["name", "english"])):
        with open(tmp_path / fname, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(cols)
            for n in names:
                w.writerow([n, "happy" if "openset" in fname else "words"])
    ds = CaptionDataset.from_csvs(
        str(tmp_path / "openset.csv"), str(tmp_path / "reason.csv"),
        str(tmp_path / "subtitle.csv"), str(face_dir), str(audio_dir),
        face_or_frame=cfg.face_or_frame,
        stream_dirs={"face": str(face_dir), "audio": str(audio_dir)})
    s = ds.sample(0, rng)
    assert s["face_feats"].shape == (4, cfg.video_dim)
    assert s["audio_feats"].shape == (5, cfg.audio_dim)

    model = AffectGPT(cfg)
    tok = FakeWordTokenizer(64)
    from mertools_tpu.mllm.data import build_stream_batch

    batch = build_stream_batch([ds.sample(i, rng) for i in (0, 1)], tok, cfg,
                               max_len=128)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    chat = Chat(model, params, tok, max_new_tokens=3, max_len=128)
    answers = chat.answer_batch(
        [{k: v for k, v in ds.sample(i, rng).items()
          if k.endswith("_feats") or k == "subtitle"} for i in (0, 1)])
    assert len(answers) == 2 and all(isinstance(a, str) for a in answers)


def test_build_model_accepts_reference_yaml_keys():
    from mertools_tpu.cli.train_mllm import build_model

    mcfg = {"llm_checkpoint": "tiny", "vocab_size": 64,
            "video_dim": 12, "audio_dim": 10,
            "multi_fusion_type": "attention",
            "video_fusion_type": "attention",
            "audio_fusion_type": "attention",
            "image_fusion_type": "mean",
            "num_audio_query_token": 1, "num_video_query_token": 1,
            "num_multi_query_token": 1, "num_image_query_token": 1,
            "face_or_frame": "multiface_audio_face_text"}
    model, _, _ = build_model(mcfg)
    c = model.cfg
    assert c.face_or_frame == "multiface_audio_face_text"
    assert c.video_fusion_type == "attention"
    assert c.multi_fusion == "attention"
    assert c.multi_qformer is None
    assert c.segment_tokens("multi") == 1
    assert c.has_multi


def test_caption_dataset_ovlabel_only(tmp_path):
    """reason_csv=None (MER2026-T2 Human/OV datasets): label_type defaults
    to ovlabel and sampling works without descriptions."""
    import csv

    from mertools_tpu.mllm.data import CaptionDataset

    rng = np.random.default_rng(0)
    vdir, adir = tmp_path / "v", tmp_path / "a"
    vdir.mkdir(), adir.mkdir()
    np.save(vdir / "c1.npy", rng.normal(size=(3, 8)).astype(np.float32))
    np.save(adir / "c1.npy", rng.normal(size=(4, 6)).astype(np.float32))
    with open(tmp_path / "openset.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "openset"])
        w.writerow(["c1", "['happy', 'calm']"])
    ds = CaptionDataset.from_csvs(str(tmp_path / "openset.csv"), None, None,
                                  str(vdir), str(adir))
    assert ds.label_type == "ovlabel"
    s = ds.sample(0, rng)
    # reference-exact answer template (base_dataset.py:265-274)
    assert s["answer"] == "The character's emotional state is happy, calm."


def test_multiturn_history_prompts_and_chatsession():
    """History turns render into both prompt paths (conversation_video.py
    Conversation accumulation) and ChatSession threads answers forward."""
    import jax

    from mertools_tpu.mllm import AffectGPT
    from mertools_tpu.mllm.chat import (Chat, ChatSession, Conversation,
                                        encode_stream_prompt)
    from mertools_tpu.mllm.data import FakeWordTokenizer

    conv = Conversation()
    pre, post = conv.render("sub", "second question?",
                            history=[("first?", "happy")])
    assert "first?" in post and "happy" in post
    assert post.index("first?") < post.index("second question?")

    cfg = _cfg("multiface_audio_face_text")
    tok = FakeWordTokenizer(64)
    ids0, starts0 = encode_stream_prompt(tok, cfg, "sub", "q2")
    ids1, starts1 = encode_stream_prompt(tok, cfg, "sub", "q2",
                                         history=[("q1", "a1 a2")])
    assert starts0 == starts1          # history goes after the AV segments
    assert len(ids1) > len(ids0)

    rng = np.random.default_rng(5)
    model = AffectGPT(cfg)
    batch = _stream_batch(cfg, rng)
    params = model.init(jax.random.PRNGKey(5), batch)["params"]
    chat = Chat(model, params, tok, max_new_tokens=2, max_len=128)
    session = ChatSession(chat, {
        "face_feats": rng.normal(size=(4, cfg.video_dim)).astype(np.float32),
        "audio_feats": rng.normal(size=(3, cfg.audio_dim)).astype(np.float32),
        "subtitle": "hello"})
    a1 = session.ask("what emotion?")
    a2 = session.ask("why?")
    assert isinstance(a1, str) and isinstance(a2, str)
    assert session.history == [("what emotion?", a1), ("why?", a2)]
