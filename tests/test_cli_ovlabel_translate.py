"""End-to-end CLI coverage for the batched-LLM utilities: OV label
extraction (static + continuous engines) and transcript translation, over a
real tiny HF qwen2 checkpoint on disk (the mains' full load->convert->
schedule->decode->store path)."""

import csv
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_hf_llm(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_qwen"))
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import (PreTrainedTokenizerFast, Qwen2Config,
                              Qwen2ForCausalLM)

    vocab = {"<eos>": 0, "<pad>": 1}
    words = ("the a happy sad angry calm person is emotional state list "
             "output input describe emotion label").split()
    for i, w in enumerate(words):
        vocab[w] = i + 2
    for ch in ("abcdefghijklmnopqrstuvwxyz"
               "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789[],.:;'-_ "):
        vocab.setdefault(ch, len(vocab))
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token="<pad>"))
    tok.pre_tokenizer = pre_tokenizers.Split(" ", behavior="removed")
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>",
                                   pad_token="<pad>")
    fast.save_pretrained(d)
    cfg = Qwen2Config(vocab_size=len(vocab), hidden_size=32,
                      num_hidden_layers=1, num_attention_heads=4,
                      num_key_value_heads=2, intermediate_size=64,
                      max_position_embeddings=1024)
    Qwen2ForCausalLM(cfg).save_pretrained(d)
    return d


def test_ovlabel_cli_static_end_to_end(tiny_hf_llm, tmp_path):
    from mertools_tpu.cli.ovlabel_extraction import main

    reasons = {f"c{i}": f"the person is {'happy' if i % 2 else 'sad'} "
                        f"and talks" for i in range(5)}
    npz = tmp_path / "name2reason.npz"
    np.savez_compressed(npz, name2reason=np.array(reasons, dtype=object))
    store = tmp_path / "openset.npz"
    main([f"--reason_npz={npz}", f"--store_npz={store}",
          f"--model={tiny_hf_llm}", "--batch=2", "--max_new_tokens=4",
          "--temperature=0.0"])
    out = np.load(store, allow_pickle=True)
    names = [str(n) for n in out["filenames"]]
    assert sorted(names) == sorted(reasons)  # order restored after sorting
    assert len(out["fileitems"]) == 5  # postprocessed strings (may be '')


def test_ovlabel_cli_continuous_end_to_end(tiny_hf_llm, tmp_path):
    from mertools_tpu.cli.ovlabel_extraction import main

    reasons = {f"c{i}": "a calm emotional state" for i in range(3)}
    npz = tmp_path / "name2reason.npz"
    np.savez_compressed(npz, name2reason=np.array(reasons, dtype=object))
    store = tmp_path / "openset_root"
    main([f"--reason_npz={npz}", f"--store_root={store}",
          f"--model={tiny_hf_llm}", "--batch=2", "--max_new_tokens=4",
          "--engine=continuous"])
    assert sorted(os.listdir(store)) == ["c0.npy", "c1.npy", "c2.npy"]


def test_translate_cli_end_to_end(tiny_hf_llm, tmp_path):
    from mertools_tpu.cli.translate import main

    src = tmp_path / "transcription.csv"
    with open(src, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["name", "chinese"])
        w.writerow(["c0", "the happy person"])
        w.writerow(["c1", ""])          # empty rows stay empty
        w.writerow(["c2", "a sad state"])
    dst = tmp_path / "transcription-eng.csv"
    main([f"--trans_path={src}", f"--save_path={dst}",
          "--direction=chi2eng", f"--model={tiny_hf_llm}", "--batch=2",
          "--max_new_tokens=4"])
    with open(dst, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    assert [r["name"] for r in rows] == ["c0", "c1", "c2"]
    assert rows[1]["english"] == ""
    assert "english" in rows[0]


def test_generate_synonyms_cli_end_to_end(tiny_hf_llm, tmp_path):
    from mertools_tpu.cli.main_ov import main

    gt = tmp_path / "gt.csv"
    gt.write_text('name,openset\nc0,"[\'happy\']"\nc1,"[\'sad\']"\n',
                  encoding="utf-8")
    pred = tmp_path / "pred.csv"
    pred.write_text('name,openset\nc0,"[\'calm\']"\nc1,"[\'angry\']"\n',
                    encoding="utf-8")
    root = tmp_path / "synonyms"
    main(["generate-synonyms", f"--gt_csv={gt}", f"--pred_csv={pred}",
          f"--synonym_root={root}", f"--model={tiny_hf_llm}", "--batch=2",
          "--max_new_tokens=4"])
    assert sorted(os.listdir(root)) == ["c0.npy", "c1.npy"]
    # idempotent: second run skips everything
    main(["generate-synonyms", f"--gt_csv={gt}", f"--pred_csv={pred}",
          f"--synonym_root={root}", f"--model={tiny_hf_llm}"])


def test_inference_mllm_cli_end_to_end(tiny_hf_llm, tmp_path):
    """Full inference sweep CLI: restore_model -> feature store -> batched
    prefetch loop -> name2reason npz (inference_hybird.py equivalent)."""
    import jax
    from transformers import AutoTokenizer

    from mertools_tpu.cli.inference_mllm import main
    from mertools_tpu.mllm import (AffectGPT, AffectGPTConfig, LLMConfig,
                                   QFormerConfig)
    from mertools_tpu.mllm.runner import save_model

    tok = AutoTokenizer.from_pretrained(tiny_hf_llm)
    cfg = AffectGPTConfig(
        llm=LLMConfig(vocab_size=len(tok), hidden_size=32, num_layers=1,
                      num_heads=4, num_kv_heads=4, intermediate_size=64,
                      lora_r=2),
        video_qformer=QFormerConfig(num_queries=4, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        audio_qformer=QFormerConfig(num_queries=2, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        video_dim=12, audio_dim=10, max_video_frames=8, max_audio_frames=8)
    rng = np.random.default_rng(0)
    model = AffectGPT(cfg)
    batch = {"video_feats": rng.normal(size=(1, 4, 12)).astype(np.float32),
             "audio_feats": rng.normal(size=(1, 3, 10)).astype(np.float32),
             "video_mask": np.ones((1, 4), np.int32),
             "audio_mask": np.ones((1, 3), np.int32),
             "input_ids": rng.integers(3, len(tok), (1, 16)).astype(np.int32),
             "splice_start": np.array([2], np.int32),
             "attention_mask": np.ones((1, 16), np.int32),
             "labels": np.full((1, 16), 7, np.int64)}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    ckpt = str(tmp_path / "model")
    save_model(ckpt, model, params)

    vdir = tmp_path / "v"; adir = tmp_path / "a"
    vdir.mkdir(); adir.mkdir()
    names = [f"c{i}" for i in range(5)]
    for n in names:
        np.save(vdir / f"{n}.npy", rng.normal(size=(5, 12)).astype(np.float32))
        np.save(adir / f"{n}.npy", rng.normal(size=(3, 10)).astype(np.float32))
    (tmp_path / "sub.csv").write_text(
        "name,english\n" + "\n".join(f"{n},hello there" for n in names) + "\n")

    save_path = tmp_path / "name2reason.npz"
    main([f"--ckpt={ckpt}", f"--tokenizer={tiny_hf_llm}",
          f"--video_feat_dir={vdir}", f"--audio_feat_dir={adir}",
          f"--subtitle_csv={tmp_path / 'sub.csv'}",
          f"--save_path={save_path}", "--batch=2", "--max_new_tokens=3",
          "--question=What emotion?"])
    out = np.load(save_path, allow_pickle=True)["name2reason"].item()
    assert sorted(out) == names
    assert all(isinstance(v, str) for v in out.values())

    # idempotent resume: re-run processes nothing new but keeps results
    main([f"--ckpt={ckpt}", f"--tokenizer={tiny_hf_llm}",
          f"--video_feat_dir={vdir}", f"--audio_feat_dir={adir}",
          f"--save_path={save_path}"])
    out2 = np.load(save_path, allow_pickle=True)["name2reason"].item()
    assert out2 == out

    # --bf16 decode mode (the reference's fp16-autocast class): the bf16
    # LLM subtree flows through the splice (cast at the update site) and
    # the dtype-driven decode path; outputs stay strings
    save_bf = tmp_path / "name2reason_bf16.npz"
    main([f"--ckpt={ckpt}", f"--tokenizer={tiny_hf_llm}",
          f"--video_feat_dir={vdir}", f"--audio_feat_dir={adir}",
          f"--save_path={save_bf}", "--batch=2", "--max_new_tokens=3",
          "--bf16"])
    outb = np.load(save_bf, allow_pickle=True)["name2reason"].item()
    assert sorted(outb) == names
    assert all(isinstance(v, str) for v in outb.values())


def test_main_dpo_judge_cli_rounds(tiny_hf_llm, tmp_path):
    """main_dpo judge end-to-end with --rounds/--temperature: per-round
    npz outputs, idempotent re-run (reference --totalround gating)."""
    import jax
    from transformers import AutoTokenizer

    from mertools_tpu.cli.main_dpo import main
    from mertools_tpu.mllm import (AffectGPT, AffectGPTConfig, LLMConfig,
                                   QFormerConfig)
    from mertools_tpu.mllm.runner import save_model

    tok = AutoTokenizer.from_pretrained(tiny_hf_llm)
    cfg = AffectGPTConfig(
        llm=LLMConfig(vocab_size=len(tok), hidden_size=32, num_layers=1,
                      num_heads=4, num_kv_heads=4, intermediate_size=64,
                      lora_r=2),
        video_qformer=QFormerConfig(num_queries=4, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        audio_qformer=QFormerConfig(num_queries=2, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        video_dim=12, audio_dim=10, max_video_frames=8, max_audio_frames=8)
    rng = np.random.default_rng(0)
    model = AffectGPT(cfg)
    batch = {"video_feats": rng.normal(size=(1, 4, 12)).astype(np.float32),
             "audio_feats": rng.normal(size=(1, 3, 10)).astype(np.float32),
             "video_mask": np.ones((1, 4), np.int32),
             "audio_mask": np.ones((1, 3), np.int32),
             "input_ids": rng.integers(3, len(tok), (1, 16)).astype(np.int32),
             "splice_start": np.array([2], np.int32),
             "attention_mask": np.ones((1, 16), np.int32),
             "labels": np.full((1, 16), 7, np.int64)}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    ckpt = str(tmp_path / "model")
    save_model(ckpt, model, params)

    vdir = tmp_path / "v"; adir = tmp_path / "a"
    vdir.mkdir(); adir.mkdir()
    for n in ("c0", "c1"):
        np.save(vdir / f"{n}.npy", rng.normal(size=(4, 12)).astype(np.float32))
        np.save(adir / f"{n}.npy", rng.normal(size=(3, 10)).astype(np.float32))
    label_csv = tmp_path / "labels.csv"
    label_csv.write_text(
        "name,a1,a2,preference\nc0,happy one,sad one,a1\n"
        "c1,calm talk,angry talk,a2\n", encoding="utf-8")

    save_npz = tmp_path / "judge.npz"
    main(["judge", f"--label_csv={label_csv}", f"--ckpt={ckpt}",
          f"--tokenizer={tiny_hf_llm}", f"--video_feat_dir={vdir}",
          f"--audio_feat_dir={adir}", f"--save_npz={save_npz}",
          "--batch=2", "--max_new_tokens=2", "--temperature=0.7",
          "--rounds=2"])
    r1 = tmp_path / "judge-round1.npz"
    r2 = tmp_path / "judge-round2.npz"
    assert r1.exists() and r2.exists()
    d1 = np.load(r1, allow_pickle=True)
    assert [str(x) for x in d1["gt_labels"]] == ["a1", "a2"]
    assert all(str(x) in ("a1", "a2", "same") for x in d1["pred_labels"])
    mtimes = (r1.stat().st_mtime_ns, r2.stat().st_mtime_ns)
    # idempotent: per-round npz gating skips existing rounds
    main(["judge", f"--label_csv={label_csv}", f"--ckpt={ckpt}",
          f"--tokenizer={tiny_hf_llm}", f"--video_feat_dir={vdir}",
          f"--audio_feat_dir={adir}", f"--save_npz={save_npz}",
          "--rounds=2"])
    assert (r1.stat().st_mtime_ns, r2.stat().st_mtime_ns) == mtimes
