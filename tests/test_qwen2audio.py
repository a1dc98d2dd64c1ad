"""Qwen2-Audio wrapper: HF torch oracle parity + caller end-to-end.

VERDICT.md Missing #2 / Next #4: concrete runnable zero-shot judge models.
Reference wrapper: MER2026/MER2026_Track3/utils/qwen2audio.py.
"""

import numpy as np
import pytest
import torch


def tiny_hf_qwen2audio(audio_token_index=60, vocab=64):
    from transformers import Qwen2AudioConfig, Qwen2AudioForConditionalGeneration
    from transformers.models.qwen2_audio.configuration_qwen2_audio import (
        Qwen2AudioEncoderConfig)

    acfg = Qwen2AudioEncoderConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, num_mel_bins=16, max_source_positions=50,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    tcfg = dict(vocab_size=vocab, hidden_size=48, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                intermediate_size=96, model_type="qwen2",
                max_position_embeddings=512)
    cfg = Qwen2AudioConfig(audio_config=acfg.to_dict(), text_config=tcfg,
                           audio_token_index=audio_token_index)
    torch.manual_seed(0)
    return Qwen2AudioForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def models():
    from mertools_tpu.preference.qwen2audio import Qwen2Audio

    hf = tiny_hf_qwen2audio()
    ours = Qwen2Audio.from_hf_torch(hf)
    return hf, ours


def test_audio_tower_parity(models):
    hf, ours = models
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, 16, 100)).astype(np.float32)
    with torch.no_grad():
        ref = hf.audio_tower(torch.tensor(mel)).last_hidden_state.numpy()
        ref = hf.multi_modal_projector(torch.tensor(ref)).numpy()
    got = ours.audio_features(mel)
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_full_model_logits_parity(models):
    """input_ids with expanded audio placeholders + mel -> LM logits,
    vs the HF forward (masked-scatter splice). Includes a SHORT audio
    whose feature_attention_mask trims the token count."""
    hf, ours = models
    rng = np.random.default_rng(1)
    B, S = 2, 40
    mel = rng.normal(size=(B, 16, 100)).astype(np.float32)

    # row 0: full-length audio (25 tokens); row 1: 60 valid frames ->
    # (60-1)//2+1=30 -> (30-2)//2+1 = 15 tokens
    feat_mask = np.zeros((B, 100), np.int64)
    feat_mask[0, :] = 1
    feat_mask[1, :60] = 1
    from mertools_tpu.preference.qwen2audio import audio_token_count

    counts = [audio_token_count(100), audio_token_count(60)]
    assert counts == [25, 15]

    ids = rng.integers(1, 50, size=(B, S)).astype(np.int64)
    for b, n in enumerate(counts):
        ids[b, 2: 2 + n] = 60  # audio_token_index
    mask = np.ones((B, S), np.int64)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 input_features=torch.tensor(mel),
                 attention_mask=torch.tensor(mask),
                 feature_attention_mask=torch.tensor(feat_mask)).logits.numpy()
    got = ours.forward_logits(ids.astype(np.int32), mel, mask,
                              valid_frames=np.array([100, 60], np.int32))
    assert np.abs(got - ref).max() < 2e-3, np.abs(got - ref).max()
    # greedy next-token agreement everywhere
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.97


def test_caller_batched_generation(models, tmp_path):
    """Qwen2AudioCaller end-to-end: wav -> on-device mel -> tower -> splice
    -> batched KV-cached decode; output matches the HF .generate oracle."""
    hf, ours = models
    from tokenizers import Tokenizer, models as tok_models
    from transformers import PreTrainedTokenizerFast

    vocab = {f"w{i}": i for i in range(60)}
    vocab.update({"<|AUDIO|>": 60, "<|audio_bos|>": 61, "<|audio_eos|>": 62,
                  "<eos>": 63})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")
    fast.add_special_tokens({"additional_special_tokens":
                             ["<|AUDIO|>", "<|audio_bos|>", "<|audio_eos|>"]})

    from mertools_tpu.preference.qwen2audio import Qwen2AudioCaller

    caller = Qwen2AudioCaller(model=ours, tokenizer=fast, batch=2,
                              max_new_tokens=6)
    rng = np.random.default_rng(2)
    # 30 s chunk is 2*max_source_positions*160 = 16000 samples for the tiny
    # tower (100 mel frames)
    samples = [{"wav": rng.normal(size=9000).astype(np.float32) * 0.1},
               {"wav": rng.normal(size=16000).astype(np.float32) * 0.1}]
    res = caller(samples, ["w5 w6", "w7"])
    assert len(res) == 2 and all(isinstance(r, str) for r in res)

    # oracle: HF generate on the same expanded prompt + mel
    import jax.numpy as jnp

    from mertools_tpu.ops.mel import log_mel_spectrogram, pad_or_trim

    for i, s in enumerate(samples):
        valid = min(100, -(-len(s["wav"]) // 160))
        ids = caller.prompt_ids(["w5 w6", "w7"][i], valid)
        padded = pad_or_trim(s["wav"], 16000)[None]
        mel = np.asarray(log_mel_spectrogram(jnp.asarray(padded), n_mels=16))
        feat_mask = np.zeros((1, 100), np.int64)
        feat_mask[0, :valid] = 1
        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor(ids[None].astype(np.int64)),
                input_features=torch.tensor(mel),
                attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
                feature_attention_mask=torch.tensor(feat_mask),
                max_new_tokens=6, do_sample=False,
                eos_token_id=63, pad_token_id=63)
        ref_text = fast.decode(out[0, len(ids):], skip_special_tokens=True)
        assert res[i] == ref_text.replace("\n", " ").replace("\t", " ").strip(), \
            (i, res[i], ref_text)


def test_func_calling_sample_reads_wav(models, tmp_path):
    _, ours = models
    from tokenizers import Tokenizer, models as tok_models
    from transformers import PreTrainedTokenizerFast

    vocab = {f"w{i}": i for i in range(60)}
    vocab.update({"<|AUDIO|>": 60, "<|audio_bos|>": 61, "<|audio_eos|>": 62,
                  "<eos>": 63})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")

    from mertools_tpu.io.wav import write_wav
    from mertools_tpu.preference.qwen2audio import Qwen2AudioCaller

    rng = np.random.default_rng(3)
    p = str(tmp_path / "a.wav")
    write_wav(p, rng.normal(size=8000).astype(np.float32) * 0.05, 16000)

    caller = Qwen2AudioCaller(model=ours, tokenizer=fast, max_new_tokens=4)
    r = caller.func_calling_sample(p, None, "w5", "audio")
    assert isinstance(r, str)


def test_main_dpo_cli_qwen2audio_judge(tmp_path):
    """main_dpo judge --judge qwen2audio end-to-end over a saved tiny HF
    checkpoint + processor + raw wavs (the reference's
    main_dpo_sample.py --model qwen2audio path)."""
    from tokenizers import Tokenizer, models as tok_models
    from transformers import PreTrainedTokenizerFast, WhisperFeatureExtractor
    from transformers.models.qwen2_audio.processing_qwen2_audio import (
        Qwen2AudioProcessor)

    d = str(tmp_path / "q2a")
    hf = tiny_hf_qwen2audio()
    hf.save_pretrained(d)
    vocab = {f"w{i}": i for i in range(60)}
    vocab.update({"<|AUDIO|>": 60, "<|audio_bos|>": 61, "<|audio_eos|>": 62,
                  "<eos>": 63})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")
    fe = WhisperFeatureExtractor(feature_size=16, sampling_rate=16000,
                                 hop_length=160, chunk_length=1, n_fft=400)
    Qwen2AudioProcessor(feature_extractor=fe,
                        tokenizer=fast).save_pretrained(d)

    from mertools_tpu.io.wav import write_wav

    rng = np.random.default_rng(0)
    adir = tmp_path / "wavs"
    adir.mkdir()
    for n in ("u1", "u2"):
        write_wav(str(adir / f"{n}.wav"),
                  rng.normal(size=8000).astype(np.float32) * 0.05, 16000)
    (tmp_path / "labels.csv").write_text(
        "name,a1,a2,preference\nu1,happy person,sad person,a1\n"
        "u2,angry tone,calm tone,a2\n")

    from mertools_tpu.cli.main_dpo import main

    out = tmp_path / "res.npz"
    main(["judge", f"--label_csv={tmp_path}/labels.csv",
          "--judge=qwen2audio", f"--ckpt={d}", f"--audio_dir={adir}",
          f"--save_npz={out}", "--batch=2", "--max_new_tokens=4"])
    data = np.load(out, allow_pickle=True)
    assert len(data["pred_labels"]) == 2
    assert set(str(x) for x in data["pred_labels"]) <= {"a1", "a2", "same"}
    main(["score", f"--result_npz={out}", "--metric=twoclass"])
