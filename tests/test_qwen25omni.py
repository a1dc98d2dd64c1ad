"""Qwen2.5-Omni thinker: HF torch oracle parity (chunked audio tower,
TMRoPE incl. audio-in-video interleaving, full logits, generation) +
caller end-to-end.

Reference wrapper: MER2026/MER2026_Track3/utils/qwen25omni.py (the
Track3 headline judge). VERDICT.md Next #4.
"""

import numpy as np
import pytest
import torch

AUD, ABOS, AEOS = 146, 147, 148
IMG, VID, VBOS, VEOS = 150, 151, 152, 153


def tiny_hf_thinker():
    from transformers.models.qwen2_5_omni import (
        Qwen2_5OmniThinkerForConditionalGeneration)
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniThinkerConfig)

    acfg = dict(d_model=32, encoder_layers=2, encoder_attention_heads=4,
                encoder_ffn_dim=64, num_mel_bins=16, n_window=25,
                max_source_positions=50, output_dim=48, scale_embedding=False,
                dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    vcfg = dict(depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
                patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
                window_size=56, fullatt_block_indexes=[1], out_hidden_size=48,
                in_channels=3, hidden_act="silu")
    tcfg = dict(vocab_size=160, hidden_size=48, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                intermediate_size=96, model_type="qwen2_5_omni_text",
                rope_scaling={"rope_type": "default",
                              "mrope_section": [2, 2, 2]},
                max_position_embeddings=512)
    cfg = Qwen2_5OmniThinkerConfig(
        audio_config=acfg, vision_config=vcfg, text_config=tcfg,
        audio_token_id=AUD, video_token_id=VID, image_token_id=IMG,
        audio_start_token_id=ABOS, audio_end_token_id=AEOS,
        vision_start_token_id=VBOS, vision_end_token_id=VEOS,
        position_id_per_seconds=25, seconds_per_chunk=2)
    torch.manual_seed(0)
    return Qwen2_5OmniThinkerForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def models():
    from mertools_tpu.preference.qwen25omni import Qwen25Omni

    hf = tiny_hf_thinker()
    return hf, Qwen25Omni.from_hf_thinker(hf)


def _mel_batch(lens, n_mels=16, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.normal(size=(n_mels, L)).astype(np.float32) for L in lens]


def test_audio_tower_parity(models):
    """Chunked conv + packed segment attention + pool + ln + proj vs the HF
    tower fed the concatenated valid mels (lengths force multiple chunks,
    a tail chunk, and an odd after-cnn length)."""
    hf, ours = models
    mels = _mel_batch([60, 50, 37])  # chunk size = 2*n_window = 50
    with torch.no_grad():
        feat_lens = torch.tensor([m.shape[1] for m in mels])
        cat = torch.tensor(np.concatenate(mels, axis=1))
        aftercnn = (feat_lens - 1) // 2 + 1
        ref = hf.audio_tower(cat, feature_lens=feat_lens,
                             aftercnn_lens=aftercnn).last_hidden_state.numpy()
    got = ours.audio_features(mels)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def _video_patches(ours, T=2, H=56, W=84, seed=1):
    from mertools_tpu.preference.qwen25vl import (IMAGE_MEAN, IMAGE_STD,
                                                  patchify)

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, size=(T, H, W, 3)).astype(np.uint8)
    x = (frames.astype(np.float32) / 255.0 - IMAGE_MEAN) / IMAGE_STD
    return patchify(x, ours.vcfg)


def _prompt_audio(n_audio_tok, S=36, seed=2):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 140, size=S).astype(np.int64)
    ids[2] = ABOS
    ids[3: 3 + n_audio_tok] = AUD
    ids[3 + n_audio_tok] = AEOS
    return ids


def test_rope_and_logits_audio(models):
    hf, ours = models
    from mertools_tpu.preference.qwen25omni import audio_token_count

    mels = _mel_batch([60])
    n_tok = audio_token_count(60)
    ids = _prompt_audio(n_tok)
    mask = np.ones((1, len(ids)), np.int64)
    with torch.no_grad():
        ref_pos, _ = hf.get_rope_index(
            torch.tensor(ids[None]), attention_mask=torch.tensor(mask),
            audio_seqlens=torch.tensor([60]))
        ref = hf(input_ids=torch.tensor(ids[None]),
                 attention_mask=torch.tensor(mask),
                 input_features=torch.tensor(
                     np.concatenate(mels, 1)[None]),
                 feature_attention_mask=torch.ones((1, 60),
                                                   dtype=torch.long),
                 ).logits.numpy()
    got_pos = ours.rope(ids[None], mask, audio_seqlens=np.asarray([60]))
    assert (got_pos[0] == ref_pos.numpy().transpose(1, 2, 0)[0]).all()
    got = ours.forward_logits(ids[None].astype(np.int32), mask, mels=mels)
    assert np.abs(got - ref).max() < 2e-3, np.abs(got - ref).max()
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.97


def _interleaved_prompt(ours, n_audio_tok, grid, spg):
    """The processor's audio-in-video interleaved layout."""
    from mertools_tpu.preference.qwen25omni import _chunked_index

    lh = grid[1] // 2
    lw = grid[2] // 2
    vid_t = np.repeat((np.arange(grid[0]) * spg * 25).astype(np.int64),
                      lh * lw)
    aud_t = np.arange(n_audio_tok)
    v_ch = _chunked_index(vid_t, 50, 0)
    a_ch = _chunked_index(aud_t, 50, 0)
    seq = [VBOS, ABOS]
    for j in range(max(len(v_ch), len(a_ch))):
        if j < len(v_ch):
            seq += [VID] * (v_ch[j][1] - v_ch[j][0])
        if j < len(a_ch):
            seq += [AUD] * (a_ch[j][1] - a_ch[j][0])
    seq += [AEOS, VEOS]
    return seq


def test_rope_and_logits_audio_in_video(models):
    """use_audio_in_video: interleaved placeholders + TMRoPE chunking."""
    hf, ours = models
    from mertools_tpu.preference.qwen25omni import audio_token_count

    patches, grid = _video_patches(ours, T=6)  # grid_t = 3 -> t = 0,100,200
    mels = _mel_batch([277])  # 70 audio tokens spanning several 2 s chunks
    n_tok = audio_token_count(277)
    rng = np.random.default_rng(3)
    head = rng.integers(1, 140, size=4).tolist()
    tail = rng.integers(1, 140, size=5).tolist()
    ids = np.asarray(head + _interleaved_prompt(ours, n_tok, grid, 1.0)
                     + tail, np.int64)
    mask = np.ones((1, len(ids)), np.int64)
    spg = np.asarray([1.0])
    with torch.no_grad():
        ref_pos, _ = hf.get_rope_index(
            torch.tensor(ids[None]), attention_mask=torch.tensor(mask),
            audio_seqlens=torch.tensor([277]),
            video_grid_thw=torch.tensor(np.asarray([grid])),
            second_per_grids=torch.tensor(spg), use_audio_in_video=True)
        ref = hf(input_ids=torch.tensor(ids[None]),
                 attention_mask=torch.tensor(mask),
                 input_features=torch.tensor(np.concatenate(mels, 1)[None]),
                 feature_attention_mask=torch.ones((1, 277),
                                                   dtype=torch.long),
                 pixel_values_videos=torch.tensor(patches),
                 video_grid_thw=torch.tensor(np.asarray([grid])),
                 video_second_per_grid=torch.tensor(spg),
                 use_audio_in_video=True).logits.numpy()
    got_pos = ours.rope(ids[None], mask, audio_seqlens=np.asarray([277]),
                        video_grid_thw=np.asarray([grid]),
                        second_per_grids=spg, use_audio_in_video=True)
    assert (got_pos[0] == ref_pos.numpy().transpose(1, 2, 0)[0]).all()
    got = ours.forward_logits(
        ids[None].astype(np.int32), mask, mels=mels, patches=patches,
        grid_thw=np.asarray([grid]), second_per_grids=spg,
        use_audio_in_video=True)
    assert np.abs(got - ref).max() < 2e-3, np.abs(got - ref).max()
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.97


def test_generation_matches_hf(models):
    hf, ours = models
    from tokenizers import Tokenizer, models as tok_models
    from transformers import PreTrainedTokenizerFast

    from mertools_tpu.preference.qwen25omni import audio_token_count

    vocab = {f"w{i}": i for i in range(146)}
    vocab.update({"<|AUDIO|>": AUD, "<|audio_bos|>": ABOS,
                  "<|audio_eos|>": AEOS, "<eos>": 159})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")

    mels = _mel_batch([50], seed=5)
    n_tok = audio_token_count(50)
    ids = _prompt_audio(n_tok, seed=6)
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor(ids[None]),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
            input_features=torch.tensor(np.concatenate(mels, 1)[None]),
            feature_attention_mask=torch.ones((1, 50), dtype=torch.long),
            max_new_tokens=8, do_sample=False,
            eos_token_id=159, pad_token_id=159)
    ref_text = fast.decode(out[0, len(ids):], skip_special_tokens=True)
    got = ours.generate_batch([ids.astype(np.int32)], fast, mels=mels,
                              max_new_tokens=8)
    assert got[0] == ref_text, (got[0], ref_text)


def test_caller_end_to_end_all_input_types(models):
    _, ours = models
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    from mertools_tpu.preference.qwen25omni import Qwen25OmniCaller

    vocab = {f"w{i}": i for i in range(146)}
    vocab.update({"<|AUDIO|>": AUD, "<|audio_bos|>": ABOS,
                  "<|audio_eos|>": AEOS, "<|IMAGE|>": IMG, "<|VIDEO|>": VID,
                  "<|vision_bos|>": VBOS, "<|vision_eos|>": VEOS,
                  "<eos>": 159})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")
    fast.add_special_tokens({"additional_special_tokens": [
        "<|AUDIO|>", "<|audio_bos|>", "<|audio_eos|>", "<|VIDEO|>",
        "<|vision_bos|>", "<|vision_eos|>"]})

    caller = Qwen25OmniCaller(model=ours, tokenizer=fast, batch=2,
                              max_new_tokens=4, max_pixels=56 * 84, fps=2.0)
    rng = np.random.default_rng(7)
    samples = [
        {"wav": rng.normal(size=9000).astype(np.float32) * 0.1,
         "frames": rng.integers(0, 255, size=(2, 56, 84, 3)
                                ).astype(np.uint8)},
        {"wav": rng.normal(size=16000).astype(np.float32) * 0.1,
         "frames": rng.integers(0, 255, size=(4, 30, 44, 3)
                                ).astype(np.uint8)},
    ]
    for input_type in ("audio", "video", "audiovideo"):
        res = caller(samples, ["w5 w6", "w7"], input_type=input_type)
        assert len(res) == 2 and all(isinstance(r, str) for r in res), \
            input_type
