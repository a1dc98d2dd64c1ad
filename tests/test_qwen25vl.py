"""Qwen2.5-VL wrapper: HF torch oracle parity (windowed ViT, M-RoPE LLM,
get_rope_index, generation) + caller end-to-end.

VERDICT.md Next #4: concrete runnable zero-shot video judge.
Reference wrapper: MER2026/MER2026_Track3/utils/qwen25vl.py.
"""

import numpy as np
import pytest
import torch

VIDEO_ID, VSTART_ID, IMG_ID = 151, 152, 150


def tiny_hf_qwen25vl():
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration

    vcfg = dict(depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
                patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
                window_size=56, fullatt_block_indexes=[1], out_hidden_size=48,
                in_channels=3, hidden_act="silu", tokens_per_second=2)
    tcfg = dict(vocab_size=160, hidden_size=48, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                intermediate_size=96,
                rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
                max_position_embeddings=512)
    cfg = Qwen2_5_VLConfig(vision_config=vcfg, text_config=tcfg,
                           image_token_id=IMG_ID, video_token_id=VIDEO_ID,
                           vision_start_token_id=VSTART_ID)
    torch.manual_seed(0)
    return Qwen2_5_VLForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def models():
    from mertools_tpu.preference.qwen25vl import Qwen25VL

    hf = tiny_hf_qwen25vl()
    return hf, Qwen25VL.from_hf_torch(hf)


def _video_patches(ours, T=2, H=56, W=84, seed=0):
    """Synthetic video -> (patches, grid) via the caller preprocessing
    (56x84 is already smart_resize-stable at factor 28)."""
    from mertools_tpu.preference.qwen25vl import (IMAGE_MEAN, IMAGE_STD,
                                                  patchify)

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, size=(T, H, W, 3)).astype(np.uint8)
    x = frames.astype(np.float32) / 255.0
    x = (x - IMAGE_MEAN) / IMAGE_STD
    return patchify(x, ours.vcfg)


def test_vision_tower_parity(models):
    hf, ours = models
    patches, grid = _video_patches(ours)
    grid_thw = np.asarray([grid])
    with torch.no_grad():
        ref = hf.model.visual(torch.tensor(patches),
                              grid_thw=torch.tensor(grid_thw)).numpy()
    got = ours.encode_patches(patches, grid_thw)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_vision_tower_parity_two_videos_packed(models):
    """Two clips packed in one sequence (HF cu_seqlens semantics)."""
    hf, ours = models
    p1, g1 = _video_patches(ours, T=2, H=56, W=84, seed=1)
    p2, g2 = _video_patches(ours, T=4, H=28, W=56, seed=2)
    patches = np.concatenate([p1, p2])
    grid_thw = np.asarray([g1, g2])
    with torch.no_grad():
        ref = hf.model.visual(torch.tensor(patches),
                              grid_thw=torch.tensor(grid_thw)).numpy()
    got = ours.encode_patches(patches, grid_thw)
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def _prompt_with_video(grid, merge_unit, S=40, seed=3):
    n_tok = int(np.prod(grid)) // merge_unit
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 140, size=S).astype(np.int64)
    ids[3] = VSTART_ID
    ids[4: 4 + n_tok] = VIDEO_ID
    return ids


def test_get_rope_index_matches_hf(models):
    hf, ours = models
    from mertools_tpu.preference.qwen25vl import get_rope_index

    patches, grid = _video_patches(ours)
    ids = _prompt_with_video(grid, ours.vcfg.merge_unit)
    # left-pad one row, right-pad impossible in HF (it compacts valid) —
    # use ragged masks
    B, S = 2, len(ids)
    input_ids = np.stack([ids, ids])
    mask = np.ones((B, S), np.int64)
    mask[1, -5:] = 0
    input_ids[1, -5:] = 0
    input_ids[1] = np.concatenate([input_ids[1][:20], input_ids[1][20:]])
    grid_thw = np.asarray([grid, grid])
    spgt = np.asarray([1.0, 2.0])
    with torch.no_grad():
        ref, deltas = hf.model.get_rope_index(
            torch.tensor(input_ids), video_grid_thw=torch.tensor(grid_thw),
            second_per_grid_ts=torch.tensor(spgt),
            attention_mask=torch.tensor(mask))
    got = get_rope_index(input_ids, mask, grid_thw, ours.vcfg,
                         VIDEO_ID, VSTART_ID, second_per_grid_ts=spgt)
    ref = ref.numpy().transpose(1, 2, 0)  # (3,B,S) -> (B,S,3)
    # HF fills PAD positions with a running index "1"; compare valid only
    for b in range(B):
        v = mask[b] > 0
        assert (got[b][v] == ref[b][v]).all(), b


def test_full_model_logits_parity(models):
    hf, ours = models
    patches, grid = _video_patches(ours)
    ids = _prompt_with_video(grid, ours.vcfg.merge_unit)
    input_ids = ids[None]
    mask = np.ones_like(input_ids)
    grid_thw = np.asarray([grid])
    spgt = np.asarray([2.0])
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(input_ids),
                 attention_mask=torch.tensor(mask),
                 pixel_values_videos=torch.tensor(patches),
                 video_grid_thw=torch.tensor(grid_thw),
                 second_per_grid_ts=torch.tensor(spgt)).logits.numpy()
    got = ours.forward_logits(input_ids.astype(np.int32), mask, patches,
                              grid_thw, second_per_grid_ts=spgt)
    assert np.abs(got - ref).max() < 2e-3, np.abs(got - ref).max()
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.97


def test_generation_matches_hf(models):
    hf, ours = models
    from tokenizers import Tokenizer, models as tok_models
    from transformers import PreTrainedTokenizerFast

    vocab = {f"w{i}": i for i in range(150)}
    vocab.update({"<|image_pad|>": IMG_ID, "<|video_pad|>": VIDEO_ID,
                  "<|vision_start|>": VSTART_ID, "<|vision_end|>": 153,
                  "<eos>": 159})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")

    patches, grid = _video_patches(ours, seed=5)
    ids = _prompt_with_video(grid, ours.vcfg.merge_unit, seed=6)
    grid_thw = np.asarray([grid])
    spgt = np.asarray([2.0])
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor(ids[None]),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
            pixel_values_videos=torch.tensor(patches),
            video_grid_thw=torch.tensor(grid_thw),
            second_per_grid_ts=torch.tensor(spgt),
            max_new_tokens=8, do_sample=False,
            eos_token_id=159, pad_token_id=159)
    ref_text = fast.decode(out[0, len(ids):], skip_special_tokens=True)

    got = ours.generate_batch([ids.astype(np.int32)], patches, grid_thw,
                              fast, second_per_grid_ts=spgt,
                              max_new_tokens=8)
    assert got[0] == ref_text, (got[0], ref_text)


def test_caller_end_to_end(models):
    _, ours = models
    from tokenizers import Tokenizer, models as tok_models
    from transformers import PreTrainedTokenizerFast

    from mertools_tpu.preference.qwen25vl import Qwen25VLCaller

    from tokenizers import pre_tokenizers

    vocab = {f"w{i}": i for i in range(150)}
    vocab.update({"<|video_pad|>": VIDEO_ID, "<|vision_start|>": VSTART_ID,
                  "<|vision_end|>": 153, "<eos>": 159})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")
    fast.add_special_tokens({"additional_special_tokens":
                             ["<|video_pad|>", "<|vision_start|>",
                              "<|vision_end|>"]})

    caller = Qwen25VLCaller(model=ours, tokenizer=fast, batch=2,
                            max_new_tokens=4, max_pixels=56 * 84)
    rng = np.random.default_rng(7)
    samples = [
        {"frames": rng.integers(0, 255, size=(2, 56, 84, 3)).astype(np.uint8)},
        {"frames": rng.integers(0, 255, size=(4, 30, 44, 3)).astype(np.uint8)},
    ]
    res = caller(samples, ["w5 w6", "w7"])
    assert len(res) == 2 and all(isinstance(r, str) for r in res)
