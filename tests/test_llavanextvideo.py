"""LLaVA-NeXT-Video wrapper: HF torch oracle parity (CLS drop + spatial
pooling video path, splice, generation) + caller end-to-end.

VERDICT.md round-2 Missing #1: LLaVA-NeXT family judges.
Reference wrapper: MER2026/MER2026_Track3/utils/llavanextvideo.py:24-62.
"""

import numpy as np
import pytest
import torch

VIDEO_ID, IMAGE_ID = 151, 150


def tiny_hf_lnv(pool_mode="average"):
    from transformers import (LlavaNextVideoConfig,
                              LlavaNextVideoForConditionalGeneration)

    vcfg = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                num_attention_heads=2, image_size=56, patch_size=14,
                projection_dim=16)
    tcfg = dict(model_type="llama", vocab_size=160, hidden_size=48,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, intermediate_size=96,
                max_position_embeddings=512)
    cfg = LlavaNextVideoConfig(
        vision_config=vcfg, text_config=tcfg,
        image_token_index=IMAGE_ID, video_token_index=VIDEO_ID,
        spatial_pool_mode=pool_mode, spatial_pool_stride=2,
        image_grid_pinpoints=[[56, 56]])
    torch.manual_seed(0)
    return LlavaNextVideoForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def models():
    from mertools_tpu.preference.llavanextvideo import LlavaNextVideo

    hf = tiny_hf_lnv()
    return hf, LlavaNextVideo.from_hf_torch(hf)


def _frames(ours, B=1, F=2, seed=0):
    rng = np.random.default_rng(seed)
    s = ours.vcfg.image_size
    return rng.normal(size=(B, F, s, s, 3)).astype(np.float32)


def test_tokens_per_frame(models):
    _, ours = models
    # 56/14 = 4x4 grid, stride-2 pool -> 2x2 = 4 tokens/frame
    assert ours.tokens_per_frame == 4


@pytest.mark.parametrize("pool_mode", ["average", "max", "conv"])
def test_video_features_parity(pool_mode):
    """Our tower(-2) + CLS drop + spatial pool + projector == HF
    get_video_features for every pooling mode."""
    from mertools_tpu.preference.llavanextvideo import LlavaNextVideo

    hf = tiny_hf_lnv(pool_mode)
    ours = LlavaNextVideo.from_hf_torch(hf)
    pixels = _frames(ours, B=2, F=2)
    with torch.no_grad():
        ref = hf.model.get_video_features(
            torch.tensor(pixels.transpose(0, 1, 4, 2, 3)),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default")
        ref = torch.cat(list(ref), dim=0)       # (B*F, tpf, H_llm)
        ref = ref.reshape(pixels.shape[0], -1, ref.shape[-1]).numpy()
    got = ours.video_features(pixels)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def _prompt_with_video(ours, F=2, S=24, seed=3):
    n_tok = ours.tokens_per_frame * F
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 150, size=S).astype(np.int64)
    ids[2: 2 + n_tok] = VIDEO_ID
    return ids


def test_full_model_logits_parity(models):
    hf, ours = models
    pixels = _frames(ours, B=1, F=2, seed=4)
    ids = _prompt_with_video(ours, F=2, seed=5)[None]
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask),
                 pixel_values_videos=torch.tensor(
                     pixels.transpose(0, 1, 4, 2, 3))).logits.numpy()
    got = ours.forward_logits(ids.astype(np.int32), pixels, mask)
    assert np.abs(got - ref).max() < 2e-3, np.abs(got - ref).max()
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.97


def _word_tokenizer():
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {f"w{i}": i for i in range(150)}
    vocab.update({"<image>": IMAGE_ID, "<video>": VIDEO_ID, "<eos>": 159})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")
    fast.add_special_tokens(
        {"additional_special_tokens": ["<video>", "<image>"]})
    return fast


def test_generation_matches_hf(models):
    hf, ours = models
    fast = _word_tokenizer()
    pixels = _frames(ours, B=1, F=2, seed=6)
    ids = _prompt_with_video(ours, F=2, seed=7)
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor(ids[None]),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
            pixel_values_videos=torch.tensor(
                pixels.transpose(0, 1, 4, 2, 3)),
            max_new_tokens=8, do_sample=False,
            eos_token_id=159, pad_token_id=159)
    ref_text = fast.decode(out[0, len(ids):], skip_special_tokens=True)

    got = ours.generate_batch([ids.astype(np.int32)], pixels, fast,
                              max_new_tokens=8, temperature=0.0)
    assert got[0] == ref_text, (got[0], ref_text)


def test_caller_end_to_end(models):
    """Caller protocol: shortest-edge resize + center crop preprocessing,
    flattened responses, batch == alone."""
    _, ours = models
    from mertools_tpu.preference.llavanextvideo import LlavaNextVideoCaller

    fast = _word_tokenizer()
    caller = LlavaNextVideoCaller(model=ours, tokenizer=fast, batch=2,
                                  n_frames=2, max_new_tokens=4,
                                  temperature=0.0)
    rng = np.random.default_rng(11)
    samples = [
        {"frames": rng.integers(0, 255, size=(5, 70, 90, 3)).astype(np.uint8)},
        {"frames": rng.integers(0, 255, size=(9, 90, 60, 3)).astype(np.uint8)},
        {"frames": rng.integers(0, 255, size=(2, 56, 56, 3)).astype(np.uint8)},
    ]
    # preprocessing contract: square crop at the tower size
    x = caller.preprocess_video(samples[0]["frames"][:2])
    assert x.shape == (2, 56, 56, 3)
    res = caller(samples, ["w5 w6", "w7", "w8 w9"])
    assert len(res) == 3 and all(isinstance(r, str) for r in res)
    assert all("\n" not in r and "\t" not in r for r in res)
    one = caller(samples[:1], ["w5 w6"])
    assert one[0] == res[0]
