"""Video-LLaVA wrapper: HF torch oracle parity (hidden-layer -2 CLIP tower,
projector, placeholder splice, generation) + caller end-to-end.

VERDICT.md Next #4: runnable video-LLaVA-class zero-shot judge.
Reference wrapper: MER2025/MER2025_Track23/Video-LLaVA/main-video.py:22-121.
"""

import numpy as np
import pytest
import torch

VIDEO_ID, IMAGE_ID = 151, 150


def tiny_hf_videollava():
    from transformers import VideoLlavaConfig, VideoLlavaForConditionalGeneration

    vcfg = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                num_attention_heads=2, image_size=28, patch_size=14,
                projection_dim=16)
    tcfg = dict(model_type="llama", vocab_size=160, hidden_size=48,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, intermediate_size=96,
                max_position_embeddings=512)
    cfg = VideoLlavaConfig(vision_config=vcfg, text_config=tcfg,
                           image_token_index=IMAGE_ID,
                           video_token_index=VIDEO_ID)
    torch.manual_seed(0)
    return VideoLlavaForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def models():
    from mertools_tpu.preference.videollava import VideoLlava

    hf = tiny_hf_videollava()
    return hf, VideoLlava.from_hf_torch(hf)


def _frames(ours, B=1, F=2, seed=0):
    """Normalized (B, F, H, W, 3) frames at the tower's native size."""
    rng = np.random.default_rng(seed)
    s = ours.vcfg.image_size
    return rng.normal(size=(B, F, s, s, 3)).astype(np.float32)


def test_video_features_parity(models):
    """Our tower(-2)+projector == HF get_video_features (all 257 tokens/frame
    kept — HF applies no select strategy to videos)."""
    hf, ours = models
    pixels = _frames(ours, B=2, F=2)
    with torch.no_grad():
        ref, _ = hf.model.get_video_features(
            torch.tensor(pixels.transpose(0, 1, 4, 2, 3)),
            vision_feature_layer=-2)
        # HF returns (B*F, 257, H_llm); regroup per clip
        ref = ref.reshape(pixels.shape[0], -1, ref.shape[-1]).numpy()
    got = ours.video_features(pixels)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_image_features_parity(models):
    """Image path drops CLS under the "default" strategy."""
    hf, ours = models
    pixels = _frames(ours, B=2, F=1, seed=1)[:, 0]
    with torch.no_grad():
        ref = hf.model.get_image_features(
            torch.tensor(pixels.transpose(0, 3, 1, 2)),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default").numpy()
    got = ours.image_features(pixels)
    assert got.shape == ref.shape
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


def test_generation_batched_ragged(models):
    """Two ragged prompts in one batch == each decoded alone (right-pad +
    splice correctness)."""
    _, ours = models
    fast = _word_tokenizer()
    pixels = _frames(ours, B=2, F=2, seed=8)
    ids_a = _prompt_with_video(ours, F=2, S=20, seed=9).astype(np.int32)
    ids_b = _prompt_with_video(ours, F=2, S=31, seed=10).astype(np.int32)
    together = ours.generate_batch([ids_a, ids_b], pixels, fast,
                                   max_new_tokens=6, temperature=0.0)
    alone = [ours.generate_batch([ids_a], pixels[:1], fast,
                                 max_new_tokens=6, temperature=0.0)[0],
             ours.generate_batch([ids_b], pixels[1:], fast,
                                 max_new_tokens=6, temperature=0.0)[0]]
    assert together == alone, (together, alone)


def test_caller_end_to_end(models):
    """Unified caller protocol on raw uint8 frames (reference
    main-video.py:75-112 semantics: uniform frame pick, resize+CLIP norm,
    flattened response)."""
    _, ours = models
    from mertools_tpu.preference.videollava import VideoLlavaCaller

    fast = _word_tokenizer()
    caller = VideoLlavaCaller(model=ours, tokenizer=fast, batch=2,
                              n_frames=2, max_new_tokens=4, temperature=0.0)
    rng = np.random.default_rng(11)
    samples = [
        {"frames": rng.integers(0, 255, size=(5, 40, 56, 3)).astype(np.uint8)},
        {"frames": rng.integers(0, 255, size=(9, 30, 44, 3)).astype(np.uint8)},
        {"frames": rng.integers(0, 255, size=(2, 28, 28, 3)).astype(np.uint8)},
    ]
    res = caller(samples, ["w5 w6", "w7", "w8 w9"])
    assert len(res) == 3 and all(isinstance(r, str) for r in res)
    assert all("\n" not in r and "\t" not in r for r in res)
    one = caller(samples[:1], ["w5 w6"])
    assert one[0] == res[0]
