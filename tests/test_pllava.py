"""PLLaVA judge parity vs a hand-assembled torch oracle.

The reference tree ships only the wrapper (utils/pllava.py) — the model
package is not vendored — so the oracle follows the published PLLaVA
architecture: CLIP tower(-2) CLS-drop -> per-frame projector ->
torch.nn.functional.adaptive_avg_pool3d over (T, grid, grid) ->
placeholder splice -> LLaMA greedy decode.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

IMAGE_ID = 150
POOL = (3, 1, 2)    # (t, h, w) — deliberately uneven vs T=4, grid=2


def tiny_hf_llava():
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    vcfg = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                num_attention_heads=2, image_size=28, patch_size=14,
                projection_dim=16)
    tcfg = dict(model_type="llama", vocab_size=160, hidden_size=48,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, intermediate_size=96,
                max_position_embeddings=512)
    cfg = LlavaConfig(vision_config=vcfg, text_config=tcfg,
                      image_token_index=IMAGE_ID)
    torch.manual_seed(0)
    return LlavaForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def models():
    from mertools_tpu.preference.pllava import Pllava

    hf = tiny_hf_llava()
    ours = Pllava.from_hf_torch(hf, pooling_shape=POOL)
    return hf, ours


def test_adaptive_pool_matrix_matches_torch():
    from mertools_tpu.preference.pllava import adaptive_pool_matrix

    rng = np.random.default_rng(0)
    for n_in, n_out in ((7, 3), (4, 3), (16, 12), (5, 5), (3, 4)):
        x = rng.normal(size=(2, n_in)).astype(np.float32)
        ref = F.adaptive_avg_pool1d(torch.tensor(x)[:, None], n_out
                                    )[:, 0].numpy()
        got = x @ adaptive_pool_matrix(n_in, n_out).T
        np.testing.assert_allclose(got, ref, atol=1e-6)


def _oracle_features(hf, pixels):
    """published PLLaVA get-video-features flow."""
    B, T = pixels.shape[:2]
    with torch.no_grad():
        x = torch.tensor(pixels.reshape((-1,) + pixels.shape[2:])
                         .transpose(0, 3, 1, 2))
        hs = hf.model.vision_tower(x, output_hidden_states=True
                                   ).hidden_states[-2][:, 1:]
        feats = hf.model.multi_modal_projector(hs)     # (B*T, 4, H)
        H = feats.shape[-1]
        feats = feats.reshape(B, T, 2, 2, H).permute(0, 4, 1, 2, 3)
        pooled = F.adaptive_avg_pool3d(feats, POOL)
        return pooled.flatten(2).transpose(1, 2).numpy()  # (B, twh, H)


def test_video_features_parity(models):
    hf, ours = models
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(2, 4, 28, 28, 3)).astype(np.float32)
    ref = _oracle_features(hf, pixels)
    got = ours.video_features(pixels)
    assert got.shape == ref.shape == (2, int(np.prod(POOL)), 48)
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_generation_matches_oracle_greedy(models):
    hf, ours = models
    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(1, 4, 28, 28, 3)).astype(np.float32)
    n_tok = int(np.prod(POOL))
    ids = rng.integers(1, 150, size=18).astype(np.int64)
    ids[2: 2 + n_tok] = IMAGE_ID

    class _Tok:
        eos_token_id = 2

        def decode(self, x, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in x)

    got = ours.generate_batch([ids.astype(np.int32)], pixels, _Tok(),
                              max_new_tokens=6, temperature=0.0)[0]

    feats = _oracle_features(hf, pixels)
    table = hf.model.language_model.embed_tokens.weight.detach()
    emb = table[torch.tensor(np.where(ids == IMAGE_ID, 0, ids))].clone()
    emb[2: 2 + n_tok] = torch.tensor(feats[0])
    cur = emb[None]
    out_ids = []
    with torch.no_grad():
        for _ in range(6):
            h = hf.model.language_model(inputs_embeds=cur)[0]
            logits = hf.lm_head(h)
            nxt = int(logits[0, -1].argmax())
            if nxt == 2:
                break
            out_ids.append(nxt)
            cur = torch.cat([cur, table[None, [nxt]]], dim=1)
    want = " ".join(f"t{i}" for i in out_ids)
    assert got == want, (got, want)


def test_caller_end_to_end(models):
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    from mertools_tpu.preference.pllava import PLLAVA_SYSTEM, PllavaCaller

    _, ours = models
    vocab = {f"w{i}": i for i in range(150)}
    vocab.update({"<image>": IMAGE_ID, "<eos>": 159})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")
    fast.add_special_tokens({"additional_special_tokens": ["<image>"]})

    caller = PllavaCaller(model=ours, tokenizer=fast, batch=2, n_frames=4,
                          max_new_tokens=4, temperature=0.0)
    assert "Video Magic ChatBot" in PLLAVA_SYSTEM
    rng = np.random.default_rng(3)
    samples = [
        {"frames": rng.integers(0, 255, size=(9, 40, 50, 3)).astype(np.uint8)},
        {"frames": rng.integers(0, 255, size=(5, 28, 28, 3)).astype(np.uint8)},
    ]
    res = caller(samples, ["w5 w6", "w7"])
    assert len(res) == 2 and all(isinstance(r, str) for r in res)
    one = caller(samples[:1], ["w5 w6"])
    assert one[0] == res[0]
