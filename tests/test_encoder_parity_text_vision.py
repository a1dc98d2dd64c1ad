"""BERT and CLIP-ViT parity vs HF torch on tiny random configs."""

import numpy as np
import torch


def test_bert_parity():
    import jax.numpy as jnp

    from transformers import BertConfig as HFCfg, BertModel

    from mertools_tpu.encoders import bert

    cfg = HFCfg(hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
                intermediate_size=64, vocab_size=100, max_position_embeddings=64,
                type_vocab_size=2, hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = BertModel(cfg).eval()
    mcfg, params = bert.from_hf_torch(hf)
    enc = bert.BertEncoder(mcfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, size=(2, 11)).astype(np.int32)
    mask = np.ones((2, 11), np.int32)
    mask[1, 7:] = 0
    with torch.no_grad():
        ref = hf(torch.tensor(ids).long(), attention_mask=torch.tensor(mask).long(),
                 output_hidden_states=True).hidden_states
    ours = enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    assert len(ours) == len(ref)
    # masked positions diverge (torch computes them with garbage attention);
    # compare valid positions only — exactly what the extraction pipeline uses
    valid = mask.astype(bool)
    for i, (o, r) in enumerate(zip(ours, ref)):
        err = np.abs(np.asarray(o) - r.numpy())[valid].max()
        assert err < 1e-4, (i, err)


def test_bert_last4_sum_utt():
    """The reference's last-4-sum + span mean (extract_text_huggingface.py)."""
    import jax.numpy as jnp

    from transformers import BertConfig as HFCfg, BertModel

    from mertools_tpu.encoders import bert

    cfg = HFCfg(hidden_size=16, num_hidden_layers=5, num_attention_heads=2,
                intermediate_size=32, vocab_size=50, max_position_embeddings=32,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(1)
    hf = BertModel(cfg).eval()
    mcfg, params = bert.from_hf_torch(hf)
    ids = np.array([[2, 5, 7, 9, 3]], np.int32)  # [CLS] a b c [SEP]-style
    with torch.no_grad():
        hs = hf(torch.tensor(ids).long(), output_hidden_states=True).hidden_states
        ref = torch.stack(hs)[-4:].sum(dim=0)[0, 1:-1].mean(0).numpy()
    ours_hs = bert.BertEncoder(mcfg).apply({"params": params}, jnp.asarray(ids))
    ours = np.asarray(sum(ours_hs[-4:])[0, 1:-1].mean(0))
    assert np.abs(ours - ref).max() < 1e-4


def test_clip_vision_parity():
    import jax.numpy as jnp

    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModelWithProjection

    from mertools_tpu.encoders import vit_clip

    cfg = HFCfg(hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
                intermediate_size=64, image_size=32, patch_size=16,
                projection_dim=24, attention_dropout=0.0)
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(cfg).eval()
    mcfg, params = vit_clip.from_hf_torch(hf)
    enc = vit_clip.CLIPVisionEncoder(mcfg)

    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(pix)).image_embeds.numpy()
    # flax takes NHWC
    out = enc.apply({"params": params}, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    assert np.abs(np.asarray(out["image_embeds"]) - ref).max() < 1e-4
