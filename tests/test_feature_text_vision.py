"""Text + vision batched extraction parity vs torch per-item pipelines."""

import numpy as np
import torch


def test_text_extractor_matches_torch():
    import jax.numpy as jnp  # noqa: F401

    from transformers import BertConfig as HFCfg, BertModel

    from mertools_tpu.encoders import bert
    from mertools_tpu.features.text import TextExtractor

    cfg = HFCfg(hidden_size=16, num_hidden_layers=4, num_attention_heads=2,
                intermediate_size=32, vocab_size=60, max_position_embeddings=64,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = BertModel(cfg).eval()
    mcfg, params = bert.from_hf_torch(hf)
    ex = TextExtractor(mcfg, params, buckets=(8, 16, 32), batch_size=4)

    rng = np.random.default_rng(0)
    # fake tokenized sentences with [CLS]=2 ... [SEP]=3 framing
    token_ids = {f"s{i}": [2] + rng.integers(4, 60, size=int(L)).tolist() + [3]
                 for i, L in enumerate([3, 7, 12, 1, 22, 5, 9])}
    fra = ex.extract(token_ids, span=(1, -1), level="FRA")
    utt = ex.extract(token_ids, span=(1, -1), level="UTT")

    for name, ids in token_ids.items():
        with torch.no_grad():
            hs = hf(torch.tensor([ids]).long(), output_hidden_states=True).hidden_states
        ref = torch.stack(hs)[[-4, -3, -2, -1]].sum(0)[0, 1:-1].numpy()
        assert fra[name].shape == ref.shape
        assert np.abs(fra[name] - ref).max() < 1e-3, name
        np.testing.assert_allclose(utt[name], ref.mean(0), atol=1e-3)


def test_text_extractor_empty_sentence():
    from transformers import BertConfig as HFCfg, BertModel

    from mertools_tpu.encoders import bert
    from mertools_tpu.features.text import TextExtractor

    cfg = HFCfg(hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=32, vocab_size=60, max_position_embeddings=64)
    hf = BertModel(cfg).eval()
    mcfg, params = bert.from_hf_torch(hf)
    ex = TextExtractor(mcfg, params, buckets=(8,), batch_size=2, layer_ids=(-1,))
    out = ex.extract({"empty": [2, 3]}, span=(1, -1), level="FRA")
    assert out["empty"].shape == (1, 16)
    np.testing.assert_array_equal(out["empty"], 0.0)
    out_u = ex.extract({"empty": [2, 3]}, span=(1, -1), level="UTT")
    assert out_u["empty"].shape == (16,)


def test_vision_extractor_matches_torch():
    import torch.nn.functional  # noqa: F401

    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModelWithProjection
    from transformers import CLIPImageProcessor

    from mertools_tpu.encoders import vit_clip
    from mertools_tpu.features.vision import VisionExtractor, resample_frames_uniform

    cfg = HFCfg(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=64, image_size=32, patch_size=16,
                projection_dim=24, attention_dropout=0.0)
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(cfg).eval()
    mcfg, params = vit_clip.from_hf_torch(hf)
    proc = CLIPImageProcessor(size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32},
                              do_center_crop=True, do_resize=True, resample=3)

    rng = np.random.default_rng(0)
    faces = {f"v{i}": rng.integers(0, 255, size=(t, 32, 32, 3)).astype(np.uint8)
             for i, t in enumerate([3, 5, 2])}

    ex = VisionExtractor(mcfg, params, batch_size=4, max_frames=8)
    fra = ex.extract(faces, level="FRA")

    for name, arr in faces.items():
        rgb = [frame[..., ::-1] for frame in arr]  # BGR -> RGB like reference
        pix = proc(images=rgb, return_tensors="pt").pixel_values
        with torch.no_grad():
            ref = hf(pix).image_embeds.numpy()
        assert fra[name].shape == ref.shape
        err = np.abs(fra[name] - ref).max()
        # resize resample differs slightly (jax bicubic vs PIL bicubic)
        assert err < 0.15, (name, err)


def test_resample_frames_uniform():
    from mertools_tpu.features.vision import resample_frames_uniform

    assert resample_frames_uniform(5, 8).tolist() == [0, 1, 2, 3, 4]
    idx = resample_frames_uniform(100, 10)
    assert len(idx) == 10 and idx[0] == 0 and idx[-1] <= 99
    assert (np.diff(idx) > 0).all()


def test_causal_lm_text_extractor(rng):
    """Decoder-LM text features: last-4-sum hidden states, UTT mean."""
    import jax

    from mertools_tpu.features.text import CausalLMTextExtractor
    from mertools_tpu.mllm.llm import LLM, LLMConfig

    cfg = LLMConfig(vocab_size=64, hidden_size=32, num_layers=4,
                    num_heads=4, num_kv_heads=2, intermediate_size=64)
    model = LLM(cfg)

    def both(mdl, embeds, ids):
        mdl.embed(ids)
        return mdl(embeds)

    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 4, cfg.hidden_size), np.float32),
                        np.zeros((1, 1), np.int32), method=both)["params"]
    ex = CausalLMTextExtractor(cfg, params, compute_dtype=None,
                               batch_size=2)
    tokens = {"a": [5, 6, 7, 8], "b": [9, 10], "c": [11, 12, 13]}
    fra = ex.extract(tokens, span=(0, 0), level="FRA")
    utt = ex.extract(tokens, span=(0, 0), level="UTT")
    assert fra["a"].shape == (4, cfg.hidden_size)
    np.testing.assert_allclose(utt["b"], fra["b"].mean(0), rtol=1e-5,
                               atol=1e-6)
