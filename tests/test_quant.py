"""Dynamic int8 (w8a8) quantized matmul: exactness of the quantization
scheme vs a NumPy reference, and accuracy class of the int8 encoder mode
(production mode analogous to bf16 — NOT the <1e-3 parity contract)."""

import numpy as np
import pytest


def ref_int8_dot(lhs: np.ndarray, rhs: np.ndarray) -> np.ndarray:
    ls = np.maximum(np.abs(lhs).max(-1, keepdims=True), 1e-8)
    ql = np.round(lhs / ls * 127.0).astype(np.int8)
    rs = np.maximum(np.abs(rhs).max(0, keepdims=True), 1e-8)
    qr = np.round(rhs / rs * 127.0).astype(np.int8)
    acc = ql.astype(np.int32) @ qr.astype(np.int32)
    return acc.astype(np.float32) * (ls / 127.0) * (rs / 127.0)


def test_int8_dot_general_matches_numpy_reference():
    import jax.numpy as jnp

    from mertools_tpu.ops.quant import int8_dot_general

    rng = np.random.default_rng(0)
    lhs = rng.normal(size=(3, 7, 16)).astype(np.float32) * 3.0
    rhs = rng.normal(size=(16, 9)).astype(np.float32)
    out = np.asarray(int8_dot_general(
        jnp.asarray(lhs), jnp.asarray(rhs),
        (((2,), (0,)), ((), ()))))
    ref = ref_int8_dot(lhs, rhs)
    assert np.abs(out - ref).max() < 1e-5


def test_int8_dot_general_accuracy_class():
    """Relative error of the w8a8 scheme itself on gaussian data ~1e-2."""
    import jax.numpy as jnp

    from mertools_tpu.ops.quant import int8_dot_general

    rng = np.random.default_rng(1)
    lhs = rng.normal(size=(64, 128)).astype(np.float32)
    rhs = rng.normal(size=(128, 96)).astype(np.float32) / np.sqrt(128)
    out = np.asarray(int8_dot_general(jnp.asarray(lhs), jnp.asarray(rhs),
                                      (((1,), (0,)), ((), ()))))
    exact = lhs @ rhs
    rel = np.linalg.norm(out - exact) / np.linalg.norm(exact)
    assert rel < 0.02, rel


def test_int8_dot_general_rejects_non_dense_patterns():
    import jax.numpy as jnp

    from mertools_tpu.ops.quant import int8_dot_general

    a = jnp.ones((2, 3, 4))
    b = jnp.ones((2, 4, 5))
    with pytest.raises(NotImplementedError):
        int8_dot_general(a, b, (((2,), (1,)), ((0,), (0,))))


def test_int8_encoder_mode_accuracy_and_pipeline():
    """AudioExtractor(compute_dtype='int8') runs end-to-end and its UTT
    features stay within the production-mode error class of the f32 path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mertools_tpu.encoders import wav2vec2 as w2v
    from mertools_tpu.features.audio import AudioExtractor

    cfg = dataclasses.replace(
        w2v.Wav2Vec2Config.base(), hidden_size=32, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=48, conv_dim=(16, 16),
        conv_kernel=(10, 3), conv_stride=(5, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2, feat_extract_norm="layer",
        do_stable_layer_norm=True, conv_bias=True)
    enc = w2v.Wav2Vec2Encoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 800)))["params"]

    rng = np.random.default_rng(2)
    wavs = {f"c{i}": rng.normal(size=(n,)).astype(np.float32)
            for i, n in enumerate((800, 1200, 500))}

    exact = AudioExtractor(cfg, params, buckets=(1600,),
                           max_segment=1600).extract(wavs, level="UTT")
    quant = AudioExtractor(cfg, params, buckets=(1600,), max_segment=1600,
                           compute_dtype="int8").extract(wavs, level="UTT")
    for name in wavs:
        e, q = exact[name], quant[name]
        assert q.shape == e.shape and q.dtype == np.float32
        cos = float(np.dot(e, q) / (np.linalg.norm(e) * np.linalg.norm(q)))
        assert cos > 0.999, (name, cos)


def test_w8_pack_roundtrip():
    import jax.numpy as jnp

    from mertools_tpu.ops.quant import quantize_weight_w8, w8_einsum

    rng = np.random.default_rng(4)
    w = rng.normal(size=(32, 24)).astype(np.float32)
    packed = quantize_weight_w8(jnp.asarray(w))
    assert packed["q"].dtype == np.int8 and packed["scale"].shape == (24,)
    deq = np.asarray(packed["q"], np.float32) * np.asarray(packed["scale"])
    assert np.abs(deq - w).max() <= np.abs(w).max(0).max() / 127 + 1e-6

    x = rng.normal(size=(5, 32)).astype(np.float32)
    y = np.asarray(w8_einsum("bd,df->bf", jnp.asarray(x), packed))
    assert np.abs(y - x @ deq).max() < 1e-4


def test_w8_generate_matches_dequantized_params():
    """generate() over a w8-packed tree == generate() over the explicitly
    dequantized float tree (same math, packed storage)."""
    import jax
    import jax.numpy as jnp

    from mertools_tpu.mllm import generate as G
    from mertools_tpu.mllm.llm import LLM, LLMConfig

    cfg = LLMConfig.tiny(vocab=64)
    llm = LLM(cfg)

    def both(m, emb, ids):
        m.embed(ids)
        return m(emb)

    params = llm.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4, cfg.hidden_size)),
                      jnp.zeros((1, 1), jnp.int32), method=both)["params"]

    packed = G.quantize_llm_params_w8(params)

    # materialized dequant: what the packed math is algebraically equal to
    def dq(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict) and "q" in v and "scale" in v:
                out[k] = jnp.asarray(np.asarray(v["q"], np.float32)
                                     * np.asarray(v["scale"]))
            elif isinstance(v, dict):
                out[k] = dq(v)
            else:
                out[k] = v
        return out

    deq = dq(packed)
    B, S, H = 2, 6, cfg.hidden_size
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, S, H))
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.int32)

    lp, *_ = G.prefill(cfg, packed, emb, mask, S + 4)
    lf, *_ = G.prefill(cfg, deq, emb, mask, S + 4)
    assert np.allclose(np.asarray(lp), np.asarray(lf), atol=1e-4)

    tp = np.asarray(G.generate(cfg, packed, emb, mask, max_new_tokens=5,
                               eos_token_id=1))
    tf = np.asarray(G.generate(cfg, deq, emb, mask, max_new_tokens=5,
                               eos_token_id=1))
    assert tp.shape == (B, 5)
    assert (tp == tf).all()


def test_kv_int8_generate_close_to_full_precision():
    """kv_int8 generation: same shapes, high greedy agreement with the
    full-precision cache on a tiny LLM (per-token-head absmax, ~1e-2
    logit class), EOS semantics intact."""
    import jax
    import jax.numpy as jnp

    from mertools_tpu.mllm import generate as G
    from mertools_tpu.mllm.llm import LLM, LLMConfig

    cfg = LLMConfig.tiny(vocab=64)   # GQA: nh=4, nkv=2 — grouped path
    llm = LLM(cfg)

    def both(m, emb, ids):
        m.embed(ids)
        return m(emb)

    params = llm.init(jax.random.PRNGKey(2),
                      jnp.zeros((1, 4, cfg.hidden_size)),
                      jnp.zeros((1, 1), jnp.int32), method=both)["params"]
    emb = jax.random.normal(jax.random.PRNGKey(3),
                            (2, 5, cfg.hidden_size))
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], jnp.int32)

    # prefill logits: quantization error bounded
    lq, kc, vc, _ = G.prefill(cfg, params, emb, mask, 12, kv_int8=True)
    lf, _, _, _ = G.prefill(cfg, params, emb, mask, 12)
    assert isinstance(kc, tuple) and kc[0].dtype == np.int8
    rel = (np.linalg.norm(np.asarray(lq) - np.asarray(lf))
           / np.linalg.norm(np.asarray(lf)))
    assert rel < 0.05, rel

    tq = np.asarray(G.generate(cfg, params, emb, mask, max_new_tokens=6,
                               eos_token_id=-1, kv_int8=True))
    tf = np.asarray(G.generate(cfg, params, emb, mask, max_new_tokens=6,
                               eos_token_id=-1))
    assert tq.shape == tf.shape == (2, 6)
    assert (tq == tf).mean() >= 0.5  # tiny random LLM: near-uniform logits


def test_int8_clip_vision_mode():
    """VisionExtractor(compute_dtype='int8') end-to-end on a tiny CLIP."""
    import jax
    import jax.numpy as jnp

    from mertools_tpu.encoders.vit_clip import (CLIPVisionConfig,
                                                CLIPVisionEncoder)
    from mertools_tpu.features.vision import VisionExtractor

    cfg = CLIPVisionConfig(hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=2, intermediate_size=48,
                           image_size=28, patch_size=14, projection_dim=16)
    enc = CLIPVisionEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 28, 28, 3)))["params"]

    rng = np.random.default_rng(3)
    faces = {"a": rng.integers(0, 255, (5, 112, 112, 3), dtype=np.uint8),
             "b": rng.integers(0, 255, (3, 112, 112, 3), dtype=np.uint8)}
    exact = VisionExtractor(cfg, params, batch_size=4).extract(faces, "UTT")
    quant = VisionExtractor(cfg, params, batch_size=4,
                            compute_dtype="int8").extract(faces, "UTT")
    for name in faces:
        e, q = exact[name], quant[name]
        assert q.shape == e.shape
        cos = float(np.dot(e, q) / (np.linalg.norm(e) * np.linalg.norm(q)))
        assert cos > 0.99, (name, cos)
