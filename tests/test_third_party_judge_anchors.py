"""Third-party (HF transformers) anchors for the three NON-VENDORED
judges — PLLaVA, Qwen-Audio v1, VITA (VERDICT round-3 #8 / Weak #7).

These judges have no reference code in-tree; both our implementation and
its hand-assembled torch oracle encode the same author's reading of the
published architecture, so a shared misreading would pass the oracle
tests. Where the installed ``transformers`` (4.57) ships the same ops, we
pin sub-module equality against it — an INDEPENDENT implementation, the
same treatment test_dsp_third_party_anchors gave the DSP chains:

  * Qwen-Audio v1 tower == transformers WhisperEncoder (the published
    tower IS Whisper's: conv3x2+GELU, sinusoid positions, bias-free K,
    per-head scaling, pre-LN blocks);
  * Qwen v1 LM converter + our LLM == transformers Qwen2ForCausalLM
    (the v1 stack is Qwen2's within the 2048 window: fused-bias qkv,
    RMSNorm, SwiGLU, rotary NTK base) — weights mapped v1-layout -> HF;
  * VITA InternViT tower == transformers InternVLVisionModel (layer-scale
    pre-norm ViT, cls token, learned positions, attention biases);
  * VITA pixel shuffle == transformers InternVLModel.pixel_shuffle;
  * PLLaVA separable pooling == torch F.adaptive_avg_pool3d end-to-end
    (the pool-matrix unit test in test_pllava covers one axis; this
    covers the composed 3D pool at production shapes).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp


# ---------------------------------------------------------------- qwenaudio
def test_qwenaudio_tower_matches_hf_whisper_encoder():
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    from mertools_tpu.preference.qwenaudio import (QwenAudioTower,
                                                   QwenAudioTowerConfig,
                                                   whisper_sinusoids)

    torch.manual_seed(0)
    d, L, heads, mels, n_ctx = 32, 2, 2, 8, 50
    hf_cfg = WhisperConfig(d_model=d, encoder_layers=L,
                           encoder_attention_heads=heads, num_mel_bins=mels,
                           max_source_positions=n_ctx,
                           encoder_ffn_dim=4 * d)
    enc = WhisperEncoder(hf_cfg).eval()
    # real checkpoints carry exactly the sinusoid table; pin it so the
    # anchor isolates the BLOCK math
    with torch.no_grad():
        enc.embed_positions.weight.copy_(
            torch.tensor(whisper_sinusoids(n_ctx, d)))
    sd = enc.state_dict()

    tcfg = QwenAudioTowerConfig(n_mels=mels, n_ctx=n_ctx, n_state=d,
                                n_head=heads, n_layer=L, output_dim=16)
    rng = np.random.default_rng(0)
    proj_k = rng.normal(size=(d, 16)).astype(np.float32) * 0.1
    proj_b = rng.normal(size=(16,)).astype(np.float32) * 0.1

    def t(x):
        return np.asarray(x.detach().numpy())

    p = {"conv1": {"kernel": t(sd["conv1.weight"]).transpose(2, 1, 0),
                   "bias": t(sd["conv1.bias"])},
         "conv2": {"kernel": t(sd["conv2.weight"]).transpose(2, 1, 0),
                   "bias": t(sd["conv2.bias"])},
         "ln_post": {"scale": t(sd["layer_norm.weight"]),
                     "bias": t(sd["layer_norm.bias"])},
         "proj_kernel": proj_k, "proj_bias": proj_b}
    for i in range(L):
        lp = f"layers.{i}"
        p[f"attn_ln_{i}"] = {
            "scale": t(sd[f"{lp}.self_attn_layer_norm.weight"]),
            "bias": t(sd[f"{lp}.self_attn_layer_norm.bias"])}
        p[f"mlp_ln_{i}"] = {
            "scale": t(sd[f"{lp}.final_layer_norm.weight"]),
            "bias": t(sd[f"{lp}.final_layer_norm.bias"])}
        p[f"q_{i}"] = {"kernel": t(sd[f"{lp}.self_attn.q_proj.weight"]).T,
                       "bias": t(sd[f"{lp}.self_attn.q_proj.bias"])}
        p[f"k_{i}"] = {"kernel": t(sd[f"{lp}.self_attn.k_proj.weight"]).T}
        p[f"v_{i}"] = {"kernel": t(sd[f"{lp}.self_attn.v_proj.weight"]).T,
                       "bias": t(sd[f"{lp}.self_attn.v_proj.bias"])}
        p[f"out_{i}"] = {"kernel": t(sd[f"{lp}.self_attn.out_proj.weight"]).T,
                         "bias": t(sd[f"{lp}.self_attn.out_proj.bias"])}
        p[f"fc1_{i}"] = {"kernel": t(sd[f"{lp}.fc1.weight"]).T,
                         "bias": t(sd[f"{lp}.fc1.bias"])}
        p[f"fc2_{i}"] = {"kernel": t(sd[f"{lp}.fc2.weight"]).T,
                         "bias": t(sd[f"{lp}.fc2.bias"])}

    T = 100  # mel frames (HF WhisperEncoder requires 2 * n_ctx exactly)
    mel = rng.normal(size=(2, mels, T)).astype(np.float32)
    with torch.no_grad():
        hf_out = enc(torch.tensor(mel)).last_hidden_state.numpy()
    # HF output -> the Qwen-Audio additions (avgpool(2,2) + projection)
    T2 = (hf_out.shape[1] // 2) * 2
    ref = hf_out[:, :T2].reshape(2, T2 // 2, 2, d).mean(2) @ proj_k + proj_b

    tower = QwenAudioTower(tcfg)
    got = np.asarray(tower.apply({"params": p}, jnp.asarray(mel)))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_qwen_v1_converter_matches_hf_qwen2():
    """Map a tiny HF Qwen2's weights INTO the published QWen-v1 layout,
    run them through convert_qwen_v1_llm + our LLM, and compare logits
    with the HF forward — anchors the converter's fused-qkv split and
    gate/up mapping against an independent implementation."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from mertools_tpu.mllm.llm import LLM, LLMConfig
    from mertools_tpu.preference.qwenaudio import convert_qwen_v1_llm

    torch.manual_seed(1)
    hf_cfg = Qwen2Config(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=4,
                         intermediate_size=64, rms_norm_eps=1e-6,
                         rope_theta=10000.0, max_position_embeddings=512,
                         tie_word_embeddings=False)
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    sd = hf.state_dict()

    v1 = {"transformer.wte.weight": sd["model.embed_tokens.weight"],
          "transformer.ln_f.weight": sd["model.norm.weight"],
          "lm_head.weight": sd["lm_head.weight"]}
    for i in range(2):
        hl = f"model.layers.{i}"
        v1[f"transformer.h.{i}.ln_1.weight"] = sd[f"{hl}.input_layernorm.weight"]
        v1[f"transformer.h.{i}.ln_2.weight"] = sd[
            f"{hl}.post_attention_layernorm.weight"]
        v1[f"transformer.h.{i}.attn.c_attn.weight"] = torch.cat(
            [sd[f"{hl}.self_attn.q_proj.weight"],
             sd[f"{hl}.self_attn.k_proj.weight"],
             sd[f"{hl}.self_attn.v_proj.weight"]], dim=0)
        v1[f"transformer.h.{i}.attn.c_attn.bias"] = torch.cat(
            [sd[f"{hl}.self_attn.q_proj.bias"],
             sd[f"{hl}.self_attn.k_proj.bias"],
             sd[f"{hl}.self_attn.v_proj.bias"]], dim=0)
        v1[f"transformer.h.{i}.attn.c_proj.weight"] = sd[
            f"{hl}.self_attn.o_proj.weight"]
        v1[f"transformer.h.{i}.mlp.w2.weight"] = sd[
            f"{hl}.mlp.gate_proj.weight"]
        v1[f"transformer.h.{i}.mlp.w1.weight"] = sd[f"{hl}.mlp.up_proj.weight"]
        v1[f"transformer.h.{i}.mlp.c_proj.weight"] = sd[
            f"{hl}.mlp.down_proj.weight"]

    cfg = LLMConfig(vocab_size=120, hidden_size=32, num_layers=2,
                    num_heads=4, num_kv_heads=4, intermediate_size=64,
                    attention_bias=True, rms_norm_eps=1e-6,
                    rope_theta=10000.0)
    params = convert_qwen_v1_llm(cfg, v1)

    rng = np.random.default_rng(2)
    ids = rng.integers(1, 120, size=(2, 13)).astype(np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    llm = LLM(cfg)
    emb = np.asarray(params["embed_tokens"]["embedding"])[ids]
    got = np.asarray(llm.apply({"params": params}, jnp.asarray(emb),
                               attention_mask=jnp.ones(ids.shape,
                                                       jnp.int32)))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-3, np.abs(got - ref).max()
    assert (got.argmax(-1) == ref.argmax(-1)).all()


# -------------------------------------------------------------------- vita
def _hf_internvl_vision():
    from transformers import InternVLVisionConfig, InternVLVisionModel

    torch.manual_seed(3)
    cfg = InternVLVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=[28, 28], patch_size=[14, 14],
        attention_bias=True, layer_scale_init_value=0.1, use_qk_norm=False,
        norm_type="layer_norm", layer_norm_eps=1e-6, hidden_dropout_prob=0.0,
        attention_dropout=0.0, use_mean_pooling=True)
    m = InternVLVisionModel(cfg).eval()
    # random layer scales (init is constant 0.1; make the anchor sensitive)
    with torch.no_grad():
        for layer in m.encoder.layer:
            layer.lambda_1.uniform_(0.05, 0.3)
            layer.lambda_2.uniform_(0.05, 0.3)
    return m


def test_vita_tower_matches_hf_internvl_vision():
    from mertools_tpu.encoders.vit import ViTEncoder
    from mertools_tpu.preference.vita import internvit_config

    m = _hf_internvl_vision()
    sd = m.state_dict()
    # HF names -> the OpenGVLab InternVisionModel layout convert_vita_state
    # consumes (fused qkv)
    pre = "model.vision_tower.vision_tower."
    mapped = {
        f"{pre}embeddings.class_embedding": sd["embeddings.cls_token"],
        f"{pre}embeddings.position_embedding":
            sd["embeddings.position_embeddings"],
        f"{pre}embeddings.patch_embedding.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        f"{pre}embeddings.patch_embedding.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
    }
    for i in range(2):
        hl = f"encoder.layer.{i}"
        ol = f"{pre}encoder.layers.{i}"
        mapped[f"{ol}.attn.qkv.weight"] = torch.cat(
            [sd[f"{hl}.attention.q_proj.weight"],
             sd[f"{hl}.attention.k_proj.weight"],
             sd[f"{hl}.attention.v_proj.weight"]], dim=0)
        mapped[f"{ol}.attn.qkv.bias"] = torch.cat(
            [sd[f"{hl}.attention.q_proj.bias"],
             sd[f"{hl}.attention.k_proj.bias"],
             sd[f"{hl}.attention.v_proj.bias"]], dim=0)
        mapped[f"{ol}.attn.proj.weight"] = sd[
            f"{hl}.attention.projection_layer.weight"]
        mapped[f"{ol}.attn.proj.bias"] = sd[
            f"{hl}.attention.projection_layer.bias"]
        mapped[f"{ol}.norm1.weight"] = sd[f"{hl}.layernorm_before.weight"]
        mapped[f"{ol}.norm1.bias"] = sd[f"{hl}.layernorm_before.bias"]
        mapped[f"{ol}.norm2.weight"] = sd[f"{hl}.layernorm_after.weight"]
        mapped[f"{ol}.norm2.bias"] = sd[f"{hl}.layernorm_after.bias"]
        mapped[f"{ol}.ls1"] = sd[f"{hl}.lambda_1"]
        mapped[f"{ol}.ls2"] = sd[f"{hl}.lambda_2"]
        mapped[f"{ol}.mlp.fc1.weight"] = sd[f"{hl}.mlp.fc1.weight"]
        mapped[f"{ol}.mlp.fc1.bias"] = sd[f"{hl}.mlp.fc1.bias"]
        mapped[f"{ol}.mlp.fc2.weight"] = sd[f"{hl}.mlp.fc2.weight"]
        mapped[f"{ol}.mlp.fc2.bias"] = sd[f"{hl}.mlp.fc2.bias"]

    vcfg = internvit_config(hidden_size=32, num_layers=2, num_heads=2,
                            intermediate_size=64, image_size=28,
                            patch_size=14)
    from mertools_tpu.preference import vita as vita_mod

    # exercise the REAL converter on the tower keys by giving it a minimal
    # projector + LLM so nothing is hand-rolled here
    H = 32
    mapped["model.mm_projector.0.weight"] = torch.zeros(8, H)
    mapped["model.mm_projector.0.bias"] = torch.zeros(8)
    mapped["model.mm_projector.2.weight"] = torch.zeros(8, 8)
    mapped["model.mm_projector.2.bias"] = torch.zeros(8)
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(4)
    lm = LlamaForCausalLM(LlamaConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2,
        intermediate_size=32)).eval()
    for k, v in lm.model.state_dict().items():
        mapped["model." + k] = v
    mapped["lm_head.weight"] = lm.lm_head.weight
    from mertools_tpu.mllm.llm import LLMConfig

    lcfg = LLMConfig.from_hf(lm.config)
    params = vita_mod.convert_vita_state(vcfg, lcfg, mapped)

    rng = np.random.default_rng(5)
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = m(torch.tensor(pixels.transpose(0, 3, 1, 2))
                ).last_hidden_state.numpy()
    enc = ViTEncoder(vcfg)
    got = np.asarray(enc.apply({"params": params["tower"]},
                               jnp.asarray(pixels)))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_vita_pixel_shuffle_matches_hf_internvl():
    from transformers.models.internvl.modeling_internvl import InternVLModel

    from mertools_tpu.preference.vita import pixel_shuffle

    rng = np.random.default_rng(6)
    x = rng.normal(size=(3, 8, 8, 20)).astype(np.float32)
    ref = InternVLModel.pixel_shuffle(None, torch.tensor(x),
                                      scale_factor=0.5).numpy()
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 0.5))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


# ------------------------------------------------------------------ pllava
def test_pllava_pool_matches_adaptive_avg_pool3d_composed():
    """Composed separable pooling == F.adaptive_avg_pool3d at the
    production shape class (ragged T, 24x24 grid -> 16x12x12)."""
    from mertools_tpu.preference.pllava import adaptive_pool_matrix

    rng = np.random.default_rng(7)
    for T, g, (pt, ph, pw) in [(7, 6, (4, 3, 3)), (25, 24, (16, 12, 12))]:
        feats = rng.normal(size=(1, T, g, g, 5)).astype(np.float32)
        mt = adaptive_pool_matrix(T, pt)
        mh = adaptive_pool_matrix(g, ph)
        mw = adaptive_pool_matrix(g, pw)
        got = np.einsum("bthwc,ut->buhwc", feats, mt)
        got = np.einsum("buhwc,vh->buvwc", got, mh)
        got = np.einsum("buvwc,xw->buvxc", got, mw)
        ref = torch.nn.functional.adaptive_avg_pool3d(
            torch.tensor(feats).permute(0, 4, 1, 2, 3), (pt, ph, pw)
        ).permute(0, 2, 3, 4, 1).numpy()
        assert np.abs(got - ref).max() < 1e-5, (T, g)
