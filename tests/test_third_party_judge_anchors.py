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


# ---------------------------------------------- full-forward compositions
# (VERDICT r4 next #6b: pin END-TO-END generation against transformers
# compositions, not just sub-modules — a shared misreading of the GLUE
# (splice order, placeholder expansion) passes sub-module anchors but not
# these.)

def test_qwenaudio_full_generation_matches_hf_composition():
    """Qwen-Audio v1 END-TO-END vs a transformers-composed pipeline:
    WhisperEncoder tower (HF forward) -> AvgPool1d+Linear (torch builtins,
    published additions) -> bos/feats/eos splice at the pad positions ->
    Qwen2ForCausalLM.generate (HF KV-cached greedy loop). Weights flow
    HF -> published-v1 layout -> convert_qwenaudio_state, so the converter,
    tower, splice and decode loop are all pinned in ONE run."""
    import torch.nn.functional as F
    from transformers import (Qwen2Config, Qwen2ForCausalLM, WhisperConfig)
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    from mertools_tpu.mllm.llm import LLMConfig
    from mertools_tpu.preference.qwenaudio import (QwenAudio,
                                                   QwenAudioTowerConfig,
                                                   convert_qwenaudio_state,
                                                   whisper_sinusoids)

    torch.manual_seed(5)
    d, L, heads, mels, n_ctx, out = 16, 2, 2, 8, 20, 32
    PAD_ID = 151
    enc = WhisperEncoder(WhisperConfig(
        d_model=d, encoder_layers=L, encoder_attention_heads=heads,
        num_mel_bins=mels, max_source_positions=n_ctx,
        encoder_ffn_dim=4 * d)).eval()
    with torch.no_grad():
        enc.embed_positions.weight.copy_(
            torch.tensor(whisper_sinusoids(n_ctx, d)))
    proj = torch.nn.Linear(d, out)
    hf_lm = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=160, hidden_size=out, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=48,
        rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=512,
        tie_word_embeddings=False)).eval()
    g = torch.Generator().manual_seed(6)
    bos_eos = torch.randn(2, out, generator=g) * 0.5

    # HF weights -> the published v1 checkpoint layout
    esd, lsd = enc.state_dict(), hf_lm.state_dict()
    sd = {"transformer.audio.conv1.weight": esd["conv1.weight"],
          "transformer.audio.conv1.bias": esd["conv1.bias"],
          "transformer.audio.conv2.weight": esd["conv2.weight"],
          "transformer.audio.conv2.bias": esd["conv2.bias"],
          "transformer.audio.ln_post.weight": esd["layer_norm.weight"],
          "transformer.audio.ln_post.bias": esd["layer_norm.bias"],
          "transformer.audio.proj.weight": proj.weight,
          "transformer.audio.proj.bias": proj.bias,
          "transformer.audio.audio_bos_eos_token.weight": bos_eos,
          "transformer.wte.weight": lsd["model.embed_tokens.weight"],
          "transformer.ln_f.weight": lsd["model.norm.weight"],
          "lm_head.weight": lsd["lm_head.weight"]}
    for i in range(L):
        e, b = f"layers.{i}", f"transformer.audio.blocks.{i}"
        sd[f"{b}.attn_ln.weight"] = esd[f"{e}.self_attn_layer_norm.weight"]
        sd[f"{b}.attn_ln.bias"] = esd[f"{e}.self_attn_layer_norm.bias"]
        sd[f"{b}.attn.query.weight"] = esd[f"{e}.self_attn.q_proj.weight"]
        sd[f"{b}.attn.query.bias"] = esd[f"{e}.self_attn.q_proj.bias"]
        sd[f"{b}.attn.key.weight"] = esd[f"{e}.self_attn.k_proj.weight"]
        sd[f"{b}.attn.value.weight"] = esd[f"{e}.self_attn.v_proj.weight"]
        sd[f"{b}.attn.value.bias"] = esd[f"{e}.self_attn.v_proj.bias"]
        sd[f"{b}.attn.out.weight"] = esd[f"{e}.self_attn.out_proj.weight"]
        sd[f"{b}.attn.out.bias"] = esd[f"{e}.self_attn.out_proj.bias"]
        sd[f"{b}.mlp_ln.weight"] = esd[f"{e}.final_layer_norm.weight"]
        sd[f"{b}.mlp_ln.bias"] = esd[f"{e}.final_layer_norm.bias"]
        sd[f"{b}.mlp.0.weight"] = esd[f"{e}.fc1.weight"]
        sd[f"{b}.mlp.0.bias"] = esd[f"{e}.fc1.bias"]
        sd[f"{b}.mlp.2.weight"] = esd[f"{e}.fc2.weight"]
        sd[f"{b}.mlp.2.bias"] = esd[f"{e}.fc2.bias"]
        h = f"model.layers.{i}"
        sd[f"transformer.h.{i}.ln_1.weight"] = lsd[f"{h}.input_layernorm.weight"]
        sd[f"transformer.h.{i}.ln_2.weight"] = lsd[
            f"{h}.post_attention_layernorm.weight"]
        sd[f"transformer.h.{i}.attn.c_attn.weight"] = torch.cat(
            [lsd[f"{h}.self_attn.q_proj.weight"],
             lsd[f"{h}.self_attn.k_proj.weight"],
             lsd[f"{h}.self_attn.v_proj.weight"]], dim=0)
        sd[f"transformer.h.{i}.attn.c_attn.bias"] = torch.cat(
            [lsd[f"{h}.self_attn.q_proj.bias"],
             lsd[f"{h}.self_attn.k_proj.bias"],
             lsd[f"{h}.self_attn.v_proj.bias"]], dim=0)
        sd[f"transformer.h.{i}.attn.c_proj.weight"] = lsd[
            f"{h}.self_attn.o_proj.weight"]
        sd[f"transformer.h.{i}.mlp.w2.weight"] = lsd[f"{h}.mlp.gate_proj.weight"]
        sd[f"transformer.h.{i}.mlp.w1.weight"] = lsd[f"{h}.mlp.up_proj.weight"]
        sd[f"transformer.h.{i}.mlp.c_proj.weight"] = lsd[
            f"{h}.mlp.down_proj.weight"]

    tcfg = QwenAudioTowerConfig(n_mels=mels, n_ctx=n_ctx, n_state=d,
                                n_head=heads, n_layer=L, output_dim=out)
    llm_cfg = LLMConfig(vocab_size=160, hidden_size=out, num_layers=2,
                        num_heads=4, num_kv_heads=4, intermediate_size=48,
                        attention_bias=True, rms_norm_eps=1e-6)
    ours = QwenAudio(tcfg, llm_cfg, convert_qwenaudio_state(tcfg, llm_cfg, sd))

    rng = np.random.default_rng(8)
    T_mel = 2 * n_ctx                       # HF WhisperEncoder's fixed length
    mel = rng.normal(size=(1, mels, T_mel)).astype(np.float32)
    n_audio = tcfg.audio_len(T_mel)
    n_pads = n_audio + 2
    ids = rng.integers(1, 150, size=n_pads + 12).astype(np.int64)
    ids[3: 3 + n_pads] = PAD_ID

    # HF-composed reference: tower fwd + published pool/proj + splice +
    # HF generate (greedy, KV-cached)
    with torch.no_grad():
        x = enc(torch.tensor(mel)).last_hidden_state           # (1, 2*ctx? , d)
        x = F.avg_pool1d(x.permute(0, 2, 1), 2, 2).permute(0, 2, 1)
        feats = proj(x)[0]                                     # (n_audio, out)
        table = hf_lm.get_input_embeddings().weight
        emb = table[torch.tensor(np.where(ids == PAD_ID, 0, ids))].clone()
        emb[3] = bos_eos[0]
        emb[4: 4 + n_audio] = feats
        emb[3 + n_pads - 1] = bos_eos[1]
        ref_out = hf_lm.generate(
            inputs_embeds=emb[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=6, do_sample=False, eos_token_id=2,
            pad_token_id=2)
    want = [int(t) for t in ref_out[0].tolist() if t != 2]

    class _Tok:
        eos_token_id = 2

        def decode(self, x, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in x)

    got = ours.generate_batch([ids.astype(np.int32)], mel, _Tok(), PAD_ID,
                              max_new_tokens=6, temperature=0.0)[0]
    assert got == " ".join(f"t{i}" for i in want), (got, want)


def test_videochatgpt_full_generation_matches_hf_llava():
    """Video-ChatGPT END-TO-END vs transformers' OWN LLaVA assembly:
    LlavaForConditionalGeneration runs the placeholder masked-scatter and
    the KV-cached greedy loop (third-party machinery), with its
    get_image_features overridden to the published spatio-temporal pooling
    (tower -2, CLS drop, temporal pad-to-100 + spatial means, linear
    projector). If our 356-token splice order or expansion misreads the
    published layout, HF's independent splice disagrees here."""
    import types

    from transformers import (CLIPVisionConfig, CLIPVisionModel, LlamaConfig,
                              LlamaForCausalLM, LlavaConfig,
                              LlavaForConditionalGeneration)

    from mertools_tpu.mllm.llm import LLMConfig
    from mertools_tpu.preference import videochatgpt as vcg

    torch.manual_seed(7)
    vis = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=16)).eval()
    llm = LlamaForCausalLM(LlamaConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=512)).eval()
    proj = torch.nn.Linear(32, 48)
    PATCH = 150
    n_vid = vcg.N_TEMPORAL + (28 // 14) ** 2

    # our side: the converter + JAX model
    from mertools_tpu.encoders.vit_clip import CLIPVisionConfig as VCfg

    vcfg = VCfg.from_hf(vis.config, projection_dim=1)
    lcfg = LLMConfig.from_hf(llm.config)
    model_sd = {"model." + k: v for k, v in llm.model.state_dict().items()}
    model_sd["model.mm_projector.weight"] = proj.weight
    model_sd["model.mm_projector.bias"] = proj.bias
    model_sd["lm_head.weight"] = llm.lm_head.weight
    ours = vcg.VideoChatGPT(
        vcfg, lcfg,
        vcg.convert_videochatgpt_state(vcfg, lcfg, vis.state_dict(),
                                       model_sd),
        vid_patch_token=PATCH)

    # HF-composed side: a real LlavaForConditionalGeneration whose tower/
    # LM ARE the same modules, with the published pooling as its
    # get_image_features — splice + decode loop stay HF's
    hf = LlavaForConditionalGeneration(LlavaConfig(
        vision_config=vis.config, text_config=llm.config,
        image_token_index=PATCH)).eval()
    hf.model.vision_tower = vis
    hf.model.language_model = llm.model
    hf.lm_head = llm.lm_head

    def vcg_features(self, pixel_values, **kw):
        with torch.no_grad():
            hs = vis(pixel_values, output_hidden_states=True
                     ).hidden_states[-2][:, 1:]            # (T, S, C)
            temporal = hs.mean(dim=1)
            pad = vcg.N_TEMPORAL - temporal.shape[0]
            if pad > 0:
                temporal = torch.cat(
                    [temporal, torch.zeros(pad, hs.shape[-1])], dim=0)
            st = torch.cat([temporal, hs.mean(dim=0)], dim=0)
            return [proj(st)]

    hf.model.get_image_features = types.MethodType(vcg_features, hf.model)

    rng = np.random.default_rng(9)
    T = 2
    pixels = rng.normal(size=(1, T, 28, 28, 3)).astype(np.float32) * 0.5
    ids = rng.integers(1, 150, size=n_vid + 30).astype(np.int64)
    ids[3] = 151                                  # <vid_start>
    ids[4: 4 + n_vid] = PATCH                     # <vid_patch> x n_vid
    ids[4 + n_vid] = 152                          # <vid_end>

    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor(ids[None]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values=torch.tensor(pixels[0].transpose(0, 3, 1, 2)),
            max_new_tokens=8, do_sample=False, eos_token_id=159,
            pad_token_id=159)
    want = [int(t) for t in out[0, len(ids):].tolist() if t != 159]

    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {f"w{i}": i for i in range(150)}
    vocab.update({"<vid_patch>": 150, "<vid_start>": 151, "<vid_end>": 152,
                  "<eos>": 159})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")
    got = ours.generate_batch([ids.astype(np.int32)], pixels, fast,
                              max_new_tokens=8, temperature=0.0)[0]
    assert got == fast.decode(want, skip_special_tokens=True).strip(), (
        got, want)
