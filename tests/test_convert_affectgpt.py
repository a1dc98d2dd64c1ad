"""Reference AffectGPT trained-checkpoint converter: state-dict name/shape
mapping, numpy-oracle numerics through the converted weights, and peft LoRA
orientation (mllm/convert_affectgpt.py vs runner_base.py:594-638 checkpoints
+ affectgpt.py:103-126 peft wrapping)."""

import numpy as np
import pytest


def _llm_cfg():
    from mertools_tpu.mllm import LLMConfig

    return LLMConfig(vocab_size=64, hidden_size=32, num_layers=2,
                     num_heads=4, num_kv_heads=4, intermediate_size=48)


def _attention_sd(rng, Dv=12, Da=10, H_llm=32, r=2, num_layers=2,
                  hidden=32, inter=48, peft_default=False):
    """Reference-named trainable state dict for the best-setup mode
    (attention fusion everywhere, LoRA on all 7 projections)."""
    lin = lambda o, i: rng.normal(size=(o, i)).astype(np.float32)
    vec = lambda o: rng.normal(size=(o,)).astype(np.float32)
    sd = {
        "video_attention_mlp.weight": lin(1, Dv),
        "video_attention_mlp.bias": vec(1),
        "affectgpt_proj.weight": lin(H_llm, Dv),
        "affectgpt_proj.bias": vec(H_llm),
        "audio_attention_mlp.weight": lin(1, Da),
        "audio_attention_mlp.bias": vec(1),
        "audio_llama_proj.weight": lin(H_llm, Da),
        "audio_llama_proj.bias": vec(H_llm),
        "multi_video_embs.weight": lin(Da if Da > Dv else Dv, Dv),
        "multi_video_embs.bias": vec(max(Dv, Da)),
        "multi_audio_embs.weight": lin(max(Dv, Da), Da),
        "multi_audio_embs.bias": vec(max(Dv, Da)),
        "attention_mlp.weight": lin(max(Dv, Da), 2 * max(Dv, Da)),
        "attention_mlp.bias": vec(max(Dv, Da)),
        "fc_att.weight": lin(2, max(Dv, Da)),
        "fc_att.bias": vec(2),
        "multi_llama_proj.weight": lin(H_llm, max(Dv, Da)),
        "multi_llama_proj.bias": vec(H_llm),
    }
    seg = "lora_A.default.weight" if peft_default else "lora_A.weight"
    segB = seg.replace("_A", "_B")
    dims = {"q_proj": (hidden, hidden), "k_proj": (hidden, hidden),
            "v_proj": (hidden, hidden), "o_proj": (hidden, hidden),
            "gate_proj": (inter, hidden), "up_proj": (inter, hidden),
            "down_proj": (hidden, inter)}
    for i in range(num_layers):
        for proj, (out, inp) in dims.items():
            grp = "self_attn" if proj.endswith(("q_proj", "k_proj", "v_proj",
                                                "o_proj")) else "mlp"
            stem = (f"llama_model.base_model.model.model.layers.{i}."
                    f"{grp}.{proj}")
            sd[f"{stem}.{seg}"] = rng.normal(size=(r, inp)).astype(np.float32)
            sd[f"{stem}.{segB}"] = rng.normal(
                size=(out, r)).astype(np.float32)
    return sd


@pytest.mark.parametrize("peft_default", [False, True])
def test_convert_attention_mode_oracle(peft_default):
    """Converted weights must reproduce the reference fusion formulas
    (numpy oracle computed directly from the torch-layout state dict)."""
    import jax

    from mertools_tpu.mllm import AffectGPT
    from mertools_tpu.mllm.convert_affectgpt import (
        apply_checkpoint, convert_affectgpt_checkpoint)

    rng = np.random.default_rng(0)
    sd = _attention_sd(rng, peft_default=peft_default)
    cfg, glue, lora = convert_affectgpt_checkpoint(
        sd, _llm_cfg(), "multiface_audio_face_text")
    assert cfg.video_fusion_type == "attention"
    assert cfg.audio_fusion_type == "attention"
    assert cfg.multi_fusion == "attention"
    assert cfg.video_dim == 12 and cfg.audio_dim == 10
    assert cfg.llm.lora_r == 2 and cfg.llm.lora_alpha == 32.0

    model = AffectGPT(cfg)
    B, S = 2, 20
    batch = {
        "face_feats": rng.normal(size=(B, 5, 12)).astype(np.float32),
        "face_mask": np.ones((B, 5), np.int32),
        "audio_feats": rng.normal(size=(B, 4, 10)).astype(np.float32),
        "audio_mask": np.ones((B, 4), np.int32),
        "input_ids": rng.integers(3, 64, size=(B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "labels": np.full((B, S), -100, np.int64),
        "splice_multi": np.full(B, 1, np.int32),
        "splice_audio": np.full(B, 4, np.int32),
        "splice_face": np.full(B, 7, np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    params = apply_checkpoint(params, glue, lora)
    embeds = np.asarray(model.apply({"params": params}, batch,
                                    method=AffectGPT.generate_step_embeds))

    # numpy oracle straight from the torch-layout weights (W: out x in)
    tl = lambda k, x: x @ sd[f"{k}.weight"].T + sd[f"{k}.bias"]
    face, audio = batch["face_feats"], batch["audio_feats"]
    f_pool = (face * tl("video_attention_mlp", face)).sum(1)
    a_pool = (audio * tl("audio_attention_mlp", audio)).sum(1)
    face_tok = tl("affectgpt_proj", f_pool)
    audio_tok = tl("audio_llama_proj", a_pool)
    vp = tl("multi_video_embs", face.mean(1))
    ap = tl("multi_audio_embs", audio.mean(1))
    att = tl("fc_att", tl("attention_mlp", np.concatenate([vp, ap], -1)))
    multi_tok = tl("multi_llama_proj", vp * att[:, 0:1] + ap * att[:, 1:2])
    for seg, tok, col in (("multi", multi_tok, 1), ("audio", audio_tok, 4),
                          ("face", face_tok, 7)):
        np.testing.assert_allclose(embeds[:, col], tok, rtol=1e-4,
                                   atol=1e-5, err_msg=seg)

    # LoRA landed transposed into our (in, r)/(r, out) layout on all 7 projs
    seg = "lora_A.default.weight" if peft_default else "lora_A.weight"
    for proj, grp in (("q_proj", "self_attn"), ("down_proj", "mlp")):
        a_ref = sd[f"llama_model.base_model.model.model.layers.1."
                   f"{grp}.{proj}.{seg}"]
        np.testing.assert_array_equal(
            np.asarray(params["llm"]["layer_1"][proj]["lora_a"]), a_ref.T)
    for i in (0, 1):
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                     "up_proj", "down_proj"):
            assert "lora_a" in params["llm"][f"layer_{i}"][proj], (i, proj)

    # converted LoRA is live in the forward pass
    zeroed = jax.tree_util.tree_map(np.zeros_like, lora)
    p0 = apply_checkpoint(params, {}, zeroed)
    _, g1 = model.apply({"params": params}, batch)
    _, g0 = model.apply({"params": p0}, batch)
    assert np.abs(np.asarray(g1) - np.asarray(g0)).max() > 1e-6


def _fake_qformer_sd(rng, prefix, n_layers, H, inter, enc_width, n_q):
    lin = lambda o, i: rng.normal(size=(o, i)).astype(np.float32) * 0.05
    vec = lambda o: rng.normal(size=(o,)).astype(np.float32) * 0.05
    sd = {f"{prefix}.bert.embeddings.LayerNorm.weight": vec(H) + 1.0,
          f"{prefix}.bert.embeddings.LayerNorm.bias": vec(H)}
    for i in range(n_layers):
        lp = f"{prefix}.bert.encoder.layer.{i}"
        for blk, width in (("attention", H), ("crossattention", enc_width)):
            for nm in ("query", "key", "value"):
                w_in = H if (blk == "attention" or nm == "query") else width
                sd[f"{lp}.{blk}.self.{nm}.weight"] = lin(H, w_in)
                sd[f"{lp}.{blk}.self.{nm}.bias"] = vec(H)
            sd[f"{lp}.{blk}.output.dense.weight"] = lin(H, H)
            sd[f"{lp}.{blk}.output.dense.bias"] = vec(H)
            sd[f"{lp}.{blk}.output.LayerNorm.weight"] = vec(H) + 1.0
            sd[f"{lp}.{blk}.output.LayerNorm.bias"] = vec(H)
        sd[f"{lp}.intermediate_query.dense.weight"] = lin(inter, H)
        sd[f"{lp}.intermediate_query.dense.bias"] = vec(inter)
        sd[f"{lp}.output_query.dense.weight"] = lin(H, inter)
        sd[f"{lp}.output_query.dense.bias"] = vec(H)
        sd[f"{lp}.output_query.LayerNorm.weight"] = vec(H) + 1.0
        sd[f"{lp}.output_query.LayerNorm.bias"] = vec(H)
    sd[f"{prefix.split('_')[0]}_query_tokens"] = rng.normal(
        size=(1, n_q, H)).astype(np.float32) * 0.05
    return sd


def test_convert_qformer_mode_loads_and_runs():
    """Q-Former-everywhere checkpoint (init_video_Qformer naming,
    cross-attention every layer): config inference + loadable params."""
    import jax

    from mertools_tpu.mllm import AffectGPT
    from mertools_tpu.mllm.convert_affectgpt import (
        apply_checkpoint, convert_affectgpt_checkpoint)

    rng = np.random.default_rng(1)
    Dv, Da, H, H_llm = 12, 10, 16, 32
    sd = {
        "video_frame_position_embedding.weight":
            rng.normal(size=(32, Dv)).astype(np.float32),
        "audio_position_embedding.weight":
            rng.normal(size=(8, Da)).astype(np.float32),
        "multi_position_embedding.weight":
            rng.normal(size=(264, Dv)).astype(np.float32),
        "affectgpt_proj.weight": rng.normal(size=(H_llm, H)).astype(np.float32),
        "affectgpt_proj.bias": np.zeros(H_llm, np.float32),
        "audio_llama_proj.weight": rng.normal(size=(H_llm, H)).astype(np.float32),
        "audio_llama_proj.bias": np.zeros(H_llm, np.float32),
        "multi_llama_proj.weight": rng.normal(size=(H_llm, H)).astype(np.float32),
        "multi_llama_proj.bias": np.zeros(H_llm, np.float32),
        "multi_video_embs.weight": rng.normal(size=(Dv, Dv)).astype(np.float32),
        "multi_video_embs.bias": np.zeros(Dv, np.float32),
        "multi_audio_embs.weight": rng.normal(size=(Dv, Da)).astype(np.float32),
        "multi_audio_embs.bias": np.zeros(Dv, np.float32),
    }
    sd.update(_fake_qformer_sd(rng, "video_Qformer", 2, H, 32, Dv, 4))
    sd.update(_fake_qformer_sd(rng, "audio_Qformer", 2, H, 32, Da, 2))
    sd.update(_fake_qformer_sd(rng, "multi_Qformer", 2, H, 32, Dv, 3))

    cfg, glue, lora = convert_affectgpt_checkpoint(
        sd, _llm_cfg(), "multiface_audio_face_text", num_heads=2)
    assert cfg.video_fusion_type == "qformer"
    assert cfg.multi_fusion == "qformer"
    assert cfg.video_qformer.num_queries == 4
    assert cfg.video_qformer.num_layers == 2
    assert cfg.video_qformer.cross_attention_freq == 1
    assert cfg.audio_qformer.num_queries == 2
    assert cfg.multi_qformer.num_queries == 3
    assert cfg.max_video_frames == 32 and cfg.max_audio_frames == 8
    assert cfg.multi_max_positions == 264
    assert not lora

    model = AffectGPT(cfg)
    B, S = 2, 24
    batch = {
        "face_feats": rng.normal(size=(B, 5, Dv)).astype(np.float32),
        "face_mask": np.ones((B, 5), np.int32),
        "audio_feats": rng.normal(size=(B, 4, Da)).astype(np.float32),
        "audio_mask": np.ones((B, 4), np.int32),
        "input_ids": rng.integers(3, 64, size=(B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "labels": np.full((B, S), -100, np.int64),
        "splice_multi": np.full(B, 1, np.int32),
        "splice_audio": np.full(B, 6, np.int32),
        "splice_face": np.full(B, 10, np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    before = np.asarray(model.apply({"params": params}, batch,
                                    method=AffectGPT.generate_step_embeds))
    params2 = apply_checkpoint(params, glue, lora)
    after = np.asarray(model.apply({"params": params2}, batch,
                                   method=AffectGPT.generate_step_embeds))
    assert np.isfinite(after).all()
    # the converted weights actually changed every spliced segment
    for seg, start in (("multi", 1), ("audio", 6), ("face", 10)):
        assert np.abs(after[:, start] - before[:, start]).max() > 1e-6, seg
    # position embeddings landed where the model reads them
    np.testing.assert_array_equal(
        np.asarray(params2["frame_position_embedding"]),
        sd["video_frame_position_embedding.weight"])
