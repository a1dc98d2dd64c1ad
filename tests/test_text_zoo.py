"""Parity tests for the extended text-encoder zoo (encoders/text_zoo.py)
against HF torch oracles on tiny configs, with right-padded attention masks
(the TextExtractor batching regime). Valid-token parity <2e-4."""

import numpy as np
import pytest
import torch


def _ids_and_mask(rng, vocab, B=3, S=12):
    ids = rng.integers(2, vocab, size=(B, S)).astype(np.int64)
    mask = np.ones((B, S), np.int64)
    mask[1, 8:] = 0
    mask[2, 5:] = 0
    ids[mask == 0] = 0
    return ids, mask


def _check(hs_ours, hs_ref, mask, tol=2e-4):
    assert len(hs_ours) == len(hs_ref)
    for li, (a, b) in enumerate(zip(hs_ours, hs_ref)):
        a, b = np.asarray(a), b.detach().numpy()
        err = np.abs(a - b)[mask.astype(bool)].max()
        assert err < tol, (li, err)


def test_gpt2_parity():
    from transformers import GPT2Config, GPT2Model

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    hf = GPT2Model(GPT2Config(vocab_size=100, n_positions=64, n_embd=32,
                              n_layer=2, n_head=4, resid_pdrop=0.0,
                              embd_pdrop=0.0, attn_pdrop=0.0)).eval()
    cfg, params = Tz.from_hf_gpt2(hf)
    rng = np.random.default_rng(0)
    ids, mask = _ids_and_mask(rng, 100)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.GPT2Encoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


def test_opt_parity():
    from transformers import OPTConfig, OPTModel

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    hf = OPTModel(OPTConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                            ffn_dim=64, num_attention_heads=4,
                            max_position_embeddings=64, dropout=0.0,
                            word_embed_proj_dim=16)).eval()
    cfg, params = Tz.from_hf_opt(hf)
    assert cfg.word_embed_proj_dim == 16
    rng = np.random.default_rng(1)
    ids, mask = _ids_and_mask(rng, 100)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.OPTEncoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


def test_bloom_parity():
    from transformers import BloomConfig, BloomModel

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    hf = BloomModel(BloomConfig(vocab_size=100, hidden_size=36, n_layer=2,
                                n_head=6,  # non-power-of-2 slope branch
                                hidden_dropout=0.0,
                                attention_dropout=0.0)).eval()
    cfg, params = Tz.from_hf_bloom(hf)
    rng = np.random.default_rng(2)
    ids, mask = _ids_and_mask(rng, 100)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.BloomEncoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


def test_albert_parity():
    from transformers import AlbertConfig, AlbertModel

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    hf = AlbertModel(AlbertConfig(vocab_size=100, embedding_size=16,
                                  hidden_size=32, num_hidden_layers=4,
                                  num_hidden_groups=2, inner_group_num=2,
                                  num_attention_heads=4, intermediate_size=64,
                                  hidden_dropout_prob=0.0,
                                  attention_probs_dropout_prob=0.0,
                                  classifier_dropout_prob=0.0),
                     add_pooling_layer=False).eval()
    cfg, params = Tz.from_hf_albert(hf)
    rng = np.random.default_rng(3)
    ids, mask = _ids_and_mask(rng, 100)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.AlbertEncoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


@pytest.mark.parametrize("gated", [False, True])
def test_t5_encoder_parity(gated):
    from transformers import T5Config, T5EncoderModel

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    hf = T5EncoderModel(T5Config(
        vocab_size=100, d_model=32, d_kv=16, d_ff=64, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu")).eval()
    cfg, params = Tz.from_hf_t5_encoder(hf)
    assert cfg.gated_act == gated and cfg.head_dim == 16
    rng = np.random.default_rng(4)
    ids, mask = _ids_and_mask(rng, 100, S=30)  # exercise log-bucket branch
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.T5Encoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


def test_mpnet_parity():
    from transformers import MPNetConfig, MPNetModel

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    hf = MPNetModel(MPNetConfig(vocab_size=100, hidden_size=32,
                                num_hidden_layers=2, num_attention_heads=4,
                                intermediate_size=64,
                                hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0),
                    add_pooling_layer=False).eval()
    cfg, params = Tz.from_hf_mpnet(hf)
    rng = np.random.default_rng(5)
    ids, mask = _ids_and_mask(rng, 100, S=40)
    ids[mask == 0] = 1  # MPNet pad id drives position ids
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.MPNetEncoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


def test_deberta_v1_parity():
    from transformers import DebertaConfig, DebertaModel

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    hf = DebertaModel(DebertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, max_relative_positions=16,
        relative_attention=True, pos_att_type=["c2p", "p2c"],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        type_vocab_size=0, position_biased_input=False)).eval()
    cfg, params = Tz.from_hf_deberta_v1(hf)
    rng = np.random.default_rng(8)
    ids, mask = _ids_and_mask(rng, 100, S=20)  # S > max_rel: clamp branch
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.DebertaV1Encoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


def test_xlnet_parity():
    from transformers import XLNetConfig, XLNetModel

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    hf = XLNetModel(XLNetConfig(vocab_size=100, d_model=32, n_layer=3,
                                n_head=4, d_inner=64, ff_activation="gelu",
                                dropout=0.0)).eval()
    cfg, params = Tz.from_hf_xlnet(hf)
    assert cfg.d_head == 8
    rng = np.random.default_rng(9)
    ids, mask = _ids_and_mask(rng, 100, S=14)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True, use_mems=False).hidden_states
    ours = Tz.XLNetEncoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


@pytest.mark.parametrize("parallel", [True, False])
def test_gpt_neox_parity(parallel):
    from transformers import GPTNeoXConfig, GPTNeoXModel

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    hf = GPTNeoXModel(GPTNeoXConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64, rotary_pct=0.25,
        max_position_embeddings=64, use_parallel_residual=parallel,
        hidden_dropout=0.0, attention_dropout=0.0)).eval()
    cfg, params = Tz.from_hf_gpt_neox(hf)
    rng = np.random.default_rng(10)
    ids, mask = _ids_and_mask(rng, 100)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.GPTNeoXEncoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


def test_codegen_parity():
    from transformers import CodeGenConfig, CodeGenModel

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    hf = CodeGenModel(CodeGenConfig(vocab_size=100, n_embd=32, n_layer=3,
                                    n_head=4, rotary_dim=4, n_positions=64,
                                    resid_pdrop=0.0, embd_pdrop=0.0,
                                    attn_pdrop=0.0)).eval()
    cfg, params = Tz.from_hf_codegen(hf)
    rng = np.random.default_rng(11)
    ids, mask = _ids_and_mask(rng, 100)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.CodeGenEncoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


def test_falcon_parity():
    from transformers import FalconConfig, FalconModel

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    hf = FalconModel(FalconConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, bias=False, multi_query=True,
        parallel_attn=True, new_decoder_architecture=False, alibi=False,
        attention_dropout=0.0, hidden_dropout=0.0)).eval()
    cfg, params = Tz.from_hf_falcon(hf)
    rng = np.random.default_rng(12)
    ids, mask = _ids_and_mask(rng, 100)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.FalconEncoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


def _tiny_glm():
    from transformers import GlmConfig, GlmModel

    torch.manual_seed(0)
    return GlmModel(GlmConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, partial_rotary_factor=0.5,
        attention_bias=True, attention_dropout=0.0,
        max_position_embeddings=64, pad_token_id=0)).eval()


def test_glm_parity():
    from mertools_tpu.encoders import text_zoo as Tz

    hf = _tiny_glm()
    cfg, params = Tz.from_hf_glm(hf)
    assert cfg.num_kv_heads == 2
    rng = np.random.default_rng(14)
    ids, mask = _ids_and_mask(rng, 100)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.GlmEncoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


def test_chatglm_state_dict_remap():
    """THUDM chatglm fused-qkv naming remaps onto the glm layout exactly
    (synthesized from the oracle's own weights, then compared leaf-by-leaf)."""
    from mertools_tpu.encoders import text_zoo as Tz

    hf = _tiny_glm()
    cfg, ref_params = Tz.from_hf_glm(hf)
    sd = hf.state_dict()
    chatglm = {
        "transformer.embedding.word_embeddings.weight": sd["embed_tokens.weight"],
        "transformer.encoder.final_layernorm.weight": sd["norm.weight"],
    }
    for i in range(cfg.num_layers):
        src, dst = f"layers.{i}", f"transformer.encoder.layers.{i}"
        chatglm[f"{dst}.self_attention.query_key_value.weight"] = torch.cat(
            [sd[f"{src}.self_attn.q_proj.weight"],
             sd[f"{src}.self_attn.k_proj.weight"],
             sd[f"{src}.self_attn.v_proj.weight"]], dim=0)
        chatglm[f"{dst}.self_attention.query_key_value.bias"] = torch.cat(
            [sd[f"{src}.self_attn.q_proj.bias"],
             sd[f"{src}.self_attn.k_proj.bias"],
             sd[f"{src}.self_attn.v_proj.bias"]], dim=0)
        chatglm[f"{dst}.self_attention.dense.weight"] = sd[f"{src}.self_attn.o_proj.weight"]
        chatglm[f"{dst}.mlp.dense_h_to_4h.weight"] = sd[f"{src}.mlp.gate_up_proj.weight"]
        chatglm[f"{dst}.mlp.dense_4h_to_h.weight"] = sd[f"{src}.mlp.down_proj.weight"]
        chatglm[f"{dst}.input_layernorm.weight"] = sd[f"{src}.input_layernorm.weight"]
        chatglm[f"{dst}.post_attention_layernorm.weight"] = \
            sd[f"{src}.post_attention_layernorm.weight"]
    remapped = Tz._glm_params_from_sd(
        cfg, Tz.chatglm_to_glm_state_dict(chatglm, cfg))
    import jax

    leaves_a = jax.tree_util.tree_leaves_with_path(ref_params)
    leaves_b = dict(jax.tree_util.tree_leaves_with_path(remapped))
    assert len(leaves_a) == len(leaves_b)
    for path, leaf in leaves_a:
        assert np.array_equal(np.asarray(leaf), np.asarray(leaves_b[path])), path

    cfg2 = Tz.GlmZooConfig.from_chatglm({
        "padded_vocab_size": 100, "hidden_size": 32, "num_layers": 3,
        "num_attention_heads": 4, "multi_query_attention": True,
        "multi_query_group_num": 2, "kv_channels": 8,
        "ffn_hidden_size": 64, "layernorm_epsilon": 1.5625e-07,
        "rope_ratio": 1.0, "add_qkv_bias": True})
    assert cfg2 == cfg


def test_roberta_positions_parity():
    """English RoBERTa (pad-offset position ids) through encoders/bert.py."""
    from transformers import RobertaConfig, RobertaModel

    from mertools_tpu.encoders.bert import BertEncoder, from_hf_torch

    torch.manual_seed(0)
    hf = RobertaModel(RobertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, pad_token_id=1, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0),
        add_pooling_layer=False).eval()
    cfg, params = from_hf_torch(hf)
    assert cfg.position_pad_id == 1
    rng = np.random.default_rng(13)
    ids, mask = _ids_and_mask(rng, 100)
    ids[mask == 0] = 1  # pad id drives position ids
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = BertEncoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)


def test_text_extractor_with_zoo_encoder():
    """TextExtractor(encoder_cls=) drives a zoo architecture through the
    bucketed batching path with parity to the torch oracle (UTT mean)."""
    from transformers import GPT2Config, GPT2Model

    from mertools_tpu.encoders.text_zoo import MODEL_TYPE_DISPATCH
    from mertools_tpu.features.text import TextExtractor

    torch.manual_seed(0)
    hf = GPT2Model(GPT2Config(vocab_size=100, n_positions=64, n_embd=32,
                              n_layer=4, n_head=4, resid_pdrop=0.0,
                              embd_pdrop=0.0, attn_pdrop=0.0)).eval()
    convert, encoder_cls = MODEL_TYPE_DISPATCH["gpt2"]
    cfg, params = convert(hf)
    ex = TextExtractor(cfg, params, encoder_cls=encoder_cls, batch_size=2)
    rng = np.random.default_rng(7)
    lengths = [5, 9, 12, 3]
    token_ids = {f"clip{i}": rng.integers(2, 100, size=L).tolist()
                 for i, L in enumerate(lengths)}
    feats = ex.extract(token_ids, span=(0, None), level="UTT")
    for name, toks in token_ids.items():
        ids = torch.tensor([toks])
        with torch.no_grad():
            hs = hf(ids, output_hidden_states=True).hidden_states
        ref = sum(h[0] for h in hs[-4:]).mean(0).numpy()
        assert np.abs(feats[name] - ref).max() < 2e-4, name


@pytest.mark.parametrize("variant", ["xlarge_style", "plain"])
def test_deberta_v2_parity(variant):
    from transformers import DebertaV2Config, DebertaV2Model

    from mertools_tpu.encoders import text_zoo as Tz

    torch.manual_seed(0)
    kw = dict(vocab_size=100, hidden_size=32, num_hidden_layers=3,
              num_attention_heads=4, intermediate_size=64,
              max_position_embeddings=64, hidden_dropout_prob=0.0,
              attention_probs_dropout_prob=0.0, relative_attention=True,
              pos_att_type=["c2p", "p2c"])
    if variant == "xlarge_style":
        kw.update(position_buckets=8, share_att_key=True,
                  norm_rel_ebd="layer_norm", conv_kernel_size=3,
                  max_relative_positions=-1)
    else:
        kw.update(share_att_key=False, norm_rel_ebd="none",
                  position_biased_input=True, max_relative_positions=16)
    hf = DebertaV2Model(DebertaV2Config(**kw)).eval()
    cfg, params = Tz.from_hf_deberta_v2(hf)
    rng = np.random.default_rng(6)
    ids, mask = _ids_and_mask(rng, 100, S=33)  # beyond bucket range
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True).hidden_states
    ours = Tz.DebertaV2Encoder(cfg).apply({"params": params}, ids, mask)
    _check(ours, ref, mask)
