"""LLaMA-VID wrapper parity vs a hand-assembled torch oracle.

No LLaMA-VID implementation ships in this image; the oracle follows the
vendored ``LLaMA-VID/llamavid/model/llamavid_arch.py:252-420`` verbatim:
CLIP tower (hidden layer -2, patch select) -> vlm_att_ln -> text-conditioned
Q-Former (HF InstructBlipQFormerModel — the same query+instruction BERT the
vendored qformer.py implements) -> vlm_att_projector -> context-token
attention (key/val projectors) + mean-compressed content token ->
mlp2x_gelu mm_projector -> <image> insertion -> tiny LLaMA greedy decode.

Also proves QFormerText == InstructBlipQFormerModel directly.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

NQ = 4  # query tokens


def _qf_cfg_hf(enc_width=32):
    from transformers.models.instructblip.configuration_instructblip import (
        InstructBlipQFormerConfig)

    return InstructBlipQFormerConfig(
        vocab_size=70, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        encoder_hidden_size=enc_width, cross_attention_frequency=2,
        max_position_embeddings=64, pad_token_id=0)


def test_qformer_text_matches_instructblip():
    """QFormerText == HF InstructBlipQFormerModel (query+text joint
    self-attn, query-only cross-attn, split FFNs)."""
    from transformers.models.instructblip.modeling_instructblip import (
        InstructBlipQFormerModel)

    from mertools_tpu.mllm.qformer import QFormerText, from_bert_qformer_text

    torch.manual_seed(0)
    hf = InstructBlipQFormerModel(_qf_cfg_hf()).eval()
    rng = np.random.default_rng(0)
    qt = rng.normal(size=(1, NQ, 24)).astype(np.float32) * 0.5
    B, L, T = 2, 6, 5
    ids = rng.integers(1, 70, size=(B, L)).astype(np.int64)
    text_mask = np.ones((B, L), np.int64)
    text_mask[1, 4:] = 0
    enc = rng.normal(size=(B, T, 32)).astype(np.float32)
    full_mask = np.concatenate([np.ones((B, NQ), np.int64), text_mask], 1)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(full_mask),
                 query_embeds=torch.tensor(qt).expand(B, -1, -1),
                 encoder_hidden_states=torch.tensor(enc)
                 ).last_hidden_state.numpy()[:, :NQ]
    sd = dict(hf.state_dict())
    sd["query_tokens"] = torch.tensor(qt)
    cfg, params = from_bert_qformer_text(sd, prefix="", attn_inner="attention",
                                         num_heads=2)
    assert cfg.cross_attention_freq == 2 and cfg.vocab_size == 70
    got = np.asarray(QFormerText(cfg).apply(
        {"params": params}, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(text_mask.astype(np.int32)), jnp.asarray(enc)))
    np.testing.assert_allclose(got, ref, atol=5e-5)


# ---------------------------------------------------------------------------
# full-model oracle
# ---------------------------------------------------------------------------


def _build_sd():
    """Assemble a LLaMA-VID-checkpoint-shaped state dict from tiny parts."""
    from transformers import CLIPVisionConfig as HFCLIPVisionConfig
    from transformers import CLIPVisionModel, LlamaConfig, LlamaForCausalLM
    from transformers.models.instructblip.modeling_instructblip import (
        InstructBlipQFormerModel)

    torch.manual_seed(1)
    clip = CLIPVisionModel(HFCLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=16)).eval()
    qf = InstructBlipQFormerModel(_qf_cfg_hf(enc_width=32)).eval()
    llama = LlamaForCausalLM(LlamaConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=512)).eval()
    g = torch.Generator().manual_seed(2)

    sd = {}
    for k, v in clip.state_dict().items():
        sd[f"model.vision_tower.vision_tower.{k}"] = v
    for k, v in qf.state_dict().items():
        k = k.replace(".attention.attention.", ".attention.self.")
        k = k.replace(".crossattention.attention.", ".crossattention.self.")
        if k.startswith("embeddings.layernorm."):
            k = k.replace("embeddings.layernorm.", "embeddings.LayerNorm.")
        sd[f"model.vlm_att_encoder.bert.{k}"] = v
    sd["model.vlm_att_query"] = torch.randn(1, NQ, 24, generator=g) * 0.5
    sd["model.vlm_att_ln.weight"] = torch.randn(32, generator=g) * 0.1 + 1.0
    sd["model.vlm_att_ln.bias"] = torch.randn(32, generator=g) * 0.1
    sd["model.vlm_att_projector.weight"] = torch.randn(32, 24, generator=g) * 0.2
    sd["model.vlm_att_projector.bias"] = torch.randn(32, generator=g) * 0.1
    sd["model.vlm_att_key_projector.weight"] = torch.randn(32, 32, generator=g) * 0.2
    sd["model.vlm_att_key_projector.bias"] = torch.randn(32, generator=g) * 0.1
    sd["model.vlm_att_val_projector.weight"] = torch.randn(48, 32, generator=g) * 0.2
    sd["model.vlm_att_val_projector.bias"] = torch.randn(48, generator=g) * 0.1
    sd["model.mm_projector.0.weight"] = torch.randn(48, 32, generator=g) * 0.2
    sd["model.mm_projector.0.bias"] = torch.randn(48, generator=g) * 0.1
    sd["model.mm_projector.2.weight"] = torch.randn(48, 48, generator=g) * 0.2
    sd["model.mm_projector.2.bias"] = torch.randn(48, generator=g) * 0.1
    for k, v in llama.state_dict().items():
        sd[k if k.startswith("lm_head") else k] = v
    return sd, clip, qf, llama


@pytest.fixture(scope="module")
def oracle_and_ours():
    from mertools_tpu.encoders.vit_clip import CLIPVisionConfig
    from mertools_tpu.mllm.llm import LLMConfig
    from mertools_tpu.preference.llamavid import LlamaVid, convert_llamavid_state

    sd, clip, qf, llama = _build_sd()
    vcfg = CLIPVisionConfig.from_hf(clip.config, projection_dim=1)
    llm_cfg = LLMConfig.from_hf(llama.config)
    qf_cfg, params = convert_llamavid_state(vcfg, llm_cfg, sd,
                                            feature_layer=-2, num_heads=2)
    ours = LlamaVid(vcfg, qf_cfg, llm_cfg, params, feature_layer=-2,
                    compress_type="mean", use_att_ln=True,
                    mm_projector_type="mlp2x_gelu")
    return (sd, clip, qf, llama), ours


def _oracle_tokens(o, pixels, ids, mask):
    """arch:252-420 flow for one sample's F frames (qformer_pretrain,
    compress 'mean')."""
    sd, clip, qf, llama = o
    F = pixels.shape[0]
    with torch.no_grad():
        hs = clip(torch.tensor(pixels.transpose(0, 3, 1, 2)),
                  output_hidden_states=True).hidden_states[-2]
        vis = hs[:, 1:]                                   # patch select
        bert_in = torch.nn.functional.layer_norm(
            vis, (32,), sd["model.vlm_att_ln.weight"],
            sd["model.vlm_att_ln.bias"])
        qt = sd["model.vlm_att_query"].expand(F, -1, -1)
        ids_f = torch.tensor(ids)[None].expand(F, -1)
        mask_f = torch.tensor(mask)[None].expand(F, -1)
        full_mask = torch.cat(
            [torch.ones(F, NQ, dtype=torch.long), mask_f], dim=1)
        qout = qf(input_ids=ids_f, attention_mask=full_mask,
                  query_embeds=qt, encoder_hidden_states=bert_in
                  ).last_hidden_state[:, :NQ]
        text_q = torch.nn.functional.linear(
            qout, sd["model.vlm_att_projector.weight"],
            sd["model.vlm_att_projector.bias"])
        key = torch.nn.functional.linear(
            vis, sd["model.vlm_att_key_projector.weight"],
            sd["model.vlm_att_key_projector.bias"])
        ctx = text_q @ key.transpose(-1, -2) / (vis.shape[-1] ** 0.5)
        ctx = (ctx.softmax(-1) @ vis).mean(1)
        ctx = torch.nn.functional.linear(
            ctx, sd["model.vlm_att_val_projector.weight"],
            sd["model.vlm_att_val_projector.bias"])[:, None]
        vis_c = vis.mean(dim=1, keepdim=True)
        h = torch.nn.functional.linear(vis_c, sd["model.mm_projector.0.weight"],
                                       sd["model.mm_projector.0.bias"])
        h = torch.nn.functional.gelu(h)
        content = torch.nn.functional.linear(
            h, sd["model.mm_projector.2.weight"],
            sd["model.mm_projector.2.bias"])
        return torch.cat([ctx, content], dim=1).numpy()   # (F, 2, H_llm)


def test_video_tokens_parity(oracle_and_ours):
    o, ours = oracle_and_ours
    rng = np.random.default_rng(3)
    F = 3
    pixels = rng.normal(size=(F, 28, 28, 3)).astype(np.float32)
    ids = rng.integers(1, 70, size=7).astype(np.int64)
    mask = np.ones(7, np.int64)
    ref = _oracle_tokens(o, pixels, ids, mask).reshape(1, F * 2, -1)
    got = ours.video_tokens(pixels[None], ids[None].astype(np.int32),
                            mask[None].astype(np.int32))
    assert got.shape == ref.shape == (1, 6, 48)
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_generation_matches_oracle_greedy(oracle_and_ours):
    from mertools_tpu.preference.llamavid import (IMAGE_TOKEN_INDEX,
                                                  tokenizer_image_token)

    o, ours = oracle_and_ours
    sd, clip, qf, llama = o
    rng = np.random.default_rng(4)
    F = 2
    pixels = rng.normal(size=(1, F, 28, 28, 3)).astype(np.float32)
    bids = rng.integers(1, 70, size=(1, 6)).astype(np.int32)
    bmask = np.ones((1, 6), np.int32)
    prompt_ids = rng.integers(1, 150, size=12).astype(np.int64)
    prompt_ids[5] = IMAGE_TOKEN_INDEX

    class _Tok:
        eos_token_id = 2

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in ids)

    got = ours.generate_batch([prompt_ids.astype(np.int32)], pixels,
                              bids, bmask, _Tok(), max_new_tokens=6,
                              temperature=0.0)[0]

    tokens = _oracle_tokens(o, pixels[0], bids[0].astype(np.int64),
                            bmask[0].astype(np.int64))   # (F, 2, H)
    tokens = torch.tensor(tokens.reshape(-1, tokens.shape[-1]))
    emb_table = llama.model.embed_tokens.weight.detach()
    i = 5
    cur = torch.cat([emb_table[prompt_ids[:i]], tokens,
                     emb_table[prompt_ids[i + 1:]]])[None]
    ids_out = []
    with torch.no_grad():
        for _ in range(6):
            logits = llama(inputs_embeds=cur).logits
            nxt = int(logits[0, -1].argmax())
            if nxt == 2:
                break
            ids_out.append(nxt)
            cur = torch.cat([cur, emb_table[None, [nxt]]], dim=1)
    want = " ".join(f"t{i}" for i in ids_out)
    assert got == want, (got, want)


def test_tokenizer_image_token():
    from mertools_tpu.preference.llamavid import (IMAGE_TOKEN_INDEX,
                                                  tokenizer_image_token)

    class _T:
        bos_token_id = 1

        def __call__(self, text):
            from types import SimpleNamespace

            ids = [1] + [3 + (b % 60) for b in text.encode()][:8]
            return SimpleNamespace(input_ids=ids)

    ids = tokenizer_image_token("hello <image>\nworld", _T())
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    # BOS only once (from the first chunk)
    assert (ids == 1).sum() == 1 and ids[0] == 1


def test_caller_end_to_end(oracle_and_ours):
    from mertools_tpu.preference.llamavid import LlamaVidCaller

    _, ours = oracle_and_ours

    from types import SimpleNamespace

    class _Tok:
        bos_token_id = 1
        eos_token_id = 2

        def __call__(self, text):
            ids = [1] + [3 + (b % 140) for b in text.encode()][:16]
            return SimpleNamespace(input_ids=ids)

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in ids)

    class _BertTok:
        def __call__(self, prompts, padding="longest", truncation=True,
                     max_length=256):
            rows = [[2] + [3 + (b % 60) for b in p.encode()][:6]
                    for p in prompts]
            L = max(len(r) for r in rows)
            ids = [r + [0] * (L - len(r)) for r in rows]
            mask = [[1] * len(r) + [0] * (L - len(r)) for r in rows]
            return {"input_ids": ids, "attention_mask": mask}

    caller = LlamaVidCaller(ours, _Tok(), _BertTok(), batch=2,
                            max_new_tokens=4, temperature=0.0,
                            max_frames=3)
    rng = np.random.default_rng(5)
    samples = [
        {"frames": rng.integers(0, 255, size=(60, 40, 50, 3)).astype(np.uint8)},
        {"frames": rng.integers(0, 255, size=(30, 28, 28, 3)).astype(np.uint8)},
    ]
    res = caller(samples, ["how do they feel?", "pick one"])
    assert len(res) == 2 and all(isinstance(r, str) for r in res)
    assert all("\n" not in r for r in res)
    one = caller(samples[:1], ["how do they feel?"])
    assert one[0] == res[0]
