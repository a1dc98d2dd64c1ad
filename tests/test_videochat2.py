"""VideoChat2 wrapper parity vs a hand-assembled torch oracle.

The oracle re-implements the vendored modules verbatim:
``VideoChat2/models/blip2/vit.py`` (tubelet Conv3d patch embed, sinusoid
positions, layer-scale pre-norm blocks with zero-pinned k bias, truncated
depth) + ``videochat2_it.py:177-229`` (flatten + vision_layernorm,
query+extra-query text-conditioned Q-Former via HF InstructBlipQFormerModel,
llama_proj) + LoRA-merged Vicuna greedy decode.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

NQ, NQ_EXTRA = 3, 2   # query_tokens + extra_query_tokens


def _vit_cfg():
    from mertools_tpu.preference.videochat2 import UMTViTConfig

    return UMTViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=3,
                        num_heads=2, tubelet_size=1, return_index=-2,
                        with_ln=False, layer_scale=True)


class _TorchUMT(torch.nn.Module):
    """vit.py:57-133, 244-330 with tubelet 1 (run depth = depth+ri+1)."""

    def __init__(self, c):
        super().__init__()
        self.c = c
        E = c.embed_dim
        self.proj = torch.nn.Conv3d(3, E, (1, c.patch_size, c.patch_size),
                                    (1, c.patch_size, c.patch_size))
        self.blocks = torch.nn.ModuleList()
        for _ in range(c.run_depth):
            self.blocks.append(torch.nn.ModuleDict({
                "norm1": torch.nn.LayerNorm(E, eps=1e-6),
                "qkv": torch.nn.Linear(E, 3 * E, bias=False),
                "proj": torch.nn.Linear(E, E),
                "norm2": torch.nn.LayerNorm(E, eps=1e-6),
                "fc1": torch.nn.Linear(E, int(E * c.mlp_ratio)),
                "fc2": torch.nn.Linear(int(E * c.mlp_ratio), E)}))
        self.q_bias = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.randn(E) * 0.05)
             for _ in range(c.run_depth)])
        self.v_bias = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.randn(E) * 0.05)
             for _ in range(c.run_depth)])
        self.gamma1 = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.ones(E) * 0.5)
             for _ in range(c.run_depth)])
        self.gamma2 = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.ones(E) * 0.5)
             for _ in range(c.run_depth)])

    def forward(self, x):
        from mertools_tpu.preference.videochat2 import sinusoid_table

        c = self.c
        B, C, T, H, W = x.shape
        x = self.proj(x).flatten(2).transpose(1, 2)     # (B, T*L, E)
        x = x + torch.tensor(sinusoid_table(x.shape[1], c.embed_dim))
        nh = c.num_heads
        hd = c.embed_dim // nh
        for i, blk in enumerate(self.blocks):
            h = blk["norm1"](x)
            qkv_bias = torch.cat([self.q_bias[i],
                                  torch.zeros_like(self.v_bias[i]),
                                  self.v_bias[i]])
            qkv = F.linear(h, blk["qkv"].weight, qkv_bias)
            B_, N, _ = h.shape
            qkv = qkv.reshape(B_, N, 3, nh, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)).softmax(-1)
            o = (att @ v).transpose(1, 2).reshape(B_, N, -1)
            x = x + self.gamma1[i] * blk["proj"](o)
            h = blk["fc2"](F.gelu(blk["fc1"](blk["norm2"](x))))
            x = x + self.gamma2[i] * h
        L = (self.c.img_size // self.c.patch_size) ** 2
        return x.view(B, T, L, -1)


def _umt_sd(tm):
    sd = {"vision_encoder.encoder.patch_embed.proj.weight": tm.proj.weight,
          "vision_encoder.encoder.patch_embed.proj.bias": tm.proj.bias}
    for i, blk in enumerate(tm.blocks):
        b = f"vision_encoder.encoder.blocks.{i}"
        sd[f"{b}.norm1.weight"] = blk["norm1"].weight
        sd[f"{b}.norm1.bias"] = blk["norm1"].bias
        sd[f"{b}.attn.qkv.weight"] = blk["qkv"].weight
        sd[f"{b}.attn.q_bias"] = tm.q_bias[i]
        sd[f"{b}.attn.v_bias"] = tm.v_bias[i]
        sd[f"{b}.attn.proj.weight"] = blk["proj"].weight
        sd[f"{b}.attn.proj.bias"] = blk["proj"].bias
        sd[f"{b}.norm2.weight"] = blk["norm2"].weight
        sd[f"{b}.norm2.bias"] = blk["norm2"].bias
        sd[f"{b}.mlp.fc1.weight"] = blk["fc1"].weight
        sd[f"{b}.mlp.fc1.bias"] = blk["fc1"].bias
        sd[f"{b}.mlp.fc2.weight"] = blk["fc2"].weight
        sd[f"{b}.mlp.fc2.bias"] = blk["fc2"].bias
        sd[f"{b}.gamma_1"] = tm.gamma1[i]
        sd[f"{b}.gamma_2"] = tm.gamma2[i]
    return sd


def _qf_hf():
    from transformers.models.instructblip.configuration_instructblip import (
        InstructBlipQFormerConfig)
    from transformers.models.instructblip.modeling_instructblip import (
        InstructBlipQFormerModel)

    cfg = InstructBlipQFormerConfig(
        vocab_size=70, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        encoder_hidden_size=32, cross_attention_frequency=1,
        max_position_embeddings=64, pad_token_id=0)
    torch.manual_seed(3)
    return InstructBlipQFormerModel(cfg).eval()


@pytest.fixture(scope="module")
def oracle_and_ours():
    from transformers import LlamaConfig, LlamaForCausalLM

    from mertools_tpu.mllm.llm import LLMConfig
    from mertools_tpu.preference.videochat2 import (VideoChat2,
                                                    convert_videochat2_state)

    torch.manual_seed(4)
    vit_cfg = _vit_cfg()
    tm = _TorchUMT(vit_cfg).eval()
    qf = _qf_hf()
    llama = LlamaForCausalLM(LlamaConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=512)).eval()
    g = torch.Generator().manual_seed(5)

    sd = _umt_sd(tm)
    sd["vision_layernorm.weight"] = torch.randn(32, generator=g) * 0.1 + 1.0
    sd["vision_layernorm.bias"] = torch.randn(32, generator=g) * 0.1
    for k, v in qf.state_dict().items():
        k = k.replace(".attention.attention.", ".attention.self.")
        k = k.replace(".crossattention.attention.", ".crossattention.self.")
        if k.startswith("embeddings.layernorm."):
            k = k.replace("embeddings.layernorm.", "embeddings.LayerNorm.")
        sd[f"qformer.bert.{k}"] = v
    sd["query_tokens"] = torch.randn(1, NQ, 24, generator=g) * 0.5
    sd["extra_query_tokens"] = torch.randn(1, NQ_EXTRA, 24, generator=g) * 0.5
    sd["llama_proj.weight"] = torch.randn(48, 24, generator=g) * 0.2
    sd["llama_proj.bias"] = torch.randn(48, generator=g) * 0.1
    # peft-wrapped vicuna layout: base_layer + LoRA on q/v (r=2)
    lora = {}
    for i in range(2):
        for pj, od in (("q_proj", 48), ("v_proj", 24)):
            b = (f"llama_model.base_model.model.model.layers.{i}"
                 f".self_attn.{pj}")
            lora[f"{b}.lora_A.weight"] = torch.randn(2, 48, generator=g) * 0.1
            lora[f"{b}.lora_B.weight"] = torch.randn(od, 2, generator=g) * 0.1
    for k, v in llama.state_dict().items():
        kk = f"llama_model.base_model.model.{k}"
        if ".self_attn.q_proj." in k or ".self_attn.v_proj." in k:
            kk = kk.replace(".weight", ".base_layer.weight")
        sd[kk] = v
    sd.update(lora)

    llm_cfg = LLMConfig.from_hf(llama.config, lora_r=2)
    llm_cfg = type(llm_cfg)(**{**llm_cfg.__dict__, "lora_alpha": 32.0})
    qf_cfg, params = convert_videochat2_state(vit_cfg, llm_cfg, sd,
                                              num_heads=2)
    assert qf_cfg.num_queries == NQ + NQ_EXTRA
    ours = VideoChat2(vit_cfg, qf_cfg, llm_cfg, params)

    # merge LoRA into the torch llama for the decode oracle (scale alpha/r)
    with torch.no_grad():
        for i, layer in enumerate(llama.model.layers):
            for pj in ("q_proj", "v_proj"):
                b = (f"llama_model.base_model.model.model.layers.{i}"
                     f".self_attn.{pj}")
                delta = (32.0 / 2) * (lora[f"{b}.lora_B.weight"]
                                      @ lora[f"{b}.lora_A.weight"])
                getattr(layer.self_attn, pj).weight += delta
    return (sd, tm, qf, llama), ours


def _oracle_embeds(o, pixels, ids, mask):
    """videochat2_it.py:177-229 (encode_img)."""
    sd, tm, qf, llama = o
    with torch.no_grad():
        x = torch.tensor(pixels.transpose(0, 4, 1, 2, 3))  # B,C,T,H,W
        h = tm(x)                                          # B,T,L,C
        B = h.shape[0]
        h = h.reshape(B, -1, h.shape[-1])
        h = F.layer_norm(h, (32,), sd["vision_layernorm.weight"],
                         sd["vision_layernorm.bias"], eps=1e-12)
        qt = torch.cat([sd["query_tokens"], sd["extra_query_tokens"]],
                       dim=1).expand(B, -1, -1)
        full_mask = torch.cat(
            [torch.ones(B, NQ + NQ_EXTRA, dtype=torch.long),
             torch.tensor(mask)], dim=1)
        qout = qf(input_ids=torch.tensor(ids), attention_mask=full_mask,
                  query_embeds=qt, encoder_hidden_states=h
                  ).last_hidden_state[:, : NQ + NQ_EXTRA]
        return F.linear(qout, sd["llama_proj.weight"],
                        sd["llama_proj.bias"]).numpy()


def test_video_embeds_parity(oracle_and_ours):
    o, ours = oracle_and_ours
    rng = np.random.default_rng(0)
    B, T = 2, 4
    pixels = rng.normal(size=(B, T, 28, 28, 3)).astype(np.float32)
    ids = rng.integers(1, 70, size=(B, 6)).astype(np.int64)
    mask = np.ones((B, 6), np.int64)
    mask[1, 4:] = 0
    ref = _oracle_embeds(o, pixels, ids, mask)
    got = ours.video_embeds(pixels, ids.astype(np.int32),
                            mask.astype(np.int32))
    assert got.shape == ref.shape == (B, NQ + NQ_EXTRA, 48)
    assert np.abs(got - ref).max() < 3e-4, np.abs(got - ref).max()


def test_generation_matches_oracle_greedy(oracle_and_ours):
    o, ours = oracle_and_ours
    sd, tm, qf, llama = o
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 4, 28, 28, 3)).astype(np.float32)
    bids = rng.integers(1, 70, size=(1, 5)).astype(np.int64)
    bmask = np.ones((1, 5), np.int64)
    embeds = ours.video_embeds(pixels, bids.astype(np.int32),
                               bmask.astype(np.int32))
    left = rng.integers(3, 150, size=6).astype(np.int32)
    right = rng.integers(3, 150, size=9).astype(np.int32)

    class _Tok:
        eos_token_id = 2

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in ids)

    got = ours.generate_batch([left], [right], embeds, _Tok(),
                              max_new_tokens=6, temperature=0.0)[0]

    ref_embeds = _oracle_embeds(o, pixels, bids, bmask)
    table = llama.model.embed_tokens.weight.detach()
    cur = torch.cat([table[left], torch.tensor(ref_embeds[0]),
                     table[right]])[None]
    ids_out = []
    with torch.no_grad():
        for _ in range(6):
            nxt = int(llama(inputs_embeds=cur).logits[0, -1].argmax())
            if nxt == 2:
                break
            ids_out.append(nxt)
            cur = torch.cat([cur, table[None, [nxt]]], dim=1)
    want = " ".join(f"t{i}" for i in ids_out)
    assert got == want, (got, want)


def test_caller_end_to_end(oracle_and_ours):
    from types import SimpleNamespace

    from mertools_tpu.preference.videochat2 import VideoChat2Caller

    _, ours = oracle_and_ours

    class _Tok:
        eos_token_id = 2

        def __call__(self, text, add_special_tokens=False):
            ids = ([1] if add_special_tokens else []) + \
                [3 + (b % 140) for b in text.encode()][:12]
            return SimpleNamespace(input_ids=ids)

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in ids)

    class _BertTok:
        def __call__(self, prompts, padding="longest", truncation=True,
                     max_length=32):
            rows = [[2] + [3 + (b % 60) for b in p.encode()][:6]
                    for p in prompts]
            L = max(len(r) for r in rows)
            return {"input_ids": [r + [0] * (L - len(r)) for r in rows],
                    "attention_mask": [[1] * len(r) + [0] * (L - len(r))
                                       for r in rows]}

    caller = VideoChat2Caller(ours, _Tok(), _BertTok(), batch=2,
                              num_segments=4, max_new_tokens=4,
                              temperature=0.0)
    # segment-center sampling (conversation.py:87-93)
    # seg_size = 99/4 = 24.75; start 12; offsets 12+round(24.75*i)
    assert caller.get_index(100, 4).tolist() == [12, 37, 62, 86]
    rng = np.random.default_rng(2)
    samples = [
        {"frames": rng.integers(0, 255, size=(40, 40, 50, 3)).astype(np.uint8)},
        {"frames": rng.integers(0, 255, size=(9, 28, 28, 3)).astype(np.uint8)},
    ]
    res = caller(samples, ["how do they feel?", "pick"])
    assert len(res) == 2 and all(isinstance(r, str) for r in res)
    assert all("\n" not in r for r in res)
    one = caller(samples[:1], ["how do they feel?"])
    assert one[0] == res[0]
