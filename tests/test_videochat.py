"""VideoChat v1 wrapper parity vs a hand-assembled torch oracle.

The oracle re-implements the vendored ``VideoChat/models/eva_vit.py``
(deployed no-lmhra config): per-frame EVA blocks (fused qkv, zero k bias)
+ Global-MHRA collector (depthwise 3x3x3 dpe, packed-in_proj MHA, GELU
MLP) after each of the last ``gmhra_layers`` blocks, then ln_vision +
query-only BLIP-2 Q-Former (HF Blip2QFormerModel with query+extra-query
concat) + llama_proj + greedy Vicuna decode (videochat.py:151-176).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

H, NH, DEPTH, GL = 16, 2, 3, 2
IMG, PATCH = 28, 14
NQ, NQ_EXTRA = 3, 2


def _vit_cfg():
    from mertools_tpu.preference.videochat import EVAGMHRAConfig

    return EVAGMHRAConfig(img_size=IMG, patch_size=PATCH, embed_dim=H,
                          depth=DEPTH, num_heads=NH, mlp_ratio=2.0,
                          gmhra_layers=GL)


class _TorchEVAG(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.c = c
        self.patch_embed = torch.nn.Conv2d(3, H, PATCH, PATCH)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, H) * 0.1)
        n = (IMG // PATCH) ** 2
        self.pos_embed = torch.nn.Parameter(torch.randn(1, n + 1, H) * 0.1)
        self.gmhra_cls_token = torch.nn.Parameter(torch.randn(1, 1, H) * 0.1)
        mh = int(H * c.mlp_ratio)
        self.blocks = torch.nn.ModuleList()
        for _ in range(DEPTH):
            self.blocks.append(torch.nn.ModuleDict({
                "norm1": torch.nn.LayerNorm(H, eps=1e-6),
                "qkv": torch.nn.Linear(H, 3 * H, bias=False),
                "proj": torch.nn.Linear(H, H),
                "norm2": torch.nn.LayerNorm(H, eps=1e-6),
                "fc1": torch.nn.Linear(H, mh),
                "fc2": torch.nn.Linear(mh, H)}))
        self.q_bias = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.randn(H) * 0.05)
             for _ in range(DEPTH)])
        self.v_bias = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.randn(H) * 0.05)
             for _ in range(DEPTH)])
        gmh = round(c.mlp_ratio * H)
        self.gmhra = torch.nn.ModuleList()
        for _ in range(GL):
            self.gmhra.append(torch.nn.ModuleDict({
                "dpe": torch.nn.Conv3d(H, H, 3, 1, 1, groups=H),
                "attn": torch.nn.MultiheadAttention(H, NH),
                "ln_1": torch.nn.LayerNorm(H),
                "ln_2": torch.nn.LayerNorm(H),
                "ln_3": torch.nn.LayerNorm(H),
                "c_fc": torch.nn.Linear(H, gmh),
                "c_proj": torch.nn.Linear(gmh, H)}))

    def _gmhra_step(self, lyr, x, y, T):
        """eva_vit.py:344-377 verbatim (x (1?,B,C) collector, y (BT,N+1,C))."""
        x_in = x
        xq = lyr["ln_1"](x)
        y = lyr["ln_3"](y)
        BT, N1, C = y.shape
        B = BT // T
        g = int((N1 - 1) ** 0.5)
        y = y.view(B, T, N1, C)
        sp = y[:, :, 1:].reshape(B, T, g, g, C).permute(0, 4, 1, 2, 3)
        sp = lyr["dpe"](sp.contiguous()).view(B, C, T, N1 - 1
                                              ).permute(0, 2, 3, 1)
        y = torch.cat([y[:, :, :1], y[:, :, 1:] + sp], dim=2)
        y = y.permute(1, 2, 0, 3).flatten(0, 1)   # T(N+1), B, C
        attn = lyr["attn"]
        d = C
        q = xq @ attn.in_proj_weight[:d].T + attn.in_proj_bias[:d]
        k = y @ attn.in_proj_weight[d:-d].T + attn.in_proj_bias[d:-d]
        v = y @ attn.in_proj_weight[-d:].T + attn.in_proj_bias[-d:]
        Tx, Ty, Nb = q.size(0), k.size(0), q.size(1)
        hd = d // NH
        q = q.view(Tx, Nb, NH, hd).permute(1, 2, 0, 3)
        k = k.view(Ty, Nb, NH, hd).permute(1, 2, 0, 3)
        v = v.view(Ty, Nb, NH, hd).permute(1, 2, 0, 3)
        aff = (q @ k.transpose(-2, -1) / hd ** 0.5).softmax(-1)
        out = (aff @ v).permute(2, 0, 1, 3).flatten(2)
        out = attn.out_proj(out)
        x = x_in + out
        x = x + lyr["c_proj"](F.gelu(lyr["c_fc"](lyr["ln_2"](x))))
        return x

    def forward(self, pixels):
        # pixels (B, C, T, H, W)
        B, C, T = pixels.shape[:3]
        x = pixels.permute(0, 2, 1, 3, 4).reshape(B * T, C, IMG, IMG)
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B * T, 1, -1), x], dim=1)
        x = x + self.pos_embed
        gx = self.gmhra_cls_token.repeat(1, B, 1)   # (1, B, C)
        hd = H // NH
        gmhra_idx = [DEPTH - 1 - i for i in range(GL)]
        j = -1
        for i, blk in enumerate(self.blocks):
            h = blk["norm1"](x)
            qkv_bias = torch.cat([self.q_bias[i],
                                  torch.zeros_like(self.v_bias[i]),
                                  self.v_bias[i]])
            qkv = F.linear(h, blk["qkv"].weight, qkv_bias)
            BT, N, _ = h.shape
            qkv = qkv.reshape(BT, N, 3, NH, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)).softmax(-1)
            o = (att @ v).transpose(1, 2).reshape(BT, N, -1)
            x = x + blk["proj"](o)
            x = x + blk["fc2"](F.gelu(blk["fc1"](blk["norm2"](x))))
            if i in gmhra_idx:
                j += 1
                gx = self._gmhra_step(self.gmhra[j], gx, x.clone(), T)
        z = torch.cat([x.view(B, -1, H), gx.permute(1, 0, 2)], dim=1)
        return z


def _sd(vit, qf, qt, extras, llama):
    sd = {"visual_encoder.patch_embed.proj.weight": vit.patch_embed.weight,
          "visual_encoder.patch_embed.proj.bias": vit.patch_embed.bias,
          "visual_encoder.cls_token": vit.cls_token,
          "visual_encoder.pos_embed": vit.pos_embed,
          "visual_encoder.gmhra_cls_token": vit.gmhra_cls_token}
    for i, blk in enumerate(vit.blocks):
        b = f"visual_encoder.blocks.{i}"
        for src, dst in (("norm1", "norm1"), ("norm2", "norm2"),
                         ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2"),
                         ("proj", "attn.proj")):
            sd[f"{b}.{dst}.weight"] = blk[src].weight
            if blk[src].bias is not None:
                sd[f"{b}.{dst}.bias"] = blk[src].bias
        sd[f"{b}.attn.qkv.weight"] = blk["qkv"].weight
        sd[f"{b}.attn.q_bias"] = vit.q_bias[i]
        sd[f"{b}.attn.v_bias"] = vit.v_bias[i]
    for j, lyr in enumerate(vit.gmhra):
        b = f"visual_encoder.gmhra.{j}"
        sd[f"{b}.attn.in_proj_weight"] = lyr["attn"].in_proj_weight
        sd[f"{b}.attn.in_proj_bias"] = lyr["attn"].in_proj_bias
        sd[f"{b}.attn.out_proj.weight"] = lyr["attn"].out_proj.weight
        sd[f"{b}.attn.out_proj.bias"] = lyr["attn"].out_proj.bias
        sd[f"{b}.dpe.weight"] = lyr["dpe"].weight
        sd[f"{b}.dpe.bias"] = lyr["dpe"].bias
        for nm in ("ln_1", "ln_2", "ln_3"):
            sd[f"{b}.{nm}.weight"] = lyr[nm].weight
            sd[f"{b}.{nm}.bias"] = lyr[nm].bias
        sd[f"{b}.mlp.c_fc.weight"] = lyr["c_fc"].weight
        sd[f"{b}.mlp.c_fc.bias"] = lyr["c_fc"].bias
        sd[f"{b}.mlp.c_proj.weight"] = lyr["c_proj"].weight
        sd[f"{b}.mlp.c_proj.bias"] = lyr["c_proj"].bias
    # LAVIS-named BLIP-2 Q-Former (query-only)
    for k, v in qf.state_dict().items():
        k = k.replace(".attention.attention.", ".attention.self.")
        k = k.replace(".crossattention.attention.", ".crossattention.self.")
        if k.startswith("layernorm."):
            k = k.replace("layernorm.", "embeddings.LayerNorm.")
        sd[f"Qformer.bert.{k}"] = v
    sd["query_tokens"] = qt[:, :NQ]
    sd["extra_query_tokens"] = qt[:, NQ:]
    sd.update(extras)
    for k, v in llama.state_dict().items():
        sd[f"llama_model.{k}"] = v
    return sd


@pytest.fixture(scope="module")
def oracle_and_ours():
    from transformers import Blip2QFormerConfig, Blip2QFormerModel
    from transformers import LlamaConfig, LlamaForCausalLM

    from mertools_tpu.mllm.llm import LLMConfig
    from mertools_tpu.preference.videochat import (VideoChatV1,
                                                   convert_videochat_state)

    torch.manual_seed(0)
    vit_cfg = _vit_cfg()
    vit = _TorchEVAG(vit_cfg).eval()
    qf = Blip2QFormerModel(Blip2QFormerConfig(
        vocab_size=30, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        encoder_hidden_size=H, cross_attention_frequency=1)).eval()
    llama = LlamaForCausalLM(LlamaConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=512)).eval()
    g = torch.Generator().manual_seed(1)
    qt = torch.randn(1, NQ + NQ_EXTRA, 24, generator=g) * 0.5
    extras = {
        "ln_vision.weight": torch.randn(H, generator=g) * 0.1 + 1.0,
        "ln_vision.bias": torch.randn(H, generator=g) * 0.1,
        "llama_proj.weight": torch.randn(48, 24, generator=g) * 0.2,
        "llama_proj.bias": torch.randn(48, generator=g) * 0.1,
    }
    sd = _sd(vit, qf, qt, extras, llama)
    llm_cfg = LLMConfig.from_hf(llama.config)
    qf_cfg, params = convert_videochat_state(vit_cfg, llm_cfg, sd)
    assert qf_cfg.num_queries == NQ + NQ_EXTRA
    ours = VideoChatV1(vit_cfg, qf_cfg, llm_cfg, params)
    return (vit, qf, qt, extras, llama), ours


def _oracle_embeds(o, pixels):
    vit, qf, qt, extras, llama = o
    with torch.no_grad():
        z = vit(torch.tensor(pixels.transpose(0, 4, 1, 2, 3)))
        z = F.layer_norm(z, (H,), extras["ln_vision.weight"],
                         extras["ln_vision.bias"])
        B = z.shape[0]
        q = qf(query_embeds=qt.expand(B, -1, -1),
               encoder_hidden_states=z,
               encoder_attention_mask=torch.ones(z.shape[:-1],
                                                 dtype=torch.long)
               ).last_hidden_state
        return F.linear(q, extras["llama_proj.weight"],
                        extras["llama_proj.bias"]).numpy()


def test_video_embeds_parity(oracle_and_ours):
    o, ours = oracle_and_ours
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, IMG, IMG, 3)).astype(np.float32)
    ref = _oracle_embeds(o, pixels)
    got = ours.video_embeds(pixels)
    assert got.shape == ref.shape == (2, NQ + NQ_EXTRA, 48)
    assert np.abs(got - ref).max() < 3e-4, np.abs(got - ref).max()


def test_generation_matches_oracle_greedy(oracle_and_ours):
    o, ours = oracle_and_ours
    vit, qf, qt, extras, llama = o
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, IMG, IMG, 3)).astype(np.float32)
    embeds = ours.video_embeds(pixels)
    left = rng.integers(3, 150, size=5).astype(np.int32)
    right = rng.integers(3, 150, size=8).astype(np.int32)

    class _Tok:
        eos_token_id = 2

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in ids)

    got = ours.generate_batch([left], [right], embeds, _Tok(),
                              max_new_tokens=6, temperature=0.0)[0]
    ref_embeds = _oracle_embeds(o, pixels)
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

    from mertools_tpu.preference.videochat import VideoChatCaller

    _, ours = oracle_and_ours

    class _Tok:
        eos_token_id = 2

        def __call__(self, text, add_special_tokens=False):
            ids = ([1] if add_special_tokens else []) + \
                [3 + (b % 140) for b in text.encode()][:12]
            return SimpleNamespace(input_ids=ids)

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in ids)

    caller = VideoChatCaller(ours, _Tok(), batch=2, num_segments=3,
                             max_new_tokens=4, temperature=0.0)
    rng = np.random.default_rng(2)
    samples = [
        {"frames": rng.integers(0, 255, size=(20, 40, 50, 3)).astype(np.uint8)},
        {"frames": rng.integers(0, 255, size=(7, 28, 28, 3)).astype(np.uint8)},
    ]
    res = caller(samples, ["how do they feel?", "pick"])
    assert len(res) == 2 and all(isinstance(r, str) for r in res)
    one = caller(samples[:1], ["how do they feel?"])
    assert one[0] == res[0]
