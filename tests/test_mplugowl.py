"""mPLUG-Owl (video) wrapper parity vs a hand-assembled torch oracle.

The oracle re-implements the vendored
``mPLUG-Owl/mplug_owl_video/modeling_mplug_owl.py`` verbatim at tiny
shapes: gated local-temporal ViT (cls bypass, depthwise (3,1,1) conv,
QuickGELU, per-head-interleaved fused qkv), visual abstractor
(cross-attn-only layers, residual on the NORMED queries, SwiGLU MLP with
inner ffn_ln at config eps), visual_fc + temporal_visual_fc + vit_eos,
sentinel-overwrite splice, greedy decode.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

H, NH, LAYERS = 16, 2, 2
AB_Q, AB_LAYERS, AB_INTER = 3, 2, 48
IMG, PATCH = 28, 14


def _vit_cfgs():
    from mertools_tpu.preference.mplugowl import MplugOwlViTConfig

    return MplugOwlViTConfig(hidden_size=H, num_layers=LAYERS, num_heads=NH,
                             intermediate_size=32, image_size=IMG,
                             patch_size=PATCH)


class _TorchOwlViT(torch.nn.Module):
    """modeling_mplug_owl.py:121-718 at tiny shapes."""

    def __init__(self):
        super().__init__()
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, H) * 0.1)
        self.patch_embed = torch.nn.Conv2d(3, H, PATCH, PATCH, bias=False)
        n = (IMG // PATCH) ** 2 + 1
        self.position_embedding = torch.nn.Parameter(
            torch.randn(1, n, H) * 0.1)
        self.pre_layernorm = torch.nn.LayerNorm(H, eps=1e-6)
        self.post_layernorm = torch.nn.LayerNorm(H, eps=1e-6)
        d_b = H // 2
        self.layers = torch.nn.ModuleList()
        for _ in range(LAYERS):
            self.layers.append(torch.nn.ModuleDict({
                "t_ln": torch.nn.LayerNorm(H),
                "t_down": torch.nn.Conv3d(H, d_b, 1),
                "t_conv": torch.nn.Conv3d(d_b, d_b, (3, 1, 1), 1,
                                          (1, 0, 0), groups=d_b),
                "t_up": torch.nn.Conv3d(d_b, H, 1),
                "input_ln": torch.nn.LayerNorm(H, eps=1e-6),
                "qkv": torch.nn.Linear(H, 3 * H),
                "dense": torch.nn.Linear(H, H),
                "post_ln": torch.nn.LayerNorm(H, eps=1e-6),
                "fc1": torch.nn.Linear(H, 32),
                "fc2": torch.nn.Linear(32, H)}))

    @staticmethod
    def _qgelu(x):
        return x * torch.sigmoid(1.702 * x)

    def forward(self, pixels):
        # pixels (B, C, T, H, W)
        B, C, T = pixels.shape[:3]
        x = pixels.permute(0, 2, 1, 3, 4).reshape(B * T, C, IMG, IMG)
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B * T, 1, -1), x], dim=1)
        x = x + self.position_embedding[:, : x.shape[1]]
        x = self.pre_layernorm(x)
        x = x.view(B, T, -1, H)
        hd = H // NH
        grid = IMG // PATCH
        for lyr in self.layers:
            if T > 1:
                cls_tok, body = x[:, :, :1], x[:, :, 1:]
                h = lyr["t_ln"](body)
                h = h.permute(0, 3, 1, 2).reshape(B, H, T, grid, grid)
                h = lyr["t_down"](h)
                h = lyr["t_conv"](h)
                h = self._qgelu(h)
                h = lyr["t_up"](h)
                h = h.reshape(B, H, T, grid * grid).permute(0, 2, 3, 1)
                x = x + torch.cat([torch.zeros_like(cls_tok), h], dim=2)
            xf = x.reshape(B * T, -1, H)
            res = xf
            h = lyr["input_ln"](xf)
            qkv = lyr["qkv"](h)
            # per-head interleave (modeling:258-262)
            qkv = qkv.reshape(*h.shape[:2], NH, 3, hd).permute(3, 0, 2, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-1, -2)) * hd ** -0.5
            att = att.softmax(-1)
            o = (att @ v).permute(0, 2, 1, 3).reshape(*h.shape[:2], H)
            xf = res + lyr["dense"](o)
            res = xf
            h = lyr["post_ln"](xf)
            xf = res + lyr["fc2"](self._qgelu(lyr["fc1"](h)))
            x = xf.view(B, T, -1, H)
        return self.post_layernorm(x)


class _TorchAbstractor(torch.nn.Module):
    """modeling:720-1191 (ffn sizing rule: int(2*48/3)=32 -> 256)."""

    FFN = 256

    def __init__(self):
        super().__init__()
        self.layers = torch.nn.ModuleList()
        for _ in range(AB_LAYERS):
            self.layers.append(torch.nn.ModuleDict({
                "norm1": torch.nn.LayerNorm(H),
                "normk": torch.nn.LayerNorm(H),
                "q": torch.nn.Linear(H, H),
                "k": torch.nn.Linear(H, H),
                "v": torch.nn.Linear(H, H),
                "out": torch.nn.Linear(H, H),
                "norm2": torch.nn.LayerNorm(H),
                "w1": torch.nn.Linear(H, self.FFN),
                "w2": torch.nn.Linear(self.FFN, H),
                "w3": torch.nn.Linear(H, self.FFN),
                "ffn_ln": torch.nn.LayerNorm(self.FFN, eps=1e-6)}))

    def forward(self, queries, enc):
        hd = H // NH
        x = queries
        for lyr in self.layers:
            qn = lyr["norm1"](x)
            en = lyr["normk"](enc)
            kv = torch.cat([qn, en], dim=1)

            def heads(t):
                return t.view(t.shape[0], -1, NH, hd).permute(0, 2, 1, 3)

            q = heads(lyr["q"](qn))
            k = heads(lyr["k"](kv))
            v = heads(lyr["v"](kv))
            att = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
            att = att.softmax(-1)
            o = (att @ v).permute(0, 2, 1, 3).reshape(qn.shape[0], -1, H)
            x = qn + lyr["out"](o)                 # residual on NORMED q
            h = lyr["norm2"](x)
            h = F.silu(lyr["w1"](h)) * lyr["w3"](h)
            x = x + lyr["w2"](lyr["ffn_ln"](h))
        return x


def _sd(vit, ab, extras, llama):
    sd = {"vision_model.embeddings.cls_token": vit.cls_token,
          "vision_model.embeddings.patch_embed.weight":
              vit.patch_embed.weight,
          "vision_model.embeddings.position_embedding":
              vit.position_embedding,
          "vision_model.embeddings.pre_layernorm.weight":
              vit.pre_layernorm.weight,
          "vision_model.embeddings.pre_layernorm.bias":
              vit.pre_layernorm.bias,
          "vision_model.post_layernorm.weight": vit.post_layernorm.weight,
          "vision_model.post_layernorm.bias": vit.post_layernorm.bias}
    for i, lyr in enumerate(vit.layers):
        b = f"vision_model.encoder.layers.{i}"
        sd[f"{b}.temporal.ln.weight"] = lyr["t_ln"].weight
        sd[f"{b}.temporal.ln.bias"] = lyr["t_ln"].bias
        sd[f"{b}.temporal.down_proj.weight"] = lyr["t_down"].weight
        sd[f"{b}.temporal.down_proj.bias"] = lyr["t_down"].bias
        sd[f"{b}.temporal.conv.weight"] = lyr["t_conv"].weight
        sd[f"{b}.temporal.conv.bias"] = lyr["t_conv"].bias
        sd[f"{b}.temporal.up_proj.weight"] = lyr["t_up"].weight
        sd[f"{b}.temporal.up_proj.bias"] = lyr["t_up"].bias
        sd[f"{b}.self_attn.query_key_value.weight"] = lyr["qkv"].weight
        sd[f"{b}.self_attn.query_key_value.bias"] = lyr["qkv"].bias
        sd[f"{b}.self_attn.dense.weight"] = lyr["dense"].weight
        sd[f"{b}.self_attn.dense.bias"] = lyr["dense"].bias
        sd[f"{b}.input_layernorm.weight"] = lyr["input_ln"].weight
        sd[f"{b}.input_layernorm.bias"] = lyr["input_ln"].bias
        sd[f"{b}.post_attention_layernorm.weight"] = lyr["post_ln"].weight
        sd[f"{b}.post_attention_layernorm.bias"] = lyr["post_ln"].bias
        sd[f"{b}.mlp.fc1.weight"] = lyr["fc1"].weight
        sd[f"{b}.mlp.fc1.bias"] = lyr["fc1"].bias
        sd[f"{b}.mlp.fc2.weight"] = lyr["fc2"].weight
        sd[f"{b}.mlp.fc2.bias"] = lyr["fc2"].bias
    for i, lyr in enumerate(ab.layers):
        b = f"abstractor.encoder.layers.{i}.crossattention"
        for src, dst in (("norm1", "norm1"), ("normk", "normk")):
            sd[f"{b}.{dst}.weight"] = lyr[src].weight
            sd[f"{b}.{dst}.bias"] = lyr[src].bias
        for src, dst in (("q", "attention.query"), ("k", "attention.key"),
                         ("v", "attention.value"),
                         ("out", "output.out_proj"),
                         ("norm2", "output.norm2"),
                         ("w1", "output.mlp.w1"), ("w2", "output.mlp.w2"),
                         ("w3", "output.mlp.w3"),
                         ("ffn_ln", "output.mlp.ffn_ln")):
            sd[f"{b}.{dst}.weight"] = lyr[src].weight
            sd[f"{b}.{dst}.bias"] = lyr[src].bias
    sd.update(extras)
    for k, v in llama.state_dict().items():
        sd[f"language_model.{k}"] = v
    return sd


@pytest.fixture(scope="module")
def oracle_and_ours():
    from transformers import LlamaConfig, LlamaForCausalLM

    from mertools_tpu.mllm.llm import LLMConfig
    from mertools_tpu.preference.mplugowl import (AbstractorConfig, MplugOwl,
                                                  convert_mplugowl_state)

    torch.manual_seed(0)
    vit = _TorchOwlViT().eval()
    ab = _TorchAbstractor().eval()
    llama = LlamaForCausalLM(LlamaConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=512)).eval()
    g = torch.Generator().manual_seed(1)
    extras = {
        "query_tokens": torch.randn(1, AB_Q, H, generator=g) * 0.5,
        "temporal_query_tokens": torch.randn(1, AB_Q, H, generator=g) * 0.5,
        "abstractor.visual_fc.weight": torch.randn(48, H, generator=g) * 0.2,
        "abstractor.visual_fc.bias": torch.randn(48, generator=g) * 0.1,
        "abstractor.temporal_visual_fc.weight":
            torch.randn(48, H, generator=g) * 0.2,
        "abstractor.temporal_visual_fc.bias":
            torch.randn(48, generator=g) * 0.1,
        "abstractor.vit_eos": torch.randn(1, 1, 48, generator=g) * 0.5,
    }
    sd = _sd(vit, ab, extras, llama)
    vit_cfg = _vit_cfgs()
    ab_cfg = AbstractorConfig(hidden_size=H, num_layers=AB_LAYERS,
                              num_heads=NH, intermediate_size=AB_INTER,
                              num_queries=AB_Q)
    assert ab_cfg.ffn_hidden == _TorchAbstractor.FFN
    llm_cfg = LLMConfig.from_hf(llama.config)
    params = convert_mplugowl_state(vit_cfg, ab_cfg, llm_cfg, sd)
    ours = MplugOwl(vit_cfg, ab_cfg, llm_cfg, params)
    return (sd, vit, ab, llama, extras), ours


def _oracle_embeds(o, pixels):
    sd, vit, ab, llama, extras = o
    with torch.no_grad():
        h = vit(torch.tensor(pixels.transpose(0, 4, 1, 2, 3)))  # B,T,N,D
        B = h.shape[0]
        enc = h.reshape(B, -1, h.shape[-1])
        queries = torch.cat([
            extras["query_tokens"].expand(B, -1, -1),
            extras["temporal_query_tokens"].expand(B, -1, -1)], dim=1)
        out = ab(queries, enc)
        sq, tq = out[:, :AB_Q], out[:, AB_Q:]
        seq = F.linear(sq, extras["abstractor.visual_fc.weight"],
                       extras["abstractor.visual_fc.bias"])
        seq = seq + F.linear(tq,
                             extras["abstractor.temporal_visual_fc.weight"],
                             extras["abstractor.temporal_visual_fc.bias"])
        return torch.cat([seq, extras["abstractor.vit_eos"].expand(
            B, -1, -1)], dim=1).numpy()


def test_video_embeds_parity(oracle_and_ours):
    o, ours = oracle_and_ours
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, IMG, IMG, 3)).astype(np.float32)
    ref = _oracle_embeds(o, pixels)
    got = ours.video_embeds(pixels)
    assert got.shape == ref.shape == (2, AB_Q + 1, 48)
    assert np.abs(got - ref).max() < 3e-4, np.abs(got - ref).max()


def test_generation_matches_oracle_greedy(oracle_and_ours):
    o, ours = oracle_and_ours
    sd, vit, ab, llama, extras = o
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, IMG, IMG, 3)).astype(np.float32)
    ids = rng.integers(3, 150, size=16).astype(np.int64)
    ids[4: 4 + AB_Q + 1] = -2     # expanded <|video|> sentinels

    class _Tok:
        eos_token_id = 2

        def decode(self, x, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in x)

    got = ours.generate_batch([ids], pixels, _Tok(), max_new_tokens=6,
                              temperature=0.0)[0]

    embeds_v = _oracle_embeds(o, pixels)
    table = llama.model.embed_tokens.weight.detach()
    emb = table[torch.tensor(np.where(ids < 0, 0, ids))].clone()
    emb[4: 4 + AB_Q + 1] = torch.tensor(embeds_v[0])
    cur = emb[None]
    out_ids = []
    with torch.no_grad():
        for _ in range(6):
            nxt = int(llama(inputs_embeds=cur).logits[0, -1].argmax())
            if nxt == 2:
                break
            out_ids.append(nxt)
            cur = torch.cat([cur, table[None, [nxt]]], dim=1)
    want = " ".join(f"t{i}" for i in out_ids)
    assert got == want, (got, want)


def test_caller_end_to_end(oracle_and_ours):
    from types import SimpleNamespace

    from mertools_tpu.preference.mplugowl import (PROMPT_TEMPLATE,
                                                  MplugOwlCaller)

    _, ours = oracle_and_ours
    # the reference conversation string, indentation preserved
    assert "\n        Human: <|video|>\n" in PROMPT_TEMPLATE

    class _Tok:
        eos_token_id = 2

        def __call__(self, text, add_special_tokens=False):
            ids = ([1] if add_special_tokens else []) + \
                [3 + (b % 140) for b in text.encode()][:16]
            return SimpleNamespace(input_ids=ids)

        def decode(self, x, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in x)

    caller = MplugOwlCaller(ours, _Tok(), batch=2, n_frames=3,
                            max_new_tokens=4, temperature=0.0)
    rng = np.random.default_rng(2)
    samples = [
        {"frames": rng.integers(0, 255, size=(11, 40, 50, 3)).astype(np.uint8)},
        {"frames": rng.integers(0, 255, size=(5, 28, 28, 3)).astype(np.uint8)},
    ]
    res = caller(samples, ["how do they feel?", "pick"])
    assert len(res) == 2 and all(isinstance(r, str) for r in res)
    one = caller(samples[:1], ["how do they feel?"])
    assert one[0] == res[0]
