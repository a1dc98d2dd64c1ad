"""Qwen-Audio v1 (qwen-audio-chat) parity vs a hand-assembled torch oracle.

The reference tree ships only the wrapper (utils/qwenaudio.py,
trust_remote_code) — the oracle follows the published Qwen-Audio
architecture: whisper-style tower (sinusoid positions, bias-free K,
(hd)^-0.25 double scaling), AvgPool1d(2,2) + projection, audio bos/eos
bracketing at the pad positions, QWen v1 LM (fused biased c_attn,
RMSNorm, c_proj(w1 * silu(w2)) MLP, rotate-half rotary).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

NM, NS, NH, NL = 8, 16, 2, 2       # mels, state, heads, layers
OUT = 32                           # LM width
PAD_ID = 151


class _TorchTower(torch.nn.Module):
    def __init__(self, n_ctx):
        super().__init__()
        from mertools_tpu.preference.qwenaudio import whisper_sinusoids

        self.conv1 = torch.nn.Conv1d(NM, NS, 3, padding=1)
        self.conv2 = torch.nn.Conv1d(NS, NS, 3, stride=2, padding=1)
        self.register_buffer("positional_embedding", torch.tensor(
            whisper_sinusoids(n_ctx, NS)))
        self.blocks = torch.nn.ModuleList()
        for _ in range(NL):
            self.blocks.append(torch.nn.ModuleDict({
                "attn_ln": torch.nn.LayerNorm(NS),
                "q": torch.nn.Linear(NS, NS),
                "k": torch.nn.Linear(NS, NS, bias=False),
                "v": torch.nn.Linear(NS, NS),
                "out": torch.nn.Linear(NS, NS),
                "mlp_ln": torch.nn.LayerNorm(NS),
                "fc1": torch.nn.Linear(NS, 4 * NS),
                "fc2": torch.nn.Linear(4 * NS, NS)}))
        self.ln_post = torch.nn.LayerNorm(NS)
        self.avg_pooler = torch.nn.AvgPool1d(2, stride=2)
        self.proj = torch.nn.Linear(NS, OUT)

    def forward(self, mel):
        x = F.gelu(self.conv1(mel))
        x = F.gelu(self.conv2(x))
        x = x.permute(0, 2, 1)
        x = x + self.positional_embedding[: x.shape[1]]
        hd = NS // NH
        for blk in self.blocks:
            h = blk["attn_ln"](x)
            q = blk["q"](h).view(*h.shape[:2], NH, hd) * hd ** -0.25
            k = blk["k"](h).view(*h.shape[:2], NH, hd) * hd ** -0.25
            v = blk["v"](h).view(*h.shape[:2], NH, hd)
            att = torch.einsum("bqnd,bknd->bnqk", q, k).softmax(-1)
            o = torch.einsum("bnqk,bknd->bqnd", att, v)
            x = x + blk["out"](o.reshape(*h.shape[:2], NS))
            h = blk["mlp_ln"](x)
            x = x + blk["fc2"](F.gelu(blk["fc1"](h)))
        x = self.ln_post(x)
        x = self.avg_pooler(x.permute(0, 2, 1)).permute(0, 2, 1)
        return self.proj(x)


class _TorchQwenV1(torch.nn.Module):
    """Published QWen v1 block semantics at tiny shapes (RMSNorm,
    fused biased c_attn, rotate-half rotary, c_proj(w1 * silu(w2)))."""

    def __init__(self, vocab=160, layers=2, heads=4, ff=48):
        super().__init__()
        H = OUT
        self.wte = torch.nn.Embedding(vocab, H)
        self.h = torch.nn.ModuleList()
        self.heads = heads
        for _ in range(layers):
            self.h.append(torch.nn.ModuleDict({
                "ln_1": torch.nn.ParameterDict(
                    {"weight": torch.nn.Parameter(torch.ones(H))}),
                "c_attn": torch.nn.Linear(H, 3 * H),
                "attn_c_proj": torch.nn.Linear(H, H, bias=False),
                "ln_2": torch.nn.ParameterDict(
                    {"weight": torch.nn.Parameter(torch.ones(H))}),
                "w1": torch.nn.Linear(H, ff, bias=False),
                "w2": torch.nn.Linear(H, ff, bias=False),
                "mlp_c_proj": torch.nn.Linear(ff, H, bias=False)}))
        self.ln_f = torch.nn.ParameterDict(
            {"weight": torch.nn.Parameter(torch.ones(H))})
        self.lm_head = torch.nn.Linear(H, vocab, bias=False)

    @staticmethod
    def _rms(w, x, eps=1e-6):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x * torch.rsqrt(var + eps)) * w

    @staticmethod
    def _rope(t, pos):
        hd = t.shape[-1]
        inv = 1.0 / (10000.0 ** (torch.arange(0, hd, 2).float() / hd))
        ang = pos[:, None].float() * inv[None]
        cos = torch.cos(ang)[None, :, None, :]
        sin = torch.sin(ang)[None, :, None, :]
        x1, x2 = t[..., : hd // 2], t[..., hd // 2:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    def forward(self, inputs_embeds):
        x = inputs_embeds
        B, S, H = x.shape
        nh = self.heads
        hd = H // nh
        pos = torch.arange(S)
        causal = torch.full((S, S), float("-inf")).triu(1)
        for blk in self.h:
            xn = self._rms(blk["ln_1"]["weight"], x)
            qkv = blk["c_attn"](xn)
            q, k, v = qkv.split(H, dim=-1)
            q = self._rope(q.view(B, S, nh, hd), pos)
            k = self._rope(k.view(B, S, nh, hd), pos)
            v = v.view(B, S, nh, hd)
            att = torch.einsum("bqnd,bknd->bnqk", q, k) / hd ** 0.5
            att = (att + causal).softmax(-1)
            o = torch.einsum("bnqk,bknd->bqnd", att, v).reshape(B, S, H)
            x = x + blk["attn_c_proj"](o)
            xn = self._rms(blk["ln_2"]["weight"], x)
            inter = blk["w1"](xn) * F.silu(blk["w2"](xn))
            x = x + blk["mlp_c_proj"](inter)
        x = self._rms(self.ln_f["weight"], x)
        return self.lm_head(x)


def _sd(tower, lm, bos_eos):
    sd = {"transformer.audio.conv1.weight": tower.conv1.weight,
          "transformer.audio.conv1.bias": tower.conv1.bias,
          "transformer.audio.conv2.weight": tower.conv2.weight,
          "transformer.audio.conv2.bias": tower.conv2.bias,
          "transformer.audio.ln_post.weight": tower.ln_post.weight,
          "transformer.audio.ln_post.bias": tower.ln_post.bias,
          "transformer.audio.proj.weight": tower.proj.weight,
          "transformer.audio.proj.bias": tower.proj.bias,
          "transformer.audio.audio_bos_eos_token.weight": bos_eos}
    for i, blk in enumerate(tower.blocks):
        b = f"transformer.audio.blocks.{i}"
        sd[f"{b}.attn_ln.weight"] = blk["attn_ln"].weight
        sd[f"{b}.attn_ln.bias"] = blk["attn_ln"].bias
        sd[f"{b}.attn.query.weight"] = blk["q"].weight
        sd[f"{b}.attn.query.bias"] = blk["q"].bias
        sd[f"{b}.attn.key.weight"] = blk["k"].weight
        sd[f"{b}.attn.value.weight"] = blk["v"].weight
        sd[f"{b}.attn.value.bias"] = blk["v"].bias
        sd[f"{b}.attn.out.weight"] = blk["out"].weight
        sd[f"{b}.attn.out.bias"] = blk["out"].bias
        sd[f"{b}.mlp_ln.weight"] = blk["mlp_ln"].weight
        sd[f"{b}.mlp_ln.bias"] = blk["mlp_ln"].bias
        sd[f"{b}.mlp.0.weight"] = blk["fc1"].weight
        sd[f"{b}.mlp.0.bias"] = blk["fc1"].bias
        sd[f"{b}.mlp.2.weight"] = blk["fc2"].weight
        sd[f"{b}.mlp.2.bias"] = blk["fc2"].bias
    sd["transformer.wte.weight"] = lm.wte.weight
    sd["transformer.ln_f.weight"] = lm.ln_f["weight"]
    sd["lm_head.weight"] = lm.lm_head.weight
    for i, blk in enumerate(lm.h):
        b = f"transformer.h.{i}"
        sd[f"{b}.ln_1.weight"] = blk["ln_1"]["weight"]
        sd[f"{b}.attn.c_attn.weight"] = blk["c_attn"].weight
        sd[f"{b}.attn.c_attn.bias"] = blk["c_attn"].bias
        sd[f"{b}.attn.c_proj.weight"] = blk["attn_c_proj"].weight
        sd[f"{b}.ln_2.weight"] = blk["ln_2"]["weight"]
        sd[f"{b}.mlp.w1.weight"] = blk["w1"].weight
        sd[f"{b}.mlp.w2.weight"] = blk["w2"].weight
        sd[f"{b}.mlp.c_proj.weight"] = blk["mlp_c_proj"].weight
    return sd


MEL_T = 40      # -> conv2: 20, pool: 10 features, pads = 12


@pytest.fixture(scope="module")
def oracle_and_ours():
    from mertools_tpu.mllm.llm import LLMConfig
    from mertools_tpu.preference.qwenaudio import (QwenAudio,
                                                   QwenAudioTowerConfig,
                                                   convert_qwenaudio_state)

    torch.manual_seed(0)
    tcfg = QwenAudioTowerConfig(n_mels=NM, n_ctx=20, n_state=NS,
                                n_head=NH, n_layer=NL, output_dim=OUT)
    tower = _TorchTower(n_ctx=20).eval()
    lm = _TorchQwenV1().eval()
    g = torch.Generator().manual_seed(1)
    bos_eos = torch.randn(2, OUT, generator=g) * 0.5
    sd = _sd(tower, lm, bos_eos)
    llm_cfg = LLMConfig(vocab_size=160, hidden_size=OUT, num_layers=2,
                        num_heads=4, num_kv_heads=4, intermediate_size=48,
                        attention_bias=True, rms_norm_eps=1e-6)
    params = convert_qwenaudio_state(tcfg, llm_cfg, sd)
    ours = QwenAudio(tcfg, llm_cfg, params)
    return (tower, lm, bos_eos), ours


def test_audio_features_parity(oracle_and_ours):
    (tower, lm, bos_eos), ours = oracle_and_ours
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, NM, MEL_T)).astype(np.float32)
    with torch.no_grad():
        ref = tower(torch.tensor(mel)).numpy()
    got = ours.audio_features(mel)
    assert got.shape == ref.shape == (2, 10, OUT)
    assert ours.tcfg.audio_len(MEL_T) == 10
    assert np.abs(got - ref).max() < 3e-4, np.abs(got - ref).max()


def test_generation_matches_oracle_greedy(oracle_and_ours):
    (tower, lm, bos_eos), ours = oracle_and_ours
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(1, NM, MEL_T)).astype(np.float32)
    n_pads = 10 + 2
    ids = rng.integers(1, 150, size=22).astype(np.int64)
    ids[3: 3 + n_pads] = PAD_ID

    class _Tok:
        eos_token_id = 2

        def decode(self, x, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in x)

    got = ours.generate_batch([ids.astype(np.int32)], mel, _Tok(), PAD_ID,
                              max_new_tokens=6, temperature=0.0)[0]

    with torch.no_grad():
        feats = tower(torch.tensor(mel))
        table = lm.wte.weight.detach()
        emb = table[torch.tensor(np.where(ids == PAD_ID, 0, ids))].clone()
        emb[3] = bos_eos[0]
        emb[4: 4 + 10] = feats[0]
        emb[3 + n_pads - 1] = bos_eos[1]
        cur = emb[None]
        out_ids = []
        for _ in range(6):
            logits = lm(cur)
            nxt = int(logits[0, -1].argmax())
            if nxt == 2:
                break
            out_ids.append(nxt)
            cur = torch.cat([cur, table[None, [nxt]]], dim=1)
    want = " ".join(f"t{i}" for i in out_ids)
    assert got == want, (got, want)


def test_caller_end_to_end(oracle_and_ours):
    from types import SimpleNamespace

    from mertools_tpu.preference.qwenaudio import CHATML, QwenAudioCaller

    _, ours = oracle_and_ours
    assert "<|im_start|>system\nYou are a helpful assistant." in CHATML

    class _Tok:
        eos_token_id = 2
        audio_pad_id = PAD_ID

        def __call__(self, text, add_special_tokens=False):
            ids = [3 + (b % 140) for b in text.encode()][:20]
            return SimpleNamespace(input_ids=ids)

        def decode(self, x, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in x)

    caller = QwenAudioCaller(ours, _Tok(), batch=2, max_new_tokens=4,
                             temperature=0.0, n_mels_chunk=MEL_T)
    rng = np.random.default_rng(2)
    samples = [{"wav": 0.1 * rng.normal(size=MEL_T * 160)},
               {"wav": 0.1 * rng.normal(size=MEL_T * 80)}]
    res = caller(samples, ["how do they feel?", "pick"])
    assert len(res) == 2 and all(isinstance(r, str) for r in res)
    one = caller(samples[:1], ["how do they feel?"])
    assert one[0] == res[0]
