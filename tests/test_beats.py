"""BEATs encoder parity vs an original-architecture torch oracle.

No fairseq/BEATs implementation exists in this image, so the oracle below
re-implements the published architecture (patch conv2d, DeepNorm post-LN
layers, gated relative position bias computed from projected query heads)
in torch with random weights; the converter maps the torch state dict into
the Flax module and outputs must agree to float32 tolerance.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax

from mertools_tpu.encoders.beats import (BEATsConfig, BEATsEncoder,
                                         beats_fbank, convert_beats_state)

CFG = BEATsConfig(input_patch_size=16, embed_dim=8, encoder_layers=2,
                  encoder_embed_dim=16, encoder_ffn_embed_dim=32,
                  encoder_attention_heads=2, conv_pos=8, conv_pos_groups=2,
                  num_buckets=32, max_distance=16)


def _bucket_torch(rel, num_buckets, max_distance):
    num_buckets //= 2
    out = (rel > 0).long() * num_buckets
    rel = rel.abs()
    max_exact = num_buckets // 2
    small = rel < max_exact
    large = max_exact + (torch.log(rel.float().clamp(min=1) / max_exact)
                         / math.log(max_distance / max_exact)
                         * (num_buckets - max_exact)).long()
    large = torch.minimum(large, torch.full_like(large, num_buckets - 1))
    return out + torch.where(small, rel, large)


class _TorchBEATs(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.c = c
        E, H = c.embed_dim, c.encoder_embed_dim
        p = c.input_patch_size
        self.patch_embedding = torch.nn.Conv2d(1, E, p, p, bias=c.conv_bias)
        self.layer_norm = torch.nn.LayerNorm(E)
        self.post_extract_proj = torch.nn.Linear(E, H)
        self.pos_conv = torch.nn.Conv1d(H, H, c.conv_pos,
                                        padding=c.conv_pos // 2,
                                        groups=c.conv_pos_groups)
        self.enc_ln = torch.nn.LayerNorm(H)
        self.rel_bias = torch.nn.Embedding(c.num_buckets,
                                           c.encoder_attention_heads)
        self.layers = torch.nn.ModuleList()
        for _ in range(c.encoder_layers):
            self.layers.append(torch.nn.ModuleDict({
                "q": torch.nn.Linear(H, H), "k": torch.nn.Linear(H, H),
                "v": torch.nn.Linear(H, H), "o": torch.nn.Linear(H, H),
                "grep": torch.nn.Linear(H // c.encoder_attention_heads, 8),
                "ln1": torch.nn.LayerNorm(H),
                "fc1": torch.nn.Linear(H, c.encoder_ffn_embed_dim),
                "fc2": torch.nn.Linear(c.encoder_ffn_embed_dim, H),
                "ln2": torch.nn.LayerNorm(H)}))
        self.grep_a = torch.nn.Parameter(
            torch.ones(c.encoder_layers, 1, c.encoder_attention_heads, 1, 1))

    def forward(self, fbank):
        c = self.c
        B, T, M = fbank.shape
        x = self.patch_embedding(fbank.unsqueeze(1))  # (B, E, t, 8)
        x = x.reshape(B, x.shape[1], -1).transpose(1, 2)
        x = self.layer_norm(x)
        x = self.post_extract_proj(x)

        pos = self.pos_conv(x.transpose(1, 2))[..., : x.shape[1]]
        x = x + F.gelu(pos.transpose(1, 2))
        x = self.enc_ln(x)

        n = x.shape[1]
        rel = (torch.arange(n)[None, :] - torch.arange(n)[:, None])
        buckets = _bucket_torch(rel, c.num_buckets, c.max_distance)
        pos_bias = self.rel_bias(buckets).permute(2, 0, 1)  # (nh, n, n)

        nh = c.encoder_attention_heads
        hd = x.shape[-1] // nh
        alpha = (2 * c.encoder_layers) ** 0.25
        for li, lyr in enumerate(self.layers):
            q_raw = lyr["q"](x).view(B, n, nh, hd)
            k = lyr["k"](x).view(B, n, nh, hd)
            v = lyr["v"](x).view(B, n, nh, hd)
            logits = torch.einsum("bqnd,bknd->bnqk", q_raw * hd ** -0.5, k)
            g = lyr["grep"](q_raw.permute(0, 2, 1, 3))      # (B,nh,n,8)
            g = torch.sigmoid(g.view(B, nh, n, 2, 4).sum(-1))
            ga, gb = g.chunk(2, dim=-1)
            gate = ga * (gb * self.grep_a[li] - 1.0) + 2.0
            logits = logits + gate * pos_bias[None]
            w = torch.softmax(logits, -1)
            att = torch.einsum("bnqk,bknd->bqnd", w, v).reshape(B, n, -1)
            att = lyr["o"](att)
            x = lyr["ln1"](x * alpha + att)
            h = lyr["fc2"](F.gelu(lyr["fc1"](x)))
            x = lyr["ln2"](x * alpha + h)
        return x


def _fairseq_sd(tm):
    """Map the oracle's parameters to fairseq BEATs checkpoint names."""
    sd = {"patch_embedding.weight": tm.patch_embedding.weight,
          "layer_norm.weight": tm.layer_norm.weight,
          "layer_norm.bias": tm.layer_norm.bias,
          "post_extract_proj.weight": tm.post_extract_proj.weight,
          "post_extract_proj.bias": tm.post_extract_proj.bias,
          "encoder.layer_norm.weight": tm.enc_ln.weight,
          "encoder.layer_norm.bias": tm.enc_ln.bias,
          "encoder.layers.0.self_attn.relative_attention_bias.weight":
              tm.rel_bias.weight}
    if tm.patch_embedding.bias is not None:
        sd["patch_embedding.bias"] = tm.patch_embedding.bias
    # weight-norm decomposition that composes back to the plain conv weight
    w = tm.pos_conv.weight.detach()
    sd["encoder.pos_conv.0.weight_v"] = w
    sd["encoder.pos_conv.0.weight_g"] = torch.sqrt(
        (w ** 2).sum(dim=(0, 1), keepdim=True))
    sd["encoder.pos_conv.0.bias"] = tm.pos_conv.bias
    names = {"q": "q_proj", "k": "k_proj", "v": "v_proj", "o": "out_proj",
             "grep": "grep_linear", "ln1": "self_attn_layer_norm",
             "fc1": "fc1", "fc2": "fc2", "ln2": "final_layer_norm"}
    for i, lyr in enumerate(tm.layers):
        b = f"encoder.layers.{i}"
        for src, dst in names.items():
            mod = lyr[src]
            tgt = (f"{b}.self_attn.{dst}"
                   if dst in ("q_proj", "k_proj", "v_proj", "out_proj",
                              "grep_linear") else f"{b}.{dst}")
            sd[f"{tgt}.weight"] = mod.weight
            sd[f"{tgt}.bias"] = mod.bias
        sd[f"{b}.self_attn.grep_a"] = tm.grep_a[i]
    return sd


def test_beats_matches_torch_oracle():
    torch.manual_seed(0)
    tm = _TorchBEATs(CFG).eval()
    rng = np.random.default_rng(0)
    fbank = rng.normal(size=(2, 48, 128)).astype(np.float32) * 0.5

    with torch.no_grad():
        ref = tm(torch.from_numpy(fbank)).numpy()

    params = convert_beats_state(CFG, _fairseq_sd(tm))
    enc = BEATsEncoder(CFG)
    out = np.asarray(enc.apply({"params": params}, fbank))
    assert out.shape == ref.shape == (2, 3 * 8, 16)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_beats_fbank_shape_and_norm():
    rng = np.random.default_rng(1)
    wav = (0.1 * rng.normal(size=(2, 16000))).astype(np.float32)
    fb = np.asarray(beats_fbank(wav))
    assert fb.shape == (2, 98, 128)
    # normalization centers typical speech-scale input near zero
    assert abs(float(fb.mean())) < 3.0


def test_beats_mask_zeroes_padded_patches():
    torch.manual_seed(1)
    tm = _TorchBEATs(CFG).eval()
    params = convert_beats_state(CFG, _fairseq_sd(tm))
    enc = BEATsEncoder(CFG)
    rng = np.random.default_rng(2)
    fbank = rng.normal(size=(1, 64, 128)).astype(np.float32)
    mask = np.zeros((1, 64), bool)
    mask[0, :32] = True  # 2 valid patch rows of 4
    out = np.asarray(enc.apply({"params": params}, fbank, mask))
    assert np.abs(out[0, 16:]).max() == 0.0  # padded patches zeroed
    # valid patches equal the exact-length run
    out_exact = np.asarray(enc.apply({"params": params}, fbank[:, :32]))
    np.testing.assert_allclose(out[0, :16], out_exact[0], rtol=2e-4,
                               atol=2e-4)
