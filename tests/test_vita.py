"""VITA judge parity vs a hand-assembled torch oracle.

The reference tree ships only the wrapper (utils/vita.py) — the ``vita``
package is not vendored — so the oracle follows the published VITA-1.5
architecture: InternViT (LayerScale, fused qkv, no final LN) -> CLS drop ->
pixel shuffle (ps_version v2) -> Sequential[Linear, GELU, Linear] projector
-> per-frame <image> insertion -> Qwen2 greedy decode.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from mertools_tpu.preference.llamavid import IMAGE_TOKEN_INDEX
from mertools_tpu.preference.vita import (Vita, VitaCaller, convert_vita_state,
                                          internvit_config)

VCFG = dict(hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32,
            image_size=28, patch_size=7)     # grid 4 -> 4 tokens/frame
LLM_HID = 48


class _InternBlock(nn.Module):
    """OpenGVLab modeling_intern_vit.InternVisionEncoderLayer (qk_norm off,
    drop_path 0)."""

    def __init__(self, d, heads, inter):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.qkv = nn.Linear(d, 3 * d)
        self.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.fc1 = nn.Linear(d, inter)
        self.fc2 = nn.Linear(inter, d)
        self.ls1 = nn.Parameter(0.1 * torch.ones(d))
        self.ls2 = nn.Parameter(0.1 * torch.ones(d))
        self.heads = heads

    def forward(self, x):
        B, N, D = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, N, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) * (q.shape[-1] ** -0.5)
        att = att.softmax(dim=-1)
        h = (att @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.ls1 * self.proj(h)
        h = self.fc2(nn.functional.gelu(self.norm2(x) @ self.fc1.weight.T
                                        + self.fc1.bias))
        x = x + self.ls2 * h
        return x


class _InternViT(nn.Module):
    def __init__(self, c):
        super().__init__()
        d = c["hidden_size"]
        g = c["image_size"] // c["patch_size"]
        self.patch = nn.Conv2d(3, d, c["patch_size"], c["patch_size"])
        self.cls = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos = nn.Parameter(torch.randn(1, 1 + g * g, d) * 0.02)
        self.blocks = nn.ModuleList(
            _InternBlock(d, c["num_heads"], c["intermediate_size"])
            for _ in range(c["num_layers"]))

    def forward(self, x):                     # (B, 3, H, W)
        h = self.patch(x).flatten(2).transpose(1, 2)
        h = torch.cat([self.cls.expand(h.shape[0], -1, -1), h], dim=1)
        h = h + self.pos
        for b in self.blocks:
            h = b(h)
        return h                              # no final LN


def _torch_pixel_shuffle(x, r=0.5):
    n, w, h, c = x.shape
    x = x.reshape(n, w, int(h * r), int(c / r))
    x = x.permute(0, 2, 1, 3).contiguous()
    x = x.reshape(n, int(h * r), int(w * r), int(c / (r * r)))
    x = x.permute(0, 2, 1, 3).contiguous()
    return x


def _tiny_qwen2():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(vocab_size=160, hidden_size=LLM_HID,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, intermediate_size=96,
                      max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(1)
    return Qwen2ForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def setup():
    from mertools_tpu.mllm.llm import LLMConfig

    torch.manual_seed(0)
    tower = _InternViT(VCFG).eval()
    proj = nn.Sequential(nn.Linear(VCFG["hidden_size"] * 4, LLM_HID),
                         nn.GELU(), nn.Linear(LLM_HID, LLM_HID)).eval()
    lm = _tiny_qwen2()

    sd = {}
    pre = "model.vision_tower.vision_tower."
    sd[f"{pre}embeddings.class_embedding"] = tower.cls.detach()
    sd[f"{pre}embeddings.position_embedding"] = tower.pos.detach()
    sd[f"{pre}embeddings.patch_embedding.weight"] = tower.patch.weight.detach()
    sd[f"{pre}embeddings.patch_embedding.bias"] = tower.patch.bias.detach()
    for i, b in enumerate(tower.blocks):
        lp = f"{pre}encoder.layers.{i}"
        sd[f"{lp}.norm1.weight"] = b.norm1.weight.detach()
        sd[f"{lp}.norm1.bias"] = b.norm1.bias.detach()
        sd[f"{lp}.norm2.weight"] = b.norm2.weight.detach()
        sd[f"{lp}.norm2.bias"] = b.norm2.bias.detach()
        sd[f"{lp}.attn.qkv.weight"] = b.qkv.weight.detach()
        sd[f"{lp}.attn.qkv.bias"] = b.qkv.bias.detach()
        sd[f"{lp}.attn.proj.weight"] = b.proj.weight.detach()
        sd[f"{lp}.attn.proj.bias"] = b.proj.bias.detach()
        sd[f"{lp}.mlp.fc1.weight"] = b.fc1.weight.detach()
        sd[f"{lp}.mlp.fc1.bias"] = b.fc1.bias.detach()
        sd[f"{lp}.mlp.fc2.weight"] = b.fc2.weight.detach()
        sd[f"{lp}.mlp.fc2.bias"] = b.fc2.bias.detach()
        sd[f"{lp}.ls1"] = b.ls1.detach()
        sd[f"{lp}.ls2"] = b.ls2.detach()
    sd["model.mm_projector.0.weight"] = proj[0].weight.detach()
    sd["model.mm_projector.0.bias"] = proj[0].bias.detach()
    sd["model.mm_projector.2.weight"] = proj[2].weight.detach()
    sd["model.mm_projector.2.bias"] = proj[2].bias.detach()
    sd.update({k: v.detach() for k, v in lm.state_dict().items()})

    vcfg = internvit_config(**VCFG)
    llm_cfg = LLMConfig.from_hf(lm.config)
    params = convert_vita_state(vcfg, llm_cfg, sd)
    ours = Vita(vcfg, llm_cfg, params)
    return tower, proj, lm, ours


def _oracle_features(tower, proj, pixels):
    """published VITA encode_images flow per frame."""
    B, F = pixels.shape[:2]
    with torch.no_grad():
        x = torch.tensor(pixels.reshape((-1,) + pixels.shape[2:])
                         .transpose(0, 3, 1, 2))
        h = tower(x)[:, 1:]
        g = int(np.sqrt(h.shape[1]))
        h = _torch_pixel_shuffle(h.reshape(h.shape[0], g, g, -1))
        h = h.reshape(h.shape[0], -1, h.shape[-1])
        out = proj(h)
        return out.reshape(B, F, out.shape[1], -1).numpy()


def test_frame_features_parity(setup):
    tower, proj, lm, ours = setup
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(2, 3, 28, 28, 3)).astype(np.float32)
    ref = _oracle_features(tower, proj, pixels)
    got = ours.frame_features(pixels)
    assert got.shape == ref.shape == (2, 3, 4, LLM_HID)
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_generation_matches_oracle_greedy(setup):
    tower, proj, lm, ours = setup
    rng = np.random.default_rng(2)
    F = 2
    pixels = rng.normal(size=(1, F, 28, 28, 3)).astype(np.float32)
    tpf = ours.tokens_per_frame
    base = rng.integers(1, 150, size=14).astype(np.int64)
    ids = np.concatenate([base[:3], [IMAGE_TOKEN_INDEX], base[3:5],
                          [IMAGE_TOKEN_INDEX], base[5:]]).astype(np.int32)

    class _Tok:
        eos_token_id = 2

        def decode(self, x, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in x)

    got = ours.generate_batch([ids], pixels, _Tok(), max_new_tokens=6,
                              temperature=0.0)[0]

    feats = _oracle_features(tower, proj, pixels)[0]   # (F, tpf, H)
    table = lm.model.embed_tokens.weight.detach()
    parts, prev, k = [], 0, 0
    for i in np.where(ids == IMAGE_TOKEN_INDEX)[0]:
        parts.append(table[torch.tensor(ids[prev:i].astype(np.int64))])
        parts.append(torch.tensor(feats[k]))
        prev, k = i + 1, k + 1
    parts.append(table[torch.tensor(ids[prev:].astype(np.int64))])
    cur = torch.cat(parts, dim=0)[None]
    assert cur.shape[1] == len(ids) - F + F * tpf
    out_ids = []
    with torch.no_grad():
        for _ in range(6):
            logits = lm(inputs_embeds=cur).logits
            nxt = int(logits[0, -1].argmax())
            if nxt == 2:
                break
            out_ids.append(nxt)
            cur = torch.cat([cur, table[None, [nxt]]], dim=1)
    want = " ".join(f"t{i}" for i in out_ids)
    assert got == want, (got, want)


def test_pixel_shuffle_matches_published(setup):
    from mertools_tpu.preference.vita import pixel_shuffle

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    ref = _torch_pixel_shuffle(torch.tensor(x)).numpy()
    got = np.asarray(pixel_shuffle(x))
    np.testing.assert_allclose(got, ref, atol=0)
    assert got.shape == (2, 2, 2, 32)


def test_caller_end_to_end(setup):
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    _, _, _, ours = setup
    vocab = {f"w{i}": i for i in range(150)}
    vocab.update({"<image>": 150, "<eos>": 159})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")

    caller = VitaCaller(ours, fast, batch=2, max_new_tokens=4,
                        temperature=0.0, fps=1.0, min_frames=2,
                        max_frames=3, strip_marker=False)
    rng = np.random.default_rng(4)
    samples = [
        {"frames": rng.integers(0, 255, size=(60, 30, 44, 3)
                                ).astype(np.uint8), "fps": 25.0},
        {"frames": rng.integers(0, 255, size=(20, 28, 28, 3)
                                ).astype(np.uint8), "fps": 25.0},
    ]
    # 60 frames @25fps -> 3 kept (1fps, capped at 3); 20 -> 2 (min pad)
    res = caller(samples, ["w5 w6", "w7"])
    assert len(res) == 2 and all(isinstance(r, str) for r in res)
    one = caller(samples[:1], ["w5 w6"])
    assert one[0] == res[0]
    # prompt structure: ChatML with one sentinel per frame
    ids = caller.prompt_ids("w5", 3)
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 3


def test_from_checkpoint_roundtrip(setup, tmp_path):
    """Save the tiny oracle as a VITA checkpoint dir; from_checkpoint must
    reproduce generate_batch exactly."""
    import json

    import torch as _torch
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    tower, proj, lm, ours = setup
    sd = {}
    pre = "model.vision_tower.vision_tower."
    sd[f"{pre}embeddings.class_embedding"] = tower.cls.detach()
    sd[f"{pre}embeddings.position_embedding"] = tower.pos.detach()
    sd[f"{pre}embeddings.patch_embedding.weight"] = tower.patch.weight.detach()
    sd[f"{pre}embeddings.patch_embedding.bias"] = tower.patch.bias.detach()
    for i, b in enumerate(tower.blocks):
        lp = f"{pre}encoder.layers.{i}"
        for nm, t in (("norm1.weight", b.norm1.weight),
                      ("norm1.bias", b.norm1.bias),
                      ("norm2.weight", b.norm2.weight),
                      ("norm2.bias", b.norm2.bias),
                      ("attn.qkv.weight", b.qkv.weight),
                      ("attn.qkv.bias", b.qkv.bias),
                      ("attn.proj.weight", b.proj.weight),
                      ("attn.proj.bias", b.proj.bias),
                      ("mlp.fc1.weight", b.fc1.weight),
                      ("mlp.fc1.bias", b.fc1.bias),
                      ("mlp.fc2.weight", b.fc2.weight),
                      ("mlp.fc2.bias", b.fc2.bias),
                      ("ls1", b.ls1), ("ls2", b.ls2)):
            sd[f"{lp}.{nm}"] = t.detach()
    sd["model.mm_projector.0.weight"] = proj[0].weight.detach()
    sd["model.mm_projector.0.bias"] = proj[0].bias.detach()
    sd["model.mm_projector.2.weight"] = proj[2].weight.detach()
    sd["model.mm_projector.2.bias"] = proj[2].bias.detach()
    sd.update({k: v.detach() for k, v in lm.state_dict().items()})
    _torch.save(sd, tmp_path / "pytorch_model.bin")
    with open(tmp_path / "config.json", "w") as f:
        json.dump({
            "model_type": "qwen2", "vocab_size": 160,
            "hidden_size": LLM_HID, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "intermediate_size": 96, "rms_norm_eps": lm.config.rms_norm_eps,
            "rope_theta": lm.config.rope_theta,
            "vision_config": {"hidden_size": VCFG["hidden_size"],
                              "num_hidden_layers": VCFG["num_layers"],
                              "num_attention_heads": VCFG["num_heads"],
                              "intermediate_size": VCFG["intermediate_size"],
                              "image_size": VCFG["image_size"],
                              "patch_size": VCFG["patch_size"]},
        }, f)
    vocab = {f"w{i}": i for i in range(150)}
    vocab.update({"<image>": 150, "<eos>": 159})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")
    fast.save_pretrained(str(tmp_path))

    caller = VitaCaller.from_checkpoint(
        str(tmp_path), batch=1, max_new_tokens=4, temperature=0.0,
        min_frames=2, max_frames=3, strip_marker=False)
    rng = np.random.default_rng(4)
    sample = {"frames": rng.integers(0, 255, size=(60, 30, 44, 3)
                                     ).astype(np.uint8), "fps": 25.0}
    ref = VitaCaller(setup[3], fast, batch=1, max_new_tokens=4,
                     temperature=0.0, min_frames=2, max_frames=3,
                     strip_marker=False)([sample], ["w5 w6"])
    got = caller([sample], ["w5 w6"])
    assert got == ref


def test_marker_strip():
    caller = VitaCaller.__new__(VitaCaller)
    caller.strip_marker = True
    assert caller._postprocess("☞nice answer<|im_end|>") == "nice answer"
