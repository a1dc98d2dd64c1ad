"""Otter (Flamingo family) wrapper parity vs a hand-assembled torch oracle.

The oracle re-implements the vendored ``Otter/otter/modeling_otter.py``
verbatim at tiny shapes: CLIP last_hidden (no post-LN) CLS-dropped frame
features -> perceiver resampler (kv includes the latents, amax-stabilized
softmax, bias-free projections) -> tanh-gated cross-attention blocks
before every Nth LLaMA layer (media mask from text_time cumsum) -> LM.
Decode parity is greedy with the reference's bad-words / no-repeat-3-gram
logit processing active.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

MEDIA_ID = 151
NLAT, PDEPTH, PHEADS, PDH = 4, 2, 2, 8
CROSS_EVERY = 2
VDIM = 32          # clip hidden == perceiver dim
LDIM = 48          # llama hidden


def _tiny_clip():
    from transformers import CLIPVisionConfig as HFC
    from transformers import CLIPVisionModel

    torch.manual_seed(0)
    return CLIPVisionModel(HFC(
        hidden_size=VDIM, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=16)).eval()


class _TorchPerceiver(torch.nn.Module):
    """modeling_otter.py:130-238 (no frame/media-time embs by default)."""

    def __init__(self, with_frame_embs=True, max_frames=8):
        super().__init__()
        inner = PHEADS * PDH
        self.latents = torch.nn.Parameter(torch.randn(NLAT, VDIM) * 0.5)
        self.frame_embs = (torch.nn.Parameter(
            torch.randn(max_frames, VDIM) * 0.1) if with_frame_embs else None)
        self.norm = torch.nn.LayerNorm(VDIM)
        self.layers = torch.nn.ModuleList()
        for _ in range(PDEPTH):
            self.layers.append(torch.nn.ModuleDict({
                "norm_media": torch.nn.LayerNorm(VDIM),
                "norm_latents": torch.nn.LayerNorm(VDIM),
                "to_q": torch.nn.Linear(VDIM, inner, bias=False),
                "to_kv": torch.nn.Linear(VDIM, inner * 2, bias=False),
                "to_out": torch.nn.Linear(inner, VDIM, bias=False),
                "ff_ln": torch.nn.LayerNorm(VDIM),
                "ff1": torch.nn.Linear(VDIM, VDIM * 4, bias=False),
                "ff2": torch.nn.Linear(VDIM * 4, VDIM, bias=False)}))

    def forward(self, x):
        # x (b, T=1, F, v, D)
        b, T, Fr, v = x.shape[:4]
        if self.frame_embs is not None:
            x = x + self.frame_embs[:Fr][None, None, :, None, :]
        x = x.reshape(b, T, Fr * v, -1)
        lat = self.latents[None, None].expand(b, T, -1, -1)
        for lyr in self.layers:
            xm = lyr["norm_media"](x)
            res = lat
            qn = lyr["norm_latents"](lat)
            q = lyr["to_q"](qn)
            kv_in = torch.cat([xm, qn], dim=-2)
            k, vv = lyr["to_kv"](kv_in).chunk(2, dim=-1)

            def h_(t):
                return t.view(*t.shape[:3], PHEADS, PDH).permute(
                    0, 3, 1, 2, 4)  # b h t n d

            q, k, vv = h_(q) * PDH ** -0.5, h_(k), h_(vv)
            sim = torch.einsum("...id,...jd->...ij", q, k)
            sim = sim - sim.amax(dim=-1, keepdim=True).detach()
            att = sim.softmax(-1)
            o = torch.einsum("...ij,...jd->...id", att, vv)
            o = o.permute(0, 2, 3, 1, 4).reshape(b, T, -1, PHEADS * PDH)
            lat = lyr["to_out"](o) + res
            res = lat
            h = lyr["ff2"](F.gelu(lyr["ff1"](lyr["ff_ln"](lat))))
            lat = h + res
        return self.norm(lat)


class _TorchGatedCross(torch.nn.Module):
    """modeling_otter.py:239-445."""

    def __init__(self):
        super().__init__()
        inner = PHEADS * PDH
        self.norm = torch.nn.LayerNorm(LDIM)
        self.to_q = torch.nn.Linear(LDIM, inner, bias=False)
        self.to_kv = torch.nn.Linear(VDIM, inner * 2, bias=False)
        self.to_out = torch.nn.Linear(inner, LDIM, bias=False)
        self.attn_gate = torch.nn.Parameter(torch.tensor([0.3]))
        self.ff_ln = torch.nn.LayerNorm(LDIM)
        self.ff1 = torch.nn.Linear(LDIM, LDIM * 4, bias=False)
        self.ff2 = torch.nn.Linear(LDIM * 4, LDIM, bias=False)
        self.ff_gate = torch.nn.Parameter(torch.tensor([0.2]))

    def forward(self, x, media, media_locations):
        # media (B, T=1, n, D)
        _, T_img, n = media.shape[:3]
        xn = self.norm(x)
        q = self.to_q(xn)
        media = media.reshape(media.shape[0], -1, media.shape[-1])
        k, v = self.to_kv(media).chunk(2, dim=-1)
        B, S = x.shape[:2]

        def h_(t):
            return t.view(B, -1, PHEADS, PDH).permute(0, 2, 1, 3)

        q, k, v = h_(q) * PDH ** -0.5, h_(k), h_(v)
        sim = torch.einsum("bhid,bhjd->bhij", q, k)
        text_time = media_locations.cumsum(-1)
        media_time = torch.arange(T_img) + 1
        mask = (text_time[:, None, :, None]
                == media_time.repeat_interleave(n)[None, None, None, :])
        sim = sim.masked_fill(~mask, -torch.finfo(sim.dtype).max)
        sim = sim - sim.amax(dim=-1, keepdim=True).detach()
        att = sim.softmax(-1)
        att = att.masked_fill((text_time == 0)[:, None, :, None], 0.0)
        o = torch.einsum("bhij,bhjd->bhid", att, v)
        o = o.permute(0, 2, 1, 3).reshape(B, S, -1)
        x = self.to_out(o) * self.attn_gate.tanh() + x
        x = self.ff2(F.gelu(self.ff1(self.ff_ln(x)))) * self.ff_gate.tanh() \
            + x
        return x


def _build():
    from transformers import LlamaConfig, LlamaForCausalLM

    clip = _tiny_clip()
    torch.manual_seed(1)
    perc = _TorchPerceiver().eval()
    llama = LlamaForCausalLM(LlamaConfig(
        vocab_size=160, hidden_size=LDIM, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=512)).eval()
    crosses = torch.nn.ModuleList(
        [_TorchGatedCross().eval()
         for _ in range(2 // CROSS_EVERY)])
    torch.manual_seed(2)
    for m in crosses:
        for p in m.parameters():
            if p.dim() > 1:
                torch.nn.init.normal_(p, std=0.1)

    sd = {}
    for k, v in clip.state_dict().items():
        sd[f"vision_encoder.{k}"] = v
    sd["perceiver.latents"] = perc.latents
    sd["perceiver.frame_embs"] = perc.frame_embs
    sd["perceiver.norm.weight"] = perc.norm.weight
    sd["perceiver.norm.bias"] = perc.norm.bias
    for i, lyr in enumerate(perc.layers):
        b = f"perceiver.layers.{i}"
        for nm in ("norm_media", "norm_latents"):
            sd[f"{b}.{nm}.weight"] = lyr[nm].weight
            sd[f"{b}.{nm}.bias"] = lyr[nm].bias
        sd[f"{b}.to_q.weight"] = lyr["to_q"].weight
        sd[f"{b}.to_kv.weight"] = lyr["to_kv"].weight
        sd[f"{b}.to_out.weight"] = lyr["to_out"].weight
        sd[f"{b}.feed_forward.0.weight"] = lyr["ff_ln"].weight
        sd[f"{b}.feed_forward.0.bias"] = lyr["ff_ln"].bias
        sd[f"{b}.feed_forward.1.weight"] = lyr["ff1"].weight
        sd[f"{b}.feed_forward.3.weight"] = lyr["ff2"].weight
    for j, m in enumerate(crosses):
        b = f"lang_encoder.gated_cross_attn_layers.{j}"
        sd[f"{b}.attn.norm.weight"] = m.norm.weight
        sd[f"{b}.attn.norm.bias"] = m.norm.bias
        sd[f"{b}.attn.to_q.weight"] = m.to_q.weight
        sd[f"{b}.attn.to_kv.weight"] = m.to_kv.weight
        sd[f"{b}.attn.to_out.weight"] = m.to_out.weight
        sd[f"{b}.attn_gate"] = m.attn_gate
        sd[f"{b}.feed_forward.0.weight"] = m.ff_ln.weight
        sd[f"{b}.feed_forward.0.bias"] = m.ff_ln.bias
        sd[f"{b}.feed_forward.1.weight"] = m.ff1.weight
        sd[f"{b}.feed_forward.3.weight"] = m.ff2.weight
        sd[f"{b}.ff_gate"] = m.ff_gate
    for k, v in llama.state_dict().items():
        sd[f"lang_encoder.{k}"] = v
    return sd, clip, perc, crosses, llama


@pytest.fixture(scope="module")
def oracle_and_ours():
    from mertools_tpu.encoders.vit_clip import CLIPVisionConfig
    from mertools_tpu.mllm.llm import LLMConfig
    from mertools_tpu.preference.otter import (Otter, PerceiverConfig,
                                               convert_otter_state)

    sd, clip, perc, crosses, llama = _build()
    vcfg = CLIPVisionConfig.from_hf(clip.config, projection_dim=1)
    pcfg = PerceiverConfig(dim=VDIM, depth=PDEPTH, dim_head=PDH,
                           heads=PHEADS, num_latents=NLAT)
    llm_cfg = LLMConfig.from_hf(llama.config)
    cross_layers = [i for i in range(2) if (i + 1) % CROSS_EVERY == 0]
    params = convert_otter_state(vcfg, pcfg, llm_cfg, sd, cross_layers)
    ours = Otter(vcfg, pcfg, llm_cfg, params, media_token_id=MEDIA_ID,
                 cross_attn_every_n_layers=CROSS_EVERY, cross_heads=PHEADS,
                 cross_dim_head=PDH)
    return (sd, clip, perc, crosses, llama), ours


def _oracle_latents(o, pixels):
    sd, clip, perc, crosses, llama = o
    B, Fr = pixels.shape[:2]
    with torch.no_grad():
        x = torch.tensor(pixels.reshape((-1,) + pixels.shape[2:])
                         .transpose(0, 3, 1, 2))
        h = clip(x).last_hidden_state[:, 1:]       # no post-LN, CLS drop
        h = h.reshape(B, 1, Fr, h.shape[1], h.shape[2])
        return perc(h)                             # (B, 1, NLAT, VDIM)


def _oracle_forward(o, pixels, ids):
    """Full LM forward with gated cross blocks before every Nth layer."""
    sd, clip, perc, crosses, llama = o
    lat = _oracle_latents(o, pixels)
    media_loc = torch.tensor(ids) == MEDIA_ID
    with torch.no_grad():
        x = llama.model.embed_tokens(torch.tensor(
            np.where(ids == MEDIA_ID, MEDIA_ID, ids)))
        # run llama manually, inserting the cross blocks
        B, S, _ = x.shape
        pos = torch.arange(S)[None]
        causal = torch.full((S, S), float("-inf")).triu(1)[None, None]
        pe = llama.model.rotary_emb(x, pos)
        j = 0
        for i, layer in enumerate(llama.model.layers):
            if (i + 1) % CROSS_EVERY == 0:
                x = crosses[j](x, lat, media_loc)
                j += 1
            x = layer(x, attention_mask=causal, position_ids=pos,
                      position_embeddings=pe)
            if isinstance(x, tuple):   # older transformers return tuples
                x = x[0]
        x = llama.model.norm(x)
        return llama.lm_head(x).numpy()


def test_media_latents_parity(oracle_and_ours):
    o, ours = oracle_and_ours
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, 28, 28, 3)).astype(np.float32)
    ref = _oracle_latents(o, pixels).numpy()[:, 0]
    kvs = ours.media_kvs(pixels)
    # compare through the first cross layer's K projection
    sd = o[0]
    i = ours.cross_layers[0]
    kv = ref @ sd["lang_encoder.gated_cross_attn_layers.0.attn.to_kv"
                  ".weight"].detach().numpy().T
    k_ref = kv[..., : PHEADS * PDH].reshape(2, NLAT, PHEADS, PDH)
    got = np.asarray(kvs[i][0])
    assert np.abs(got - k_ref).max() < 3e-4, np.abs(got - k_ref).max()


def test_prefill_logits_parity(oracle_and_ours):
    o, ours = oracle_and_ours
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 28, 28, 3)).astype(np.float32)
    ids = rng.integers(3, 150, size=(1, 12)).astype(np.int64)
    ids[0, 1] = MEDIA_ID    # [bos-ish, <image>, text...]
    ref = _oracle_forward(o, pixels, ids)
    kvs = ours.media_kvs(pixels)
    import jax.numpy as jnp

    logits, k_cache, v_cache, n_valid = ours._prefill(
        ours.params, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(np.ones((1, 12), np.int32)), kvs, cache_len=16)
    got = np.asarray(logits)
    assert np.abs(got - ref[0, -1]).max() < 2e-3, \
        np.abs(got - ref[0, -1]).max()


def test_generation_matches_oracle_greedy(oracle_and_ours):
    o, ours = oracle_and_ours
    sd, clip, perc, crosses, llama = o
    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(1, 3, 28, 28, 3)).astype(np.float32)
    ids = rng.integers(3, 150, size=10).astype(np.int64)
    ids[0] = MEDIA_ID

    class _Tok:
        eos_token_id = 2

        def decode(self, x, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in x)

    got = ours.generate_batch([ids.astype(np.int32)], pixels, _Tok(),
                              max_new_tokens=6, temperature=0.0)[0]

    cur = list(ids)
    out_ids = []
    with torch.no_grad():
        for _ in range(6):
            logits = _oracle_forward(o, pixels,
                                     np.asarray(cur, np.int64)[None])
            nxt = int(logits[0, -1].argmax())
            if nxt == 2:
                break
            out_ids.append(nxt)
            cur.append(nxt)
    want = " ".join(f"t{i}" for i in out_ids)
    assert got == want, (got, want)


def test_bad_words_and_ngram_processing():
    from mertools_tpu.preference.otter import _process_logits

    lg = np.zeros(10, np.float32)
    # multi-token bad word: ban last token only when prefix matches
    out = _process_logits(lg.copy(), [1, 2, 3], [[3, 4]], 0)
    assert out[4] == -np.inf
    out = _process_logits(lg.copy(), [1, 2, 5], [[3, 4]], 0)
    assert out[4] == 0.0
    # single-token bad word always banned
    out = _process_logits(lg.copy(), [], [[7]], 0)
    assert out[7] == -np.inf
    # no-repeat-3-gram: seq [1,2,3,1,2] -> banning 3 (completes 1,2,3)
    out = _process_logits(lg.copy(), [1, 2, 3, 1, 2], None, 3)
    assert out[3] == -np.inf and out[4] == 0.0


def test_caller_end_to_end(oracle_and_ours):
    from types import SimpleNamespace

    from mertools_tpu.preference.otter import OtterCaller

    _, ours = oracle_and_ours

    class _Tok:
        eos_token_id = 2

        def __call__(self, text, add_special_tokens=True):
            ids = ([1] if add_special_tokens else []) + [
                MEDIA_ID if w == "<image>" else (3 + (hash(w) % 140))
                for w in text.replace("<image>", " <image> ").split()][:14]
            return SimpleNamespace(input_ids=ids)

        def decode(self, x, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in x)

    caller = OtterCaller(ours, _Tok(), batch=2, n_frames=3,
                         max_new_tokens=4, temperature=0.0)
    rng = np.random.default_rng(3)
    samples = [
        {"frames": rng.integers(0, 255, size=(20, 40, 50, 3)).astype(np.uint8)},
        {"frames": rng.integers(0, 255, size=(7, 28, 28, 3)).astype(np.uint8)},
    ]
    res = caller(samples, ["how do they feel?", "pick"])
    assert len(res) == 2 and all(isinstance(r, str) for r in res)
    one = caller(samples[:1], ["how do they feel?"])
    assert one[0] == res[0]
