"""VideoChat (v1) zero-shot judge — EVA-G + GMHRA collector + BLIP-2
Q-Former + Vicuna.

Reference: ``MER2026/MER2026_Track3/utils/videochat.py`` wrapping the
vendored ``MER2025_Track23/VideoChat``:

- **vision** (``models/eva_vit.py``, deployed ``configs/config_7b.json``:
  ``no_lmhra=true, temporal_downsample=false, gmhra_layers=8``): per-frame
  EVA-G blocks (fused qkv with zero-pinned k bias, learned abs positions,
  cls token, eps 1e-6, NO layer-scale) + a **Global-MHRA collector token**
  that cross-attends the full T x (HW+1) stream after each of the last 8
  blocks (depthwise 3x3x3 conv positional on the spatial tokens, packed
  in_proj MHA, GELU MLP — eva_vit.py:311-377, 458-483); output =
  ``[frame tokens; collector token]``;
- ``ln_vision`` -> **query-only BLIP-2 Q-Former** with
  ``query_tokens(32) + extra_query_tokens(64)`` concatenated
  (videochat.py:87-176, = :class:`mertools_tpu.mllm.qformer.QFormer`) ->
  ``llama_proj``;
- ### conversation, splice at ``<VideoHere>``, Vicuna decode (protocol:
  8 segments, do_sample temperature 1.0 top_p 0.9 — utils/videochat.py:
  59-76, conversation.py:60-85).

TPU-native re-design: batched jitted tower (the gmhra stream runs inside
the same jit), shared KV-cached decode. Parity vs a hand-assembled torch
oracle in tests/test_videochat.py.

Documented scope: the deployed no-lmhra config; ``lmhra`` local-temporal
convs (off in config_7b.json) raise NotImplementedError in the converter.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..mllm.llm import LLM, LLMConfig
from ..mllm.qformer import QFormer, QFormerConfig, from_blip2_qformer
from .videochat2 import VideoChat2Caller

_P = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class EVAGMHRAConfig:
    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1408
    depth: int = 39
    num_heads: int = 16
    mlp_ratio: float = 4.3637
    gmhra_layers: int = 8
    layer_norm_eps: float = 1e-6

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    @property
    def gmhra_mlp_hidden(self) -> int:
        return round(self.mlp_ratio * self.embed_dim)


class EVAGMHRA(nn.Module):
    """(B, T, H, W, 3) -> (B, T*(HW+1) + 1, C): per-frame EVA blocks with a
    video collector token updated by cross-attention after each of the
    last ``gmhra_layers`` blocks."""

    cfg: EVAGMHRAConfig
    precision: object = _P

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B, T = pixels.shape[:2]
        x = nn.Conv(c.embed_dim, kernel_size=(c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embed", precision=self.precision)(
            pixels.reshape((B * T,) + pixels.shape[2:]))
        g = x.shape[1]
        N = g * g
        x = x.reshape(B * T, N, c.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros, (c.embed_dim,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B * T, 1, c.embed_dim)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (N + 1, c.embed_dim))
        x = x + pos[None]

        gtok = self.param("gmhra_cls_token", nn.initializers.zeros,
                          (c.embed_dim,))
        gx = jnp.broadcast_to(gtok, (B, 1, c.embed_dim))

        nh, hd = c.num_heads, c.embed_dim // c.num_heads
        # gmhra modules index in BLOCK-ENCOUNTER order (eva_vit.py:470-480:
        # j increments as ascending block idx hits gmhra_layer_idx)
        gmhra_idx = {b: j for j, b in enumerate(sorted(
            c.depth - 1 - i for i in range(c.gmhra_layers)))}
        ln = lambda n: nn.LayerNorm(epsilon=c.layer_norm_eps, name=n)
        for i in range(c.depth):
            # EVA block (pre-norm, fused qkv with zero k bias)
            h = ln(f"norm1_{i}")(x)
            qkv = nn.Dense(3 * c.embed_dim, use_bias=False, name=f"qkv_{i}",
                           precision=self.precision)(h)
            qb = self.param(f"q_bias_{i}", nn.initializers.zeros,
                            (c.embed_dim,))
            vb = self.param(f"v_bias_{i}", nn.initializers.zeros,
                            (c.embed_dim,))
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = (q + qb).reshape(B * T, -1, nh, hd)
            k = k.reshape(B * T, -1, nh, hd)
            v = (v + vb).reshape(B * T, -1, nh, hd)
            att = jnp.einsum("bqnd,bknd->bnqk", q * hd ** -0.5, k,
                             precision=self.precision)
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("bnqk,bknd->bqnd", att, v,
                           precision=self.precision)
            o = nn.Dense(c.embed_dim, name=f"proj_{i}",
                         precision=self.precision)(
                o.reshape(B * T, -1, c.embed_dim))
            x = x + o
            h = ln(f"norm2_{i}")(x)
            h = nn.Dense(c.mlp_hidden, name=f"fc1_{i}",
                         precision=self.precision)(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(c.embed_dim, name=f"fc2_{i}",
                         precision=self.precision)(h)
            x = x + h

            if i in gmhra_idx:
                j = gmhra_idx[i]
                gx = self._gmhra(j, gx, x, B, T, N, g)
        x = x.reshape(B, T * (N + 1), c.embed_dim)
        return jnp.concatenate([x, gx], axis=1)

    def _gmhra(self, j, gx, y, B, T, N, g):
        """Global_MHRA (eva_vit.py:311-377): collector token cross-attends
        [cls; dpe-enhanced spatial tokens] over all frames."""
        c = self.cfg
        nh, hd = c.num_heads, c.embed_dim // c.num_heads
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, name=n)
        y = ln(f"g_ln3_{j}")(y.reshape(B, T, N + 1, c.embed_dim))
        ycls, ysp = y[:, :, :1], y[:, :, 1:]
        # depthwise 3x3x3 conv positional encoding on (T, H, W) per channel
        kern = self.param(f"g_dpe_{j}_k", nn.initializers.zeros,
                          (3, 3, 3, 1, c.embed_dim))
        db = self.param(f"g_dpe_{j}_b", nn.initializers.zeros,
                        (c.embed_dim,))
        sp = ysp.reshape(B, T, g, g, c.embed_dim)
        sp = jax.lax.conv_general_dilated(
            sp, kern, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            feature_group_count=c.embed_dim,
            precision=self.precision) + db
        ysp = ysp + sp.reshape(B, T, N, c.embed_dim)
        kv = jnp.concatenate([ycls, ysp], axis=2).reshape(
            B, T * (N + 1), c.embed_dim)

        qn = ln(f"g_ln1_{j}")(gx)
        q = (jnp.einsum("bqd,dh->bqh", qn, self.param(
            f"g_q_{j}_k", nn.initializers.zeros,
            (c.embed_dim, c.embed_dim)), precision=self.precision)
            + self.param(f"g_q_{j}_b", nn.initializers.zeros,
                         (c.embed_dim,)))
        k = (jnp.einsum("bkd,dh->bkh", kv, self.param(
            f"g_k_{j}_k", nn.initializers.zeros,
            (c.embed_dim, c.embed_dim)), precision=self.precision)
            + self.param(f"g_k_{j}_b", nn.initializers.zeros,
                         (c.embed_dim,)))
        v = (jnp.einsum("bkd,dh->bkh", kv, self.param(
            f"g_v_{j}_k", nn.initializers.zeros,
            (c.embed_dim, c.embed_dim)), precision=self.precision)
            + self.param(f"g_v_{j}_b", nn.initializers.zeros,
                         (c.embed_dim,)))
        q = q.reshape(B, -1, nh, hd)
        k = k.reshape(B, -1, nh, hd)
        v = v.reshape(B, -1, nh, hd)
        att = jnp.einsum("bqnd,bknd->bnqk", q, k,
                         precision=self.precision) / np.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bnqk,bknd->bqnd", att, v, precision=self.precision)
        o = (jnp.einsum("bqh,hd->bqd", o.reshape(B, -1, c.embed_dim),
                        self.param(f"g_out_{j}_k", nn.initializers.zeros,
                                   (c.embed_dim, c.embed_dim)),
                        precision=self.precision)
             + self.param(f"g_out_{j}_b", nn.initializers.zeros,
                          (c.embed_dim,)))
        gx = gx + o
        h = ln(f"g_ln2_{j}")(gx)
        h = (jnp.einsum("bqd,dh->bqh", h,
                        self.param(f"g_fc1_{j}_k", nn.initializers.zeros,
                                   (c.embed_dim, c.gmhra_mlp_hidden)),
                        precision=self.precision)
             + self.param(f"g_fc1_{j}_b", nn.initializers.zeros,
                          (c.gmhra_mlp_hidden,)))
        h = jax.nn.gelu(h, approximate=False)
        h = (jnp.einsum("bqh,hd->bqd", h,
                        self.param(f"g_fc2_{j}_k", nn.initializers.zeros,
                                   (c.gmhra_mlp_hidden, c.embed_dim)),
                        precision=self.precision)
             + self.param(f"g_fc2_{j}_b", nn.initializers.zeros,
                          (c.embed_dim,)))
        return gx + h


class VideoChatV1:
    """Batched TPU VideoChat v1. ``params``: {vit, ln_vision, qformer,
    llama_proj, llm}."""

    def __init__(self, vit_cfg: EVAGMHRAConfig, qf_cfg: QFormerConfig,
                 llm_cfg: LLMConfig, params: dict):
        self.vit_cfg = vit_cfg
        self.qf_cfg = qf_cfg
        self.llm_cfg = llm_cfg
        self.params = params
        self._vit = EVAGMHRA(vit_cfg)
        self._qf = QFormer(qf_cfg)
        self._llm = LLM(llm_cfg)

        def encode(p, pixels):
            h = self._vit.apply({"params": p["vit"]}, pixels)
            mu = h.mean(-1, keepdims=True)
            var = ((h - mu) ** 2).mean(-1, keepdims=True)
            h = ((h - mu) * jax.lax.rsqrt(var + 1e-5)
                 * p["ln_vision"]["scale"] + p["ln_vision"]["bias"])
            q = self._qf.apply({"params": p["qformer"]}, h)
            return (jnp.einsum("bqd,dh->bqh", q,
                               p["llama_proj"]["kernel"], precision=_P)
                    + p["llama_proj"]["bias"])

        self._encode = jax.jit(encode)

    def video_embeds(self, pixels: np.ndarray) -> np.ndarray:
        return np.asarray(self._encode(self.params, jnp.asarray(pixels)))

    # the prompt machinery is identical to VideoChat2's
    generate_batch = None  # assigned below


# share the [left; video; right] splice + decode with VideoChat2
from .videochat2 import VideoChat2  # noqa: E402

VideoChatV1.generate_batch = VideoChat2.generate_batch


def convert_videochat_state(vit_cfg: EVAGMHRAConfig, llm_cfg: LLMConfig,
                            sd: dict) -> tuple[QFormerConfig, dict]:
    """VideoChat-7B checkpoint layout (eva_vit names under
    ``visual_encoder.``, ``ln_vision``, LAVIS ``Qformer.bert.*`` +
    ``query_tokens``/``extra_query_tokens``, ``llama_proj``,
    ``llama_model.*``) -> our tree."""
    from ..mllm.llm import convert_torch_state

    if any("lmhra" in k for k in sd):
        raise NotImplementedError(
            "lmhra local-temporal convs are off in the deployed "
            "config_7b.json; this build supports the no_lmhra layout")

    def t(x):
        return np.asarray(x.detach().cpu().numpy()
                          if hasattr(x, "detach") else x)

    c = vit_cfg
    w = t(sd["visual_encoder.patch_embed.proj.weight"])
    if w.ndim == 5:        # Conv3d (D, 3, 1, P, P) with temporal k=1
        assert w.shape[2] == 1, "temporal_downsample unsupported (off in " \
            "config_7b.json)"
        w = w[:, :, 0]
    vp: dict = {
        "patch_embed": {"kernel": w.transpose(2, 3, 1, 0),
                        "bias": t(sd["visual_encoder.patch_embed.proj.bias"])},
        "cls_token": t(sd["visual_encoder.cls_token"]).reshape(-1),
        "pos_embed": t(sd["visual_encoder.pos_embed"])[0],
        "gmhra_cls_token": t(sd["visual_encoder.gmhra_cls_token"]
                             ).reshape(-1),
    }
    for i in range(c.depth):
        b = f"visual_encoder.blocks.{i}"
        vp[f"norm1_{i}"] = {"scale": t(sd[f"{b}.norm1.weight"]),
                            "bias": t(sd[f"{b}.norm1.bias"])}
        vp[f"qkv_{i}"] = {"kernel": t(sd[f"{b}.attn.qkv.weight"]).T}
        vp[f"q_bias_{i}"] = t(sd[f"{b}.attn.q_bias"])
        vp[f"v_bias_{i}"] = t(sd[f"{b}.attn.v_bias"])
        vp[f"proj_{i}"] = {"kernel": t(sd[f"{b}.attn.proj.weight"]).T,
                           "bias": t(sd[f"{b}.attn.proj.bias"])}
        vp[f"norm2_{i}"] = {"scale": t(sd[f"{b}.norm2.weight"]),
                            "bias": t(sd[f"{b}.norm2.bias"])}
        vp[f"fc1_{i}"] = {"kernel": t(sd[f"{b}.mlp.fc1.weight"]).T,
                          "bias": t(sd[f"{b}.mlp.fc1.bias"])}
        vp[f"fc2_{i}"] = {"kernel": t(sd[f"{b}.mlp.fc2.weight"]).T,
                          "bias": t(sd[f"{b}.mlp.fc2.bias"])}
    D = c.embed_dim
    for j in range(c.gmhra_layers):
        b = f"visual_encoder.gmhra.{j}"
        inw = t(sd[f"{b}.attn.in_proj_weight"])
        inb = t(sd[f"{b}.attn.in_proj_bias"])
        vp[f"g_q_{j}_k"] = inw[:D].T
        vp[f"g_q_{j}_b"] = inb[:D]
        vp[f"g_k_{j}_k"] = inw[D: 2 * D].T
        vp[f"g_k_{j}_b"] = inb[D: 2 * D]
        vp[f"g_v_{j}_k"] = inw[2 * D:].T
        vp[f"g_v_{j}_b"] = inb[2 * D:]
        vp[f"g_out_{j}_k"] = t(sd[f"{b}.attn.out_proj.weight"]).T
        vp[f"g_out_{j}_b"] = t(sd[f"{b}.attn.out_proj.bias"])
        # torch Conv3d (D, 1, 3, 3, 3) depthwise -> (3,3,3,1,D)
        vp[f"g_dpe_{j}_k"] = t(sd[f"{b}.dpe.weight"]).transpose(2, 3, 4, 1, 0)
        vp[f"g_dpe_{j}_b"] = t(sd[f"{b}.dpe.bias"])
        for src, dst in (("ln_1", f"g_ln1_{j}"), ("ln_2", f"g_ln2_{j}"),
                         ("ln_3", f"g_ln3_{j}")):
            vp[dst] = {"scale": t(sd[f"{b}.{src}.weight"]),
                       "bias": t(sd[f"{b}.{src}.bias"])}
        vp[f"g_fc1_{j}_k"] = t(sd[f"{b}.mlp.c_fc.weight"]).T
        vp[f"g_fc1_{j}_b"] = t(sd[f"{b}.mlp.c_fc.bias"])
        vp[f"g_fc2_{j}_k"] = t(sd[f"{b}.mlp.c_proj.weight"]).T
        vp[f"g_fc2_{j}_b"] = t(sd[f"{b}.mlp.c_proj.bias"])

    qsd = {k: v for k, v in sd.items() if k.startswith("Qformer.bert.")}
    qsd["query_tokens"] = np.concatenate(
        [t(sd["query_tokens"]), t(sd["extra_query_tokens"])], axis=1)
    qf_cfg, qparams = from_blip2_qformer(qsd)
    params: dict = {
        "vit": vp,
        "ln_vision": {"scale": t(sd["ln_vision.weight"]),
                      "bias": t(sd["ln_vision.bias"])},
        "qformer": qparams,
        "llama_proj": {"kernel": t(sd["llama_proj.weight"]).T,
                       "bias": t(sd["llama_proj.bias"])},
    }
    lsd = {k.removeprefix("llama_model."): v for k, v in sd.items()
           if k.startswith("llama_model.")}
    params["llm"] = convert_torch_state(llm_cfg, lsd)
    return qf_cfg, jax.tree_util.tree_map(jnp.asarray, params)


class VideoChatCaller(VideoChat2Caller):
    """v1 protocol == v2's ### conversation and sampling defaults
    (utils/videochat.py:59-76: 8 segments, do_sample t=1.0 top_p=0.9);
    only the encoder differs (no Q-Former instruction)."""

    def __init__(self, model: VideoChatV1, tokenizer, **kw):
        kw.pop("bert_tokenizer", None)
        super().__init__(model, tokenizer, None, **kw)

    @classmethod
    def from_checkpoints(cls, videochat_path: str, vit_path: str,
                         qformer_path: str, vicuna_path: str, *,
                         vit_cfg: EVAGMHRAConfig | None = None, **kw
                         ) -> "VideoChatCaller":
        """Assemble from real checkpoints (utils/videochat.py:21-31:
        eva_vit_g.pth + blip2_pretrained_flant5xxl.pth towers overlaid by
        videochat_7b.pth)."""
        import torch
        from transformers import AutoTokenizer, LlamaForCausalLM

        sd = {}
        d = torch.load(vit_path, map_location="cpu")
        sd.update({f"visual_encoder.{k}": v
                   for k, v in d.get("model", d).items()})
        d = torch.load(qformer_path, map_location="cpu")
        sd.update(d.get("model", d))
        hfl = LlamaForCausalLM.from_pretrained(vicuna_path)
        llm_cfg = LLMConfig.from_hf(hfl.config)
        for k, v in hfl.state_dict().items():
            sd.setdefault(f"llama_model.{k}", v)
        del hfl
        d = torch.load(videochat_path, map_location="cpu")
        sd.update(d.get("model", d))   # stage weights overwrite
        vit_cfg = vit_cfg or EVAGMHRAConfig()
        qf_cfg, params = convert_videochat_state(vit_cfg, llm_cfg, sd)
        model = VideoChatV1(vit_cfg, qf_cfg, llm_cfg, params)
        tok = AutoTokenizer.from_pretrained(vicuna_path, use_fast=False)
        return cls(model, tok, **kw)

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        out: list[str] = [""] * len(samples)
        key = (jax.random.PRNGKey(self.seed)
               if self.temperature > 0 else None)
        for i in range(0, len(samples), self.batch):
            grp = list(range(i, min(i + self.batch, len(samples))))
            pixels = np.stack([self.preprocess(self._load_frames(samples[j]))
                               for j in grp])
            embeds = self.model.video_embeds(pixels)
            lids, rids = zip(*[self._prompt_ids(prompts[j]) for j in grp])
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            texts = self.model.generate_batch(
                list(lids), list(rids), embeds, self.tok,
                max_new_tokens=self.max_new_tokens,
                temperature=self.temperature, top_p=self.top_p,
                prng_key=sub)
            for j, t in zip(grp, texts):
                t = t.split("###")[0].split("Assistant:")[-1].strip()
                out[j] = t.replace("\n", " ").replace("\t", " ").strip()
        return out
