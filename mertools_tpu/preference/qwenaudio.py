"""Qwen-Audio v1 (qwen-audio-chat) zero-shot judge.

Reference wrapper: ``MER2026/MER2026_Track3/utils/qwenaudio.py`` (1-44):
``from_list_format`` query (``Audio 1:<audio>{path}</audio>\\n{prompt}``),
``model.chat`` (ChatML), response flattening. NOTE: the model package
(`Qwen-main/qwen-audio-chat`, trust_remote_code) is NOT vendored in the
reference tree — this implementation follows the published Qwen-Audio
architecture (QwenLM/Qwen-Audio ``audio.py`` + ``modeling_qwen.py``):

- **audio tower**: Whisper-large-v2-style encoder adapted from openai
  whisper — conv1(3)/GELU/conv2(3, stride 2)/GELU, FIXED sinusoid
  positions (sin|cos concat), pre-LN blocks whose K projection has NO
  bias and whose q/k are scaled by (hd)^-0.25 each, ln_post — then an
  AvgPool1d(2,2) and a Linear projection to the LM width; trainable
  audio bos/eos embeddings bracket the features;
- splice: the tokenizer expands ``<audio>path</audio>`` into
  ``audio_start_tag + [pad]*(L+2) + audio_end_tag``; the model overwrites
  those L+2 pad positions with ``[bos_emb; features; eos_emb]``;
- **QWen v1 LM**: fused ``c_attn`` qkv WITH bias, bias-free ``c_proj``,
  RMSNorm ``ln_1``/``ln_2``, MLP ``c_proj(w1(x) * silu(w2(x)))`` — i.e.
  gate = w2, up = w1 in the shared LLM stack's terms; standard
  rotate-half rotary (dynamic-NTK and logn scaling only engage beyond
  the 2048-token training window — out of scope for judge prompts,
  documented);
- ChatML prompting (system "You are a helpful assistant.").

Runs on the shared KV-cached batched decode. Parity vs a hand-assembled
torch oracle in tests/test_qwenaudio.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..mllm.llm import LLM, LLMConfig

_P = jax.lax.Precision.HIGHEST

CHATML = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
          "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n")
QUERY_FORMAT = "Audio 1:<audio>{}</audio>\n{}"


def whisper_sinusoids(length: int, channels: int) -> np.ndarray:
    """openai-whisper sinusoids(): [sin | cos] concatenation."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=1).astype(np.float32)


@dataclass(frozen=True)
class QwenAudioTowerConfig:
    n_mels: int = 80
    n_ctx: int = 1500
    n_state: int = 1280
    n_head: int = 20
    n_layer: int = 32
    output_dim: int = 4096

    def audio_len(self, mel_frames: int) -> int:
        """Feature count after conv2(stride 2) + AvgPool1d(2, 2)."""
        after_conv = (mel_frames - 1) // 2 + 1    # conv k=3 s=2 p=1
        return after_conv // 2                    # AvgPool1d(2, 2)


class QwenAudioTower(nn.Module):
    """mel (B, n_mels, T) -> (B, audio_len(T), output_dim)."""

    cfg: QwenAudioTowerConfig
    precision: object = _P

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = jnp.swapaxes(mel, 1, 2)                    # (B, T, n_mels)
        x = nn.Conv(c.n_state, kernel_size=(3,), padding=[(1, 1)],
                    name="conv1", precision=self.precision)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(c.n_state, kernel_size=(3,), strides=(2,),
                    padding=[(1, 1)], name="conv2",
                    precision=self.precision)(x)
        x = jax.nn.gelu(x, approximate=False)
        pos = whisper_sinusoids(c.n_ctx, c.n_state)
        x = x + jnp.asarray(pos)[None, : x.shape[1]]
        nh = c.n_head
        hd = c.n_state // nh
        scale = hd ** -0.25
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, name=n)
        for i in range(c.n_layer):
            h = ln(f"attn_ln_{i}")(x)
            q = nn.Dense(c.n_state, name=f"q_{i}",
                         precision=self.precision)(h)
            k = nn.Dense(c.n_state, use_bias=False, name=f"k_{i}",
                         precision=self.precision)(h)
            v = nn.Dense(c.n_state, name=f"v_{i}",
                         precision=self.precision)(h)
            q = q.reshape(*h.shape[:2], nh, hd) * scale
            k = k.reshape(*h.shape[:2], nh, hd) * scale
            v = v.reshape(*h.shape[:2], nh, hd)
            att = jnp.einsum("bqnd,bknd->bnqk", q, k,
                             precision=self.precision)
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("bnqk,bknd->bqnd", att, v,
                           precision=self.precision)
            o = nn.Dense(c.n_state, name=f"out_{i}",
                         precision=self.precision)(
                o.reshape(*h.shape[:2], c.n_state))
            x = x + o
            h = ln(f"mlp_ln_{i}")(x)
            h = nn.Dense(4 * c.n_state, name=f"fc1_{i}",
                         precision=self.precision)(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(c.n_state, name=f"fc2_{i}",
                         precision=self.precision)(h)
            x = x + h
        x = ln("ln_post")(x)
        # AvgPool1d(2, 2) over time, then project to the LM width
        T2 = (x.shape[1] // 2) * 2
        x = x[:, :T2].reshape(x.shape[0], T2 // 2, 2, c.n_state).mean(2)
        x = (jnp.einsum("btd,dh->bth", x, self.param(
            "proj_kernel", nn.initializers.zeros,
            (c.n_state, c.output_dim)), precision=self.precision)
            + self.param("proj_bias", nn.initializers.zeros,
                         (c.output_dim,)))
        return x


class QwenAudio:
    """Batched TPU Qwen-Audio-Chat. ``params``: {tower, bos_eos (2, H),
    llm}."""

    def __init__(self, tcfg: QwenAudioTowerConfig, llm_cfg: LLMConfig,
                 params: dict):
        self.tcfg = tcfg
        self.llm_cfg = llm_cfg
        self.params = params
        self._tower = QwenAudioTower(tcfg)
        self._llm = LLM(llm_cfg)
        self._encode = jax.jit(lambda p, mel: self._tower.apply(
            {"params": p["tower"]}, mel))
        self._forward = jax.jit(
            lambda p, emb, mask: self._llm.apply(
                {"params": p["llm"]}, emb, attention_mask=mask))

    def audio_features(self, mel: np.ndarray) -> np.ndarray:
        """(B, n_mels, T) -> (B, audio_len, H_llm)."""
        return np.asarray(self._encode(self.params, jnp.asarray(mel)))

    def splice_embeds(self, ids: np.ndarray, feats: np.ndarray,
                      pad_id: int) -> np.ndarray:
        """Rows' audio-pad positions <- [bos_emb; features; eos_emb]
        (published modeling_qwen.py audio injection)."""
        table = np.asarray(self.params["llm"]["embed_tokens"]["embedding"])
        bos_eos = np.asarray(self.params["bos_eos"])
        emb = table[np.where(ids == pad_id, 0, ids)].astype(np.float32)
        for b in range(ids.shape[0]):
            pos = np.where(ids[b] == pad_id)[0]
            n = len(pos)
            assert n == feats.shape[1] + 2, (n, feats.shape)
            emb[b, pos[0]] = bos_eos[0]
            emb[b, pos[1:-1]] = feats[b]
            emb[b, pos[-1]] = bos_eos[1]
        return emb

    def forward_logits(self, ids: np.ndarray, mel: np.ndarray,
                       mask: np.ndarray, pad_id: int) -> np.ndarray:
        feats = self.audio_features(mel)
        emb = self.splice_embeds(ids, feats, pad_id)
        return np.asarray(self._forward(self.params, jnp.asarray(emb),
                                        jnp.asarray(mask)))

    def generate_batch(self, ids_list: list, mel: np.ndarray, tokenizer,
                       pad_id: int, *, max_new_tokens: int = 256,
                       temperature: float = 0.0, top_p: float = 0.8,
                       prng_key=None) -> list[str]:
        from ..mllm.generate import bucket_len, generate

        B = len(ids_list)
        feats = self.audio_features(mel)
        S = bucket_len(max(len(x) for x in ids_list))
        ids = np.zeros((B, S), np.int32)
        mask = np.zeros((B, S), np.int32)
        for i, x in enumerate(ids_list):
            ids[i, : len(x)] = x
            mask[i, : len(x)] = 1
        emb = self.splice_embeds(ids, feats, pad_id) * mask[..., None]
        eos = tokenizer.eos_token_id
        toks = np.asarray(generate(
            self.llm_cfg, self.params["llm"], jnp.asarray(emb),
            jnp.asarray(mask), max_new_tokens=max_new_tokens,
            temperature=temperature, top_p=top_p,
            eos_token_id=eos if eos is not None else -1, prng_key=prng_key))
        out = []
        for row in toks:
            stop = np.where(row == eos)[0] if eos is not None else []
            row = row[: stop[0]] if len(stop) else row
            out.append(tokenizer.decode(row, skip_special_tokens=True))
        return out


def convert_qwen_v1_llm(cfg: LLMConfig, sd: dict, prefix: str = "transformer."
                        ) -> dict:
    """Published QWen v1 layout -> the shared LLM stack: fused c_attn
    split into q/k/v (bias kept), c_proj -> o_proj (no bias), ln_1/ln_2
    RMSNorms, MLP gate = w2 / up = w1 / down = mlp.c_proj, wte/ln_f."""
    def t(x):
        return np.asarray(x.detach().cpu().numpy()
                          if hasattr(x, "detach") else x)

    H = cfg.hidden_size
    p: dict = {
        "embed_tokens": {"embedding": t(sd[f"{prefix}wte.weight"])},
        "norm": {"weight": t(sd[f"{prefix}ln_f.weight"])},
        "lm_head": {"kernel": t(sd["lm_head.weight"]).T},
    }
    for i in range(cfg.num_layers):
        lp = f"{prefix}h.{i}"
        w = t(sd[f"{lp}.attn.c_attn.weight"])       # (3H, H)
        b = t(sd[f"{lp}.attn.c_attn.bias"])
        p[f"layer_{i}"] = {
            "input_layernorm": {"weight": t(sd[f"{lp}.ln_1.weight"])},
            "post_attention_layernorm": {
                "weight": t(sd[f"{lp}.ln_2.weight"])},
            "q_proj": {"kernel": w[:H].T, "bias": b[:H]},
            "k_proj": {"kernel": w[H: 2 * H].T, "bias": b[H: 2 * H]},
            "v_proj": {"kernel": w[2 * H:].T, "bias": b[2 * H:]},
            "o_proj": {"kernel": t(sd[f"{lp}.attn.c_proj.weight"]).T},
            "gate_proj": {"kernel": t(sd[f"{lp}.mlp.w2.weight"]).T},
            "up_proj": {"kernel": t(sd[f"{lp}.mlp.w1.weight"]).T},
            "down_proj": {"kernel": t(sd[f"{lp}.mlp.c_proj.weight"]).T},
        }
    return jax.tree_util.tree_map(jnp.asarray, p)


def convert_qwenaudio_state(tcfg: QwenAudioTowerConfig, llm_cfg: LLMConfig,
                            sd: dict) -> dict:
    """Published Qwen-Audio checkpoint layout (``transformer.audio.*``
    whisper-style tower + ``transformer.{wte,h.N,ln_f}`` + lm_head)."""
    def t(x):
        return np.asarray(x.detach().cpu().numpy()
                          if hasattr(x, "detach") else x)

    a = "transformer.audio."
    tp: dict = {
        "conv1": {"kernel": t(sd[f"{a}conv1.weight"]).transpose(2, 1, 0),
                  "bias": t(sd[f"{a}conv1.bias"])},
        "conv2": {"kernel": t(sd[f"{a}conv2.weight"]).transpose(2, 1, 0),
                  "bias": t(sd[f"{a}conv2.bias"])},
        "ln_post": {"scale": t(sd[f"{a}ln_post.weight"]),
                    "bias": t(sd[f"{a}ln_post.bias"])},
        "proj_kernel": t(sd[f"{a}proj.weight"]).T,
        "proj_bias": t(sd[f"{a}proj.bias"]),
    }
    for i in range(tcfg.n_layer):
        b = f"{a}blocks.{i}"
        tp[f"attn_ln_{i}"] = {"scale": t(sd[f"{b}.attn_ln.weight"]),
                              "bias": t(sd[f"{b}.attn_ln.bias"])}
        tp[f"q_{i}"] = {"kernel": t(sd[f"{b}.attn.query.weight"]).T,
                        "bias": t(sd[f"{b}.attn.query.bias"])}
        tp[f"k_{i}"] = {"kernel": t(sd[f"{b}.attn.key.weight"]).T}
        tp[f"v_{i}"] = {"kernel": t(sd[f"{b}.attn.value.weight"]).T,
                        "bias": t(sd[f"{b}.attn.value.bias"])}
        tp[f"out_{i}"] = {"kernel": t(sd[f"{b}.attn.out.weight"]).T,
                          "bias": t(sd[f"{b}.attn.out.bias"])}
        tp[f"mlp_ln_{i}"] = {"scale": t(sd[f"{b}.mlp_ln.weight"]),
                             "bias": t(sd[f"{b}.mlp_ln.bias"])}
        tp[f"fc1_{i}"] = {"kernel": t(sd[f"{b}.mlp.0.weight"]).T,
                          "bias": t(sd[f"{b}.mlp.0.bias"])}
        tp[f"fc2_{i}"] = {"kernel": t(sd[f"{b}.mlp.2.weight"]).T,
                          "bias": t(sd[f"{b}.mlp.2.bias"])}
    params = {"tower": tp,
              "bos_eos": t(sd[f"{a}audio_bos_eos_token.weight"]),
              "llm": convert_qwen_v1_llm(llm_cfg, sd)}
    return jax.tree_util.tree_map(jnp.asarray, params)


class QwenAudioCaller:
    """utils/qwenaudio.py protocol: from_list_format query + ChatML chat,
    response flattening. Audio tags expand to
    ``audio_start + [pad]*(L+2) + audio_end``."""

    def __init__(self, model: QwenAudio, tokenizer, *, batch: int = 4,
                 max_new_tokens: int = 256, temperature: float = 0.0,
                 top_p: float = 0.8, seed: int = 0,
                 audio_pad_id: int | None = None,
                 audio_start: str = "<audio>", audio_end: str = "</audio>",
                 n_mels_chunk: int = 3000):
        self.model = model
        self.tok = tokenizer
        self.batch = batch
        self.max_new_tokens = max_new_tokens
        self.temperature = float(temperature)
        self.top_p = top_p
        self.seed = seed
        self.audio_pad_id = audio_pad_id if audio_pad_id is not None else \
            getattr(tokenizer, "audio_pad_id", 0)
        self.audio_start = audio_start
        self.audio_end = audio_end
        self.n_mels_chunk = n_mels_chunk

    def _load_mel(self, sample: dict) -> np.ndarray:
        from ..ops.mel import log_mel_spectrogram, pad_or_trim

        if "wav" in sample:
            w = np.asarray(sample["wav"], np.float32)
        else:
            from ..io.wav import read_wav_16k

            w = read_wav_16k(sample["audio_path"])
        w = pad_or_trim(w, self.n_mels_chunk * 160)
        return np.asarray(log_mel_spectrogram(
            w[None], n_mels=self.model.tcfg.n_mels))[0]

    def prompt_ids(self, prompt: str, audio_len: int) -> np.ndarray:
        query = QUERY_FORMAT.format("audio.wav", prompt)
        left, rest = CHATML.format(query).split(self.audio_start)
        _, right = rest.split(self.audio_end)
        lids = self.tok(left, add_special_tokens=False).input_ids
        rids = self.tok(right, add_special_tokens=False).input_ids
        pads = [self.audio_pad_id] * (audio_len + 2)
        return np.asarray(list(lids) + pads + list(rids), np.int32)

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        out: list[str] = [""] * len(samples)
        key = (jax.random.PRNGKey(self.seed)
               if self.temperature > 0 else None)
        audio_len = self.model.tcfg.audio_len(self.n_mels_chunk)
        for i in range(0, len(samples), self.batch):
            grp = list(range(i, min(i + self.batch, len(samples))))
            mel = np.stack([self._load_mel(samples[j]) for j in grp])
            ids = [self.prompt_ids(prompts[j], audio_len) for j in grp]
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            texts = self.model.generate_batch(
                ids, mel, self.tok, self.audio_pad_id,
                max_new_tokens=self.max_new_tokens,
                temperature=self.temperature, top_p=self.top_p,
                prng_key=sub)
            for j, txt in zip(grp, texts):
                # utils/qwenaudio.py:40-41 response flattening
                out[j] = txt.replace("\n", " ").replace("\t", " ").strip()
        return out

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        return self([{"audio_path": audio_path}], [prompt])[0]
