"""SALMONN zero-shot audio-LLM judge — the window-level Q-Former family.

Reference: ``MER2026/MER2026_Track3/utils/salmonn.py`` wrapping the vendored
``MER2025_Track23/SALMONN/model.py``. Architecture (model.py:31-259):

- Whisper-large-v2 ENCODER on the 30 s log-mel -> (B, 1500, 1280), LayerNorm
  (``ln_speech``);
- BEATs on the raw wav -> (B, T', 768), LayerNorm (``ln_audio``), zero-pad
  to 1500 frames; concat -> (B, 1500, 2048);
- WINDOW-LEVEL Q-Former (model.py:163-186): the 1500-frame stream splits
  into ~0.33 s windows (kernel = stride = round(1500/30 * 0.333) = 17, the
  trailing remainder dropped — F.unfold with kernel == stride is a plain
  reshape); a 2-layer BLIP-2-style Q-Former with ONE query runs per window
  (cross-attention width 2048), giving one token per window -> (B, 88, 768);
- ``speech_llama_proj`` 768 -> LLM width; splice between the tokenized
  halves of ``USER: <Speech><SpeechHere></Speech> {prompt}\\nASSISTANT:``
  with a BOS embedding in front (model.py:190-226);
- Vicuna LLM with LoRA on q/v (peft default target modules), generate.

TPU-native re-design: every stage is a batched jitted computation (the
reference loops sample-by-sample with a try/except); decoding rides the
shared ``mllm/generate.generate`` (``num_beams=1``) or the HF-semantics
beam engine ``mllm/beam.beam_generate``. The caller defaults reproduce the
reference protocol ``num_beams=4, do_sample=True, top_p=0.9,
temperature=1.0, length_penalty=1.0, min_length=1`` (model.py:118-132) —
beam sampling is seed-reproducible, not bit-equal to torch's RNG stream
(the deterministic beam machinery is HF-EXACT, tests/test_beam.py).

Conversion: a SALMONN checkpoint stores the trainable params (Q-Former,
projection, LoRA, ln_speech/ln_audio); the frozen towers load from their
own checkpoints (Whisper HF, BEATs fairseq, Vicuna HF) — see
:meth:`SalmonnCaller.from_checkpoints`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..encoders.beats import BEATsConfig, BEATsEncoder, beats_fbank
from ..encoders.whisper import WhisperConfig, WhisperEncoder
from ..mllm.llm import LLMConfig
from ..mllm.qformer import QFormer, QFormerConfig
from ..ops.mel import log_mel_spectrogram, pad_or_trim

PROMPT_PATTERN = "USER: <Speech><SpeechHere></Speech> {}\nASSISTANT:"
SECOND_PER_FRAME = 1.0 / 3.0     # model.py second_per_frame=0.333333


def salmonn_qformer_config(enc_width_hidden: int = 768,
                           num_layers: int = 2) -> QFormerConfig:
    """init_speech_Qformer (model.py:243-259): BertLMHeadModel defaults
    (768/12/3072), ``num_query_token=1``, cross-attention every layer,
    encoder width = whisper + beats (2048)."""
    return QFormerConfig(num_queries=1, hidden_size=enc_width_hidden,
                         num_layers=num_layers, num_heads=12,
                         intermediate_size=3072, cross_attention_freq=1,
                         project_encoder=False, query_layernorm=True)


@dataclass
class SalmonnModel:
    whisper_cfg: WhisperConfig
    beats_cfg: BEATsConfig
    qf_cfg: QFormerConfig
    llm_cfg: LLMConfig
    params: dict        # {whisper, ln_speech, beats, ln_audio, qformer,
    #                      proj, llm}
    n_mels: int = 80

    def __post_init__(self):
        wenc = WhisperEncoder(self.whisper_cfg)
        benc = BEATsEncoder(self.beats_cfg)
        qf = QFormer(self.qf_cfg)
        n_frames = self.whisper_cfg.max_source_positions  # 1500

        kernel = round(n_frames * SECOND_PER_FRAME / 30.0)
        self.n_windows = (n_frames - kernel) // kernel + 1
        self.kernel = kernel

        @jax.jit
        def encode(p, mel, fbank):
            speech = wenc.apply({"params": p["whisper"]}, mel)
            speech = _ln(p["ln_speech"], speech)           # (B, 1500, 1280)
            audio = benc.apply({"params": p["beats"]}, fbank)
            audio = _ln(p["ln_audio"], audio)              # (B, Ta, 768)
            pad = speech.shape[1] - audio.shape[1]
            if pad > 0:
                audio = jnp.pad(audio, ((0, 0), (0, pad), (0, 0)))
            else:
                audio = audio[:, : speech.shape[1]]
            x = jnp.concatenate([speech, audio], axis=-1)  # (B, 1500, 2048)
            B = x.shape[0]
            n, k = self.n_windows, self.kernel
            win = x[:, : n * k].reshape(B * n, k, x.shape[-1])
            q = qf.apply({"params": p["qformer"]}, win)    # (B*n, 1, 768)
            q = q.reshape(B, n, -1)
            h = jnp.einsum("bnd,dh->bnh", q, p["proj"]["kernel"],
                           precision=jax.lax.Precision.HIGHEST)
            return h + p["proj"]["bias"]

        self._encode = encode

    def speech_embeds(self, wavs: np.ndarray) -> np.ndarray:
        """(B, 480000) float32 16 kHz (already 30 s padded/trimmed) ->
        (B, n_windows, H_llm)."""
        mel = log_mel_spectrogram(jnp.asarray(wavs), n_mels=self.n_mels)
        fbank = beats_fbank(wavs)
        return np.asarray(self._encode(self.params, mel, fbank))

    def generate_batch(self, prompts: list[str], wavs: np.ndarray,
                       tokenizer, *, max_new_tokens: int = 200,
                       temperature: float = 0.0, top_p: float = 0.9,
                       num_beams: int = 1, length_penalty: float = 1.0,
                       seed: int = 0, prng_key=None) -> list[str]:
        """Per-sample prompt splice [bos, left, speech, right] (model.py:
        190-226), right-padded batch, shared batched decode; ``num_beams>1``
        runs HF-semantics beam search/sampling (the reference protocol)."""
        from ..mllm.generate import bucket_len, generate

        B = len(prompts)
        speech = self.speech_embeds(wavs)                 # (B, n_win, H)
        table = np.asarray(self.params["llm"]["embed_tokens"]["embedding"])
        bos = table[tokenizer.bos_token_id]
        rows, lens = [], []
        for i, prompt in enumerate(prompts):
            left, right = PROMPT_PATTERN.format(prompt).split("<SpeechHere>")
            lids = tokenizer(left, add_special_tokens=False).input_ids
            rids = tokenizer(right, add_special_tokens=False).input_ids
            emb = np.concatenate([bos[None], table[lids], speech[i],
                                  table[rids]], axis=0)
            rows.append(emb)
            lens.append(len(emb))
        S = bucket_len(max(lens))
        H = rows[0].shape[-1]
        embeds = np.zeros((B, S, H), np.float32)
        mask = np.zeros((B, S), np.int32)
        for i, emb in enumerate(rows):
            embeds[i, : len(emb)] = emb
            mask[i, : len(emb)] = 1
        eos = tokenizer.eos_token_id
        if num_beams > 1:
            from ..mllm.beam import beam_generate

            rows_out = beam_generate(
                self.llm_cfg, self.params["llm"], jnp.asarray(embeds),
                jnp.asarray(mask), num_beams=num_beams,
                max_new_tokens=max_new_tokens,
                eos_token_id=eos if eos is not None else -1,
                length_penalty=length_penalty,
                do_sample=temperature > 0, temperature=temperature,
                top_p=top_p, min_new_tokens=1, seed=seed)
            toks = [np.asarray(r, np.int64) for r in rows_out]
        else:
            toks = np.asarray(generate(
                self.llm_cfg, self.params["llm"], jnp.asarray(embeds),
                jnp.asarray(mask), max_new_tokens=max_new_tokens,
                temperature=temperature, top_p=top_p,
                eos_token_id=eos if eos is not None else -1,
                prng_key=prng_key))
        out = []
        for row in toks:
            stop = np.where(row == eos)[0] if eos is not None else []
            row = row[: stop[0]] if len(stop) else row
            out.append(tokenizer.decode(row, skip_special_tokens=True))
        return out


def _ln(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def convert_salmonn_trainables(sd: dict, llm_params: dict) -> dict:
    """SALMONN checkpoint ``model`` dict (trainable-only: ln_speech/
    ln_audio, speech_Qformer.*, speech_query_tokens, speech_llama_proj,
    LoRA) -> the corresponding param subtrees; LoRA leaves are merged into
    ``llm_params`` (peft naming ``llama_model.base_model.model.model.
    layers.N.self_attn.{q,v}_proj.lora_{A,B}.weight``)."""
    from ..mllm.qformer import from_blip2_qformer

    def t(x):
        return np.asarray(x.detach().cpu().numpy()
                          if hasattr(x, "detach") else x)

    out = {}
    out["ln_speech"] = {"scale": t(sd["ln_speech.weight"]),
                        "bias": t(sd["ln_speech.bias"])}
    out["ln_audio"] = {"scale": t(sd["ln_audio.weight"]),
                       "bias": t(sd["ln_audio.bias"])}
    qsd = {k.removeprefix("speech_Qformer.bert.").replace(
        "speech_Qformer.bert.", ""): v
        for k, v in sd.items() if k.startswith("speech_Qformer.bert.")}
    qsd = {f"Qformer.bert.{k}": v for k, v in qsd.items()}
    qsd["query_tokens"] = sd["speech_query_tokens"]
    _, out["qformer"] = from_blip2_qformer(qsd)
    out["proj"] = {"kernel": t(sd["speech_llama_proj.weight"]).T,
                   "bias": t(sd["speech_llama_proj.bias"])}

    lora = {k: v for k, v in sd.items() if "lora_" in k}
    for k, v in lora.items():
        # ...model.layers.{i}.self_attn.{q|v}_proj.lora_{A|B}.weight
        parts = k.split(".")
        li = parts[parts.index("layers") + 1]
        pj = parts[parts.index("self_attn") + 1]
        which = "lora_a" if ".lora_A." in k else "lora_b"
        layer = llm_params[f"layer_{li}"]
        layer.setdefault(pj, {})
        # peft stores (r, in) for A and (out, r) for B; our layout is
        # (in, r) and (r, out)
        layer[pj][which] = t(v).T
    return out


class SalmonnCaller:
    """Unified judge wrapper: reference sample-wise
    ``func_calling_sample(audio, video, prompt, input_type)``
    (utils/salmonn.py:42-55: 30 s truncation, response flattening, empty
    string on failure) + the batched ``caller(samples, prompts)`` protocol
    of ``PreferenceJudge``."""

    def __init__(self, model: SalmonnModel, tokenizer, batch: int = 4,
                 max_new_tokens: int = 200, temperature: float = 1.0,
                 top_p: float = 0.9, num_beams: int = 4,
                 length_penalty: float = 1.0, seed: int = 0):
        """Defaults reproduce the reference decode protocol
        (model.py:118-132: num_beams=4, do_sample=True, temperature=1.0,
        top_p=0.9, length_penalty=1.0; wrapper max_length=300 ->
        max_new_tokens bounded by the same budget). ``num_beams=1,
        temperature=0`` gives deterministic greedy decode."""
        self.model = model
        self.tok = tokenizer
        self.batch = batch
        self.max_new_tokens = max_new_tokens
        self.temperature = float(temperature)
        self.top_p = top_p
        self.num_beams = int(num_beams)
        self.length_penalty = float(length_penalty)
        self.seed = seed

    @classmethod
    def from_checkpoints(cls, ckpt_path: str, whisper_path: str,
                         beats_path: str, vicuna_path: str, **kw):
        """Assemble from real checkpoints (model.py:52-118 layout); the
        recipe a networked host runs — every converter is oracle-tested."""
        import torch
        from transformers import (AutoTokenizer, LlamaForCausalLM,
                                  WhisperModel)

        from ..encoders.beats import convert_beats_state
        from ..encoders.whisper import from_hf_torch as whisper_from_hf
        from ..mllm.llm import convert_torch_state as convert_llm

        hfw = WhisperModel.from_pretrained(whisper_path)
        wcfg, wparams = whisper_from_hf(hfw)
        del hfw
        bs = torch.load(beats_path, map_location="cpu")
        bcfg = BEATsConfig.from_fairseq(bs["cfg"])
        bparams = convert_beats_state(bcfg, bs["model"])
        hfl = LlamaForCausalLM.from_pretrained(vicuna_path)
        lcfg = LLMConfig.from_hf(hfl.config)
        lcfg = type(lcfg)(**{**lcfg.__dict__, "lora_r": 8, "lora_alpha": 32})
        lparams = convert_llm(lcfg, hfl.state_dict())
        del hfl
        sd = torch.load(ckpt_path, map_location="cpu")["model"]
        trained = convert_salmonn_trainables(sd, lparams)
        params = {"whisper": wparams["encoder"], "beats": bparams,
                  "llm": lparams, **trained}
        model = SalmonnModel(wcfg, bcfg, salmonn_qformer_config(),
                             lcfg, params)
        tok = AutoTokenizer.from_pretrained(vicuna_path, use_fast=False)
        return cls(model, tok, **kw)

    def _load_wav(self, sample: dict) -> np.ndarray:
        if "wav" in sample:
            w = np.asarray(sample["wav"], np.float32)
        else:
            from ..io.wav import read_wav_16k

            w = read_wav_16k(sample["audio_path"])
        return w[: 30 * 16000]  # salmonn.py:30s truncation

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        chunk = self.model.whisper_cfg.max_source_positions * 2 * 160
        out: list[str] = [""] * len(samples)
        key = (jax.random.PRNGKey(self.seed)
               if self.temperature > 0 else None)
        for i in range(0, len(samples), self.batch):
            grp = list(range(i, min(i + self.batch, len(samples))))
            wavs = np.stack([pad_or_trim(self._load_wav(samples[j]), chunk)
                             for j in grp])
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            texts = self.model.generate_batch(
                [prompts[j] for j in grp], wavs, self.tok,
                max_new_tokens=self.max_new_tokens,
                temperature=self.temperature, top_p=self.top_p,
                num_beams=self.num_beams,
                length_penalty=self.length_penalty,
                seed=self.seed * 1000003 + i, prng_key=sub)
            for j, txt in zip(grp, texts):
                # reference response flattening (utils/salmonn.py:48-49)
                out[j] = txt.replace("\n", " ").replace("\t", " ").strip()
        return out

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        try:
            return self([{"audio_path": audio_path}], [prompt])[0]
        except Exception:  # noqa: BLE001 (utils/salmonn.py:44-51)
            return ""
