"""SALMONN judge parity vs an assembled torch oracle.

No SALMONN implementation ships in this image, so the oracle below follows
the vendored reference model exactly (MER2025_Track23/SALMONN/model.py:
119-246): HF Whisper encoder -> ln_speech; BEATs (the original-architecture
torch oracle from test_beats) -> ln_audio -> zero-pad to the Whisper frame
count; concat; kernel==stride window unfold; one-query 2-layer Q-Former
(HF Blip2QFormerModel, proven LAVIS-equivalent in test_qformer_blip2);
linear proj; [bos, left, speech, right] prompt splice; LoRA-merged LLaMA
greedy decode. Both sides consume identical mel/fbank tensors (featurizer
parity is covered by test_mel / test_whisper_parity / test_beats).

Documented protocol deviation (salmonn.py docstring): the reference
generates with num_beams=4; parity here is greedy (num_beams=1), the
supported decode mode.
"""

from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax

from test_beats import CFG as BEATS_CFG
from test_beats import _fairseq_sd, _TorchBEATs

from mertools_tpu.encoders.beats import beats_fbank
from mertools_tpu.mllm.qformer import QFormerConfig
from mertools_tpu.ops.mel import log_mel_spectrogram
from mertools_tpu.preference.salmonn import (PROMPT_PATTERN, SalmonnCaller,
                                             SalmonnModel,
                                             convert_salmonn_trainables)

LORA_R, LORA_ALPHA = 4, 32.0
N_MELS = 8


class _Tok:
    bos_token_id = 1
    eos_token_id = 2

    def __call__(self, text, add_special_tokens=False):
        ids = [3 + (b % 60) for b in text.encode()][:10]
        return SimpleNamespace(input_ids=ids)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{int(i)}" for i in ids)


def _tiny_whisper():
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperModel

    cfg = HFWhisperConfig(
        d_model=16, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_layers=1, decoder_attention_heads=2,
        decoder_ffn_dim=32, num_mel_bins=N_MELS, max_source_positions=90,
        max_target_positions=16, vocab_size=51, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, decoder_start_token_id=3)
    torch.manual_seed(0)
    return WhisperModel(cfg).eval()


def _tiny_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=64, max_position_embeddings=256,
                      attention_dropout=0.0)
    torch.manual_seed(1)
    return LlamaForCausalLM(cfg).eval()


def _qformer_lavis_sd():
    """HF Blip2QFormerModel (24-wide, 2 layers, 1 query) with its keys
    renamed to the LAVIS BertLMHeadModel layout the SALMONN checkpoint
    stores (speech_Qformer.bert.* — model.py:247-259)."""
    from transformers import Blip2QFormerConfig, Blip2QFormerModel

    cfg = Blip2QFormerConfig(
        vocab_size=30, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        encoder_hidden_size=16 + BEATS_CFG.encoder_embed_dim,
        cross_attention_frequency=1)
    torch.manual_seed(2)
    model = Blip2QFormerModel(cfg).eval()
    sd = {}
    for k, v in model.state_dict().items():
        k = k.replace(".attention.attention.", ".attention.self.")
        k = k.replace(".crossattention.attention.", ".crossattention.self.")
        if k.startswith("layernorm."):
            k = k.replace("layernorm.", "embeddings.LayerNorm.")
        sd[f"speech_Qformer.bert.{k}"] = v
    return model, sd


@pytest.fixture(scope="module")
def oracle_and_ours():
    from mertools_tpu.encoders.beats import convert_beats_state
    from mertools_tpu.encoders.whisper import WhisperConfig
    from mertools_tpu.encoders.whisper import from_hf_torch as whisper_from_hf
    from mertools_tpu.mllm.llm import LLMConfig, convert_torch_state

    g = torch.Generator().manual_seed(3)
    hfw = _tiny_whisper()
    wcfg, wparams = whisper_from_hf(hfw)
    assert isinstance(wcfg, WhisperConfig)

    torch.manual_seed(4)
    beats = _TorchBEATs(BEATS_CFG).eval()
    bparams = convert_beats_state(BEATS_CFG, _fairseq_sd(beats))

    qf_torch, sd = _qformer_lavis_sd()
    H_enc = 16 + BEATS_CFG.encoder_embed_dim  # whisper d_model + beats dim

    hfl = _tiny_llama()
    lcfg = LLMConfig.from_hf(hfl.config, lora_r=LORA_R)
    lcfg = type(lcfg)(**{**lcfg.__dict__, "lora_alpha": LORA_ALPHA})
    lparams = convert_torch_state(lcfg, hfl.state_dict())

    # SALMONN trainables: layernorms, query token, proj, LoRA on q/v
    sd["ln_speech.weight"] = torch.randn(16, generator=g) * 0.1 + 1.0
    sd["ln_speech.bias"] = torch.randn(16, generator=g) * 0.1
    sd["ln_audio.weight"] = (torch.randn(BEATS_CFG.encoder_embed_dim,
                                         generator=g) * 0.1 + 1.0)
    sd["ln_audio.bias"] = torch.randn(BEATS_CFG.encoder_embed_dim,
                                      generator=g) * 0.1
    sd["speech_query_tokens"] = torch.randn(1, 1, 24, generator=g) * 0.5
    sd["speech_llama_proj.weight"] = torch.randn(32, 24, generator=g) * 0.2
    sd["speech_llama_proj.bias"] = torch.randn(32, generator=g) * 0.1
    lora = {}
    for i in range(2):
        # q_proj out = H (32); v_proj out = num_kv_heads * head_dim (16)
        for pj, out_dim in (("q_proj", 32), ("v_proj", 16)):
            base = (f"llama_model.base_model.model.model.layers.{i}"
                    f".self_attn.{pj}")
            lora[f"{base}.lora_A.weight"] = (
                torch.randn(LORA_R, 32, generator=g) * 0.05)
            lora[f"{base}.lora_B.weight"] = (
                torch.randn(out_dim, LORA_R, generator=g) * 0.05)
    sd.update(lora)

    trained = convert_salmonn_trainables(sd, lparams)
    params = {"whisper": wparams["encoder"], "beats": bparams,
              "llm": lparams, **trained}
    qf_cfg = QFormerConfig(num_queries=1, hidden_size=24, num_layers=2,
                           num_heads=2, intermediate_size=48,
                           cross_attention_freq=1, project_encoder=False,
                           query_layernorm=True)
    ours = SalmonnModel(wcfg, BEATS_CFG, qf_cfg, lcfg, params,
                        n_mels=N_MELS)

    # torch oracle pieces, LoRA merged into the base q/v weights
    # (peft scaling = alpha / r; side-path == merged to fp tolerance)
    with torch.no_grad():
        for i, layer in enumerate(hfl.model.layers):
            for pj in ("q_proj", "v_proj"):
                base = (f"llama_model.base_model.model.model.layers.{i}"
                        f".self_attn.{pj}")
                delta = (LORA_ALPHA / LORA_R) * (
                    sd[f"{base}.lora_B.weight"] @ sd[f"{base}.lora_A.weight"])
                getattr(layer.self_attn, pj).weight += delta

    oracle = SimpleNamespace(whisper=hfw, beats=beats, qf=qf_torch,
                             llama=hfl, sd=sd)
    return oracle, ours


def _oracle_speech_embeds(o, mel, fbank):
    """model.py:147-189 verbatim flow (batched)."""
    sd = o.sd
    with torch.no_grad():
        speech = o.whisper.encoder(torch.from_numpy(mel)).last_hidden_state
        speech = torch.nn.functional.layer_norm(
            speech, (speech.shape[-1],), sd["ln_speech.weight"],
            sd["ln_speech.bias"])
        audio = o.beats(torch.from_numpy(fbank))
        audio = torch.nn.functional.layer_norm(
            audio, (audio.shape[-1],), sd["ln_audio.weight"],
            sd["ln_audio.bias"])
        audio = torch.nn.functional.pad(
            audio, (0, 0, 0, speech.size(1) - audio.size(1)))
        x = torch.cat([speech, audio], dim=-1)       # (B, T, 32)
        B, T, C = x.shape
        kernel = round(T * (1.0 / 3.0) / 30.0)
        xt = x.transpose(1, 2).unsqueeze(2)          # (B, C, 1, T)
        ov = torch.nn.functional.unfold(
            xt, kernel_size=(1, kernel), stride=(1, kernel))
        L = ov.shape[-1]
        ov = ov.view(B, C, kernel, L).permute(0, 3, 2, 1)
        win = ov.reshape(-1, kernel, C)              # (B*L, kernel, C)
        qt = sd["speech_query_tokens"].expand(win.shape[0], -1, -1)
        q = o.qf(query_embeds=qt, encoder_hidden_states=win,
                 encoder_attention_mask=torch.ones(win.shape[:-1],
                                                   dtype=torch.long)
                 ).last_hidden_state                 # (B*L, 1, 24)
        h = torch.nn.functional.linear(q, sd["speech_llama_proj.weight"],
                                       sd["speech_llama_proj.bias"])
        return h.view(B, L, -1).numpy()


def test_speech_embeds_parity(oracle_and_ours):
    o, ours = oracle_and_ours
    rng = np.random.default_rng(0)
    chunk = ours.whisper_cfg.max_source_positions * 2 * 160  # 28800
    wavs = (0.1 * rng.normal(size=(2, chunk))).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(wavs, n_mels=N_MELS))
    fbank = np.asarray(beats_fbank(wavs))
    ref = _oracle_speech_embeds(o, mel, fbank)
    got = ours.speech_embeds(wavs)
    assert got.shape == ref.shape == (2, 90, 32)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_generate_matches_oracle_greedy(oracle_and_ours):
    o, ours = oracle_and_ours
    tok = _Tok()
    rng = np.random.default_rng(1)
    chunk = ours.whisper_cfg.max_source_positions * 2 * 160
    wavs = (0.1 * rng.normal(size=(2, chunk))).astype(np.float32)
    prompts = ["is a1 or a2 better?", "pick"]
    max_new = 8

    got = ours.generate_batch(prompts, wavs, tok, max_new_tokens=max_new,
                              temperature=0.0)

    mel = np.asarray(log_mel_spectrogram(wavs, n_mels=N_MELS))
    fbank = np.asarray(beats_fbank(wavs))
    speech = _oracle_speech_embeds(o, mel, fbank)
    emb_table = o.llama.model.embed_tokens.weight.detach()
    want = []
    for i, prompt in enumerate(prompts):
        left, right = PROMPT_PATTERN.format(prompt).split("<SpeechHere>")
        lids = tok(left).input_ids
        rids = tok(right).input_ids
        cur = torch.cat([emb_table[[tok.bos_token_id]],
                         emb_table[lids],
                         torch.from_numpy(speech[i]),
                         emb_table[rids]])[None]
        ids = []
        with torch.no_grad():
            for _ in range(max_new):
                logits = o.llama(inputs_embeds=cur).logits
                nxt = int(logits[0, -1].argmax())
                if nxt == tok.eos_token_id:
                    break
                ids.append(nxt)
                cur = torch.cat([cur, emb_table[None, [nxt]]], dim=1)
        want.append(tok.decode(ids))
    assert got == want


def test_caller_protocol(oracle_and_ours):
    """30 s truncation + response flattening (utils/salmonn.py:42-55) and
    the batched caller contract main_dpo drives."""
    o, ours = oracle_and_ours
    caller = SalmonnCaller(ours, _Tok(), batch=2, max_new_tokens=4)
    rng = np.random.default_rng(2)
    chunk = ours.whisper_cfg.max_source_positions * 2 * 160
    # longer than the chunk -> truncated; shorter -> padded
    samples = [{"wav": 0.1 * rng.normal(size=chunk + 999)},
               {"wav": 0.1 * rng.normal(size=chunk // 2)},
               {"wav": 0.1 * rng.normal(size=chunk)}]
    out = caller(samples, ["p1", "p2", "p3"])
    assert len(out) == 3
    assert all(isinstance(t, str) for t in out)
    assert all("\n" not in t and "\t" not in t for t in out)
