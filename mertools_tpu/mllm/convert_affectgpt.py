"""Reference AffectGPT trained-checkpoint converter.

The reference saves trainable-only state dicts per epoch
(``runner_base.py:594-638``: Q-Formers / position embeddings / fusion MLPs /
LLM projections / peft LoRA deltas — the frozen encoders and LLM base are
reloaded from their own checkpoints). This module maps such a state dict onto
our :class:`~mertools_tpu.mllm.affectgpt.AffectGPT` parameter tree so
published AffectGPT checkpoints run under the TPU stack.

Branch fusion types and dimensions are inferred from the key set
(affectgpt.py:142-299 creates parameters per fusion type); ``face_or_frame``
is not recoverable from weights and must be supplied (it lives in the
checkpoint's config dict — ``save_obj['config']``).
"""

from __future__ import annotations

import numpy as np

from .qformer import from_blip2_qformer


def _t(x):
    try:
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                          else x)
    except Exception:
        return np.asarray(x)


def _dense(sd, key):
    out = {"kernel": _t(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _qformer(sd, prefix, num_heads):
    """Sub-state-dict 'video_Qformer.*' + 'video_query_tokens' -> (cfg, params)
    via the BLIP-2/Video-LLaMA naming converter (init_video_Qformer builds a
    BertLMHeadModel with cross_attention_freq=1 — affectgpt.py:24-37)."""
    sub = {k[len(prefix) + 1:]: v for k, v in sd.items()
           if k.startswith(prefix + ".")}
    qt = f"{prefix.split('_')[0]}_query_tokens"
    if qt in sd:
        sub["query_tokens"] = sd[qt]
    return from_blip2_qformer(sub, prefix="bert.", attn_inner="self",
                              num_heads=num_heads)


def _branch_fusion(sd, name):
    """'video' | 'audio' | 'multi' -> fusion type present in the state dict."""
    if any(k.startswith(f"{name}_Qformer.") for k in sd):
        return "qformer"
    if name == "multi":
        return "attention" if "attention_mlp.weight" in sd else None
    return "attention" if f"{name}_attention_mlp.weight" in sd else "mean"


def convert_lora(sd, num_layers: int) -> dict:
    """peft LoRA deltas -> our llm overlay {layer_i: {x_proj: {lora_a/b}}}.

    peft stores ``lora_A.weight`` (r, in) and ``lora_B.weight`` (out, r)
    (key may carry an adapter segment ``lora_A.default.weight``); ours are
    ``lora_a`` (in, r) and ``lora_b`` (r, out)."""
    out: dict = {}

    def find(layer, proj, ab):
        for key in (f"lora_{ab}.weight", f"lora_{ab}.default.weight"):
            for stem in sd:
                if (f"layers.{layer}." in stem and f"{proj}.{key}" in stem):
                    return _t(sd[stem])
        return None

    projs = [("q_proj", "self_attn"), ("k_proj", "self_attn"),
             ("v_proj", "self_attn"), ("o_proj", "self_attn"),
             ("gate_proj", "mlp"), ("up_proj", "mlp"), ("down_proj", "mlp")]
    for i in range(num_layers):
        lp = {}
        for proj, _group in projs:
            a = find(i, proj, "A")
            b = find(i, proj, "B")
            if a is not None and b is not None:
                lp[proj] = {"lora_a": a.T, "lora_b": b.T}
        if lp:
            out[f"layer_{i}"] = lp
    return out


def convert_affectgpt_checkpoint(sd: dict, llm_cfg, face_or_frame: str,
                                 num_heads: int = 12,
                                 lora_alpha: float = 32.0):
    """Reference trainable-only state dict -> (AffectGPTConfig, glue_params,
    llm_lora_overlay).

    ``llm_cfg``: the base LLM's LLMConfig (converted separately from its HF
    checkpoint). ``lora_alpha``: the reference hardcodes 32 (affectgpt.py:116)
    — stored on the returned LLMConfig so forward and decode agree.
    """
    import dataclasses

    from .affectgpt import AffectGPTConfig

    glue: dict = {}
    kw: dict = {"face_or_frame": face_or_frame}

    # ---- video branch (shared face/frame weights)
    vf = _branch_fusion(sd, "video")
    kw["video_fusion"] = vf
    vq_cfg = None
    if vf == "qformer":
        pos = _t(sd["video_frame_position_embedding.weight"])
        glue["frame_position_embedding"] = pos
        kw["max_video_frames"], kw["video_dim"] = pos.shape
        vq_cfg, qp = _qformer(sd, "video_Qformer", num_heads)
        glue["video_qformer"] = qp
    else:
        if vf == "attention":
            glue["video_attention_mlp"] = _dense(sd, "video_attention_mlp")
        kw["video_dim"] = _t(sd["affectgpt_proj.weight"]).shape[1]
    glue["video_proj"] = _dense(sd, "affectgpt_proj")

    # ---- audio branch
    af = _branch_fusion(sd, "audio")
    kw["audio_fusion"] = af
    aq_cfg = None
    if af == "qformer":
        pos = _t(sd["audio_position_embedding.weight"])
        glue["audio_position_embedding"] = pos
        kw["max_audio_frames"], kw["audio_dim"] = pos.shape
        aq_cfg, qp = _qformer(sd, "audio_Qformer", num_heads)
        glue["audio_qformer"] = qp
    else:
        if af == "attention":
            glue["audio_attention_mlp"] = _dense(sd, "audio_attention_mlp")
        kw["audio_dim"] = _t(sd["audio_llama_proj.weight"]).shape[1]
    glue["audio_proj"] = _dense(sd, "audio_llama_proj")

    # ---- multi branch
    mf = _branch_fusion(sd, "multi")
    mq_cfg = None
    if mf is not None and "multi_llama_proj.weight" in sd:
        kw["multi_fusion"] = mf
        glue["multi_video_embs"] = _dense(sd, "multi_video_embs")
        glue["multi_audio_embs"] = _dense(sd, "multi_audio_embs")
        if mf == "qformer":
            pos = _t(sd["multi_position_embedding.weight"])
            glue["multi_position_embedding"] = pos
            kw["multi_max_positions"] = pos.shape[0]
            mq_cfg, qp = _qformer(sd, "multi_Qformer", num_heads)
            glue["multi_qformer"] = qp
        else:
            glue["attention_mlp"] = _dense(sd, "attention_mlp")
            glue["fc_att"] = _dense(sd, "fc_att")
        glue["multi_proj"] = _dense(sd, "multi_llama_proj")

    # ---- image branch
    if "image_llama_proj.weight" in sd:
        glue["image_proj"] = _dense(sd, "image_llama_proj")

    lora = convert_lora(sd, llm_cfg.num_layers)
    if lora:
        r = next(iter(next(iter(lora.values())).values()))["lora_a"].shape[1]
        llm_cfg = dataclasses.replace(llm_cfg, lora_r=r,
                                      lora_alpha=lora_alpha)

    cfg = AffectGPTConfig(
        llm=llm_cfg,
        video_qformer=vq_cfg or AffectGPTConfig().video_qformer,
        audio_qformer=aq_cfg or AffectGPTConfig().audio_qformer,
        multi_qformer=mq_cfg, **kw)
    return cfg, glue, lora


def apply_checkpoint(params: dict, glue: dict, lora: dict) -> dict:
    """Overlay converted glue + LoRA leaves onto a freshly-initialized
    parameter tree (strict=False composition like the reference's staged
    ckpt_1/2/3 loads — runner_base.py:659-684)."""

    def overlay(cur, new):
        out = dict(cur)
        for k, v in new.items():
            out[k] = (overlay(cur.get(k, {}), v) if isinstance(v, dict)
                      else v)
        return out

    params = overlay(params, glue)
    if lora:
        params = dict(params)
        params["llm"] = overlay(params["llm"], lora)
    return params
