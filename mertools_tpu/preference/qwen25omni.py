"""Qwen2.5-Omni (thinker) zero-shot wrapper — the reference Track3's
headline judge.

Reference: ``MER2026/MER2026_Track3/utils/qwen25omni.py`` (batched HF
``Qwen2_5OmniForConditionalGeneration`` calling with the fixed system
prompt, input types audio / video / audiovideo via ``use_audio_in_video``,
``return_audio=False`` — only the thinker runs).

TPU-native re-design (the talker/speech head is out of scope — the
reference never uses it):

  * audio tower (``Qwen2_5OmniAudioEncoder``): valid mel frames of the
    whole batch CONCATENATED, split into 2*n_window-frame chunks; the conv
    stem runs as one static (n_chunks, n_mels, 2*n_window) batch with
    per-chunk restarting sinusoidal positions; the transformer runs over
    the PACKED valid tokens with per-chunk segment-id attention (the HF
    cu_seqlens block-diagonal mask); per-audio avg-pool(2) + ln_post +
    proj gather through host-built index arrays;
  * vision tower: REUSES ``preference/qwen25vl.Qwen25VLVisionTower`` (the
    Omni vision encoder is structurally identical to Qwen2.5-VL's);
  * LLM: the shared M-RoPE stack (mllm/llm + mllm/generate);
  * TMRoPE: numpy port of ``Qwen2_5OmniThinker...get_rope_index``
    including the use_audio_in_video 2-second chunk interleaving;
  * placeholder expansion replicates ``Qwen2_5OmniProcessor
    .replace_multimodal_special_tokens`` exactly.

Parity-tested against the HF torch thinker oracle in
``tests/test_qwen25omni.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..mllm.llm import LLM, LLMConfig
from ..mllm.llm import convert_torch_state as convert_llm_state
from ..ops.mel import log_mel_spectrogram, pad_or_trim
from .qwen25vl import Qwen25VLVisionTower, VisionConfig
from .qwen25vl import _t  # noqa: F401  (shared torch->numpy helper)

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class OmniAudioConfig:
    """Qwen2_5OmniAudioEncoderConfig equivalent (whisper-layer field names
    so ``encoders.whisper._EncLayer`` consumes it directly)."""

    d_model: int = 1280
    num_layers: int = 32
    num_heads: int = 20
    ffn_dim: int = 5120
    num_mel_bins: int = 128
    n_window: int = 100
    max_source_positions: int = 1500
    output_dim: int = 3584

    @classmethod
    def from_hf(cls, hf):
        return cls(d_model=hf.d_model, num_layers=hf.encoder_layers,
                   num_heads=hf.encoder_attention_heads,
                   ffn_dim=hf.encoder_ffn_dim, num_mel_bins=hf.num_mel_bins,
                   n_window=hf.n_window,
                   max_source_positions=hf.max_source_positions,
                   output_dim=hf.output_dim)

    @property
    def chunk_frames(self) -> int:
        return 2 * self.n_window


def audio_token_count(n_valid_frames: int) -> int:
    """mel frames -> LLM audio tokens (_get_feat_extract_output_lengths)."""
    after_cnn = (n_valid_frames - 1) // 2 + 1
    return (after_cnn - 2) // 2 + 1


def sinusoid_positions(length: int, channels: int,
                       max_timescale: float = 10000.0) -> np.ndarray:
    """SinusoidsPositionEmbedding: cat([sin, cos], -1) layout."""
    inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2, dtype=np.float32))
    t = np.arange(length, dtype=np.float32)[:, None] * inv[None]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


class OmniAudioTower(nn.Module):
    """Runs on pre-chunked/pre-packed inputs (host index math):

    chunks       (N, n_mels, chunk_frames) zero-padded mel chunks
    chunk_mask   (N, chunk_frames) 1 = valid mel column
    pack_rc      (S, 2) [chunk_row, post-conv col] for each packed token
    seg          (S,) chunk id per packed token (block-diagonal attention)
    pool_a/b     (P,) packed-token indices of each avg-pool(2) pair
    Returns (P, output_dim) per-audio-token features in splice order.
    """

    cfg: OmniAudioConfig
    precision: object = _PRECISION

    @nn.compact
    def __call__(self, chunks, chunk_mask, pack_rc, seg, pool_a, pool_b):
        from ..encoders.whisper import _EncLayer

        c = self.cfg
        x = chunks.transpose(0, 2, 1)  # (N, T, n_mels)
        x = jax.nn.gelu(nn.Conv(c.d_model, kernel_size=(3,), padding=[(1, 1)],
                                name="conv1", precision=self.precision)(x),
                        approximate=False)
        x = x * chunk_mask[..., None]
        x = jax.nn.gelu(nn.Conv(c.d_model, kernel_size=(3,), strides=(2,),
                                padding=[(1, 1)], name="conv2",
                                precision=self.precision)(x),
                        approximate=False)
        pos = sinusoid_positions(x.shape[1], c.d_model)
        x = x + jnp.asarray(pos)[None]
        packed = x[pack_rc[:, 0], pack_rc[:, 1]]  # (S, D)

        bias = jnp.where(seg[:, None] == seg[None, :], 0.0, -1e30)
        packed = packed[None]
        for i in range(c.num_layers):
            packed = _EncLayer(c, self.precision, name=f"layer_{i}")(
                packed, bias[None, None])
        packed = packed[0]

        pooled = 0.5 * (packed[pool_a] + packed[pool_b])
        pooled = nn.LayerNorm(epsilon=1e-5, name="ln_post")(pooled)
        return nn.Dense(c.output_dim, name="proj",
                        precision=self.precision)(pooled)


def audio_pack_plan(feature_lens: list[int], cfg: OmniAudioConfig):
    """Host index math reproducing the HF chunk/pack/pool layout.

    Returns (chunk_spans, chunk_valid, pack_rc, seg, pool_a, pool_b) where
    chunk_spans[i] = (audio_idx, start, length) into that audio's valid
    mel frames."""
    CF = cfg.chunk_frames
    chunk_spans, chunk_valid = [], []
    for a, L in enumerate(feature_lens):
        n_chunks = -(-L // CF)
        for ci in range(n_chunks):
            ln = CF if ci < n_chunks - 1 else (L - CF * (n_chunks - 1))
            chunk_spans.append((a, ci * CF, ln))
            chunk_valid.append(ln)
    pack_rc, seg = [], []
    per_audio_token_ranges = []
    tok = 0
    row = 0
    for a, L in enumerate(feature_lens):
        start_tok = tok
        n_chunks = -(-L // CF)
        for ci in range(n_chunks):
            ln = chunk_valid[row]
            n_out = (ln - 1) // 2 + 1
            for p in range(n_out):
                pack_rc.append((row, p))
                seg.append(row)
            tok += n_out
            row += 1
        per_audio_token_ranges.append((start_tok, tok))
    pool_a, pool_b = [], []
    for s, e in per_audio_token_ranges:
        for k in range((e - s) // 2):
            pool_a.append(s + 2 * k)
            pool_b.append(s + 2 * k + 1)
    return (chunk_spans, np.asarray(chunk_valid, np.int32),
            np.asarray(pack_rc, np.int32), np.asarray(seg, np.int32),
            np.asarray(pool_a, np.int32), np.asarray(pool_b, np.int32))


# ---------------------------------------------------------------------------
# conversion (thinker subtree of the Omni checkpoint)
# ---------------------------------------------------------------------------
def convert_omni_audio_state(cfg: OmniAudioConfig, sd: dict,
                             pre: str = "audio_tower.") -> dict:
    def dense(prefix, use_bias=True):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if use_bias and f"{prefix}.bias" in sd:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    p: dict = {
        "conv1": {"kernel": _t(sd[f"{pre}conv1.weight"]).transpose(2, 1, 0),
                  "bias": _t(sd[f"{pre}conv1.bias"])},
        "conv2": {"kernel": _t(sd[f"{pre}conv2.weight"]).transpose(2, 1, 0),
                  "bias": _t(sd[f"{pre}conv2.bias"])},
        "ln_post": ln(f"{pre}ln_post"),
        "proj": dense(f"{pre}proj"),
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}layers.{i}"
        p[f"layer_{i}"] = {
            "self_attn_q": dense(f"{lp}.self_attn.q_proj"),
            "self_attn_k": dense(f"{lp}.self_attn.k_proj", use_bias=False),
            "self_attn_v": dense(f"{lp}.self_attn.v_proj"),
            "self_attn_out": dense(f"{lp}.self_attn.out_proj"),
            "self_attn_layer_norm": ln(f"{lp}.self_attn_layer_norm"),
            "final_layer_norm": ln(f"{lp}.final_layer_norm"),
            "fc1": dense(f"{lp}.fc1"), "fc2": dense(f"{lp}.fc2"),
        }
    return jax.tree_util.tree_map(jnp.asarray, p)


# ---------------------------------------------------------------------------
# TMRoPE (numpy port of Qwen2_5OmniThinker get_rope_index)
# ---------------------------------------------------------------------------
def _vision_pos(st_idx, grid, spatial_merge_size, t_index):
    lt = len(t_index)
    lh, lw = int(grid[1]) // spatial_merge_size, \
        int(grid[2]) // spatial_merge_size
    h = np.tile(np.repeat(np.arange(lh), lw), lt)
    w = np.tile(np.arange(lw), lt * lh)
    t = np.repeat(np.asarray(t_index, np.int64), lh * lw)
    return np.stack([t, h, w]) + st_idx


def _chunked_index(token_indices: np.ndarray, tokens_per_chunk: int,
                   remove_index: int) -> list[tuple[int, int]]:
    out, i, start, cur = [], 0, 0, 1
    while i < len(token_indices):
        if token_indices[i] - remove_index >= cur * tokens_per_chunk:
            out.append((start, i))
            start = i
            cur += 1
        i += 1
    out.append((start, len(token_indices)))
    return out


def omni_rope_index(input_ids: np.ndarray, attention_mask: np.ndarray, *,
                    audio_seqlens=None, video_grid_thw=None,
                    image_grid_thw=None, second_per_grids=None,
                    use_audio_in_video: bool = False,
                    spatial_merge_size: int = 2,
                    audio_token_id: int, video_token_id: int,
                    image_token_id: int, audio_start_token_id: int,
                    vision_start_token_id: int,
                    position_id_per_seconds: int = 25,
                    seconds_per_chunk: float = 2.0) -> np.ndarray:
    """(B, S, 3) position ids (right-pad aware)."""
    B, S = input_ids.shape
    pos = np.zeros((B, S, 3), np.int32)
    audio_idx = video_idx = image_idx = 0
    for b in range(B):
        valid = attention_mask[b] > 0
        ids = input_ids[b][valid].tolist()
        if not (audio_token_id in ids or video_token_id in ids
                or image_token_id in ids):
            n = len(ids)
            pos[b, valid] = np.broadcast_to(np.arange(n)[:, None], (n, 3))
            continue
        chunks: list = []

        def st_idx():
            return (int(np.max(chunks[-1])) + 1) if chunks else 0

        def text(n):
            if n > 0:
                chunks.append(np.broadcast_to(
                    np.arange(n)[None], (3, n)) + st_idx())

        audio_nums = sum(1 for t in ids if t == audio_start_token_id)
        vstarts = [i for i, t in enumerate(ids)
                   if t == vision_start_token_id and i + 1 < len(ids)]
        image_nums = sum(1 for i in vstarts if ids[i + 1] == image_token_id)
        if use_audio_in_video:
            video_nums = sum(1 for i in vstarts
                             if ids[i + 1] == audio_start_token_id)
        else:
            video_nums = sum(1 for i in vstarts
                             if ids[i + 1] == video_token_id)
        n_mm = (image_nums + audio_nums if use_audio_in_video
                else image_nums + video_nums + audio_nums)

        st = 0
        remain_a, remain_v, remain_i = audio_nums, video_nums, image_nums
        for _ in range(n_mm):
            find = lambda t, ok: (ids.index(t, st) if ok and t in ids[st:]
                                  else len(ids) + 1)
            ed_a = find(audio_token_id, remain_a > 0)
            ed_v = find(video_token_id, remain_v > 0)
            ed_i = find(image_token_id, remain_i > 0)
            min_ed = min(ed_a, ed_v, ed_i)
            if min_ed == ed_a and not (use_audio_in_video
                                       and min_ed == ed_v):
                text(min_ed - st - 1)
                chunks.append(np.zeros((3, 1), np.int64) + st_idx())  # bos
                alen = audio_token_count(int(audio_seqlens[audio_idx]))
                chunks.append(np.broadcast_to(
                    np.arange(alen)[None], (3, alen)) + st_idx())
                chunks.append(np.zeros((3, 1), np.int64) + st_idx())  # eos
                st = min_ed - 1 + 1 + alen + 1
                audio_idx += 1
                remain_a -= 1
            elif min_ed == ed_i:
                text(min_ed - st - 1)
                chunks.append(np.zeros((3, 1), np.int64) + st_idx())
                grid = image_grid_thw[image_idx]
                t_index = (np.arange(int(grid[0]))
                           * position_id_per_seconds).astype(np.int64)
                chunks.append(_vision_pos(st_idx(), grid,
                                          spatial_merge_size, t_index))
                ilen = int(np.prod(grid)) // spatial_merge_size ** 2
                chunks.append(np.zeros((3, 1), np.int64) + st_idx())
                st = min_ed - 1 + 1 + ilen + 1
                image_idx += 1
                remain_i -= 1
            elif min_ed == ed_v and not use_audio_in_video:
                text(min_ed - st - 1)
                chunks.append(np.zeros((3, 1), np.int64) + st_idx())
                grid = video_grid_thw[video_idx]
                spg = (float(second_per_grids[video_idx])
                       if second_per_grids is not None else 1.0)
                t_index = (np.arange(int(grid[0])) * spg
                           * position_id_per_seconds).astype(np.int64)
                chunks.append(_vision_pos(st_idx(), grid,
                                          spatial_merge_size, t_index))
                vlen = int(np.prod(grid)) // spatial_merge_size ** 2
                chunks.append(np.zeros((3, 1), np.int64) + st_idx())
                st = min_ed - 1 + 1 + vlen + 1
                video_idx += 1
                remain_v -= 1
            else:  # video with audio interleaved by 2 s chunks
                text(min_ed - st - 2)
                base = st_idx()
                chunks.append(np.zeros((3, 1), np.int64) + base)  # vision bos
                chunks.append(np.zeros((3, 1), np.int64) + base)  # audio bos
                base = st_idx()
                alen = audio_token_count(int(audio_seqlens[audio_idx]))
                audio_pos = np.broadcast_to(
                    np.arange(alen)[None], (3, alen)) + base
                grid = video_grid_thw[video_idx]
                spg = (float(second_per_grids[video_idx])
                       if second_per_grids is not None else 1.0)
                t_index = (np.arange(int(grid[0])) * spg
                           * position_id_per_seconds).astype(np.int64)
                video_pos = _vision_pos(base, grid, spatial_merge_size,
                                        t_index)
                tpc = int(position_id_per_seconds * seconds_per_chunk)
                v_ch = _chunked_index(video_pos[0], tpc, base)
                a_ch = _chunked_index(audio_pos[0], tpc, base)
                for j in range(max(len(v_ch), len(a_ch))):
                    if j < len(v_ch):
                        chunks.append(video_pos[:, v_ch[j][0]: v_ch[j][1]])
                    if j < len(a_ch):
                        chunks.append(audio_pos[:, a_ch[j][0]: a_ch[j][1]])
                vlen = int(np.prod(grid)) // spatial_merge_size ** 2
                # HF computes st_idx ONCE for the two eos tokens — audio_eos
                # and vision_eos share the same position value
                eos_base = st_idx()
                chunks.append(np.zeros((3, 1), np.int64) + eos_base)
                chunks.append(np.zeros((3, 1), np.int64) + eos_base)
                st = min_ed - 2 + 2 + alen + vlen + 2
                audio_idx += 1
                video_idx += 1
                remain_v -= 1
                remain_a -= 1
        text(len(ids) - st)
        got = np.concatenate(chunks, axis=1).T
        assert len(got) == len(ids), (len(got), len(ids))
        pos[b, valid] = got.astype(np.int32)
    return pos


# ---------------------------------------------------------------------------
# thinker wrapper
# ---------------------------------------------------------------------------
class Qwen25Omni:
    def __init__(self, acfg: OmniAudioConfig, vcfg: VisionConfig,
                 lcfg: LLMConfig, params: dict, tok_ids: dict):
        """tok_ids: audio_token_id / video_token_id / image_token_id /
        audio_start_token_id / vision_start_token_id (+ optional
        position_id_per_seconds / seconds_per_chunk)."""
        self.acfg, self.vcfg, self.lcfg = acfg, vcfg, lcfg
        self.params = params
        self.tok_ids = tok_ids
        self._audio = OmniAudioTower(acfg)
        self._vision = Qwen25VLVisionTower(vcfg)
        self._llm = LLM(lcfg)
        self._audio_fwd = jax.jit(
            lambda p, *a: self._audio.apply({"params": p["audio"]}, *a))
        self._vision_fwd = jax.jit(
            lambda p, *a: self._vision.apply({"params": p["visual"]}, *a))
        self._encode = self._vision_fwd  # Qwen25VL.encode_patches protocol
        self._llm_fwd = jax.jit(
            lambda p, emb, mask, pos: self._llm.apply(
                {"params": p["llm"]}, emb, attention_mask=mask,
                positions=pos))

    @classmethod
    def from_hf_thinker(cls, hf_thinker) -> "Qwen25Omni":
        cfg = hf_thinker.config
        acfg = OmniAudioConfig.from_hf(cfg.audio_config)
        vcfg = VisionConfig.from_hf(cfg.vision_config)
        lcfg = LLMConfig.from_hf(cfg.text_config)
        sd = hf_thinker.state_dict()
        from .qwen25vl import convert_qwen25vl_visual

        # thinker keys: audio_tower.* / visual.* / model.* / lm_head.*
        lsd = {k: v for k, v in sd.items()
               if k.startswith("model.") or k == "lm_head.weight"}
        params = {"audio": convert_omni_audio_state(acfg, sd),
                  "visual": convert_qwen25vl_visual(vcfg, sd),
                  "llm": convert_llm_state(lcfg, lsd)}
        tok_ids = dict(
            audio_token_id=cfg.audio_token_id,
            video_token_id=cfg.video_token_id,
            image_token_id=cfg.image_token_id,
            audio_start_token_id=cfg.audio_start_token_id,
            vision_start_token_id=getattr(cfg, "vision_start_token_id",
                                          151652),
            position_id_per_seconds=cfg.position_id_per_seconds,
            seconds_per_chunk=cfg.seconds_per_chunk)
        return cls(acfg, vcfg, lcfg, params, tok_ids)

    # ---- encoders ----
    def audio_features(self, mels: list[np.ndarray]) -> np.ndarray:
        """mels: list of (n_mels, L_i) VALID-length mel arrays (one per
        audio) -> (sum_i tokens_i, output_dim) in splice order."""
        lens = [m.shape[1] for m in mels]
        spans, cvalid, pack_rc, seg, pa, pb = audio_pack_plan(lens, self.acfg)
        CF = self.acfg.chunk_frames
        chunks = np.zeros((len(spans), self.acfg.num_mel_bins, CF),
                          np.float32)
        cmask = np.zeros((len(spans), CF), np.float32)
        for r, (a, s, ln) in enumerate(spans):
            chunks[r, :, :ln] = mels[a][:, s: s + ln]
            cmask[r, :ln] = 1.0
        return np.asarray(self._audio_fwd(
            self.params, jnp.asarray(chunks), jnp.asarray(cmask),
            jnp.asarray(pack_rc), jnp.asarray(seg), jnp.asarray(pa),
            jnp.asarray(pb)))

    def vision_features(self, patches: np.ndarray,
                        grid_thw: np.ndarray) -> np.ndarray:
        from .qwen25vl import Qwen25VL

        return Qwen25VL.encode_patches(self, patches, grid_thw)

    # ---- splice + forward ----
    def splice(self, input_ids: np.ndarray, audio_feats, video_feats
               ) -> np.ndarray:
        table = np.asarray(self.params["llm"]["embed_tokens"]["embedding"])
        emb = table[input_ids].astype(np.float32)
        for tid, feats in ((self.tok_ids["audio_token_id"], audio_feats),
                           (self.tok_ids["video_token_id"], video_feats)):
            if feats is None:
                continue
            used = 0
            for b in range(input_ids.shape[0]):
                p = np.where(input_ids[b] == tid)[0]
                emb[b, p] = feats[used: used + len(p)]
                used += len(p)
            assert used == len(feats), (tid, used, len(feats))
        return emb

    def rope(self, input_ids, attention_mask, *, audio_seqlens=None,
             video_grid_thw=None, second_per_grids=None,
             use_audio_in_video=False):
        t = self.tok_ids
        return omni_rope_index(
            input_ids, attention_mask, audio_seqlens=audio_seqlens,
            video_grid_thw=video_grid_thw,
            second_per_grids=second_per_grids,
            use_audio_in_video=use_audio_in_video,
            spatial_merge_size=self.vcfg.spatial_merge_size,
            audio_token_id=t["audio_token_id"],
            video_token_id=t["video_token_id"],
            image_token_id=t["image_token_id"],
            audio_start_token_id=t["audio_start_token_id"],
            vision_start_token_id=t["vision_start_token_id"],
            position_id_per_seconds=t.get("position_id_per_seconds", 25),
            seconds_per_chunk=t.get("seconds_per_chunk", 2.0))

    def forward_logits(self, input_ids, attention_mask, *, mels=None,
                       patches=None, grid_thw=None, second_per_grids=None,
                       use_audio_in_video=False) -> np.ndarray:
        af = self.audio_features(mels) if mels else None
        vf = (self.vision_features(patches, grid_thw)
              if patches is not None else None)
        emb = self.splice(input_ids, af, vf)
        pos = self.rope(input_ids, attention_mask,
                        audio_seqlens=np.asarray(
                            [m.shape[1] for m in mels]) if mels else None,
                        video_grid_thw=grid_thw,
                        second_per_grids=second_per_grids,
                        use_audio_in_video=use_audio_in_video)
        return np.asarray(self._llm_fwd(self.params, jnp.asarray(emb),
                                        jnp.asarray(attention_mask),
                                        jnp.asarray(pos)))

    def generate_batch(self, ids_list, tokenizer, *, mels=None, patches=None,
                       grid_thw=None, second_per_grids=None,
                       use_audio_in_video=False, max_new_tokens: int = 512,
                       temperature: float = 0.0, top_p: float = 0.9,
                       prng_key=None) -> list[str]:
        from ..mllm.generate import bucket_len, generate

        B = len(ids_list)
        S = bucket_len(max(len(x) for x in ids_list))
        ids = np.zeros((B, S), np.int32)
        mask = np.zeros((B, S), np.int32)
        for i, x in enumerate(ids_list):
            ids[i, : len(x)] = x
            mask[i, : len(x)] = 1
        af = self.audio_features(mels) if mels else None
        vf = (self.vision_features(patches, grid_thw)
              if patches is not None else None)
        emb = self.splice(ids, af, vf)
        pos = self.rope(ids, mask,
                        audio_seqlens=np.asarray(
                            [m.shape[1] for m in mels]) if mels else None,
                        video_grid_thw=grid_thw,
                        second_per_grids=second_per_grids,
                        use_audio_in_video=use_audio_in_video)
        eos = tokenizer.eos_token_id
        toks = np.asarray(generate(
            self.lcfg, self.params["llm"], jnp.asarray(emb), jnp.asarray(mask),
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, eos_token_id=eos if eos is not None else -1,
            prng_key=prng_key, positions=jnp.asarray(pos)))
        out = []
        for row in toks:
            stop = np.where(row == eos)[0] if eos is not None else []
            row = row[: stop[0]] if len(stop) else row
            out.append(tokenizer.decode(row, skip_special_tokens=True))
        return out


SYSTEM_PROMPT = ("You are Qwen, a virtual human developed by the Qwen Team, "
                 "Alibaba Group, capable of perceiving auditory and visual "
                 "inputs, as well as generating text and speech.")


class Qwen25OmniCaller:
    """Reference wrapper semantics (utils/qwen25omni.py): fixed system
    prompt; input_type audio | video | audiovideo (use_audio_in_video);
    batched calling; responses whitespace-flattened.

    Samples carry ``wav`` (16 kHz float) and/or ``frames`` ((T, H, W, 3)
    uint8 RGB) or ``audio_path``/``video_path``."""

    AUDIO_TOKEN = "<|AUDIO|>"
    VIDEO_TOKEN = "<|VIDEO|>"
    AUDIO_BOS, AUDIO_EOS = "<|audio_bos|>", "<|audio_eos|>"
    VISION_BOS, VISION_EOS = "<|vision_bos|>", "<|vision_eos|>"

    def __init__(self, model_path: str | None = None, *, model=None,
                 tokenizer=None, batch: int = 4, max_new_tokens: int = 512,
                 max_pixels: int = 360 * 420, fps: float = 2.0,
                 chat_template: str | None = None):
        if model is None:
            from transformers import AutoProcessor
            from transformers.models.qwen2_5_omni import (
                Qwen2_5OmniThinkerForConditionalGeneration)

            hf = Qwen2_5OmniThinkerForConditionalGeneration.from_pretrained(
                model_path)
            model = Qwen25Omni.from_hf_thinker(hf)
            del hf
            proc = AutoProcessor.from_pretrained(model_path)
            tokenizer = proc.tokenizer
            chat_template = chat_template or getattr(proc, "chat_template",
                                                     None)
        self.model = model
        self.tok = tokenizer
        self.batch = batch
        self.max_new_tokens = max_new_tokens
        self.max_pixels = max_pixels
        self.fps = fps
        self.chat_template = chat_template

    # ---- media prep ----
    def _mel(self, wav: np.ndarray) -> np.ndarray:
        """(n_mels, L_valid) whisper log-mel, 30 s max-length semantics."""
        n_mels = self.model.acfg.num_mel_bins
        valid = min(3000, -(-min(len(wav), 480000) // 160))
        padded = pad_or_trim(np.asarray(wav, np.float32))[None]
        mel = np.asarray(log_mel_spectrogram(jnp.asarray(padded),
                                             n_mels=n_mels))[0]
        return mel[:, :valid]

    def _template_text(self, prompt: str, kind: str) -> str:
        content = {"audio": [{"type": "audio", "audio": "local"}],
                   "video": [{"type": "video", "video": "local"}],
                   "audiovideo": [{"type": "video", "video": "local"}]}[kind]
        conv = [
            {"role": "system",
             "content": [{"type": "text", "text": SYSTEM_PROMPT}]},
            {"role": "user",
             "content": content + [{"type": "text", "text": prompt}]},
        ]
        if self.chat_template:
            return self.tok.apply_chat_template(
                conv, chat_template=self.chat_template,
                add_generation_prompt=True, tokenize=False)
        body = {"audio": f"{self.AUDIO_BOS}{self.AUDIO_TOKEN}{self.AUDIO_EOS}",
                "video": f"{self.VISION_BOS}{self.VIDEO_TOKEN}{self.VISION_EOS}",
                "audiovideo":
                    f"{self.VISION_BOS}{self.VIDEO_TOKEN}{self.VISION_EOS}",
                }[kind]
        return f"{SYSTEM_PROMPT}\n{body}{prompt}"

    def expand_prompt(self, text: str, *, n_audio_tok=None, grid=None,
                      second_per_grid=None,
                      use_audio_in_video: bool = False) -> str:
        """Processor placeholder expansion
        (Qwen2_5OmniProcessor.replace_multimodal_special_tokens)."""
        if n_audio_tok is not None and not use_audio_in_video:
            text = text.replace(self.AUDIO_TOKEN,
                                self.AUDIO_TOKEN * n_audio_tok, 1)
        if grid is not None:
            mu = self.model.vcfg.merge_unit
            if not use_audio_in_video:
                n_v = int(np.prod(grid)) // mu
                text = text.replace(self.VIDEO_TOKEN,
                                    self.VIDEO_TOKEN * n_v, 1)
            else:
                t = self.model.tok_ids
                pps = t.get("position_id_per_seconds", 25)
                tpc = int(pps * t.get("seconds_per_chunk", 2.0))
                lh = int(grid[1]) // self.model.vcfg.spatial_merge_size
                lw = int(grid[2]) // self.model.vcfg.spatial_merge_size
                vid_t = np.repeat(
                    (np.arange(int(grid[0])) * second_per_grid
                     * pps).astype(np.int64), lh * lw)
                aud_t = np.arange(n_audio_tok)
                v_ch = _chunked_index(vid_t, tpc, 0)
                a_ch = _chunked_index(aud_t, tpc, 0)
                s = self.VISION_BOS + self.AUDIO_BOS
                for j in range(max(len(v_ch), len(a_ch))):
                    if j < len(v_ch):
                        s += self.VIDEO_TOKEN * (v_ch[j][1] - v_ch[j][0])
                    if j < len(a_ch):
                        s += self.AUDIO_TOKEN * (a_ch[j][1] - a_ch[j][0])
                s += self.AUDIO_EOS + self.VISION_EOS
                text = text.replace(
                    self.VISION_BOS + self.VIDEO_TOKEN + self.VISION_EOS,
                    s, 1)
        return text

    def _load(self, sample: dict, kind: str):
        wav = frames = None
        if kind in ("audio", "audiovideo"):
            if "wav" in sample:
                wav = np.asarray(sample["wav"], np.float32)
            elif kind == "audiovideo" and "video_path" in sample:
                from ..io.video import demux_audio_16k

                wav = demux_audio_16k(sample["video_path"])
            else:
                from ..io.wav import read_wav_16k

                wav = read_wav_16k(sample["audio_path"])
        if kind in ("video", "audiovideo"):
            if "frames" in sample:
                frames = np.asarray(sample["frames"])
            else:
                from .qwen25vl import Qwen25VLCaller

                frames = Qwen25VLCaller._load_frames(self, sample)
        return wav, frames

    def __call__(self, samples: list[dict], prompts: list[str],
                 input_type: str = "audio") -> list[str]:
        kind = {"audio": "audio", "audiotext": "audio", "video": "video",
                "videotext": "video", "audiovideo": "audiovideo",
                "text": "audio"}[input_type]
        uaiv = kind == "audiovideo"
        out: list[str] = [""] * len(samples)
        from .qwen25vl import Qwen25VLCaller

        for i in range(0, len(samples), self.batch):
            grp = list(range(i, min(i + self.batch, len(samples))))
            mels, packed, grids, spgs, ids = [], [], [], [], []
            for j in grp:
                wav, frames = self._load(samples[j], kind)
                n_audio_tok = grid = spg = None
                if wav is not None:
                    mel = self._mel(wav)
                    mels.append(mel)
                    n_audio_tok = audio_token_count(mel.shape[1])
                if frames is not None:
                    patches, grid, spg = Qwen25VLCaller.preprocess_video(
                        self, frames)
                    packed.append(patches)
                    grids.append(grid)
                    spgs.append(spg)
                text = self._template_text(prompts[j], kind)
                text = self.expand_prompt(
                    text, n_audio_tok=n_audio_tok, grid=grid,
                    second_per_grid=spg, use_audio_in_video=uaiv)
                ids.append(np.asarray(self.tok(text).input_ids, np.int32))
            texts = self.model.generate_batch(
                ids, self.tok, mels=mels or None,
                patches=np.concatenate(packed) if packed else None,
                grid_thw=np.asarray(grids) if grids else None,
                second_per_grids=np.asarray(spgs) if spgs else None,
                use_audio_in_video=uaiv, max_new_tokens=self.max_new_tokens)
            for j, t in zip(grp, texts):
                out[j] = t.replace("\n", " ").replace("\t", " ").strip()
        return out

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        s = {"audio_path": audio_path, "video_path": video_path}
        return self([s], [prompt], input_type=input_type)[0]
