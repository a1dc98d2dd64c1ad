"""Chat-UniVi zero-shot wrapper — CTM cluster-token-merging video judge.

Reference: ``MER2026/MER2026_Track3/utils/chatunivi.py:31-176`` driving the
vendored ``MER2025/MER2025_Track23/Chat-UniVi/``:
  * 1 fps frame sampling capped at 100 frames (wrapper ``:68-109``);
  * CLIP ViT-L/14 penultimate layer, CLS dropped ("patch" select,
    ``model/multimodal_encoder/clip_encoder.py:34-41``);
  * dynamic visual-token compression (``model/arch.py:111-209`` with
    config ``spatial_cluster_rate0/1/2 = 64/32/16``, ``temporal_cluster_rate
    = 1/16``, ``config/model_config.py:1-11``):
      - per-frame DPC-KNN cluster+merge at three rates: 256 -> 64 -> 32
        -> 16 tokens/frame (``ctm0/1/2``; the reference's TCBlocks are
        identity, cluster.py:280-287);
      - frame means clustered temporally into ceil(T/16) "events"
        (``ctm3``, arch.py:135-153), grouped by first occurrence;
      - per event, the member frames' level-0/1/2 tokens are re-clustered
        to 64/32/16 event tokens (arch.py:168-206) -> 112 tokens/event;
  * linear ``mm_projector`` -> LLM embeds, spliced where the ``<image>``
    sentinels (-200) sat (arch.py:220-328 — sequence length CHANGES);
  * "simple" conversation (###-separated Human/Assistant with the seeded
    Hi! exchange, ``conversation.py:249-260``), sampling at temperature
    0.2, max_new_tokens 1024, stop "###" (wrapper ``:121-172``).

TPU-native design: DPC-KNN/merge are the static-shape one-hot-matmul
kernels in :mod:`..ops.token_cluster`; the ragged event grouping (pure
integer bookkeeping over <=100 frame ids) happens on host between two
jitted stages, and the per-event re-clustering runs as ONE vmapped masked
call padded to T frames (pad-invariance proven in
tests/test_token_cluster.py). Event count ceil(T/16) is static given T,
so the spliced length is too. Decode rides the shared ``mllm/generate``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..encoders.vit_clip import CLIPVisionConfig
from ..mllm.llm import LLM, LLMConfig
from ..mllm.llm import convert_torch_state as convert_llm_state
from ..ops.token_cluster import ctm_cluster_num, ctm_k, dpc_knn_assign, \
    merge_by_cluster
from .videollava import CLIPHiddenTower, IMAGE_MEAN, IMAGE_STD, \
    n_tower_layers

IMAGE_TOKEN_INDEX = -200
DEFAULT_IMAGE_TOKEN = "<image>"
MAX_IMAGE_LENGTH = 100  # wrapper caps at 100 (utils/chatunivi.py:35)

SPATIAL_RATES = (64.0, 32.0, 16.0)
SPATIAL_KS = (5, 3, 3)
TEMPORAL_RATE = 1.0 / 16.0
TEMPORAL_K = 5

SYSTEM = ("A chat between a curious human and an artificial intelligence "
          "assistant. The assistant gives helpful, detailed, and polite "
          "answers to the human's questions.")
SEED_TURNS = (("Human", "Hi!"),
              ("Assistant", "Hi there! How can I help you today?"))
SEP = "###"


def simple_prompt(user_message: str) -> str:
    """conv_templates["simple"] (conversation.py:249-260) with one new
    Human turn — SeparatorStyle.SINGLE ``get_prompt``."""
    ret = SYSTEM + SEP
    for role, msg in SEED_TURNS + (("Human", user_message),):
        ret += f"{role}: {msg}{SEP}"
    return ret + "Assistant:"


def tokenizer_image_token(prompt: str, tokenizer,
                          image_token_index: int = IMAGE_TOKEN_INDEX
                          ) -> np.ndarray:
    """Reference-exact splice tokenizer (mm_utils.py:18-42): tokenize
    around ``<image>``, drop per-chunk BOS repeats, sentinel between."""
    chunks = [tokenizer(c).input_ids if c != "" else []
              for c in prompt.split(DEFAULT_IMAGE_TOKEN)]
    ids: list[int] = []
    offset = 0
    if chunks and chunks[0] and chunks[0][0] == tokenizer.bos_token_id:
        offset = 1
        ids.append(chunks[0][0])
    sep = [image_token_index] * (offset + 1)
    seq = [x for pair in zip(chunks, [sep] * len(chunks)) for x in pair][:-1]
    for x in seq:
        ids.extend(x[offset:])
    return np.asarray(ids, np.int64)


def events_from_assign(assign: np.ndarray) -> list[list[int]]:
    """Frame ids grouped by temporal cluster, keyed in FIRST-OCCURRENCE
    order (arch.py:145-153's OrderedDict walk)."""
    events: dict[int, list[int]] = {}
    for fid, cid in enumerate(assign.tolist()):
        events.setdefault(int(cid), []).append(fid)
    return list(events.values())


def temporal_tiebreak(T: int) -> np.ndarray:
    """Deterministic density tie-break for the temporal CTM stage.

    When ceil(T/16) <= 3 the adjusted k is 1, every frame's density is
    exactly exp(0) = 1, and the reference decides the event centers purely
    by its ``rand()*1e-6`` noise (cluster.py:143-145) — i.e. randomly. We
    feed the same mechanism a fixed descending-by-index vector instead, so
    earlier frames win ties: deterministic, inside the reference's noise
    envelope (PARITY.md §2.7)."""
    return np.arange(T, 0, -1, dtype=np.float32)[None]


def _frame_stage(feats: jnp.ndarray, frame_mask: jnp.ndarray,
                 t_tiebreak: jnp.ndarray, n_temporal: int, tk: int):
    """(T_b, S, C) patch features (padded to a 16-frame bucket) ->
    per-frame level tokens ((T_b,64,C),(T_b,32,C),(T_b,16,C)) + temporal
    cluster assignment (T_b,). Padded frames cluster to garbage rows that
    the event stage's masks drop; the temporal clustering masks them out
    (pad-invariance: tests/test_token_cluster.py)."""
    levels = []
    x = feats
    for rate, k in zip(SPATIAL_RATES, SPATIAL_KS):
        n_cl = ctm_cluster_num(x.shape[1], rate)
        a = dpc_knn_assign(x, n_cl, ctm_k(n_cl, k))
        x = merge_by_cluster(x, a, n_cl)
        levels.append(x)
    cls = jnp.mean(feats, axis=1)[None]  # (1, T_b, C) — arch.py:135
    t_assign = dpc_knn_assign(cls, n_temporal, ctm_k(n_temporal, tk),
                              mask=frame_mask[None],
                              tiebreak=t_tiebreak)[0]
    return levels[0], levels[1], levels[2], t_assign


def _event_stage(levels: tuple, ev_idx: jnp.ndarray, ev_mask: jnp.ndarray):
    """Per-event re-clustering. levels[i]: (T, S_i, C); ev_idx/ev_mask:
    (E, T) padded member-frame ids/validity. Returns (E, 112, C) in the
    reference's [64|32|16] per-event layout (arch.py:168-206)."""
    outs = []
    for x, rate, k in zip(levels, SPATIAL_RATES, SPATIAL_KS):
        E, T = ev_idx.shape
        S = x.shape[1]
        tok = x[ev_idx]                              # (E, T, S, C)
        tok = tok.reshape(E, T * S, x.shape[-1])
        m = jnp.repeat(ev_mask, S, axis=1)           # (E, T*S)
        n_cl = ctm_cluster_num(T * S, rate)          # rate > 1: absolute
        a = dpc_knn_assign(tok, n_cl, ctm_k(n_cl, k), mask=m)
        outs.append(merge_by_cluster(tok, a, n_cl,
                                     weight=m.astype(tok.dtype)))
    return jnp.concatenate(outs, axis=1)


class ChatUniVi:
    """Batched TPU Chat-UniVi: frames -> tower(-2, CLS-drop) -> CTM
    compression (112 tokens/event) -> linear projector -> splice at the
    ``<image>`` sentinels -> LLM."""

    def __init__(self, vcfg: CLIPVisionConfig, llm_cfg: LLMConfig,
                 params: dict, *, feature_layer: int = -2):
        self.vcfg = vcfg
        self.llm_cfg = llm_cfg
        self.params = params
        self._tower = CLIPHiddenTower(vcfg, n_tower_layers(vcfg,
                                                           feature_layer))
        self._llm = LLM(llm_cfg)
        self._encode = jax.jit(lambda p, px: self._tower.apply(
            {"params": p["tower"]}, px)[:, 1:])
        self._frame_stage = jax.jit(_frame_stage,
                                    static_argnames=("n_temporal", "tk"))
        self._event_stage = jax.jit(_event_stage)
        self._project = jax.jit(lambda p, x: x @ p["mm_projector"]["kernel"]
                                + p["mm_projector"]["bias"])
        self._forward = jax.jit(
            lambda p, emb, mask: self._llm.apply(
                {"params": p["llm"]}, emb, attention_mask=mask))

    def video_features(self, pixels: np.ndarray) -> np.ndarray:
        """(T, H, W, 3) normalized frames -> (E*112, H_llm) compressed
        event tokens, E = ceil(T/16)."""
        feats = self._encode(self.params, jnp.asarray(pixels))
        return self.features_from_patches(feats)

    def features_from_patches(self, feats) -> np.ndarray:
        """(T, S, C) tower patch features -> (E*112, H_llm). Split out so
        parity tests can feed both paths bit-identical features (cluster
        assignment is discontinuous in its input).

        T is padded (masked) to a 16-frame bucket so ragged clip lengths
        share compiled shapes: within one bucket ceil(T/16) is constant,
        so (bucket, n_temporal, E) are all static — one compile per
        bucket instead of one per distinct length (review finding,
        round 4)."""
        feats = np.asarray(feats)
        T = feats.shape[0]
        n_temporal = ctm_cluster_num(T, TEMPORAL_RATE)  # from REAL T
        Tb = ((T + 15) // 16) * 16
        fmask = np.zeros(Tb, np.float32)
        fmask[:T] = 1.0
        if Tb != T:
            feats = np.concatenate(
                [feats, np.zeros((Tb - T,) + feats.shape[1:],
                                 feats.dtype)], 0)
        # real frames keep EXACTLY the unpadded tie-break values
        tb = np.zeros((1, Tb), np.float32)
        tb[0, :T] = temporal_tiebreak(T)[0]
        l0, l1, l2, t_assign = self._frame_stage(
            jnp.asarray(feats), jnp.asarray(fmask), jnp.asarray(tb),
            n_temporal=n_temporal, tk=TEMPORAL_K)
        events = events_from_assign(np.asarray(t_assign)[:T])
        E = len(events)
        ev_idx = np.zeros((E, Tb), np.int32)
        ev_mask = np.zeros((E, Tb), np.float32)
        for e, frames in enumerate(events):
            ev_idx[e, : len(frames)] = frames
            ev_mask[e, : len(frames)] = 1.0
        ev = self._event_stage((l0, l1, l2), jnp.asarray(ev_idx),
                               jnp.asarray(ev_mask))   # (E, 112, C)
        proj = self._project(self.params, ev.reshape(-1, ev.shape[-1]))
        return np.asarray(proj)

    def splice_embeds(self, ids: np.ndarray,
                      feats: np.ndarray) -> np.ndarray:
        """Token embeddings with the consecutive ``<image>`` sentinel run
        REPLACED by the (different-length) compressed features
        (arch.py:261-314's consecutive-video branch)."""
        table = np.asarray(self.params["llm"]["embed_tokens"]["embedding"])
        pos = np.where(ids == IMAGE_TOKEN_INDEX)[0]
        assert len(pos) > 0 and (np.diff(pos) == 1).all(), \
            "expected one consecutive <image> sentinel run"
        pre = table[ids[: pos[0]]]
        post = table[ids[pos[-1] + 1:]]
        return np.concatenate([pre, feats, post], 0).astype(np.float32)

    def forward_logits(self, ids: np.ndarray,
                       pixels: np.ndarray) -> np.ndarray:
        """Parity path: single-row full-sequence logits."""
        emb = self.splice_embeds(ids, self.video_features(pixels))[None]
        mask = np.ones((1, emb.shape[1]), np.int32)
        return np.asarray(self._forward(self.params, jnp.asarray(emb),
                                        jnp.asarray(mask)))

    def generate_batch(self, ids_list: list[np.ndarray],
                       pixels_list: list[np.ndarray], tokenizer, *,
                       max_new_tokens: int = 1024, temperature: float = 0.2,
                       top_p: float = 1.0, prng_key=None,
                       stop_str: str = SEP) -> list[str]:
        from ..mllm.generate import bucket_len, generate

        rows = [self.splice_embeds(ids, self.video_features(px))
                for ids, px in zip(ids_list, pixels_list)]
        B = len(rows)
        S = bucket_len(max(r.shape[0] for r in rows))
        emb = np.zeros((B, S, rows[0].shape[-1]), np.float32)
        mask = np.zeros((B, S), np.int32)
        for i, r in enumerate(rows):
            emb[i, : r.shape[0]] = r
            mask[i, : r.shape[0]] = 1
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
            text = tokenizer.decode(row, skip_special_tokens=True).strip()
            # KeywordsStoppingCriteria("###") + endswith strip
            # (utils/chatunivi.py:145-171)
            if stop_str and stop_str in text:
                text = text[: text.index(stop_str)]
            out.append(text.strip())
        return out


def convert_chatunivi_state(vcfg: CLIPVisionConfig, llm_cfg: LLMConfig,
                            sd: dict, *, feature_layer: int = -2) -> dict:
    """Chat-UniVi checkpoint state dict (LLaVA layout:
    ``model.vision_tower.vision_tower.vision_model.* /
    model.mm_projector.* / model.embed_tokens / model.layers.* /
    lm_head``; the CTM/TCBlock stages hold NO parameters) -> our tree."""
    from ..encoders.vit_clip import _t
    from .videollava import _convert_tower

    n_run = n_tower_layers(vcfg, feature_layer)
    params = {
        "tower": _convert_tower(vcfg, sd, "model.vision_tower.vision_tower",
                                n_run),
        "mm_projector": {
            "kernel": _t(sd["model.mm_projector.weight"]).T,
            "bias": _t(sd["model.mm_projector.bias"]),
        },
    }
    lsd = {k[len("model."):]: v for k, v in sd.items()
           if k.startswith("model.") and not k.startswith(
               ("model.mm_", "model.vision_tower."))}
    if "lm_head.weight" in sd:
        lsd["lm_head.weight"] = sd["lm_head.weight"]
    params["llm"] = convert_llm_state(llm_cfg, lsd)
    return jax.tree_util.tree_map(jnp.asarray, params)


class ChatUniViCaller:
    """Unified preference-pipeline wrapper (utils/chatunivi.py protocol).

    Samples carry ``frames`` (T, H, W, 3) uint8 RGB (pre-sampled at 1 fps)
    or ``video_path`` (+ optional ``fps``). Defaults reproduce the
    reference: <=100 frames at 1 fps, "simple" conversation,
    temperature-0.2 sampling, 1024 new tokens, "###" stop, flattening.
    """

    def __init__(self, model_path: str | None = None, *, model=None,
                 tokenizer=None, batch: int = 4,
                 max_frames: int = MAX_IMAGE_LENGTH,
                 video_framerate: int = 1, max_new_tokens: int = 1024,
                 temperature: float = 0.2, seed: int = 0):
        if model is None:
            model, tokenizer = load_chatunivi(model_path)
        self.model = model
        self.tok = tokenizer
        self.batch = batch
        self.max_frames = max_frames
        self.video_framerate = video_framerate
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.seed = seed

    def _load_frames(self, sample: dict) -> np.ndarray:
        """1 fps stride sampling capped at max_frames by linspace
        (utils/chatunivi.py:89-104)."""
        if "frames" in sample:
            frames = np.asarray(sample["frames"])
            fps = float(sample.get("fps", self.video_framerate))
        else:
            from ..io import video as vio

            frames = vio.decode_frames(sample["video_path"])
            # the reference strides by the container's REAL average fps
            # (vreader.get_avg_fps(), utils/chatunivi.py:89-96)
            fps = float(sample.get("fps") or
                        vio.video_info(sample["video_path"])["fps"] or 25.0)
        stride = max(int(round(fps / self.video_framerate)), 1)
        pos = list(range(0, len(frames), stride))
        if len(pos) > self.max_frames:
            pos = [pos[i] for i in np.linspace(0, len(pos) - 1,
                                               num=self.max_frames,
                                               dtype=int)]
        return frames[pos]

    def preprocess_video(self, frames: np.ndarray) -> np.ndarray:
        """uint8 RGB (T, H, W, 3) -> CLIP-normalized (T, 224, 224, 3)."""
        from ..ops.image import resize_separable

        s = self.model.vcfg.image_size
        x = frames.astype(np.float32) / 255.0
        x = np.asarray(resize_separable(jnp.asarray(x), s, s))
        return (x - IMAGE_MEAN) / IMAGE_STD

    def prompt_ids(self, prompt: str, n_frames: int) -> np.ndarray:
        """``<image>``*T + '\\n' + prompt in the "simple" conversation
        (utils/chatunivi.py:130-141; mm_use_im_start_end is False in the
        deployed checkpoint)."""
        user = DEFAULT_IMAGE_TOKEN * n_frames + "\n" + prompt
        return tokenizer_image_token(simple_prompt(user), self.tok)

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        out: list[str] = [""] * len(samples)
        key = (jax.random.PRNGKey(self.seed)
               if self.temperature > 0 else None)
        for i in range(0, len(samples), self.batch):
            grp = list(range(i, min(i + self.batch, len(samples))))
            vids = [self.preprocess_video(self._load_frames(samples[j]))
                    for j in grp]
            ids = [self.prompt_ids(prompts[j], v.shape[0])
                   for j, v in zip(grp, vids)]
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            texts = self.model.generate_batch(
                ids, vids, self.tok, max_new_tokens=self.max_new_tokens,
                temperature=self.temperature, prng_key=sub)
            for j, t in zip(grp, texts):
                # response flattening (utils/chatunivi.py:168-172)
                out[j] = t.replace("\n", " ").replace("\t", " ").strip()
        return out

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        """Reference-exact single-sample entry (video-only model)."""
        return self([{"video_path": video_path}], [prompt])[0]


def load_chatunivi(model_path: str):
    """Assemble from a Chat-UniVi checkpoint dir (config.json + torch
    bins + tokenizer). The deployed 7B config: CLIP ViT-L/14, select
    layer -2, use_cluster with rates 64/32/16 + 1/16 (builder defaults +
    config/model_config.py)."""
    import json
    import os

    import torch
    from transformers import AutoTokenizer, CLIPVisionConfig as HFV
    from transformers import LlamaConfig

    with open(os.path.join(model_path, "config.json")) as f:
        cfg = json.load(f)
    sd = {}
    for fn in sorted(os.listdir(model_path)):
        if fn.endswith((".bin", ".pth")):
            sd.update(torch.load(os.path.join(model_path, fn),
                                 map_location="cpu"))
    hfv = HFV(**cfg["vision_config"]) if "vision_config" in cfg else HFV()
    vcfg = CLIPVisionConfig.from_hf(hfv, projection_dim=1)
    llm_cfg = LLMConfig.from_hf(LlamaConfig(**{
        k: v for k, v in cfg.items() if not isinstance(v, (dict, list))}))
    fl = cfg.get("mm_vision_select_layer", -2)
    tok = AutoTokenizer.from_pretrained(model_path)
    params = convert_chatunivi_state(vcfg, llm_cfg, sd, feature_layer=fl)
    return ChatUniVi(vcfg, llm_cfg, params, feature_layer=fl), tok
