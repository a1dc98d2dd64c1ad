"""MLLM training datasets (MERCaptionPlus / OVMERD equivalents).

Reference (``my_affectgpt/datasets/datasets/mercaptionplus_dataset.py:25-105``
+ ``base_dataset``): per-clip annotations join three CSVs — openset labels,
reason descriptions, subtitles — and the QA prompt asks for either the
``description`` or the ``ovlabel`` (label_type candidates). Raw media goes
through processors; here the AV side reads the offline feature store (the
frozen encoders already ran in the extraction pipeline — same factorization
the reference uses for its 'face'/'frame' precomputed features).

Batches come out right-padded with static shapes per length bucket:
input_ids / attention_mask / labels (-100 outside the answer span) /
splice_start / video_feats / audio_feats (+masks) — exactly the AffectGPT
training contract (mllm/affectgpt.py).
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass, field

import numpy as np

from .chat import DEFAULT_SYSTEM, Conversation

QUESTION_BY_LABEL_TYPE = {
    "description": ("Please describe the person's emotional state in detail "
                    "and explain the evidence."),
    "ovlabel": ("Please list every emotion label conveyed by the person, "
                "separated by commas."),
}


def _read_csv(path):
    with open(path, newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def string_to_list(value: str) -> list[str]:
    from ..ops.ov_metrics import string_to_list as _impl

    return _impl(value)


@dataclass
class CaptionDataset:
    """Annotation join + feature reads for MLLM training."""

    annotations: list[dict]
    video_feat_dir: str
    audio_feat_dir: str
    max_video_frames: int = 64
    max_audio_frames: int = 64
    label_type: str = "description"     # description | ovlabel | mixed
    # Multi-stream mode (cfg.face_or_frame set): per-stream feature dirs;
    # unset streams fall back to video_feat_dir (face/frame/image) or
    # audio_feat_dir (audio) — the reference points 'face' at openface-crop
    # features and 'frame' at raw-video features of the same clips.
    face_or_frame: str | None = None
    stream_dirs: dict = field(default_factory=dict)

    @classmethod
    def from_csvs(cls, openset_csv: str, reason_csv: str | None,
                  subtitle_csv: str | None, video_feat_dir: str,
                  audio_feat_dir: str, **kw) -> "CaptionDataset":
        """reason_csv=None covers the ovlabel-only datasets (MER2026-T2
        Human_Dataset / MER2026OV join just openset + subtitle and set
        label_type_candidates=['ovlabel'] — human_dataset.py:40-60)."""
        name2openset = {}
        for r in _read_csv(openset_csv):
            labels = string_to_list(r.get("openset", "")) or ["neutral"]
            name2openset[r["name"]] = ", ".join(labels)
        name2reason = ({r["name"]: (r.get("reason") or "")
                        for r in _read_csv(reason_csv)} if reason_csv
                       else {})
        if not reason_csv:
            kw.setdefault("label_type", "ovlabel")
        name2sub = {}
        if subtitle_csv:
            for r in _read_csv(subtitle_csv):
                name2sub[r["name"]] = (r.get("english") or
                                       r.get("sentence") or
                                       r.get("chinese") or "")
        annotations = []
        for name, openset in name2openset.items():
            if not os.path.exists(os.path.join(video_feat_dir, name + ".npy")):
                continue
            annotations.append({
                "name": name, "subtitle": name2sub.get(name, ""),
                "description": name2reason.get(name, ""), "ovlabel": openset})
        return cls(annotations=annotations, video_feat_dir=video_feat_dir,
                   audio_feat_dir=audio_feat_dir, **kw)

    def __len__(self):
        return len(self.annotations)

    def _feat(self, root, name, cap):
        x = np.load(os.path.join(root, name + ".npy")).astype(np.float32)
        if x.ndim == 1:
            x = x[None]
        if len(x) > cap:
            idx = np.linspace(0, len(x) - 1, cap).astype(int)
            x = x[idx]
        return x

    def sample(self, idx: int, rng: np.random.Generator) -> dict:
        ann = self.annotations[idx]
        if self.label_type == "mixed":  # label_type_candidates (:83)
            label_type = ("description", "ovlabel")[int(rng.integers(0, 2))]
        else:
            label_type = self.label_type
        out = {
            "subtitle": ann["subtitle"],
            "question": QUESTION_BY_LABEL_TYPE[label_type],
            "answer": ann[label_type],
        }
        if self.face_or_frame is None:
            out["video_feats"] = self._feat(self.video_feat_dir, ann["name"],
                                            self.max_video_frames)
            out["audio_feats"] = self._feat(self.audio_feat_dir, ann["name"],
                                            self.max_audio_frames)
            return out
        from .affectgpt import stream_plan

        _, needed = stream_plan(self.face_or_frame)
        for stream in needed:
            default = (self.audio_feat_dir if stream == "audio"
                       else self.video_feat_dir)
            cap = (self.max_audio_frames if stream == "audio"
                   else self.max_video_frames)
            out[f"{stream}_feats"] = self._feat(
                self.stream_dirs.get(stream, default), ann["name"], cap)
        return out


def build_batch(samples: list[dict], tokenizer, num_av_tokens: int,
                max_len: int = 512, conv: Conversation | None = None) -> dict:
    """Right-padded training batch with -100 labels outside the answer."""
    conv = conv or Conversation()
    eos = tokenizer.eos_token_id
    per = []
    for s in samples:
        pre, post = conv.render(s["subtitle"], s["question"])
        pre_ids = tokenizer.encode(pre, add_special_tokens=True)
        post_ids = tokenizer.encode(post, add_special_tokens=False)
        ans_ids = tokenizer.encode(s["answer"],
                                   add_special_tokens=False) + [eos]
        ids = pre_ids + [0] * num_av_tokens + post_ids + ans_ids
        labels = ([-100] * (len(ids) - len(ans_ids))) + ans_ids
        ids, labels = ids[:max_len], labels[:max_len]
        per.append((ids, labels, min(len(pre_ids),
                                     max(max_len - num_av_tokens, 0))))

    B = len(samples)
    S = max(len(p[0]) for p in per)
    Tv = max(s["video_feats"].shape[0] for s in samples)
    Ta = max(s["audio_feats"].shape[0] for s in samples)
    Dv = samples[0]["video_feats"].shape[1]
    Da = samples[0]["audio_feats"].shape[1]

    batch = {
        "input_ids": np.zeros((B, S), np.int32),
        "attention_mask": np.zeros((B, S), np.int32),
        "labels": np.full((B, S), -100, np.int64),
        "splice_start": np.zeros(B, np.int32),
        "video_feats": np.zeros((B, Tv, Dv), np.float32),
        "audio_feats": np.zeros((B, Ta, Da), np.float32),
        "video_mask": np.zeros((B, Tv), np.int32),
        "audio_mask": np.zeros((B, Ta), np.int32),
    }
    for b, ((ids, labels, start), s) in enumerate(zip(per, samples)):
        batch["input_ids"][b, : len(ids)] = ids
        batch["attention_mask"][b, : len(ids)] = 1
        batch["labels"][b, : len(labels)] = labels
        batch["splice_start"][b] = start
        tv = s["video_feats"].shape[0]
        ta = s["audio_feats"].shape[0]
        batch["video_feats"][b, :tv] = s["video_feats"]
        batch["audio_feats"][b, :ta] = s["audio_feats"]
        batch["video_mask"][b, :tv] = 1
        batch["audio_mask"][b, :ta] = 1
    return batch


def _pad_stream(samples: list[dict], key: str, multiple: int = 1,
                cap: int | None = None):
    """Stack ragged (T_i, D) features -> (B, T_max, D) + (B, T_max) mask.
    ``multiple`` rounds T_max up to a bucket so repeated inference batches
    reuse compiled shapes; ``cap`` bounds the bucket (frame-position tables
    are sized to the config's max frames)."""
    B = len(samples)
    T = max(s[key].shape[0] for s in samples)
    if multiple > 1:
        bucket = -(-T // multiple) * multiple
        T = max(T, min(bucket, cap) if cap is not None else bucket)
    D = samples[0][key].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    mask = np.zeros((B, T), np.int32)
    for b, s in enumerate(samples):
        t = s[key].shape[0]
        feats[b, :t] = s[key]
        mask[b, :t] = 1
    return feats, mask


def build_stream_batch(samples: list[dict], tokenizer, cfg,
                       max_len: int = 512, system: str | None = None) -> dict:
    """Multi-stream training batch for a ``face_or_frame`` config: one
    placeholder run per spliced segment (reference builds the same prompts in
    base_dataset.get_prompt_for_multimodal :463-549 and splices every segment
    in affectgpt.forward :686-711).

    ``samples`` carry ``{stream}_feats`` for each needed stream plus
    subtitle/question/answer strings. Raises if a prompt's placeholder runs
    don't fit ``max_len`` (only the answer may be truncated).
    """
    from .affectgpt import stream_plan
    from .chat import DEFAULT_SYSTEM, encode_stream_prompt

    segments, needed = stream_plan(cfg.face_or_frame)
    eos = tokenizer.eos_token_id
    per = []
    for s in samples:
        ids, starts = encode_stream_prompt(
            tokenizer, cfg, s.get("subtitle", ""), s["question"],
            system=DEFAULT_SYSTEM if system is None else system)
        if len(ids) > max_len:
            raise ValueError(f"prompt length {len(ids)} exceeds max_len "
                             f"{max_len}; placeholder runs must not truncate")
        ans = tokenizer.encode(s["answer"], add_special_tokens=False) + [eos]
        full = (ids + ans)[:max_len]
        labels = ([-100] * len(ids) + ans)[:max_len]
        per.append((full, labels, starts))

    B = len(samples)
    S = max(len(p[0]) for p in per)
    batch = {
        "input_ids": np.zeros((B, S), np.int32),
        "attention_mask": np.zeros((B, S), np.int32),
        "labels": np.full((B, S), -100, np.int64),
    }
    for seg in segments:
        batch[f"splice_{seg}"] = np.zeros(B, np.int32)
    for stream in sorted(needed):
        feats, mask = _pad_stream(samples, f"{stream}_feats")
        batch[f"{stream}_feats"] = feats
        batch[f"{stream}_mask"] = mask
    for b, (ids, labels, starts) in enumerate(per):
        batch["input_ids"][b, : len(ids)] = ids
        batch["attention_mask"][b, : len(ids)] = 1
        batch["labels"][b, : len(labels)] = labels
        for seg, start in starts.items():
            batch[f"splice_{seg}"][b] = start
    return batch


def _pad_seq_to_multiple(batch: dict, pad_to_multiple: int, max_len: int):
    """Round sequence length up so XLA sees few shapes."""
    S = batch["input_ids"].shape[1]
    target = min(-(-S // pad_to_multiple) * pad_to_multiple, max_len)
    if target > S:
        pad = target - S
        for k in ("input_ids", "attention_mask"):
            batch[k] = np.pad(batch[k], ((0, 0), (0, pad)))
        batch["labels"] = np.pad(batch["labels"], ((0, 0), (0, pad)),
                                 constant_values=-100)
    return batch


def stream_batch_iterator(dataset: CaptionDataset, tokenizer, model_cfg,
                          batch_size: int, seed: int = 0, max_len: int = 512,
                          pad_to_multiple: int = 32):
    """Infinite shuffled iterator of multi-stream training batches
    (``model_cfg.face_or_frame`` set)."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    while True:
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            samples = [dataset.sample(int(j), rng)
                       for j in order[i: i + batch_size]]
            batch = build_stream_batch(samples, tokenizer, model_cfg,
                                       max_len)
            yield _pad_seq_to_multiple(batch, pad_to_multiple, max_len)


def batch_iterator(dataset: CaptionDataset, tokenizer, num_av_tokens: int,
                   batch_size: int, seed: int = 0, max_len: int = 512,
                   pad_to_multiple: int = 32):
    """Infinite shuffled iterator of training batches (the reference runs
    iter-based epochs — runner_base.py:198-293 + base_task.py:101-185).

    Sequence lengths round up to ``pad_to_multiple`` so XLA sees few shapes.
    """
    rng = np.random.default_rng(seed)
    n = len(dataset)
    while True:
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            samples = [dataset.sample(int(j), rng)
                       for j in order[i: i + batch_size]]
            batch = build_batch(samples, tokenizer, num_av_tokens, max_len)
            yield _pad_seq_to_multiple(batch, pad_to_multiple, max_len)


class FakeWordTokenizer:
    """Hash-bucket word tokenizer for smoke configs without a checkpoint."""

    def __init__(self, vocab_size: int = 256):
        self.vocab_size = vocab_size
        self.eos_token_id = 2

    def encode(self, text, add_special_tokens=True):
        return [3 + (hash(w) % (self.vocab_size - 3)) for w in text.split()]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids if i != self.eos_token_id)
