"""Raw-input dataset for end-to-end fine-tuning (``toolkit/data/
e2e_data.py`` equivalent).

Per modality (reference semantics):
- text : transcripts CSV -> tokenizer, longest-padding, empty subtitles get
  a placeholder (e2e_data.py:63-70, NaN guard)
- audio: wav -> 8 uniform 2 s windows (ImageBind-style clip sampling,
  load_and_transform_audio_data) -> (8, 32000) float
- video: face npy -> n_frms uniform frames, CLIP/VideoMAE preprocessing
  sizes (e2e_data.py:72-86)

Everything is precomputed into static-shape arrays so the jitted CV trainer
consumes it exactly like the feature datasets (arrays() pytree protocol).
Video defaults to the compact layout: source-resolution uint8 frames
(``videos_u8``) with resize/normalize fused into the jitted model forward —
~600 KB/clip instead of ~9.6 MB/clip precomputed float, so reference-scale
e2e corpora fit device memory.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

SEG_N = 8
SEG_LEN = 2 * 16000


def audio_segments(wav: np.ndarray, n_seg: int = SEG_N,
                   seg_len: int = SEG_LEN) -> np.ndarray:
    """Uniform n_seg windows of seg_len samples; short wavs tile."""
    wav = np.asarray(wav, np.float32)
    if len(wav) < seg_len:
        wav = np.resize(wav, seg_len)
    starts = np.linspace(0, len(wav) - seg_len, n_seg).astype(int)
    return np.stack([wav[s: s + seg_len] for s in starts])


@dataclass
class E2EDataset:
    names: list
    emos: np.ndarray
    vals: np.ndarray
    modality: str
    data: dict            # modality-specific arrays

    def __len__(self):
        return len(self.names)

    # FeatureDataset protocol compat (dims are meaningless for raw inputs)
    adim = tdim = vdim = property(lambda self: -1)
    feat_type = "utt"

    def arrays(self) -> dict:
        out = dict(self.data)
        out["emos"] = self.emos
        out["vals"] = self.vals
        return out

    @classmethod
    def build_audio(cls, names, emos, vals, audio_root, n_seg: int = SEG_N,
                    seg_len: int = SEG_LEN) -> "E2EDataset":
        from ..io import wav as wav_io

        auds = np.stack([audio_segments(
            wav_io.read_wav_16k(os.path.join(audio_root, f"{n}.wav")),
            n_seg, seg_len) for n in names])
        return cls(list(names), np.asarray(emos, np.int32),
                   np.asarray(vals, np.float32), "audio", {"audios": auds})

    @classmethod
    def build_text(cls, names, emos, vals, trans_csv, tokenizer,
                   max_length: int = 256) -> "E2EDataset":
        import csv

        with open(trans_csv, newline="", encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        col = next(c for c in ("sentence", "chinese", "english")
                   if rows and c in rows[0])
        name2trans = {r["name"]: (r.get(col) or "") for r in rows}
        ids_list = []
        for n in names:
            text = name2trans.get(n, "") or "no subtitle."  # NaN guard (:64)
            ids = tokenizer.encode(text, add_special_tokens=False)[:max_length]
            ids_list.append(ids)
        S = max(len(i) for i in ids_list)
        pad = getattr(tokenizer, "pad_token_id", 0) or 0
        input_ids = np.full((len(names), S), pad, np.int32)
        mask = np.zeros((len(names), S), np.int32)
        for b, ids in enumerate(ids_list):
            input_ids[b, : len(ids)] = ids
            mask[b, : len(ids)] = 1
        return cls(list(names), np.asarray(emos, np.int32),
                   np.asarray(vals, np.float32), "text",
                   {"input_ids": input_ids, "attention_mask": mask})

    @classmethod
    def build_video(cls, names, emos, vals, face_root, n_frms: int = 16,
                    image_size: int = 224,
                    mean=(0.48145466, 0.4578275, 0.40821073),
                    std=(0.26862954, 0.26130258, 0.27577711),
                    compact: bool = True) -> "E2EDataset":
        """``compact=True`` (default) keeps frames as source-resolution uint8
        BGR under ``videos_u8``; the model preprocesses on device inside jit
        (models/e2e_model.preprocess_video_u8) — 16-32x less memory than
        precomputed float frames, so reference-scale corpora fit in HBM.
        ``compact=False`` reproduces the old precomputed-float layout."""
        if compact:
            default_stats = ((0.48145466, 0.4578275, 0.40821073),
                             (0.26862954, 0.26130258, 0.27577711))
            if (tuple(mean), tuple(std)) != default_stats:
                import warnings

                warnings.warn(
                    "build_video(compact=True) stores raw uint8 frames; the "
                    "MODEL config (E2EConfig/VideoMAEPretrain pixel_mean/"
                    "pixel_std) governs normalization — the mean/std passed "
                    "here are ignored. Pass compact=False for precomputed "
                    "float frames.", stacklevel=2)
            vids = []
            for n in names:
                arr = np.load(os.path.join(face_root, f"{n}.npy"))
                idx = np.linspace(0, len(arr) - 1, n_frms).astype(int)
                vids.append(np.ascontiguousarray(arr[idx]))
            return cls(list(names), np.asarray(emos, np.int32),
                       np.asarray(vals, np.float32), "video",
                       {"videos_u8": np.stack(vids).astype(np.uint8)})
        import jax
        import jax.numpy as jnp

        vids = []
        for n in names:
            arr = np.load(os.path.join(face_root, f"{n}.npy"))  # (T,H,W,3) BGR
            idx = np.linspace(0, len(arr) - 1, n_frms).astype(int)
            frames = arr[idx][..., ::-1].astype(np.float32) / 255.0  # RGB
            frames = np.asarray(jax.image.resize(
                jnp.asarray(frames), (n_frms, image_size, image_size, 3),
                method="bicubic"))
            vids.append((frames - np.asarray(mean)) / np.asarray(std))
        return cls(list(names), np.asarray(emos, np.int32),
                   np.asarray(vals, np.float32), "video",
                   {"videos": np.stack(vids).astype(np.float32)})
