"""Raw-media MLLM training: online frozen-encoder features + train-time
augmentation.

Reference training reads raw faces/frames and audio through
``AlproVideoTrainProcessor`` (random-resized-crop + flip,
``my_affectgpt/processors/video_processor.py:29-68``) inside the dataset
(``mercaptionplus_dataset.py:25-105``) and encodes with FROZEN encoders in
the model forward. The round-1 build trained from precomputed feature
stores only (VERDICT.md Missing #5) — this module closes that gap:

  * faces load from the openface-face store (``{name}.npy`` (T, S, S, 3)
    uint8), uniformly resampled to ``n_frms`` (load_face semantics),
  * augmentation runs ON DEVICE per batch (mllm/augment.py),
  * the frozen encoders from the registry (mllm/encoders.py) encode the
    augmented batch — gradients never flow into them (identical math to
    the reference's frozen in-forward encoders),
  * the result feeds the standard ``build_batch`` -> Runner path.
"""

from __future__ import annotations

import os

import numpy as np

from .augment import augment_faces
from .data import CaptionDataset, _pad_seq_to_multiple, build_batch


def load_face_frames(face_dir: str, name: str, n_frms: int) -> np.ndarray:
    """(n_frms, S, S, 3) uint8 — uniform resample like the reference's
    load_face (video_processor.py load_face / functions.py
    load_video_from_npy 'uniform')."""
    x = np.load(os.path.join(face_dir, name + ".npy"))
    if x.ndim == 3:
        x = x[None]
    idx = np.linspace(0, len(x) - 1, n_frms).round().astype(int)
    return np.ascontiguousarray(x[idx]).astype(np.uint8)


def encode_batch(names: list[str], face_dir: str, audio_dir: str,
                 visual_encode, acoustic_encode, *, n_frms: int,
                 rng: np.random.Generator | None = None,
                 out_size: int | None = None) -> tuple[dict, dict]:
    """Load + (optionally) augment + encode one batch of raw media.
    ``rng=None`` disables augmentation (eval processors crop
    deterministically — we pass frames through unaugmented)."""
    faces = {n: load_face_frames(face_dir, n, n_frms) for n in names}
    if rng is not None:
        faces = augment_faces(faces, rng, out_size)
    vfeats = visual_encode(faces)

    from ..io.wav import read_wav_16k

    wavs = {n: read_wav_16k(os.path.join(audio_dir, n + ".wav"))
            for n in names}
    afeats = acoustic_encode(wavs)
    return vfeats, afeats


def raw_batch_iterator(dataset: CaptionDataset, tokenizer, num_av_tokens: int,
                       batch_size: int, *, face_dir: str, audio_dir: str,
                       visual_encode, acoustic_encode, n_frms: int = 8,
                       augment: bool = True, seed: int = 0,
                       max_len: int = 512, pad_to_multiple: int = 32):
    """Infinite shuffled iterator over raw media -> encoded feature batches
    (the raw-media analogue of ``data.batch_iterator``)."""
    rng = np.random.default_rng(seed)
    aug_rng = np.random.default_rng(seed + 1) if augment else None
    n = len(dataset)
    while True:
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            samples = [dataset.sample(int(j), rng, load_features=False)
                       for j in order[i: i + batch_size]]
            names = [s["name"] for s in samples]
            vfeats, afeats = encode_batch(
                names, face_dir, audio_dir, visual_encode, acoustic_encode,
                n_frms=n_frms, rng=aug_rng)
            for s in samples:
                s["video_feats"] = np.asarray(vfeats[s["name"]], np.float32)
                s["audio_feats"] = np.asarray(afeats[s["name"]], np.float32)
            batch = build_batch(samples, tokenizer, num_av_tokens, max_len)
            yield _pad_seq_to_multiple(batch, pad_to_multiple, max_len)


def build_raw_val_batches(val_dataset: CaptionDataset, tokenizer,
                          num_av_tokens: int, batch_size: int, *,
                          face_dir: str, audio_dir: str, visual_encode,
                          acoustic_encode, n_frms: int = 8,
                          max_len: int = 512) -> list[dict]:
    """Validation batches encoded ONCE without augmentation (the reference's
    eval processor applies no random transforms)."""
    vrng = np.random.default_rng(0)
    spans = [list(range(i, min(i + batch_size, len(val_dataset))))
             for i in range(0, len(val_dataset), batch_size)]
    if len(spans) > 1 and len(spans[-1]) < batch_size:
        spans = spans[:-1]
    out = []
    for span in spans:
        samples = [val_dataset.sample(j, vrng, load_features=False)
                   for j in span]
        names = [s["name"] for s in samples]
        vfeats, afeats = encode_batch(
            names, face_dir, audio_dir, visual_encode, acoustic_encode,
            n_frms=n_frms, rng=None)
        for s in samples:
            s["video_feats"] = np.asarray(vfeats[s["name"]], np.float32)
            s["audio_feats"] = np.asarray(afeats[s["name"]], np.float32)
        out.append(_pad_seq_to_multiple(
            build_batch(samples, tokenizer, num_av_tokens, max_len),
            32, max_len))
    return out
