"""Batched visual feature extraction.

Reference semantics (``extract_vision_huggingface.py``): per clip — load the
OpenFace face npy ``(T, 112, 112, 3)`` BGR uint8, optionally resample frames
uniformly, preprocess per the model's processor (CLIP: resize 224 bicubic,
rescale, normalize, RGB), forward frames in sub-batches of 32
(``get_image_features``), FRA = per-frame (T, D), UTT = frame mean
(``:183-189``).

TPU-native: frames from MANY clips are pooled into one stream and forwarded
in large fixed-size batches; preprocessing (resize/normalize/BGR->RGB) runs
on device inside the jitted step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..encoders.vit_clip import CLIPVisionConfig, CLIPVisionEncoder

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def resample_frames_uniform(n_frames: int, max_frames: int = 64) -> np.ndarray:
    """Uniform frame index sampling (extract_vision_huggingface.py:44-56):
    keep all when short, else evenly spaced indices."""
    if n_frames <= max_frames:
        return np.arange(n_frames)
    step = n_frames / max_frames
    return np.minimum((np.arange(max_frames) * step).astype(np.int64), n_frames - 1)


def preprocess_faces_device(frames: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """(N, H, W, 3) BGR uint8 -> (N, S, S, 3) normalized RGB float32, on
    device: separable-matmul resize (MXU) with the affine normalization
    folded around it — numerically identical to the jax.image.resize
    pipeline (ops/image.py; exactness tested)."""
    from ..ops.image import fused_face_preprocess

    return fused_face_preprocess(frames, image_size, CLIP_MEAN, CLIP_STD)


@dataclass
class VisionExtractor:
    cfg: CLIPVisionConfig
    params: dict
    batch_size: int = 64
    max_frames: int = 64
    precision: object = jax.lax.Precision.HIGHEST
    # "bf16" / "int8": production modes (see features/audio.py)
    compute_dtype: str | None = None

    def __post_init__(self):
        fast = self.compute_dtype in ("bf16", "int8")
        precision = jax.lax.Precision.DEFAULT if fast else self.precision
        dot_general = None
        if self.compute_dtype == "int8":
            from ..ops.quant import int8_dot_general
            dot_general = int8_dot_general
        enc = CLIPVisionEncoder(self.cfg, precision=precision,
                                dot_general=dot_general)
        cast = (lambda x: x.astype(jnp.bfloat16)) if fast else (lambda x: x)

        def core(params, frames):
            pix = preprocess_faces_device(frames, self.cfg.image_size)
            out = enc.apply({"params": params}, cast(pix))["image_embeds"]
            return out.astype(jnp.float32)

        # UTT: the per-clip scatter-add is FUSED into the forward dispatch
        # (a separate device call costs a host round-trip per batch on the
        # link-bound dev platform); only the pooled (n_clips, D) ships
        self._fwd = jax.jit(core)
        self._fwd_acc = jax.jit(
            lambda p, frames, acc, ids: acc.at[ids].add(core(p, frames)))
        params = self.params
        if fast:
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16), params)
        self._params = jax.device_put(params)

    def extract(self, faces: dict[str, np.ndarray], level: str = "FRA",
                ) -> dict[str, np.ndarray]:
        """faces: name -> (T, H, W, 3) BGR uint8 face crops."""
        # pool all (clip, frame) jobs into one stream of fixed-size batches
        jobs: list[tuple[str, int, np.ndarray]] = []
        counts: dict[str, int] = {}
        for name, arr in faces.items():
            idx = resample_frames_uniform(len(arr), self.max_frames)
            if len(idx) == 0:
                raise ValueError(f"clip {name!r} has no frames to pool "
                                 "(empty face array)")
            counts[name] = len(idx)
            for fi, ai in enumerate(idx):
                jobs.append((name, fi, arr[ai]))

        utt = level.upper().startswith("UTT")
        slot = {n: i for i, n in enumerate(faces)}
        scrap = len(faces)          # pad rows accumulate into a junk slot
        acc = None
        results: dict[str, dict[int, np.ndarray]] = {n: {} for n in faces}
        bs = self.batch_size
        h, w = jobs[0][2].shape[:2]
        # dispatch-then-collect: queue every host->device copy + forward
        # first (JAX overlaps transfer and compute), materialize after
        pending = []
        for i in range(0, len(jobs), bs):
            group = jobs[i: i + bs]
            batch = np.zeros((bs, h, w, 3), np.uint8)  # fixed shape: 1 compile
            for r, (_, _, frame) in enumerate(group):
                batch[r] = frame
            if utt:
                ids = np.full((bs,), scrap, np.int32)
                for r, (name, _, _) in enumerate(group):
                    ids[r] = slot[name]
                if acc is None:
                    acc = jnp.zeros((scrap + 1, self.cfg.projection_dim),
                                    jnp.float32)
                acc = self._fwd_acc(self._params, jnp.asarray(batch), acc,
                                    jnp.asarray(ids))
            else:
                pending.append((group, self._fwd(self._params,
                                                 jnp.asarray(batch))))
        if utt:
            arr = np.asarray(acc)
            return {n: arr[slot[n]] / counts[n] for n in faces}
        for group, res in pending:
            embeds = np.asarray(res)
            for r, (name, fi, _) in enumerate(group):
                results[name][fi] = embeds[r]

        out = {}
        for name in faces:
            feat = np.stack([results[name][fi] for fi in range(counts[name])])
            out[name] = feat
        return out
