"""Fused Whisper log-mel frontend as a Pallas TPU kernel.

The XLA path (ops/mel.py) materializes the framed signal — a
(B, 3000, 400) fp32 tensor, 4.8 MB/clip — in HBM before the FFT. This kernel
never materializes frames anywhere: the wav is pre-chunked (in XLA, for
free) into (B, 3003, 160) hop-sized rows; each 400-sample Hann-windowed
frame is then three consecutive chunk rows, so the windowed DFT of 200
frames is exactly

    real = rows[t:t+200] @ C0 + rows[t+1:t+201] @ C1 + rows[t+2:t+202] @ C2

with the window folded into the (160, 201) cosine/sine matrices — shifted
row-slices plus MXU matmuls, no gather and no lane-crossing reshape (which
Mosaic cannot lower). Power and the mel filterbank matmul happen in the same
VMEM residency; only the (200, 80) mel block goes back to HBM.

FLOPs go up (dense DFT vs FFT) but the op is HBM-bandwidth-bound and the
MXU is idle in this frontend — exactly the trade the TPU wants.

Measured on a v5e chip: max |err| vs the FFT path 4.4e-6 (HIGHEST-precision
MXU passes — default bf16 inputs lose ~0.03 in the log domain from DFT
cancellation), 1.15x faster end-to-end including host transfer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mel import HOP, N_FFT, N_FRAMES, N_MELS, mel_filter_bank

TILE_F = 200                  # frames per grid step (3000 = 15 * 200)
_PAD = N_FFT // 2             # 200 reflect-pad samples each side
_N_BINS = N_FFT // 2 + 1      # 201
_CHUNKS = 3008                # ceil(480400/160)=3003, +5 pad for aligned 208-row loads


def _windowed_dft_parts() -> tuple[np.ndarray, np.ndarray]:
    """Hann-windowed DFT split into 3 hop-aligned row bands:
    (3, 160, 201) cos and sin. Band 2's tail rows (320..399 only) are live;
    the rest are zero so chunk row i+2's later samples don't contribute."""
    k = np.arange(N_FFT)[:, None]
    f = np.arange(_N_BINS)[None, :]
    ang = -2.0 * np.pi * k * f / N_FFT
    w = np.hanning(N_FFT + 1)[:-1].astype(np.float64)[:, None]
    cos_full = (np.cos(ang) * w).astype(np.float32)   # (400, 201)
    sin_full = (np.sin(ang) * w).astype(np.float32)
    cos = np.zeros((3, HOP, _N_BINS), np.float32)
    sin = np.zeros((3, HOP, _N_BINS), np.float32)
    for c in range(3):
        rows = min(HOP, N_FFT - c * HOP)              # 160, 160, 80
        cos[c, :rows] = cos_full[c * HOP: c * HOP + rows]
        sin[c, :rows] = sin_full[c * HOP: c * HOP + rows]
    return cos, sin


def _kernel(rows_ref, cos_ref, sin_ref, fb_ref, out_ref):
    t = pl.program_id(1)
    start = pl.multiple_of(t * TILE_F, TILE_F)
    # one aligned (208, 160) load; the +1/+2 row shifts via sublane rolls
    # (unaligned sublane offsets cannot be vector-loaded directly)
    a_full = rows_ref[0, pl.ds(start, TILE_F + 8), :]
    a0 = a_full[:TILE_F]
    # circular shift by size-1/-2 == shift left by 1/2 (negative shifts are
    # rejected); wrapped rows land beyond TILE_F and are sliced away
    a1 = pltpu.roll(a_full, TILE_F + 7, 0)[:TILE_F]
    a2 = pltpu.roll(a_full, TILE_F + 6, 0)[:TILE_F]
    real = (jnp.dot(a0, cos_ref[0], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) +
            jnp.dot(a1, cos_ref[1], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) +
            jnp.dot(a2, cos_ref[2], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST))
    imag = (jnp.dot(a0, sin_ref[0], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) +
            jnp.dot(a1, sin_ref[1], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) +
            jnp.dot(a2, sin_ref[2], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST))
    power = real * real + imag * imag                  # (TILE_F, 201)
    out_ref[0] = jnp.dot(power, fb_ref[...],
                         preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)   # (TILE_F, 80)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mel_power_pallas(wav: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(B, 480000) fp32 -> (B, 3000, 80) mel power spectrogram."""
    B = wav.shape[0]
    padded = jnp.pad(wav, ((0, 0), (_PAD, _PAD)), mode="reflect")
    padded = jnp.pad(padded, ((0, 0), (0, _CHUNKS * HOP - padded.shape[1])))
    rows = padded.reshape(B, _CHUNKS, HOP)
    cos, sin = _windowed_dft_parts()
    fb = mel_filter_bank().T                           # (201, 80)

    grid = (B, N_FRAMES // TILE_F)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _CHUNKS, HOP), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, HOP, _N_BINS), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, HOP, _N_BINS), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_BINS, N_MELS), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_F, N_MELS), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N_FRAMES, N_MELS), jnp.float32),
        interpret=interpret,
    )(rows, jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(fb))


@functools.partial(jax.jit, static_argnames=("interpret",))
def log_mel_spectrogram_fused(wav: jnp.ndarray,
                              interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.mel.log_mel_spectrogram: (B, 480000) ->
    (B, 80, 3000) Whisper features."""
    mel = jnp.swapaxes(mel_power_pallas(wav, interpret=interpret), 1, 2)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0
