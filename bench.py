"""Benchmark entry point (driver contract: prints ONE JSON line).

North-star metric (BASELINE.json): feature-extraction clips/sec/chip.
Headline ``value`` = HuBERT-large audio extraction clips/s (best production
mode); ``vs_baseline`` = speedup over the reference's execution model (one
clip per forward, sequential — extract_audio_huggingface.py:72-110) on the
SAME chip.

Numeric-class policy (BASELINE.md "How the >=5x target is read"): the
headline is the PRODUCTION mode (bf16/int8 — the reference's own
TF32/fp16 class); the fp32-HIGHEST parity mode serving the <1e-3 contract
is reported alongside (``audio_parity_clips_per_sec``) and is bounded
~3x by HIGHEST-matmul cost, by design.

``detail`` carries the round-2 legs (VERDICT.md Weak #1-3, #10):
  * audio        — fp32-HIGHEST / bf16 / int16-wire+bf16 modes, device-
                   resident audio-sec/s, and **MFU** (device + end-to-end)
                   from an analytic HuBERT FLOPs model (conv frontend +
                   24-layer transformer).
  * vision       — CLIP-ViT-L/14 frames/s: batched on-device-preprocess
                   pipeline vs the reference's sequential per-clip loop
                   (extract_vision_huggingface.py:104-189), + MFU.
  * mllm_train   — AffectGPT train-step tokens/s at a 1.1B-param LLM
                   (TinyLlama shape: H=2048, L=22, I=5632, vocab 32000)
                   with frozen base + LoRA, bf16, chunked LM loss, no
                   remat, production async dispatch — the Runner path
                   (train_configs/..._face_lz.yaml:58-90 scale); a
                   continuity sub-leg keeps the r3/r4 shape + method.
  * serve        — continuous-batching decode tokens/s at serving shapes
                   (8/16 slots), bf16 and weight-only int8; scan legs
                   report the prefill-separated MARGINAL decode rate vs
                   the weight+KV HBM roofline, plus B=32 peak-throughput
                   and sustained ragged-admission legs.

Each leg is fault-isolated: a leg failure records leg.error and the other
legs still report. Large models are INITIALIZED ON DEVICE (jitted init) —
this dev platform's host link is ~6 MB/s, so host-side weights would take
minutes to ship; real deployments load from fast storage.

Timing forces host materialization (np.asarray) because this platform's
block_until_ready does not synchronize. MFU denominator: TPU v5e bf16 peak
197 TFLOP/s (394 int8).
"""

from __future__ import annotations

import json
import time

import numpy as np

PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s
HBM_BW = 819e9      # TPU v5e HBM bandwidth (bytes/s) — decode roofline
TIME_BUDGET_S = float(__import__("os").environ.get("MERTPU_BENCH_BUDGET", 2400))
_T0 = time.perf_counter()

# Round-4 official captures (BENCH_r04.json) — every leg reports its delta
# vs these so cross-round drift is visible INSIDE the artifact (VERDICT r4
# next #1: single-shot legs made the r3->r4 mllm_train drop unattributable).
R04 = {
    "audio_clips_per_sec": 107.0,
    "audio_parity_clips_per_sec": 49.5,
    "audio_seq_clips_per_sec": 16.3,
    "vision_frames_per_sec": 573.2,
    "text_texts_per_sec": 1631.3,
    "pipeline_clips_per_sec": 1.8,
    "mllm_train_tokens_per_sec": 10254.5,
    "serve_engine_tok_per_sec": 3443.3,
    "serve_scan_tok_per_sec": 3879.1,
}


def _rep3(measure, best=True):
    """Run a timed measurement 3x; return (headline, spread dict).

    ``best=True`` reports max (tunnel-latency legs: host-link warm-up makes
    the first pass slower; best-of-N is the steady-state capability) with
    the min/median recorded as spread; ``best=False`` reports the median.
    """
    vals = sorted(measure() for _ in range(3))
    headline = vals[-1] if best else vals[1]
    return headline, {"min": round(vals[0], 2), "med": round(vals[1], 2),
                      "max": round(vals[2], 2)}


def _vs_r04(key, value):
    base = R04.get(key)
    if not base:
        return None
    return round(value / base, 3)


def _elapsed():
    return time.perf_counter() - _T0


def _probe_backend(timeout_s: int = 180) -> bool:
    """The TPU plugin's backend init BLOCKS indefinitely when its tunnel is
    unreachable (observed multi-hour outages on the dev platform). Probe
    device discovery in a subprocess with a timeout so the bench fails with
    a diagnostic JSON line instead of hanging the driver."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


# ---------------------------------------------------------------------------
# analytic FLOPs models (used for MFU; XLA cost_analysis is unavailable on
# this PJRT plugin). All counts are FLOPs (2x MACs).
# ---------------------------------------------------------------------------
def hubert_fwd_flops(samples: int) -> float:
    """HuBERT-large forward FLOPs for one clip of ``samples`` @16 kHz:
    7-layer conv frontend (512 ch; k10s5, 4x k3s2, 2x k2s2) + 24 transformer
    layers (H=1024, I=4096) at T = samples/320 frames."""
    f = 0.0
    t, cin = samples, 1
    for k, s in ((10, 5), (3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, 2)):
        t = (t - k) // s + 1
        f += 2.0 * t * k * cin * 512
        cin = 512
    H, I, L = 1024, 4096, 24
    T = t
    per_layer = 8.0 * T * H * H + 4.0 * T * T * H + 4.0 * T * H * I
    return f + L * per_layer


def vit_l_fwd_flops(n_frames: int) -> float:
    """CLIP-ViT-L/14 @224: 257 tokens, H=1024, I=4096, 24 layers + patch
    embed (14x14x3 -> 1024) + final proj (1024 -> 768)."""
    T, H, I, L = 257, 1024, 4096, 24
    per_layer = 8.0 * T * H * H + 4.0 * T * T * H + 4.0 * T * H * I
    patch = 2.0 * 256 * (14 * 14 * 3) * H
    proj = 2.0 * H * 768
    return n_frames * (L * per_layer + patch + proj)


def llm_train_flops(n_params: int, tokens: int) -> float:
    """~6*N*T: fwd 2NT + input-grads 2NT + weight-grads 2NT (value_and_grad
    differentiates every leaf — frozen leaves get zero UPDATES, not zero
    backward FLOPs). Attention O(S^2) terms (~4% at S=512/H=2048) ignored."""
    return 6.0 * n_params * tokens


# ---------------------------------------------------------------------------
# legs
# ---------------------------------------------------------------------------
def leg_audio(detail: dict) -> tuple[float, float]:
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
    wavs16 = {f"clip{i}": (rng.normal(size=int(L)) * 3000).astype(np.int16)
              for i, L in enumerate(lengths)}
    wavs = {n: w.astype(np.float32) / 32768.0 for n, w in wavs16.items()}
    total_audio_sec = float(lengths.sum()) / 16000
    total_flops = float(sum(hubert_fwd_flops(int(L)) for L in lengths))

    buckets = (64000, 112000, MAX_SEGMENT)

    def measure(ex, data):
        t0 = time.perf_counter()
        out = ex.extract(data, level="UTT")
        assert len(out) == n_clips
        return n_clips / (time.perf_counter() - t0)

    results, spreads, extractors = {}, {}, {}
    for mode, kw, data in (
            ("highest", dict(sample_budget=16 * MAX_SEGMENT), wavs),
            ("bf16", dict(compute_dtype="bf16",
                          sample_budget=16 * MAX_SEGMENT), wavs),
            ("i16_bf16", dict(compute_dtype="bf16", transfer_dtype="int16",
                              sample_budget=16 * MAX_SEGMENT), wavs16)):
        ex = AudioExtractor(cfg, params, buckets=buckets, **kw)
        extractors[mode] = ex
        warm = {f"w{i}": np.zeros(b, data[next(iter(data))].dtype)
                for i, b in enumerate(buckets)}
        ex.extract(warm, level="UTT")  # compile each bucket once
        # tunnel latency is warm-up dependent: take the best of three passes
        results[mode], spreads[mode] = _rep3(lambda: measure(ex, data))

    # device-resident compute throughput (local-host capability): data
    # pre-staged on device, batched bf16 forward only. B=128 is the measured
    # v5e sweet spot (1446/1615/1933/2101 audio-s/s at B=16/32/64/128).
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
    dt = time.perf_counter() - t0
    device_rate = (n_rep * B_dev * 10.0) / dt
    mfu_device = (n_rep * B_dev * hubert_fwd_flops(MAX_SEGMENT)) / dt / PEAK_BF16

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

    ref, seq_spread = _rep3(measure_seq)
    ours = max(results.values())

    detail["audio"] = {
        "i16_bf16_clips_per_sec": round(results["i16_bf16"], 2),
        "bf16_clips_per_sec": round(results["bf16"], 2),
        "highest_parity_clips_per_sec": round(results["highest"], 2),
        "sequential_clips_per_sec": round(ref, 2),
        "spread": {**{k: v for k, v in spreads.items()},
                   "sequential": seq_spread},
        "vs_r04": {"production": _vs_r04("audio_clips_per_sec",
                                         results["i16_bf16"]),
                   "parity": _vs_r04("audio_parity_clips_per_sec",
                                     results["highest"])},
        "device_audio_sec_per_sec_bf16": round(device_rate, 1),
        "audio_sec_per_sec_end_to_end": round(
            total_audio_sec * ours / n_clips, 1),
        "mfu_device_resident": round(mfu_device, 4),
        "mfu_end_to_end": round(
            total_flops * (ours / n_clips) / PEAK_BF16, 4),
        "n_clips": n_clips,
        "note": "end-to-end bound by the dev tunnel host link (~6MB/s); "
                "MFU vs v5e bf16 peak 197 TFLOP/s",
    }

    # HIGHEST-vs-bf16 cost ratio (VERDICT r4 next #7): measured on the
    # WORKLOAD itself — the device-resident HuBERT forward (97% of whose
    # FLOPs are matmul) at B=128 pre-staged samples, HIGHEST extractor vs
    # bf16 extractor. Both graphs are already compiled by the extraction
    # passes above, so this adds zero compiles (a synthetic matmul chain
    # took the remote AOT helper >9 min to compile and risked the leg).
    # The ratio evidences BASELINE.md's parity-ceiling claim: fp32-HIGHEST
    # matmuls cost ~`ratio` bf16 passes on the MXU.
    try:
        exh = extractors["highest"]
        np.asarray(exh._fwd_pooled(exh._params, batch, lens)[0])  # warm
        t0 = time.perf_counter()
        for _ in range(n_rep):
            np.asarray(exh._fwd_pooled(exh._params, batch, lens)[0])
        dt_h = time.perf_counter() - t0
        dev_rate_h = (n_rep * B_dev * 10.0) / dt_h
        ratio = device_rate / dev_rate_h
        # parity-mode ceiling via an additive link+device model: the bf16
        # e2e pass costs t_other (host link, scheduling) + t_device; the
        # parity pass pays the SAME t_other but `ratio`x the device time.
        # Conservative — dispatch/link overlap lets the measured parity
        # rate sit slightly ABOVE this ceiling; >=0.9x is the audit bar.
        t_dev_bf16 = total_audio_sec / device_rate
        t_dev_high = total_audio_sec / dev_rate_h
        t_other = max(n_clips / results["bf16"] - t_dev_bf16, 0.0)
        ceiling = n_clips / (t_other + t_dev_high)
        detail["audio"].update({
            "highest_vs_bf16_device_forward": {
                "bf16_audio_sec_per_sec": round(device_rate, 1),
                "highest_audio_sec_per_sec": round(dev_rate_h, 1),
                "bf16_over_highest": round(ratio, 2)},
            "parity_ceiling_clips_per_sec": round(ceiling, 1),
            "parity_vs_ceiling": round(results["highest"] / ceiling, 2),
        })
    except Exception as e:  # noqa: BLE001 - never cost the audio headline
        detail["audio"]["highest_vs_bf16_device_forward"] = {
            "error": f"{type(e).__name__}: {e}"}
    return ours, ref


def leg_vision(detail: dict) -> None:
    import jax
    import jax.numpy as jnp

    from mertools_tpu.encoders.vit_clip import CLIPVisionConfig, CLIPVisionEncoder
    from mertools_tpu.features.vision import CLIP_MEAN, CLIP_STD, VisionExtractor

    cfg = CLIPVisionConfig()  # ViT-L/14 @224 defaults
    enc = CLIPVisionEncoder(cfg)
    rng = np.random.default_rng(1)
    params = jax.jit(
        lambda k: enc.init(k, np.zeros((1, 224, 224, 3), np.float32))["params"]
    )(jax.random.PRNGKey(0))

    # 16 clips x 32 face frames (112x112 BGR uint8, the openface_face store)
    faces = {f"v{i}": rng.integers(0, 255, size=(32, 112, 112, 3),
                                   ).astype(np.uint8) for i in range(16)}
    n_frames = sum(len(v) for v in faces.values())

    # ours: cross-clip frame pooling, uint8 wire, device-side preprocess,
    # dispatch-then-collect overlap (features/vision.py)
    ex = VisionExtractor(cfg, params, batch_size=128, compute_dtype="bf16")
    warm = {"w": np.zeros((2, 112, 112, 3), np.uint8)}
    ex.extract(warm, level="UTT")
    ex.extract(faces, level="UTT")  # warm the 128-batch compile + link

    def measure_e2e():
        t0 = time.perf_counter()
        out = ex.extract(faces, level="UTT")
        assert len(out) == len(faces)
        return n_frames / (time.perf_counter() - t0)

    e2e_rate, e2e_spread = _rep3(measure_e2e)

    # device-resident: frames pre-staged, forward only
    B = 64
    staged = jax.device_put(rng.integers(0, 255, size=(B, 112, 112, 3)
                                         ).astype(np.uint8))
    np.asarray(ex._fwd(ex._params, staged))
    t0 = time.perf_counter()
    n_rep = 4
    for _ in range(n_rep):
        np.asarray(ex._fwd(ex._params, staged))
    dt = time.perf_counter() - t0
    dev_rate = n_rep * B / dt

    # REFERENCE execution model (extract_vision_huggingface.py:104-189):
    # per-clip loop, HOST preprocessing through the HF processor (PIL
    # bicubic resize to 224^2, float32 normalize -> 0.6 MB/frame on the
    # wire vs our 37 KB uint8), one 32-frame sub-batch per forward,
    # synchronous materialization per clip
    from PIL import Image

    bf = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16),
                                params)

    @jax.jit
    def fwd_pix(p, pix):
        return enc.apply({"params": p}, pix.astype(jnp.bfloat16)
                         )["image_embeds"].astype(jnp.float32)

    def host_preprocess(arr):
        outp = np.empty((len(arr), 224, 224, 3), np.float32)
        for i, fr in enumerate(arr):
            im = Image.fromarray(fr[..., ::-1]).resize((224, 224),
                                                       Image.BICUBIC)
            outp[i] = np.asarray(im, np.float32) / 255.0
        return (outp - CLIP_MEAN) / CLIP_STD

    np.asarray(fwd_pix(bf, jnp.asarray(host_preprocess(faces["v0"]))))
    t0 = time.perf_counter()
    for name in faces:
        np.asarray(fwd_pix(bf, jnp.asarray(host_preprocess(faces[name]))))
    seq_rate = n_frames / (time.perf_counter() - t0)

    detail["vision"] = {
        "clip_vit_l_frames_per_sec": round(e2e_rate, 1),
        "spread": e2e_spread,
        "vs_r04": _vs_r04("vision_frames_per_sec", e2e_rate),
        "device_frames_per_sec_bf16": round(dev_rate, 1),
        "sequential_per_clip_frames_per_sec": round(seq_rate, 1),
        "vs_sequential": round(e2e_rate / seq_rate, 2),
        "mfu_device_resident": round(
            vit_l_fwd_flops(int(n_rep * B)) / dt / PEAK_BF16, 4),
        "n_frames": n_frames,
        "note": "sequential = reference execution model (host PIL "
                "preprocess, f32 wire, per-clip sync)",
    }


def leg_text(detail: dict) -> None:
    """Text extraction (extract_text_huggingface.py execution model):
    BERT-base shape, sum last-4 layers, UTT mean."""
    import jax
    import jax.numpy as jnp

    from mertools_tpu.encoders.bert import BertConfig, BertEncoder
    from mertools_tpu.features.text import TextExtractor

    cfg = BertConfig()  # base: H=768, L=12
    enc = BertEncoder(cfg)
    rng = np.random.default_rng(4)
    params = jax.jit(
        lambda k: enc.init(k, np.zeros((1, 8), np.int32))["params"]
    )(jax.random.PRNGKey(0))

    n_texts = 256
    lens = rng.integers(8, 120, size=n_texts)
    texts = {f"t{i}": [101] + rng.integers(200, 20000, size=int(L)).tolist()
             + [102] for i, L in enumerate(lens)}
    n_tokens = int(lens.sum() + 2 * n_texts)

    ex = TextExtractor(cfg, params, compute_dtype="bf16", batch_size=64,
                       buckets=(32, 64, 128))
    ex.extract({"w": [101, 5, 102]})  # compile
    ex.extract(texts, level="UTT")    # warm every bucket + link

    def measure_texts():
        t0 = time.perf_counter()
        out = ex.extract(texts, level="UTT")
        assert len(out) == n_texts
        return n_texts / (time.perf_counter() - t0)

    rate, text_spread = _rep3(measure_texts)

    # reference execution model: one text per forward, synchronous
    # (extract_text_huggingface.py:210-246)
    bf = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16),
                                params)

    @jax.jit
    def fwd_one(p, ids):
        hs = enc.apply({"params": p}, ids)
        return sum(hs[i] for i in (-4, -3, -2, -1)).astype(jnp.float32)

    seq_texts = [texts[f"t{i}"] for i in range(8)]
    pad = 128
    def run_one(tks):
        ids = np.zeros((1, pad), np.int32)
        ids[0, : len(tks)] = tks[:pad]
        return np.asarray(fwd_one(bf, jnp.asarray(ids)))
    run_one(seq_texts[0])
    t0 = time.perf_counter()
    for tks in seq_texts:
        run_one(tks)
    seq_rate = len(seq_texts) / (time.perf_counter() - t0)

    detail["text"] = {
        "bert_base_texts_per_sec": round(rate, 1),
        "spread": text_spread,
        "vs_r04": _vs_r04("text_texts_per_sec", rate),
        "tokens_per_sec": round(rate * n_tokens / n_texts, 1),
        "sequential_texts_per_sec": round(seq_rate, 1),
        "vs_sequential": round(rate / seq_rate, 2),
        "n_texts": n_texts,
    }


def leg_pipeline(detail: dict) -> None:
    """End-to-end video pipeline: mp4 decode -> Haar face-crop -> CLIP-ViT
    features (the reference's full visual path: ffmpeg/decord + OpenFace +
    extract_vision_huggingface.py)."""
    import os
    import tempfile

    import jax

    from mertools_tpu.encoders.vit_clip import CLIPVisionConfig, CLIPVisionEncoder
    from mertools_tpu.features.vision import VisionExtractor
    from mertools_tpu.io import video as vio
    from mertools_tpu.ops.face_haar import HaarFaceFrontend

    if not vio.available():
        detail["pipeline"] = {"skipped": "libmervideo not built"}
        return

    rng = np.random.default_rng(5)

    def face_frames(n, H=240, W=208, s=100, cx=104, cy=120):
        yy, xx = np.mgrid[:H, :W]
        out = np.empty((n, H, W, 3), np.uint8)
        for t in range(n):
            img = np.full((H, W), 200.0)
            ox, oy = rng.integers(-3, 4, size=2)
            for (ex, ey, rx, ry, val) in (
                    (0, 0, 0.55 * s, 0.75 * s, 195),
                    (-0.25 * s, -0.15 * s, 0.14 * s, 0.08 * s, 60),
                    (0.25 * s, -0.15 * s, 0.14 * s, 0.08 * s, 60),
                    (0, 0.20 * s, 0.08 * s, 0.12 * s, 150),
                    (0, 0.45 * s, 0.22 * s, 0.08 * s, 90)):
                m = (((xx - cx - ox - ex) / rx) ** 2
                     + ((yy - cy - oy - ey) / ry) ** 2) <= 1
                img[m] = val
            img += rng.normal(0, 2.0, img.shape)
            out[t] = np.clip(img, 0, 255).astype(np.uint8)[..., None]
        return out

    n_clips, n_frames_each = 6, 32
    tmp = tempfile.mkdtemp(prefix="bench_pipe_")
    paths = []
    for i in range(n_clips):
        p = os.path.join(tmp, f"c{i}.mp4")
        vio.encode_video(p, face_frames(n_frames_each), fps=25.0)
        paths.append(p)

    cfg = CLIPVisionConfig()
    enc = CLIPVisionEncoder(cfg)
    params = jax.jit(
        lambda k: enc.init(k, np.zeros((1, 224, 224, 3), np.float32))["params"]
    )(jax.random.PRNGKey(0))
    # batch_size == frames/clip: the per-clip pipelined extract pads to
    # batch_size, so a larger batch would run junk rows through the ViT
    ex = VisionExtractor(cfg, params, batch_size=n_frames_each,
                         compute_dtype="bf16")
    fe = HaarFaceFrontend(min_neighbors=1, detect_every=4)

    def run_pipeline():
        # three-stage pipeline: decode(N+1) || detect/crop(N) ||
        # ViT(N-1). Decode and the device forward run on their own
        # single-thread executors (ctypes releases the GIL during the C++
        # decode; the ViT worker spends its time in device dispatch/fetch),
        # so the host detect/crop stage — the 1-core bottleneck — never
        # waits on either.
        from concurrent.futures import ThreadPoolExecutor

        feats = {}
        with ThreadPoolExecutor(1) as dec_pool, \
                ThreadPoolExecutor(1) as vit_pool:
            fut = dec_pool.submit(vio.decode_frames, paths[0])
            vit_futs = []
            for i, p in enumerate(paths):
                frames = fut.result()
                if i + 1 < len(paths):
                    fut = dec_pool.submit(vio.decode_frames, paths[i + 1])
                c, ok = fe.crop_video(frames, size=112)
                vit_futs.append(vit_pool.submit(
                    lambda pp, cc: feats.update(
                        ex.extract({pp: cc}, level="UTT")), p, c))
            for f in vit_futs:
                f.result()
        return feats

    run_pipeline()  # warm compile + detector
    run_pipeline()  # second warm pass: ViT dispatch-path link warm-up
    # (round-4 official capture measured 1.8 clips/s against 3.48 from a
    # same-day manual run — a single timed pass right after compile is
    # dominated by cold host-link/tracker state; best-of-3 with spread
    # captures steady state AND shows the variance, VERDICT r4 next #1)

    def measure_pipe():
        t0 = time.perf_counter()
        out = run_pipeline()
        assert len(out) == n_clips
        return n_clips / (time.perf_counter() - t0)

    clips_rate, pipe_spread = _rep3(measure_pipe)
    detail["pipeline"] = {
        "decode_crop_vit_clips_per_sec": round(clips_rate, 2),
        "spread": pipe_spread,
        "vs_r04": _vs_r04("pipeline_clips_per_sec", clips_rate),
        "frames_per_sec": round(clips_rate * n_frames_each, 1),
        "n_clips": n_clips, "frames_each": n_frames_each,
        "note": "mp4 decode (native/mervideo, prefetched) -> Haar "
                "detect+align (native/merhaar; ROI+scale-window tracking, "
                "detect_every=4, eye_every=4, host warp) -> device "
                "preprocess + ViT-L (bf16). Host-stage bound on this "
                "1-core box; detect/crop is per-clip independent, so N "
                "cores project ~Nx until the device ViT bounds "
                "(~600 frames/s)",
    }


def leg_mllm_train(detail: dict) -> None:
    import jax

    from mertools_tpu.mllm import (AffectGPT, AffectGPTConfig, LLMConfig,
                                   QFormerConfig)
    from mertools_tpu.mllm.runner import Runner, RunnerConfig

    def run_cfg(B, S, remat_policy, loss_chunk=0, async_dispatch=False):
        # TinyLlama-1.1B shape; LoRA-trainable, base frozen (the AffectGPT
        # production recipe). "dots" remat (round 5) saves matmul outputs
        # and recomputes only elementwise ops — full-block remat's 2NT
        # recompute capped 6NT-accounted MFU at 0.75x hardware utilization.
        # remat_policy=None turns remat OFF entirely: with the chunked LM
        # loss (loss_chunk>0) never materializing (B, S, V) logits, the
        # whole backward fits HBM at the bench config and the dots
        # policy's recomputed elementwise/attention work disappears too.
        llm = LLMConfig(vocab_size=32000, hidden_size=2048, num_layers=22,
                        num_heads=32, num_kv_heads=4, intermediate_size=5632,
                        lora_r=16, remat=remat_policy is not None,
                        remat_policy=remat_policy or "full")
        cfg = AffectGPTConfig(
            llm=llm,
            video_qformer=QFormerConfig(num_queries=32, hidden_size=768,
                                        num_layers=2, num_heads=12,
                                        intermediate_size=3072),
            audio_qformer=QFormerConfig(num_queries=8, hidden_size=768,
                                        num_layers=2, num_heads=12,
                                        intermediate_size=3072),
            video_dim=1024, audio_dim=1024, max_video_frames=8,
            max_audio_frames=8, loss_chunk=loss_chunk)
        model = AffectGPT(cfg, precision=jax.lax.Precision.DEFAULT)

        rng = np.random.default_rng(2)
        nav = model.num_av_tokens
        labels = np.full((B, S), -100, np.int64)
        labels[:, 1 + nav:] = rng.integers(0, 32000, size=(B, S - 1 - nav))
        ids = rng.integers(1, 32000, size=(B, S)).astype(np.int32)
        ids[:, 1: 1 + nav] = 0
        batch = {
            "video_feats": rng.normal(size=(B, 8, 1024)).astype(np.float32),
            "audio_feats": rng.normal(size=(B, 8, 1024)).astype(np.float32),
            "input_ids": ids,
            "splice_start": np.full(B, 1, np.int32),
            "attention_mask": np.ones((B, S), np.int32),
            "labels": labels}

        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)["params"]
        n_params = int(sum(int(np.prod(p.shape))
                           for p in jax.tree_util.tree_leaves(params)))
        runner = Runner(RunnerConfig(max_epoch=1, iters_per_epoch=1,
                                     batch_size=B, warmup_steps=1,
                                     output_dir="/tmp/bench_mllm",
                                     compute_dtype="bf16"),
                        model, params)
        state_box = [runner.state]

        def measure_block(n_rep=3, sync_each=True):
            # sync_each=True: one float(loss) per step (the r3/r4 method —
            # adds a ~35 ms/step host-tunnel gap the device spends idle;
            # kept for the r4_config continuity sub-leg). sync_each=False:
            # the PRODUCTION train_epoch dispatch pattern — steps enqueue
            # back-to-back, losses stay device arrays, one sync closes the
            # chain (train_epoch floats losses every log_every=50 steps).
            # Trace-verified: device busy 196 ms/step; async dispatch
            # reaches 97% of that bound (BENCH_NUMBERS.md session 2).
            t0 = time.perf_counter()
            last = None
            for _ in range(n_rep):
                state_box[0], last = runner._train_step(state_box[0], batch)
                if sync_each:
                    float(last)
            if not sync_each:
                float(last)
            return n_rep * B * S / (time.perf_counter() - t0)

        measure_block()  # compile + settle
        if async_dispatch:
            tok_rate, spread = _rep3(
                lambda: measure_block(n_rep=10, sync_each=False), best=False)
        else:
            tok_rate, spread = _rep3(measure_block, best=False)
        return n_params, tok_rate, spread

    # headline: the round-5 tuned step (NO remat + chunked LM loss, batch
    # 8) — the levers measured one at a time on this chip: remat
    # full->dots at B4 lifted MFU 0.396->0.432 (kills the full-block
    # recompute), B4->B8 at dots 0.432->0.488 (amortizes non-MXU step
    # overhead), +loss_chunk=128 0.488->0.555 (the dense (B,S,32000) f32
    # logits + log_softmax temporaries leave HLO), dots->no-remat
    # 0.555->0.596 (chunked loss frees enough HBM that nothing needs
    # recomputing at B8/S512). B16 / S1024 / Pallas-flash variants all
    # kill the remote tpu_compile_helper on this host (HTTP 500 at
    # compile, not an HBM OOM) — documented bound, not a model limit.
    n_params, tok_rate, train_spread = run_cfg(8, 512, None, loss_chunk=128,
                                               async_dispatch=True)
    # continuity config: the r3/r4 official shape (B4, full remat) so the
    # cross-round comparison stays apples-to-apples
    _, legacy_rate, legacy_spread = run_cfg(4, 512, "full")
    detail["mllm_train"] = {
        "llm_params_billion": round(n_params / 1e9, 3),
        "tokens_per_sec": round(tok_rate, 1),
        "spread": train_spread,
        "step_time_s": round(8 * 512 / tok_rate, 3),
        "batch": 8, "seq_len": 512, "remat": "none", "loss_chunk": 128,
        "mfu": round(6.0 * n_params * tok_rate / PEAK_BF16, 4),
        "r4_config": {
            "tokens_per_sec": round(legacy_rate, 1),
            "spread": legacy_spread,
            "mfu": round(6.0 * n_params * legacy_rate / PEAK_BF16, 4),
            "batch": 4, "remat": "full",
            "vs_r04": _vs_r04("mllm_train_tokens_per_sec", legacy_rate)},
        "note": "frozen base + LoRA via the production Runner (bf16); "
                "headline B=8 no-remat + loss_chunk=128 + the production "
                "async-dispatch pattern (one sync per 10-step chain, as "
                "train_epoch runs; per-step-sync method: 0.596 MFU) — "
                "lever ladder on-chip: full 0.396 -> dots 0.432 -> B8 "
                "0.488 -> +chunked-loss 0.555 -> no-remat 0.596 -> async "
                "0.716 (97% of the trace-verified 196 ms/step device "
                "bound); B16/S1024/flash kill the remote compile helper "
                "(not HBM); r4_config = the r3/r4 official shape+method",
    }


def _decode_weight_bytes(params) -> float:
    """HBM bytes read per decode step by the LLM weights: every kernel /
    norm / scale leaf except the embedding table (gathered per-token, not
    streamed). w8-packed trees count int8 kernels + f32 scales as stored."""
    import jax

    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = "/".join(getattr(k, "key", str(k)) for k in path)
        if "embed_tokens" in keys:
            continue
        total += leaf.size * leaf.dtype.itemsize
    return float(total)


def leg_serve(detail: dict) -> None:
    import jax

    from mertools_tpu.mllm.llm import LLM, LLMConfig
    from mertools_tpu.mllm.serve import ContinuousBatcher

    llm_cfg = LLMConfig(vocab_size=32000, hidden_size=2048, num_layers=22,
                        num_heads=32, num_kv_heads=4, intermediate_size=5632)
    llm = LLM(llm_cfg)
    rng = np.random.default_rng(3)
    x0 = np.zeros((1, 8, 2048), np.float32)
    params = dict(jax.jit(llm.init)(jax.random.PRNGKey(0), x0)["params"])
    # __call__ takes inputs_embeds, so init() never touches the embedding
    # table — but the engine's sampled-token feedback path embeds ids
    # (serve.py: params["embed_tokens"]). Init it separately and merge.
    params.update(llm.init(jax.random.PRNGKey(1),
                           np.zeros((1, 8), np.int32),
                           method=llm.embed)["params"])

    prompt_ids = [rng.integers(1, 32000, 100).astype(np.int64)
                  for _ in range(16)]
    prompt_embeds = [rng.normal(size=(100, 2048)).astype(np.float32)
                     for _ in range(16)]

    def run_engine(p, tag, compute_dtype=None, submit_ids=True, n_slots=8):
        # chunk=64 == max_new: each admission wave decodes in ONE jitted
        # device loop (host sync once per wave, not once per token).
        # submit_ids=True is the production text-serving path (round 4):
        # token ids embed on device inside the fused admission — only
        # int32 crosses the host link; submit_ids=False ships prompt
        # EMBEDDINGS (the multimodal-splice workload's shape).
        eng = ContinuousBatcher(llm_cfg, p, n_slots=n_slots, max_len=256,
                                max_new_tokens=64, eos_token_id=-1,
                                prefill_buckets=(128,), chunk=64,
                                compute_dtype=compute_dtype)

        def submit_all():
            for i in range(16):
                if submit_ids:
                    eng.submit(prompt_ids=prompt_ids[i])
                else:
                    eng.submit(prompt_embeds[i])

        submit_all()
        eng.run()  # compile (prefill + chunk loop)

        def measure_wave():
            submit_all()
            t0 = time.perf_counter()
            done = eng.run()
            dt = time.perf_counter() - t0
            n_tok = sum(len(v) for v in done.values())
            assert len(done) == 16
            return n_tok / dt

        rate, spread = _rep3(measure_wave)
        # decode roofline: every step streams the weights once for the 8
        # slots plus the FULL static KV buffer (the slot cache is read
        # whole and masked, max_len=256); % of roofline states how close
        # to the HBM bound this engine config runs (VERDICT r4 next #3a)
        import jax.numpy as jnp

        wb = _decode_weight_bytes(eng.params)
        kv_bytes = (2 * llm_cfg.num_layers * n_slots * eng.max_len
                    * llm_cfg.num_kv_heads * 64
                    * jnp.dtype(eng._emb_dtype).itemsize)
        roofline = n_slots * HBM_BW / (wb + kv_bytes)
        detail["serve"][tag] = {
            "decode_tokens_per_sec": round(rate, 1),
            "spread": spread,
            "pct_of_roofline": round(100 * rate / roofline, 1),
            "roofline_tokens_per_sec": round(roofline, 0),
            "n_requests": 16, "new_tokens_each": 64, "n_slots": n_slots,
            "submission": "token_ids" if submit_ids else "embeds"}
        return rate

    detail["serve"] = {}
    base = run_engine(params, "f32_1p1b")
    rbf = run_engine(params, "bf16_1p1b", compute_dtype="bf16")
    detail["serve"]["bf16_speedup"] = round(rbf / base, 2)
    w8 = None
    try:
        from mertools_tpu.mllm.generate import quantize_llm_params_w8

        w8 = quantize_llm_params_w8(params)
        r8 = run_engine(w8, "w8_1p1b")
        detail["serve"]["w8_speedup"] = round(r8 / base, 2)
        # the production serving configuration: int8 weights + bf16 compute
        r8b = run_engine(w8, "w8_bf16_1p1b", compute_dtype="bf16")
        detail["serve"]["w8_bf16_speedup"] = round(r8b / base, 2)
        # 16 slots: the whole 16-request wave decodes as ONE batch — the
        # per-step weight stream amortizes over 2x the rows for ~12% more
        # step time (KV read scales, weights don't); the occupancy lever
        # continuous-batching engines live on
        run_engine(w8, "w8_bf16_16slots_1p1b", compute_dtype="bf16",
                   n_slots=16)
    except Exception as e:  # noqa: BLE001
        detail["serve"]["w8_error"] = f"{type(e).__name__}: {e}"
    try:
        # embeds-submission variant (the multimodal-splice workload; also
        # the round-3 comparison point): shows the host-link upload cost
        if w8 is not None:
            run_engine(w8, "w8_bf16_embeds_1p1b", compute_dtype="bf16",
                       submit_ids=False)
    except Exception as e:  # noqa: BLE001
        detail["serve"]["embeds_variant_error"] = f"{type(e).__name__}: {e}"

    # batched scan decode (generate(): the batch_generate_texts production
    # path behind ovlabel/translate/synonym CLIs) — w8 weights + int8 KV
    # cache, the full quantized-serving configuration
    try:
        import jax.numpy as jnp

        from mertools_tpu.mllm.generate import generate

        B, S, new = 8, 128, 64
        emb = jnp.asarray(rng.normal(size=(B, S, 2048)).astype(np.float32))
        mask = jnp.ones((B, S), jnp.int32)

        def run_gen(p, kv_int8, tag, B_=None, marginal=False):
            B2 = B_ or B
            emb2 = (emb if B2 == B else jnp.asarray(
                rng.normal(size=(B2, S, 2048)).astype(np.float32)))
            mask2 = jnp.ones((B2, S), jnp.int32)

            def timed(n_new):
                kw = dict(max_new_tokens=n_new, eos_token_id=-1,
                          kv_int8=kv_int8)
                np.asarray(generate(llm_cfg, p, emb2, mask2, **kw))  # compile

                def one():
                    t0 = time.perf_counter()
                    for _ in range(2):
                        np.asarray(generate(llm_cfg, p, emb2, mask2, **kw))
                    return (time.perf_counter() - t0) / 2

                times = sorted(one() for _ in range(3))
                return times[1], times

            t64, times64 = timed(new)
            rate = B2 * new / t64
            spread = {"min": round(B2 * new / times64[2], 1),
                      "med": round(rate, 1),
                      "max": round(B2 * new / times64[0], 1)}
            wb = _decode_weight_bytes(p)
            kvb = (2 * llm_cfg.num_layers * B2 * (S + new)
                   * llm_cfg.num_kv_heads * 64 * (1 if kv_int8 else 2))
            roof = B2 * HBM_BW / (wb + kvb)
            detail["serve"][tag] = {
                "decode_tokens_per_sec": round(rate, 1), "spread": spread,
                "pct_of_roofline": round(100 * rate / roof, 1),
                "batch": B2, "new_tokens_each": new}
            if marginal:
                # generate()'s wall time INCLUDES the (batch-scaled) S=128
                # prefill; the marginal rate between max_new 32 and 64
                # isolates the pure per-step decode cost — the number the
                # weight+KV HBM roofline actually bounds (round-5: B8
                # measures ~92% of roofline — decode is at the HBM bound;
                # the wave pct above is prefill dilution, not engine slack)
                t32, _ = timed(32)
                marg = B2 * (new - 32) / (t64 - t32)
                detail["serve"][tag]["marginal_decode_tok_s"] = round(marg, 1)
                detail["serve"][tag]["marginal_pct_of_roofline"] = round(
                    100 * marg / roof, 1)
            return rate

        g8 = run_gen(w8, False, "scan_w8_1p1b")
        g8kv = run_gen(w8, True, "scan_w8_kvint8_1p1b")
        detail["serve"]["kv_int8_vs_w8"] = round(g8kv / g8, 2)
        from mertools_tpu.mllm.generate import cast_llm_params_bf16

        w8b = cast_llm_params_bf16(w8)
        g8b = run_gen(w8b, False, "scan_w8_bf16_1p1b", marginal=True)
        detail["serve"]["scan_bf16_vs_f32_acts"] = round(g8b / g8, 2)
        # batch-32 scan: weight reads amortize over 4x the rows — the
        # peak per-chip offline-serving throughput (the reference's 20k-clip
        # vLLM workload shape, evaluation.py:16-21). marginal=False keeps
        # one compile off the bench wall; the B32 slope decomposition
        # (marginal 11011 tok/s; the B16->B32 jump is XLA switching to
        # 128-row-padded MXU matmuls) is recorded in BENCH_NUMBERS.md
        run_gen(w8b, False, "scan_w8_bf16_B32", B_=32)
    except Exception as e:  # noqa: BLE001
        detail["serve"]["scan_error"] = f"{type(e).__name__}: {e}"

    # sustained ragged leg (VERDICT r4 next #3b): the reference's real vLLM
    # workload is 20k clips of RAGGED prompts with continuous admission
    # (MER2025/MER2025_Track23/evaluation.py:25-77) — 64 requests, prompt
    # lengths 64-512, per-request output budgets 16-128 (per-request
    # max_new_tokens, round 5), arrivals interleaved with decoding.
    try:
        if w8 is not None:
            _serve_sustained(detail["serve"], llm_cfg, w8)
            # 16-slot occupancy variant (the engine's throughput lever):
            # same ragged workload, double the resident batch
            _serve_sustained(detail["serve"], llm_cfg, w8, n_slots=16,
                             key="sustained_16slots")
    except Exception as e:  # noqa: BLE001
        detail["serve"]["sustained_error"] = f"{type(e).__name__}: {e}"


def _serve_sustained(sdetail: dict, llm_cfg, params, n_slots: int = 8,
                     key: str = "sustained") -> None:
    from mertools_tpu.mllm.serve import ContinuousBatcher

    rng = np.random.default_rng(7)
    n_req = 64
    plens = rng.integers(64, 513, size=n_req)
    olens = rng.integers(16, 129, size=n_req)
    prompts = [rng.integers(1, 32000, int(L)).astype(np.int64)
               for L in plens]
    # arrival schedule in STEP INDEX space (deterministic — the warm pass
    # drives the identical admission groupings, so the measured pass pays
    # zero compiles): 8 requests up front, then a seeded batch of 0-4 new
    # arrivals before every engine step until the pool drains.
    arrivals = rng.integers(0, 5, size=200)

    def drive():
        # two prefill buckets (not three): each (bucket, pow2-group) pair
        # costs an admission compile; the ragged sweep exercises admission
        # scheduling regardless
        eng = ContinuousBatcher(llm_cfg, params, n_slots=n_slots,
                                max_len=704,
                                max_new_tokens=128, eos_token_id=-1,
                                prefill_buckets=(128, 512), chunk=16,
                                compute_dtype="bf16")
        nxt = 0
        t_submit, t_done = {}, {}
        t0 = time.perf_counter()
        for i in range(n_slots):
            rid = eng.submit(prompt_ids=prompts[nxt],
                             max_new_tokens=int(olens[nxt]))
            t_submit[rid] = time.perf_counter()
            nxt += 1
        step_i = 0
        while nxt < n_req or eng.queue or eng.active.any():
            if nxt < n_req:
                for _ in range(int(arrivals[step_i % len(arrivals)])):
                    if nxt >= n_req:
                        break
                    rid = eng.submit(prompt_ids=prompts[nxt],
                                     max_new_tokens=int(olens[nxt]))
                    t_submit[rid] = time.perf_counter()
                    nxt += 1
            eng.step()
            now = time.perf_counter()
            for rid in eng.finished:
                t_done.setdefault(rid, now)
            step_i += 1
        wall = time.perf_counter() - t0
        n_tok = sum(len(v) for v in eng.finished.values())
        assert len(eng.finished) == n_req, len(eng.finished)
        lats = sorted(t_done[r] - t_submit[r] for r in t_done)
        return (n_tok / wall, lats[len(lats) // 2],
                lats[int(0.95 * (len(lats) - 1))])

    drive()  # warm: compiles every (bucket, group-size) admission + chunk
    rates = sorted(drive() for _ in range(3))
    rate, p50, p95 = rates[1]  # median by sustained tok/s
    sdetail[key] = {
        "tokens_per_sec": round(rate, 1),
        "spread": {"min": round(rates[0][0], 1),
                   "max": round(rates[2][0], 1)},
        "p50_latency_s": round(p50, 3), "p95_latency_s": round(p95, 3),
        "n_requests": n_req, "prompt_lens": "64-512", "output_lens": "16-128",
        "n_slots": n_slots,
        "note": f"w8+bf16 engine, {n_slots} slots, chunk 16, continuous "
                "admission during decode (per-request max_new_tokens)"}


def main():
    if not _probe_backend():
        print(json.dumps({
            "metric": "hubert_large_extraction_clips_per_sec",
            "value": 0.0, "unit": "clips/sec", "vs_baseline": 0.0,
            "error": "accelerator backend init timed out (device tunnel "
                     "unreachable); see BENCH_NUMBERS.md for the last "
                     "measured numbers",
            # NOT a live capture (value stays 0.0): the most recent full
            # live run on this chip, for context when the tunnel is down
            # (2026-08-21 ~10:10, bench_wall_s 698.8, all legs live, solo
            # host — BENCH_NUMBERS.md "Round-5 session-2")
            "last_measured_2026_08_21": {
                "audio_clips_per_sec": 115.2, "vs_baseline": 7.26,
                "audio_parity_clips_per_sec": 50.4,
                "vision_frames_per_sec": 590.7,
                "text_texts_per_sec": 1783.5,
                "pipeline_clips_per_sec": 3.7,
                "mllm_train_tokens_per_sec": 20298.5,
                "mllm_train_mfu": 0.7142,
                "serve_engine_tok_per_sec": 3420.7,
                "serve_engine_16slot_tok_per_sec": 5282.0,
                "serve_scan_tok_per_sec": 3921.3,
                "serve_scan_marginal_tok_per_sec": 5568.9,
                "serve_scan_b32_tok_per_sec": 7879.4,
                "serve_sustained_tok_per_sec": 1443.4,
                "serve_sustained_16slot_tok_per_sec": 1734.7}}))
        raise SystemExit(1)
    from mertools_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    detail: dict = {}
    ours = ref = 0.0
    try:
        ours, ref = leg_audio(detail)
    except Exception as e:  # noqa: BLE001
        detail["audio"] = {"error": f"{type(e).__name__}: {e}"}

    for name, leg in (("vision", leg_vision),
                      ("text", leg_text),
                      ("pipeline", leg_pipeline),
                      ("mllm_train", leg_mllm_train),
                      ("serve", leg_serve)):
        if _elapsed() > TIME_BUDGET_S:
            detail[name] = {"skipped": f"time budget ({TIME_BUDGET_S:.0f}s) "
                                       f"exhausted at {_elapsed():.0f}s"}
            continue
        try:
            leg(detail)
        except Exception as e:  # noqa: BLE001
            detail[name] = {"error": f"{type(e).__name__}: {e}"}

    detail["bench_wall_s"] = round(_elapsed(), 1)
    # Full-detail record first (may be long); the driver's tail window only
    # needs the compact FINAL line below, which is guaranteed < ~1 KB so it
    # always parses (round-3 regression: one giant line outgrew the window,
    # BENCH_r03.json ended up with parsed=null).
    print(json.dumps({
        "record": "detail",
        "metric": "hubert_large_extraction_clips_per_sec",
        "value": round(ours, 2),
        "detail": detail,
    }))
    print(compact_line(detail, ours, ref))


def compact_line(detail: dict, ours: float, ref: float) -> str:
    """One-line JSON summary guaranteed < 1 KB (driver scoreboard contract)."""
    def _leg(name: str, keys: tuple, nd: int = 1) -> float | str | None:
        leg = detail.get(name)
        if not isinstance(leg, dict):
            return None
        if "error" in leg:
            return "error"
        if "skipped" in leg:
            return "skipped"
        for k in keys:
            v = leg.get(k)
            if isinstance(v, dict):
                v = v.get("decode_tokens_per_sec", v.get("tokens_per_sec"))
            if isinstance(v, (int, float)):
                return round(float(v), nd)
        return None

    legs = {
        "audio_clips_per_sec": _leg("audio", ("i16_bf16_clips_per_sec",)),
        "audio_parity_clips_per_sec": _leg(
            "audio", ("highest_parity_clips_per_sec",)),
        "audio_seq_clips_per_sec": _leg(
            "audio", ("sequential_clips_per_sec",)),
        "vision_frames_per_sec": _leg(
            "vision", ("clip_vit_l_frames_per_sec",)),
        "text_texts_per_sec": _leg("text", ("bert_base_texts_per_sec",)),
        "pipeline_clips_per_sec": _leg(
            "pipeline", ("decode_crop_vit_clips_per_sec",)),
        "mllm_train_tokens_per_sec": _leg("mllm_train", ("tokens_per_sec",)),
        "mllm_train_mfu": _leg("mllm_train", ("mfu",), nd=3),
        "serve_engine_tok_per_sec": _leg(
            "serve", ("w8_bf16_1p1b", "bf16_1p1b", "f32_1p1b")),
        "serve_scan_tok_per_sec": _leg(
            "serve", ("scan_w8_bf16_1p1b", "scan_w8_1p1b")),
        "serve_scan_b32_tok_per_sec": _leg(
            "serve", ("scan_w8_bf16_B32",)),
        "serve_sustained_tok_per_sec": _leg("serve", ("sustained",)),
    }
    out = json.dumps({
        "metric": "hubert_large_extraction_clips_per_sec",
        "value": round(ours, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(ours / ref, 2) if ref else 0.0,
        "legs": legs,
        "bench_wall_s": detail.get("bench_wall_s", 0.0),
    })
    assert len(out) < 1024, f"compact bench line too long: {len(out)}"
    return out


if __name__ == "__main__":
    main()
