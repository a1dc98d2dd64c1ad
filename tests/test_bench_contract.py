"""bench.py driver contract: the FINAL stdout line must be compact JSON.

Round-3 regression: bench.py printed one giant JSON line that outgrew the
driver's tail window, so BENCH_r03.json recorded parsed=null and the round
had no machine-readable headline. The fix (VERDICT round-3 item #1) prints
a full-detail record first, then a compact final line guaranteed < 1 KB
carrying {"metric","value","unit","vs_baseline","legs",...}. These tests
pin that contract without needing an accelerator.
"""
import importlib.util
import json
from pathlib import Path

import pytest

_spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py")
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _full_detail():
    """A detail dict at least as large as the real round-3 output."""
    return {
        "audio": {
            "i16_bf16_clips_per_sec": 108.4, "bf16_clips_per_sec": 90.1,
            "highest_parity_clips_per_sec": 51.92,
            "sequential_clips_per_sec": 17.06,
            "device_audio_sec_per_sec_bf16": 2060.5,
            "audio_sec_per_sec_end_to_end": 780.6,
            "mfu_device_resident": 0.3922, "mfu_end_to_end": 0.1456,
            "n_clips": 64, "note": "x" * 200,
        },
        "vision": {"clip_vit_l_frames_per_sec": 604.3,
                   "device_frames_per_sec_bf16": 561.0,
                   "sequential_per_clip_frames_per_sec": 58.7,
                   "vs_sequential": 10.29, "mfu_device_resident": 0.4614,
                   "n_frames": 512, "note": "y" * 150},
        "text": {"bert_base_texts_per_sec": 2005.4,
                 "tokens_per_sec": 134896.5,
                 "sequential_texts_per_sec": 29.7,
                 "vs_sequential": 67.59, "n_texts": 256},
        "pipeline": {"decode_crop_vit_clips_per_sec": 0.93,
                     "frames_per_sec": 29.6, "n_clips": 6,
                     "frames_each": 32, "note": "z" * 150},
        "mllm_train": {"llm_params_billion": 1.155,
                       "tokens_per_sec": 11818.2, "step_time_s": 0.173,
                       "batch": 4, "seq_len": 512, "mfu": 0.4158,
                       "note": "w" * 100},
        "serve": {
            "f32_1p1b": {"decode_tokens_per_sec": 747.9, "n_requests": 16,
                         "new_tokens_each": 64},
            "bf16_1p1b": {"decode_tokens_per_sec": 1542.1, "n_requests": 16,
                          "new_tokens_each": 64},
            "w8_bf16_1p1b": {"decode_tokens_per_sec": 1930.6,
                             "n_requests": 16, "new_tokens_each": 64},
            "scan_w8_1p1b": {"decode_tokens_per_sec": 2592.3, "batch": 8,
                             "new_tokens_each": 64},
            "scan_w8_bf16_1p1b": {"decode_tokens_per_sec": 3881.2,
                                  "batch": 8, "new_tokens_each": 64},
        },
        "bench_wall_s": 1444.3,
    }


def test_compact_line_parses_and_is_small():
    line = bench.compact_line(_full_detail(), 108.4, 17.06)
    assert len(line) < 1024
    assert "\n" not in line
    rec = json.loads(line)
    assert rec["metric"] == "hubert_large_extraction_clips_per_sec"
    assert rec["value"] == 108.4
    assert rec["unit"] == "clips/sec/chip"
    assert rec["vs_baseline"] == pytest.approx(6.35, abs=0.01)
    legs = rec["legs"]
    assert legs["audio_clips_per_sec"] == 108.4
    assert legs["audio_parity_clips_per_sec"] == 51.9
    assert legs["vision_frames_per_sec"] == 604.3
    assert legs["text_texts_per_sec"] == 2005.4
    assert legs["pipeline_clips_per_sec"] == 0.9
    assert legs["mllm_train_tokens_per_sec"] == 11818.2
    assert legs["serve_engine_tok_per_sec"] == 1930.6
    assert legs["serve_scan_tok_per_sec"] == 3881.2


def test_compact_line_handles_errors_skips_and_absences():
    detail = {
        "audio": {"error": "RuntimeError: boom"},
        "vision": {"skipped": "time budget"},
        "serve": {"scan_error": "X"},  # engine keys absent, scan errored
    }
    rec = json.loads(bench.compact_line(detail, 0.0, 0.0))
    assert rec["vs_baseline"] == 0.0
    assert rec["legs"]["audio_clips_per_sec"] == "error"
    assert rec["legs"]["vision_frames_per_sec"] == "skipped"
    assert rec["legs"]["text_texts_per_sec"] is None
    assert rec["legs"]["serve_engine_tok_per_sec"] is None


def test_compact_line_is_final_print_in_main():
    """main() must print the compact line last (driver reads the tail)."""
    import inspect
    src = inspect.getsource(bench.main)
    assert src.rstrip().endswith("print(compact_line(detail, ours, ref))")


def test_compact_line_round5_serve_fields():
    """Round-5 additions: the B32 scan leg surfaces in the compact line,
    marginal-decode fields ride the full detail (not the compact line),
    and absence degrades to None rather than KeyError."""
    detail = _full_detail()
    detail["serve"]["scan_w8_bf16_B32"] = {
        "decode_tokens_per_sec": 7878.8, "batch": 32,
        "new_tokens_each": 64, "pct_of_roofline": 35.3,
        "marginal_decode_tok_s": 11128.9,
        "marginal_pct_of_roofline": 49.8,
    }
    detail["serve"]["sustained_16slots"] = {
        "tokens_per_sec": 2500.0, "n_slots": 16,
    }
    rec = json.loads(bench.compact_line(detail, 108.4, 17.06))
    assert rec["legs"]["serve_scan_b32_tok_per_sec"] == 7878.8
    # compact stays under the driver's 1 KB tail window with the new key
    assert len(bench.compact_line(detail, 108.4, 17.06)) < 1024
    # old-shape detail (no B32 leg) must not break the compact line
    rec_old = json.loads(bench.compact_line(_full_detail(), 108.4, 17.06))
    assert rec_old["legs"]["serve_scan_b32_tok_per_sec"] is None
