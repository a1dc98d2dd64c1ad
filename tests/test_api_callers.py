"""GPT / Gemini API callers: payload shapes, retry semantics, frame
sampling rule (reference: MER2026_Track3/utils/{gpt,gemini}.py +
chatgpt.py:35-45 get_completion)."""

import numpy as np
import pytest


def test_retry_semantics_matches_get_completion():
    from mertools_tpu.preference.api_callers import retry_call

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("net down")
        return "ok"

    assert retry_call(flaky, maxtry=5) == "ok"
    assert len(calls) == 3

    # gives up after maxtry-1 actual attempts (the reference breaks when
    # try_number == maxtry BEFORE calling)
    calls.clear()
    assert retry_call(lambda: (calls.append(1), "")[1], maxtry=5) == ""
    assert len(calls) == 4


def test_frame_sampling_rule():
    from mertools_tpu.preference.api_callers import sample_frame_indices

    # short clip (2 s @ 25fps): one frame per second
    assert sample_frame_indices(50, 25.0, max_frames=3) == [0, 25]
    # long clip (10 s @ 25fps): 3 uniform samples
    assert sample_frame_indices(250, 25.0, max_frames=3) == [0, 83, 166]
    # degenerate
    assert sample_frame_indices(0, 25.0) == [0]


def test_gpt_caller_video_payload(monkeypatch, tmp_path):
    from mertools_tpu.preference import api_callers as ac

    monkeypatch.setattr(ac, "extract_base64_frames",
                        lambda path, max_frames=3: ["AAA", "BBB"])
    seen = {}

    def transport(url, headers, payload):
        seen.update(url=url, headers=headers, payload=payload)
        return {"output": [{"content": [{"text": "a1"}]}]}

    c = ac.GPTCaller("gpt-4.1-mini", transport, api_key="k")
    r = c.func_calling_sample(None, "v.mp4", "which is better?", "video")
    assert r == "a1"
    assert seen["url"].endswith("/responses")
    assert seen["headers"]["Authorization"] == "Bearer k"
    content = seen["payload"]["input"][0]["content"]
    assert content[0] == {"type": "input_text", "text": "which is better?"}
    assert content[1]["image_url"].startswith("data:image/jpeg;base64,AAA")
    assert len(content) == 3


def test_gpt_caller_audio_payload(tmp_path):
    from mertools_tpu.preference import api_callers as ac

    wav = tmp_path / "a.wav"
    wav.write_bytes(b"RIFFfake")
    seen = {}

    def transport(url, headers, payload):
        seen.update(url=url, payload=payload)
        return {"choices": [{"message": {
            "audio": {"transcript": "same"}}}]}

    c = ac.GPTCaller("gpt-4o-audio-preview", transport, api_key="k")
    r = c.func_calling_sample(str(wav), None, "judge", "audio")
    assert r == "same"
    assert seen["url"].endswith("/chat/completions")
    p = seen["payload"]
    assert p["modalities"] == ["text", "audio"]
    import base64

    assert (p["messages"][0]["content"][1]["input_audio"]["data"]
            == base64.b64encode(b"RIFFfake").decode())


def test_gemini_caller_payload_and_pacing(tmp_path):
    from mertools_tpu.preference import api_callers as ac

    v = tmp_path / "v.mp4"
    v.write_bytes(b"\x00\x01video")
    seen = {}

    def transport(url, headers, payload):
        seen.update(url=url, payload=payload)
        return {"candidates": [{"content": {"parts": [{"text": "a2 "}]}}]}

    c = ac.GeminiCaller("gemini-2.0-flash", transport, api_key="g",
                        sleep_s=0.0)
    r = c.func_calling_sample(None, str(v), "judge", "video")
    assert r == "a2 "
    assert "gemini-2.0-flash:generateContent" in seen["url"]
    part = seen["payload"]["contents"][0]["parts"][0]
    assert part["inline_data"]["mime_type"] == "video/mp4"
    assert part["video_metadata"] == {"fps": 1}


def test_callers_feed_preference_judge(monkeypatch, tmp_path):
    """The batched __call__ protocol plugs into PreferenceJudge."""
    from mertools_tpu.preference import api_callers as ac
    from mertools_tpu.preference.judge import PreferenceJudge

    monkeypatch.setattr(ac, "extract_base64_frames",
                        lambda path, max_frames=3: ["AAA"])
    responses = iter(["a1: the first", "clearly a2"])

    def transport(url, headers, payload):
        return {"output": [{"content": [{"text": next(responses)}]}]}

    caller = ac.GPTCaller("gpt-4.1-mini", transport, api_key="k")
    judge = PreferenceJudge(caller)
    labels = judge.judge_normal(
        [{"a1": "x", "a2": "y", "video_path": "v.mp4"},
         {"a1": "p", "a2": "q", "video_path": "w.mp4"}])
    assert labels == ["a1", "a2"]
