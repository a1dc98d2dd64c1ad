"""API-backed zero-shot callers (GPT / Gemini) with the reference's retry
and media-preparation semantics.

Reference: ``MER2026/MER2026_Track3/utils/gpt.py`` (3-frame base64 JPEG
sampling via cv2, OpenAI responses API for video, chat-completions
``input_audio`` for audio) and ``utils/gemini.py`` (whole-video inline bytes,
fps=1 metadata, 4 s pacing sleep); retry loop =
``MERBench/toolkit/utils/chatgpt.py:35-45`` (``get_completion``: retry while
the response is empty, up to ``maxtry``; exceptions yield '' and count as a
try).

Network transport is injected (``transport(url, headers, payload) -> dict``)
so the callers are testable hermetically and deployable behind any gateway;
the default transport posts JSON over urllib using ``OPENAI_API_KEY`` /
``GEMINI_API_KEY``.
"""

from __future__ import annotations

import base64
import json
import os
import time
from typing import Callable

import numpy as np


def retry_call(fn: Callable[[], str], maxtry: int = 5) -> str:
    """get_completion semantics (chatgpt.py:35-45): call until a non-empty
    response; an exception produces '' and consumes a try; give up after
    ``maxtry`` tries."""
    response = ""
    try_number = 0
    while len(response) == 0:
        try_number += 1
        if try_number == maxtry:
            print(f"fail for {maxtry} times")
            break
        try:
            response = fn() or ""
        except Exception as e:  # noqa: BLE001 — the reference retries on any error
            print("api error:", e)
            response = ""
    return response


def default_transport(url: str, headers: dict, payload: dict) -> dict:
    """POST JSON via urllib (no SDK dependency)."""
    from urllib.request import Request, urlopen

    req = Request(url, data=json.dumps(payload).encode("utf-8"),
                  headers={"Content-Type": "application/json", **headers})
    with urlopen(req, timeout=120) as r:
        return json.loads(r.read().decode("utf-8"))


# ---------------------------------------------------------------------------
# media preparation
# ---------------------------------------------------------------------------
def sample_frame_indices(total_frames: int, fps: float,
                         max_frames: int = 3) -> list[int]:
    """Reference frame-sampling rule (gpt.py extract_base64_frames): clips
    shorter than ``max_frames`` seconds take one frame per second; longer
    clips take ``max_frames`` uniform samples."""
    duration = total_frames / fps if fps else 0.0
    if duration <= max_frames:
        idx = [int(i * fps) for i in range(int(duration))]
    else:
        idx = [int(i * total_frames / max_frames) for i in range(max_frames)]
    return [i for i in idx if i < total_frames] or [0]


def extract_base64_frames(video_path: str, max_frames: int = 3) -> list[str]:
    """Decode via the native frontend (io/video), JPEG-encode via cv2
    (the reference uses cv2 for both)."""
    import cv2

    from ..io import video as vio

    if vio.available():
        info = vio.video_info(video_path)
        frames = vio.decode_frames(video_path)  # (T, H, W, 3) RGB
        idx = sample_frame_indices(len(frames), info.get("fps", 25.0),
                                   max_frames)
        picked = frames[idx][..., ::-1]  # JPEG path expects BGR for cv2
    else:  # pragma: no cover — cv2 fallback when the native lib is absent
        cap = cv2.VideoCapture(video_path)
        fps = cap.get(cv2.CAP_PROP_FPS)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        want = set(sample_frame_indices(total, fps, max_frames))
        picked, i = [], 0
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok:
                break
            if i in want:
                picked.append(frame)
            i += 1
        cap.release()
        picked = np.asarray(picked)
    out = []
    for frame in picked:
        ok, buf = cv2.imencode(".jpg", np.ascontiguousarray(frame))
        assert ok
        out.append(base64.b64encode(buf.tobytes()).decode("utf-8"))
    return out


def extract_base64_audio(audio_path: str) -> str:
    with open(audio_path, "rb") as f:
        return base64.b64encode(f.read()).decode("utf-8")


# ---------------------------------------------------------------------------
# callers
# ---------------------------------------------------------------------------
class GPTCaller:
    """utils/gpt.py equivalent. ``input_type`` 'video' posts the sampled
    frames to the responses API; 'audio' posts wav bytes to chat
    completions with audio modality."""

    def __init__(self, model_name: str, transport=None, *, maxtry: int = 5,
                 api_base: str = "https://api.openai.com/v1",
                 api_key: str | None = None, max_frames: int = 3):
        self.model_name = model_name
        self.transport = transport or default_transport
        self.maxtry = maxtry
        self.api_base = api_base
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "")
        self.max_frames = max_frames

    def _headers(self):
        return {"Authorization": f"Bearer {self.api_key}"}

    def _call_video(self, video_path: str, prompt: str) -> str:
        frames = extract_base64_frames(video_path, self.max_frames)
        payload = {
            "model": self.model_name,
            "input": [{
                "role": "user",
                "content": [
                    {"type": "input_text", "text": prompt},
                    *[{"type": "input_image",
                       "image_url": f"data:image/jpeg;base64,{f}"}
                      for f in frames],
                ],
            }],
        }
        r = self.transport(f"{self.api_base}/responses", self._headers(),
                           payload)
        # responses API: output[0].content[0].text (output_text convenience)
        if "output_text" in r:
            return r["output_text"]
        return r["output"][0]["content"][0]["text"]

    def _call_audio(self, audio_path: str, prompt: str) -> str:
        payload = {
            "model": self.model_name,
            "modalities": ["text", "audio"],
            "audio": {"voice": "alloy", "format": "wav"},
            "messages": [{
                "role": "user",
                "content": [
                    {"type": "text", "text": prompt},
                    {"type": "input_audio",
                     "input_audio": {"data": extract_base64_audio(audio_path),
                                     "format": "wav"}},
                ],
            }],
        }
        r = self.transport(f"{self.api_base}/chat/completions",
                           self._headers(), payload)
        msg = r["choices"][0]["message"]
        # audio-modality responses carry the transcript under audio.transcript
        return (msg.get("content")
                or msg.get("audio", {}).get("transcript", "")) or ""

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        if input_type == "video":
            return retry_call(lambda: self._call_video(video_path, prompt),
                              self.maxtry)
        if input_type == "audio":
            return retry_call(lambda: self._call_audio(audio_path, prompt),
                              self.maxtry)
        raise ValueError(input_type)

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        return [self.func_calling_sample(s.get("audio_path"),
                                         s.get("video_path"), p,
                                         s.get("input_type", "video"))
                for s, p in zip(samples, prompts)]


class GeminiCaller:
    """utils/gemini.py equivalent: whole video inline (base64 REST), fps=1
    video metadata, paced by ``sleep_s`` between calls (the reference
    hard-sleeps 4 s)."""

    def __init__(self, model_name: str, transport=None, *, maxtry: int = 5,
                 api_key: str | None = None, sleep_s: float = 4.0):
        self.model_name = model_name
        self.transport = transport or default_transport
        self.maxtry = maxtry
        self.api_key = api_key or os.environ.get("GEMINI_API_KEY", "")
        self.sleep_s = sleep_s

    def _call(self, video_path: str, prompt: str) -> str:
        if self.sleep_s:
            time.sleep(self.sleep_s)
        with open(video_path, "rb") as f:
            video_b64 = base64.b64encode(f.read()).decode("utf-8")
        payload = {"contents": [{"parts": [
            {"inline_data": {"mime_type": "video/mp4", "data": video_b64},
             "video_metadata": {"fps": 1}},
            {"text": prompt},
        ]}]}
        url = (f"https://generativelanguage.googleapis.com/v1beta/models/"
               f"{self.model_name}:generateContent?key={self.api_key}")
        r = self.transport(url, {}, payload)
        return r["candidates"][0]["content"]["parts"][0]["text"]

    def func_calling_sample(self, audio_path, video_path, prompt,
                            input_type) -> str:
        return retry_call(lambda: self._call(video_path, prompt), self.maxtry)

    def __call__(self, samples: list[dict], prompts: list[str]) -> list[str]:
        return [self.func_calling_sample(s.get("audio_path"),
                                         s.get("video_path"), p,
                                         s.get("input_type", "video"))
                for s, p in zip(samples, prompts)]
