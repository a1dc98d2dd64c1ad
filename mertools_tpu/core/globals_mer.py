"""Label maps and canonical feature-name constants.

Mirrors the role of ``MERBench/toolkit/globals.py:2-215`` in the reference:
emotion label maps, canonical encoder-name constants, and the unimodal quality
rankings used by top-N fusion. Values are part of the MER challenge protocol
(public dataset metadata), re-declared here.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Emotion label space for the MER challenge series
# (reference: MERBench/toolkit/globals.py:2-5)
# ---------------------------------------------------------------------------
EMOS_MER = ["neutral", "angry", "happy", "sad", "worried", "surprise"]
EMO2IDX_MER = {emo: idx for idx, emo in enumerate(EMOS_MER)}
IDX2EMO_MER = {idx: emo for idx, emo in enumerate(EMOS_MER)}

# Sentinel used for missing valence labels
# (reference: MERBench/toolkit/dataloader/mer2023.py:97-101)
MISSING_VAL = -10.0

# ---------------------------------------------------------------------------
# Canonical feature/encoder names. The feature-store directory for a model is
# "{name}-UTT" (utterance-level, one (D,) vector per clip) or "{name}-FRA"
# (frame-level, one (T, D) array per clip) — reference: feature dirs created by
# MERBench/feature_extraction/*/extract_*.py.
# ---------------------------------------------------------------------------

# -- audio encoders (reference: MERBench/toolkit/globals.py:11-38) --
HUBERT_BASE = "chinese-hubert-base"
HUBERT_LARGE = "chinese-hubert-large"
WAV2VEC2_BASE = "chinese-wav2vec2-base"
WAV2VEC2_LARGE = "chinese-wav2vec2-large"
WAVLM_BASE = "wavlm-base"
WAVLM_LARGE = "wavlm-large"
DATA2VEC_AUDIO_BASE = "data2vec-audio-base-960h"
WHISPER_BASE = "whisper-base"
WHISPER_LARGE = "whisper-large-v2"
VGGISH = "vggish"
EMOTION2VEC = "emotion2vec"

WHOLE_AUDIO = [
    HUBERT_BASE, HUBERT_LARGE, WAV2VEC2_BASE, WAV2VEC2_LARGE,
    WAVLM_BASE, WAVLM_LARGE, DATA2VEC_AUDIO_BASE,
    WHISPER_BASE, WHISPER_LARGE, VGGISH, EMOTION2VEC,
]

# -- text encoders (reference: MERBench/toolkit/globals.py:40-115) --
BERT_BASE = "bert-base-chinese"
MACBERT_BASE = "chinese-macbert-base"
MACBERT_LARGE = "chinese-macbert-large"
ROBERTA_BASE = "chinese-roberta-wwm-ext"
ROBERTA_LARGE = "chinese-roberta-wwm-ext-large"
XLM_ROBERTA_LARGE = "xlm-roberta-large"
ELECTRA_BASE = "chinese-electra-180g-base"
DEBERTA_LARGE = "deberta-chinese-large"
LLAMA2_7B = "llama-2-7b"
BAICHUAN2_7B = "baichuan2-7b-base"
QWEN_7B = "qwen-7b"

WHOLE_TEXT = [
    BERT_BASE, MACBERT_BASE, MACBERT_LARGE, ROBERTA_BASE, ROBERTA_LARGE,
    XLM_ROBERTA_LARGE, ELECTRA_BASE, DEBERTA_LARGE,
    LLAMA2_7B, BAICHUAN2_7B, QWEN_7B,
]

# -- visual encoders (reference: MERBench/toolkit/globals.py:117-136) --
CLIP_VIT_BASE = "clip-vit-base-patch32"
CLIP_VIT_LARGE = "clip-vit-large-patch14"
EVA02_BASE = "eva02-base-patch14-224"
DATA2VEC_VISION_BASE = "data2vec-vision-base"
DINOV2_LARGE = "dinov2-large"
VIDEOMAE_BASE = "videomae-base"
VIDEOMAE_LARGE = "videomae-large"
MANET = "manet"
EMONET = "emonet"
RESNET50_FERPLUS = "resnet50-ferplus-dag"
SENET50_FERPLUS = "senet50-ferplus-dag"
RESNET_MSCELEB = "resnet-msceleb"
RESNET_IMAGENET = "resnet-imagenet"

WHOLE_IMAGE = [
    CLIP_VIT_BASE, CLIP_VIT_LARGE, EVA02_BASE, DATA2VEC_VISION_BASE,
    DINOV2_LARGE, VIDEOMAE_BASE, VIDEOMAE_LARGE,
    MANET, EMONET, RESNET50_FERPLUS, SENET50_FERPLUS,
    RESNET_MSCELEB, RESNET_IMAGENET,
]

# ---------------------------------------------------------------------------
# Unimodal quality rankings (low→high) used by top-N fusion
# (reference: MERBench/toolkit/globals.py:199-215 / MER2024 top-N fusion).
# ---------------------------------------------------------------------------
AUDIO_RANK_LOW2HIGH = [
    VGGISH, WAV2VEC2_BASE, WAVLM_BASE, WHISPER_BASE,
    WAV2VEC2_LARGE, WAVLM_LARGE, WHISPER_LARGE, HUBERT_BASE, HUBERT_LARGE,
]
TEXT_RANK_LOW2HIGH = [
    ELECTRA_BASE, BERT_BASE, XLM_ROBERTA_LARGE, ROBERTA_BASE,
    MACBERT_BASE, MACBERT_LARGE, ROBERTA_LARGE, BAICHUAN2_7B,
]
IMAGE_RANK_LOW2HIGH = [
    RESNET_IMAGENET, DATA2VEC_VISION_BASE, VIDEOMAE_BASE, EVA02_BASE,
    MANET, RESNET_MSCELEB, DINOV2_LARGE, CLIP_VIT_BASE, CLIP_VIT_LARGE,
]


def feature_dir_name(model_name: str, level: str) -> str:
    """Feature-store directory name for (encoder, level).

    level: "UTT" (one vector per clip) or "FRA" (frame/token sequence).
    """
    assert level in ("UTT", "FRA"), level
    return f"{model_name}-{level}"
