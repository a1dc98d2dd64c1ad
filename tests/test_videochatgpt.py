"""Video-ChatGPT wrapper vs a hand-assembled torch oracle.

Closes VERDICT round-3 Missing #1(a): the spatio-temporal-pooling judge
(``Video-ChatGPT/video_chatgpt/inference.py:12-43``,
``model/video_chatgpt.py:69-150``, Track3 wrapper
``MER2026/MER2026_Track3/utils/videochatgpt.py:26-91``).

Oracle = HF CLIPVisionModel (penultimate layer, CLS drop) + torch mean/cat
pooling + nn.Linear projector + HF LlamaForCausalLM with the 356-token
splice — independent torch numerics for every stage of our JAX path.
"""

import numpy as np
import pytest
import torch

from mertools_tpu.preference import videochatgpt as vcg

S_PATCH = 4  # 28/14 squared
N_VID = vcg.N_TEMPORAL + S_PATCH


@pytest.fixture(scope="module")
def oracle():
    from transformers import (CLIPVisionConfig, CLIPVisionModel, LlamaConfig,
                              LlamaForCausalLM)

    torch.manual_seed(0)
    vis = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=16)).eval()
    llm = LlamaForCausalLM(LlamaConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=512)).eval()
    proj = torch.nn.Linear(32, 48)
    return vis, proj, llm


@pytest.fixture(scope="module")
def ours(oracle):
    from mertools_tpu.encoders.vit_clip import CLIPVisionConfig
    from mertools_tpu.mllm.llm import LLMConfig

    vis, proj, llm = oracle
    vcfg = CLIPVisionConfig.from_hf(vis.config, projection_dim=1)
    lcfg = LLMConfig.from_hf(llm.config)
    model_sd = {"model." + k: v for k, v in llm.model.state_dict().items()}
    model_sd["model.mm_projector.weight"] = proj.weight
    model_sd["model.mm_projector.bias"] = proj.bias
    model_sd["lm_head.weight"] = llm.lm_head.weight
    params = vcg.convert_videochatgpt_state(
        vcfg, lcfg, vis.state_dict(), model_sd)
    return vcg.VideoChatGPT(vcfg, lcfg, params, vid_patch_token=150)


def _pixels(T=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(1, T, 28, 28, 3)).astype(np.float32) * 0.5


def oracle_features(oracle, pixels):
    """Reference pooling math (inference.py:12-43) at fp32."""
    vis, proj, _ = oracle
    T = pixels.shape[1]
    with torch.no_grad():
        out = vis(torch.tensor(pixels[0].transpose(0, 3, 1, 2)),
                  output_hidden_states=True)
        feats = out.hidden_states[-2][:, 1:]  # (T, S, C)
        temporal = feats.mean(dim=1)
        if vcg.N_TEMPORAL - T > 0:
            temporal = torch.cat(
                [temporal, torch.zeros(vcg.N_TEMPORAL - T, feats.shape[-1])],
                dim=0)
        spatial = feats.mean(dim=0)
        st = torch.cat([temporal, spatial], dim=0)
        return proj(st).numpy()


def test_spatio_temporal_features_parity(oracle, ours):
    pixels = _pixels(T=3)
    ref = oracle_features(oracle, pixels)
    got = ours.video_features(pixels)[0]
    assert got.shape == ref.shape == (N_VID, 48)
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_frame_mask_equals_ragged(oracle, ours):
    """Padded frames with mask 0 == exact-length clip (zero temporal rows,
    real-frames-only spatial mean)."""
    pixels = _pixels(T=3, seed=1)
    exact = ours.video_features(pixels)
    padded = np.concatenate(
        [pixels, np.ones((1, 2) + pixels.shape[2:], np.float32)], axis=1)
    fmask = np.array([[1, 1, 1, 0, 0]], np.float32)
    got = ours.video_features(padded, fmask)
    assert np.abs(got - exact).max() < 1e-5


def _ids_with_patches(seed=2, S=140):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 150, size=S).astype(np.int64)
    ids[3] = 151                      # <vid_start>
    ids[4: 4 + N_VID] = 150           # <vid_patch> x 104
    ids[4 + N_VID] = 152              # <vid_end>
    return ids


def test_full_logits_parity(oracle, ours):
    vis, proj, llm = oracle
    pixels = _pixels(T=3, seed=3)
    ids = _ids_with_patches()
    feats = torch.tensor(oracle_features(oracle, pixels))
    with torch.no_grad():
        emb = llm.model.embed_tokens(torch.tensor(ids[None]))
        pos = np.where(ids == 150)[0]
        emb[0, pos] = feats
        ref = llm(inputs_embeds=emb).logits.numpy()
    got = ours.forward_logits(ids[None].astype(np.int32), pixels,
                              np.ones((1, len(ids)), np.int32))
    assert np.abs(got - ref).max() < 2e-3, np.abs(got - ref).max()
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.97


def test_greedy_generation_exact(oracle, ours):
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vis, proj, llm = oracle
    vocab = {f"w{i}": i for i in range(150)}
    vocab.update({"<vid_patch>": 150, "<vid_start>": 151, "<vid_end>": 152,
                  "<eos>": 159})
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")

    pixels = _pixels(T=2, seed=4)
    ids = _ids_with_patches(seed=5)
    feats = torch.tensor(oracle_features(oracle, pixels))
    with torch.no_grad():
        emb = llm.model.embed_tokens(torch.tensor(ids[None]))
        emb[0, np.where(ids == 150)[0]] = feats
        ref_out = llm.generate(inputs_embeds=emb, max_new_tokens=8,
                               do_sample=False, eos_token_id=159,
                               pad_token_id=159)
    ref_text = fast.decode([t for t in ref_out[0].tolist() if t != 159],
                           skip_special_tokens=True)
    got = ours.generate_batch([ids.astype(np.int32)], pixels, fast,
                              max_new_tokens=8, temperature=0.0)[0]
    assert got == ref_text.strip(), (got, ref_text)


def test_caller_prompt_protocol(ours):
    """Prompt assembly: hard cuts, video-chatgpt_v1 layout, 356-expansion."""
    caller = vcg.VideoChatGPTCaller.__new__(vcg.VideoChatGPTCaller)
    caller.replace_token = (vcg.DEFAULT_VID_START_TOKEN
                            + vcg.DEFAULT_VIDEO_PATCH_TOKEN * 356
                            + vcg.DEFAULT_VID_END_TOKEN)

    class TokStub:
        def __call__(self, text):
            self.last = text
            return type("R", (), {"input_ids": [0]})()

    caller.tok = TokStub()
    caller.prompt_ids("Describe the emotion." + "x" * 2000)
    text = caller.tok.last
    assert text.startswith(vcg.SYSTEM + " USER: ")
    assert text.endswith(" ASSISTANT:")
    assert text.count("<vid_patch>") == 356
    assert "<vid_start>" in text and "<vid_end>" in text
    # 1200-char hard cut applied before appending \n<video>
    user = text[len(vcg.SYSTEM + " USER: "): -len(" ASSISTANT:")]
    assert user.index("\n<vid_start>") == 1200


def test_get_seq_frames_midpoint_rule():
    # model_utils.py:56-80 oracle (np.round = banker's rounding, as in the
    # reference's int(np.round(...)))
    def ref(total, desired):
        seg = float(total - 1) / desired
        return [(int(np.round(seg * i)) + int(np.round(seg * (i + 1)))) // 2
                for i in range(desired)]

    for total, desired in [(10, 4), (100, 100), (1000, 100), (7, 7)]:
        assert vcg.get_seq_frames(total, desired) == ref(total, desired)
    assert vcg.get_seq_frames(10, 4) == [1, 3, 5, 8]


def test_caller_frame_sampling_and_nearest_resize():
    c = vcg.VideoChatGPTCaller.__new__(vcg.VideoChatGPTCaller)
    c.n_frames = 100

    class M:  # model stub exposing the tower size
        class vcfg:
            image_size = 224
    c.model = M()
    frames = np.arange(250)[:, None, None, None] * np.ones(
        (1, 30, 40, 3), np.uint8)
    got = c._load_frames({"frames": frames})
    assert got.shape[0] == 100
    ref_idx = vcg.get_seq_frames(250, 100)
    assert [int(f[0, 0, 0]) for f in got] == [i % 256 for i in ref_idx]
    # nearest resize (F.interpolate default): floor(i * src/dst) taps
    import torch as _t

    x = (np.random.default_rng(0).random((2, 30, 40, 3)) * 255
         ).astype(np.uint8)
    got = c.preprocess_video(x)
    ref = _t.nn.functional.interpolate(
        _t.tensor(x.transpose(0, 3, 1, 2).astype(np.float32)),
        size=(224, 224)).permute(0, 2, 3, 1).numpy().astype(np.uint8)
    ref = (ref.astype(np.float32) / 255.0 - vcg.IMAGE_MEAN) / vcg.IMAGE_STD
    assert np.abs(got - ref).max() < 1e-5
