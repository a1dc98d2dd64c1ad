"""Chat-UniVi wrapper vs a hand-assembled torch oracle.

Closes VERDICT round-3 Missing #1(b): the CTM cluster-token-merging judge
(``Chat-UniVi/ChatUniVi/model/arch.py:111-209`` + ``model/cluster.py``,
Track3 wrapper ``MER2026/MER2026_Track3/utils/chatunivi.py:31-176``).

Oracle = HF CLIPVisionModel + the torch DPC-KNN/merge oracle from
test_token_cluster + the reference's event walk + nn.Linear projector +
HF LlamaForCausalLM — independent torch numerics for every stage.
"""

import math

import numpy as np
import pytest
import torch

from test_token_cluster import oracle_dpc_knn, oracle_merge

from mertools_tpu.preference import chatunivi as cu


@pytest.fixture(scope="module")
def oracle():
    from transformers import (CLIPVisionConfig, CLIPVisionModel, LlamaConfig,
                              LlamaForCausalLM)

    torch.manual_seed(0)
    vis = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=112, patch_size=14,  # 64 patches
        projection_dim=16)).eval()
    llm = LlamaForCausalLM(LlamaConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=2048)).eval()
    proj = torch.nn.Linear(32, 48)
    return vis, proj, llm


@pytest.fixture(scope="module")
def ours(oracle):
    from mertools_tpu.encoders.vit_clip import CLIPVisionConfig
    from mertools_tpu.mllm.llm import LLMConfig

    vis, proj, llm = oracle
    vcfg = CLIPVisionConfig.from_hf(vis.config, projection_dim=1)
    lcfg = LLMConfig.from_hf(llm.config)
    sd = {"model.vision_tower.vision_tower." + k: v
          for k, v in vis.state_dict().items()}
    sd.update({"model." + k: v for k, v in llm.model.state_dict().items()})
    sd["model.mm_projector.weight"] = proj.weight
    sd["model.mm_projector.bias"] = proj.bias
    sd["lm_head.weight"] = llm.lm_head.weight
    params = cu.convert_chatunivi_state(vcfg, lcfg, sd)
    return cu.ChatUniVi(vcfg, lcfg, params)


def _adjust_k(k, cn):
    return min(3, max(cn // 2, 1)) if k > cn else k


def _ctm(x, cn, k):
    a = oracle_dpc_knn(x, cn, _adjust_k(k, cn))
    return oracle_merge(x, a, cn), a


def oracle_tower_feats(oracle, pixels):
    vis, _, _ = oracle
    with torch.no_grad():
        out = vis(torch.tensor(pixels.transpose(0, 3, 1, 2)),
                  output_hidden_states=True)
        return out.hidden_states[-2][:, 1:]              # (T, S, C)


def oracle_video_tokens(oracle, feats):
    """arch.py:134-209 video path at fp32: temporal events + 3-level
    per-frame clustering + per-event re-clustering -> (E*112, H_llm).

    Takes the tower features directly: cluster ASSIGNMENT is discontinuous
    (argmin over near-tied center distances), so both paths must see
    bit-identical features; tower parity is asserted separately in
    test_tower_feature_parity."""
    _, proj, _ = oracle
    T = feats.shape[0]
    with torch.no_grad():
        cls = feats.mean(dim=1).unsqueeze(0)             # (1, T, C)
        cn_t = max(math.ceil(T / 16), 1)
        t_assign = oracle_dpc_knn(
            cls, cn_t, _adjust_k(5, cn_t),
            tiebreak=torch.tensor(cu.temporal_tiebreak(T)))[0]
        events = {}
        for fid, cid in enumerate(t_assign.tolist()):
            events.setdefault(cid, []).append(fid)

        l0, _ = _ctm(feats, 64, 5)
        l1, _ = _ctm(l0, 32, 3)
        l2, _ = _ctm(l1, 16, 3)

        outs = []
        for ev in events.values():
            for lvl, cn, k in ((l0, 64, 5), (l1, 32, 3), (l2, 16, 3)):
                cur = torch.cat([lvl[i] for i in ev], dim=0).unsqueeze(0)
                merged, _ = _ctm(cur, cn, k)
                outs.append(merged)
        x = torch.cat(outs, dim=1)[0]
        return proj(x).numpy()


def _pixels(T, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(T, 112, 112, 3)).astype(np.float32) * 0.5


def test_tower_feature_parity(oracle, ours):
    import jax.numpy as jnp

    pixels = _pixels(8, seed=0)
    ref = oracle_tower_feats(oracle, pixels).numpy()
    got = np.asarray(ours._encode(ours.params, jnp.asarray(pixels)))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


@pytest.mark.parametrize("T,seed", [(20, 1), (3, 2), (33, 3)])
def test_video_features_parity(oracle, ours, T, seed):
    """Full CTM compression parity incl. multi-event grouping (T=20 -> 2
    events, T=33 -> 3 events, T=3 -> 1 event). Both paths consume the same
    tower features (assignment is discontinuous in its input)."""
    feats = oracle_tower_feats(oracle, _pixels(T, seed))
    ref = oracle_video_tokens(oracle, feats)
    got = ours.features_from_patches(feats.numpy())
    E = math.ceil(T / 16)
    assert got.shape == ref.shape == (E * 112, 48)
    assert np.abs(got - ref).max() < 3e-4, np.abs(got - ref).max()


def test_full_logits_parity(oracle, ours):
    import jax.numpy as jnp

    vis, proj, llm = oracle
    T = 20
    feats = oracle_tower_feats(oracle, _pixels(T, seed=4))
    ref_tokens = torch.tensor(oracle_video_tokens(oracle, feats))
    rng = np.random.default_rng(5)
    pre = rng.integers(1, 150, size=9).astype(np.int64)
    post = rng.integers(1, 150, size=7).astype(np.int64)
    ids = np.concatenate([pre, np.full(T, cu.IMAGE_TOKEN_INDEX), post])
    with torch.no_grad():
        emb = torch.cat([llm.model.embed_tokens(torch.tensor(pre)),
                         ref_tokens,
                         llm.model.embed_tokens(torch.tensor(post))],
                        dim=0)[None]
        ref = llm(inputs_embeds=emb).logits.numpy()
    got_tokens = ours.features_from_patches(feats.numpy())
    got_emb = ours.splice_embeds(ids, got_tokens)[None]
    got = np.asarray(ours._forward(
        ours.params, jnp.asarray(got_emb),
        jnp.asarray(np.ones((1, got_emb.shape[1]), np.int32))))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-3, np.abs(got - ref).max()
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.97


def test_greedy_generation_exact(oracle, ours):
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vis, proj, llm = oracle
    vocab = {f"w{i}": i for i in range(150)}
    vocab["<eos>"] = 159
    tok = Tokenizer(tok_models.WordLevel(vocab=vocab, unk_token="w1"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>")

    T = 17
    pixels = _pixels(T, seed=6)
    feats = oracle_tower_feats(oracle, pixels)
    ref_tokens = torch.tensor(oracle_video_tokens(oracle, feats))
    rng = np.random.default_rng(7)
    pre = rng.integers(1, 150, size=5).astype(np.int64)
    post = rng.integers(1, 150, size=4).astype(np.int64)
    ids = np.concatenate([pre, np.full(T, cu.IMAGE_TOKEN_INDEX), post])
    with torch.no_grad():
        emb = torch.cat([llm.model.embed_tokens(torch.tensor(pre)),
                         ref_tokens,
                         llm.model.embed_tokens(torch.tensor(post))],
                        dim=0)[None]
        ref_out = llm.generate(inputs_embeds=emb, max_new_tokens=8,
                               do_sample=False, eos_token_id=159,
                               pad_token_id=159)
    ref_text = fast.decode([t for t in ref_out[0].tolist() if t != 159],
                           skip_special_tokens=True)
    # pin the shared tower features on both sides (see parity note above)
    ours.video_features = lambda px: ours.features_from_patches(
        feats.numpy())
    try:
        got = ours.generate_batch([ids], [pixels], fast, max_new_tokens=8,
                                  temperature=0.0)[0]
    finally:
        del ours.video_features
    assert got == ref_text.strip(), (got, ref_text)


def test_tokenizer_image_token_reference_semantics():
    """mm_utils.py:18-42: BOS handled once, sentinel between chunks."""
    class Tok:
        bos_token_id = 1

        def __call__(self, text):
            ids = [1] + [100 + len(w) for w in text.split()]
            return type("R", (), {"input_ids": ids})()

    ids = cu.tokenizer_image_token("hi <image><image> yo", Tok())
    # chunks: "hi " -> [1,102]; "" -> []; " yo" -> [1,102]
    # offset=1 (BOS), sep = [-200, -200] -> [1, 102, -200, -200, 102]
    assert ids.tolist() == [1, 102, -200, -200, 102]


def test_simple_prompt_layout():
    p = cu.simple_prompt("<image><image>\nDescribe.")
    assert p.startswith(cu.SYSTEM + "###Human: Hi!###Assistant: Hi there! "
                        "How can I help you today?###Human: ")
    assert p.endswith("###Assistant:")


def test_events_first_occurrence_order():
    ev = cu.events_from_assign(np.array([2, 2, 0, 1, 0, 2]))
    assert ev == [[0, 1, 5], [2, 4], [3]]


def test_caller_frame_sampling_1fps_cap100():
    """utils/chatunivi.py:89-104: stride = round(fps/1), linspace cap."""
    c = cu.ChatUniViCaller.__new__(cu.ChatUniViCaller)
    c.max_frames = 100
    c.video_framerate = 1
    frames = np.arange(250)[:, None, None, None] * np.ones(
        (1, 4, 4, 3), np.uint8)
    # 25 fps, 250 frames -> stride 25 -> 10 frames [0,25,...,225]
    got = c._load_frames({"frames": frames, "fps": 25.0})
    assert [int(f[0, 0, 0]) for f in got] == list(range(0, 250, 25))
    # 1 fps, 250 frames -> 250 candidates -> linspace down to 100
    got = c._load_frames({"frames": frames, "fps": 1.0})
    assert got.shape[0] == 100
    idx = [int(f[0, 0, 0]) for f in got]
    ref = [list(range(250))[i] for i in np.linspace(0, 249, num=100,
                                                    dtype=int)]
    assert idx == ref


def test_bucketed_lengths_share_compiles(ours):
    """Clip lengths in one 16-frame bucket must reuse the jitted cluster
    stages (review finding: per-T recompiles dominated judge throughput)."""
    rng = np.random.default_rng(9)

    def feats(T):
        return rng.normal(size=(T, 64, 32)).astype(np.float32)

    # buckets 64 and 80 are not exercised by the other tests in this
    # module (which pre-compile 16/32/48 under the shared fixture)
    ours.features_from_patches(feats(55))
    n0 = ours._frame_stage._cache_size()
    ours.features_from_patches(feats(60))   # same bucket (64), same cn_t=4
    assert ours._frame_stage._cache_size() == n0
    ours.features_from_patches(feats(70))   # new bucket (80), cn_t=5
    assert ours._frame_stage._cache_size() == n0 + 1
