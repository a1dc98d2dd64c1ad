"""MLLM stack tests: LLM parity vs HF Llama, LoRA masking, Q-Former,
AffectGPT splice + training convergence on a synthetic captioning task."""

import numpy as np
import pytest
import torch


def test_llm_parity_vs_hf_llama():
    import jax.numpy as jnp

    from transformers import LlamaConfig, LlamaForCausalLM

    from mertools_tpu.mllm import llm as L

    hf_cfg = LlamaConfig(vocab_size=200, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=128,
                         rms_norm_eps=1e-6, attention_dropout=0.0,
                         initializer_range=0.1)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = L.LLMConfig.from_hf(hf_cfg)
    params = L.convert_torch_state(cfg, hf.state_dict())
    model = L.LLM(cfg)

    ids = np.random.default_rng(0).integers(0, 200, size=(2, 9)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids).long()).logits.numpy()
    embeds = model.apply({"params": params}, jnp.asarray(ids), method=L.LLM.embed)
    ours = np.asarray(model.apply({"params": params}, embeds))
    assert np.abs(ours - ref).max() < 2e-3, np.abs(ours - ref).max()


def test_lm_loss_matches_torch():
    import jax.numpy as jnp

    from mertools_tpu.mllm.llm import lm_loss

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 7, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=(2, 7))
    labels[:, :3] = -100
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits[:, :-1]).reshape(-1, 11),
        torch.tensor(labels[:, 1:]).reshape(-1).long(), ignore_index=-100)
    ours = float(lm_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_qformer_shapes_and_mask():
    import jax
    import jax.numpy as jnp

    from mertools_tpu.mllm.qformer import QFormer, QFormerConfig

    cfg = QFormerConfig(num_queries=8, hidden_size=16, num_layers=2,
                        num_heads=2, intermediate_size=32)
    qf = QFormer(cfg)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 10, 24)).astype(np.float32)
    mask = np.ones((2, 10), np.int32)
    mask[1, 4:] = 0
    params = qf.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(mask))["params"]
    out = qf.apply({"params": params}, jnp.asarray(feats), jnp.asarray(mask))
    assert out.shape == (2, 8, 16)
    # masked tail must not influence the output
    feats2 = feats.copy()
    feats2[1, 4:] = 99.0
    out2 = qf.apply({"params": params}, jnp.asarray(feats2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def _make_affectgpt(lora_r=2):
    from mertools_tpu.mllm import AffectGPT, AffectGPTConfig, LLMConfig, QFormerConfig

    cfg = AffectGPTConfig(
        llm=LLMConfig.tiny(vocab=64, lora_r=lora_r),
        video_qformer=QFormerConfig(num_queries=4, hidden_size=16, num_layers=1,
                                    num_heads=2, intermediate_size=32),
        audio_qformer=QFormerConfig(num_queries=2, hidden_size=16, num_layers=1,
                                    num_heads=2, intermediate_size=32),
        video_dim=12, audio_dim=10, max_video_frames=6)
    return AffectGPT(cfg)


def synth_mllm_batch(rng, B=4, S=16, n_av=6, vocab=64):
    """Captioning task: answer token deterministically derives from the
    video feature's dominant sign pattern -> learnable via the AV path only."""
    video = rng.normal(size=(B, 6, 12)).astype(np.float32)
    audio = rng.normal(size=(B, 5, 10)).astype(np.float32)
    cls = (video.mean(axis=(1, 2)) > 0).astype(np.int32)  # derive label from AV
    input_ids = np.full((B, S), 3, np.int32)  # filler prompt tokens
    splice_start = np.full(B, 2, np.int32)
    labels = np.full((B, S), -100, np.int64)
    answer_tok = 10 + cls  # token 10 or 11
    input_ids[:, S - 2] = 5  # "answer:" marker
    input_ids[:, S - 1] = answer_tok
    labels[:, S - 1] = answer_tok
    return {
        "video_feats": video, "audio_feats": audio,
        "input_ids": input_ids, "splice_start": splice_start,
        "attention_mask": np.ones((B, S), np.int32),
        "labels": labels,
    }


def test_affectgpt_forward_and_splice():
    import jax
    import jax.numpy as jnp

    model = _make_affectgpt()
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in synth_mllm_batch(rng).items()}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    loss, logits = model.apply({"params": params}, batch)
    assert np.isfinite(float(loss))
    assert logits.shape == (4, 16, 64)
    # changing video feats must change logits at/after the splice point
    batch2 = dict(batch)
    batch2["video_feats"] = batch["video_feats"] + 1.0
    _, logits2 = model.apply({"params": params}, batch2)
    assert np.abs(np.asarray(logits2[:, 8:]) - np.asarray(logits[:, 8:])).max() > 1e-5


def test_affectgpt_frozen_llm_base():
    import jax

    from mertools_tpu.mllm import trainable_labels

    model = _make_affectgpt(lora_r=2)
    rng = np.random.default_rng(0)
    batch = synth_mllm_batch(rng)
    params = model.init(jax.random.PRNGKey(0),
                        {k: np.asarray(v) for k, v in batch.items()})["params"]
    labels = trainable_labels(params)
    # LLM base frozen, LoRA + qformers + projections trainable
    assert labels["llm"]["layer_0"]["q_proj"]["kernel"] == "frozen"
    assert labels["llm"]["layer_0"]["q_proj"]["lora_a"] == "train"
    assert labels["video_qformer"]["query_tokens"] == "train"
    assert labels["video_proj"]["kernel"] == "train"
    assert labels["frame_position_embedding"] == "train"


@pytest.mark.slow
def test_affectgpt_trains_on_synthetic_captioning():
    import jax
    import numpy as np

    from mertools_tpu.mllm import Runner, RunnerConfig

    model = _make_affectgpt(lora_r=2)
    rng = np.random.default_rng(0)
    init_batch = synth_mllm_batch(rng)
    params = model.init(jax.random.PRNGKey(0),
                        {k: np.asarray(v) for k, v in init_batch.items()})["params"]
    frozen_before = np.asarray(params["llm"]["layer_0"]["q_proj"]["kernel"]).copy()

    cfg = RunnerConfig(max_epoch=3, iters_per_epoch=60, init_lr=5e-3,
                       min_lr=1e-3, warmup_steps=10, output_dir="/tmp/mllm_test")
    runner = Runner(cfg, model, params)

    def batches():
        while True:
            yield synth_mllm_batch(rng)

    gen = batches()
    s1 = runner.train_epoch(0, gen)
    s2 = runner.train_epoch(1, gen)
    s3 = runner.train_epoch(2, gen)
    # loss must keep dropping; the binding oracle is the held-out accuracy
    # below (epoch ratios shift when module structure changes param init)
    assert s3["train_loss"] < s2["train_loss"] < s1["train_loss"], (s1, s2, s3)

    # frozen base unchanged; the answer token is predicted correctly
    frozen_after = np.asarray(runner.state.params["llm"]["layer_0"]["q_proj"]["kernel"])
    np.testing.assert_array_equal(frozen_before, frozen_after)

    test_batch = synth_mllm_batch(np.random.default_rng(123), B=32)
    _, logits = model.apply({"params": runner.state.params},
                            {k: np.asarray(v) for k, v in test_batch.items()})
    pred = np.asarray(logits)[:, -2].argmax(-1)  # prediction for last token
    truth = test_batch["labels"][:, -1]
    acc = (pred == truth).mean()
    assert acc >= 0.75, acc


@pytest.mark.parametrize("fusion", ["mean", "attention"])
def test_fusion_variants(fusion, rng):
    import jax
    """mean / attention AV fusion (reference encode_*_mean/attention,
    affectgpt.py:408-655): 2 pooled AV tokens instead of Q-Former queries."""
    from mertools_tpu.mllm import (AffectGPT, AffectGPTConfig, LLMConfig,
                                   QFormerConfig)

    cfg = AffectGPTConfig(
        llm=LLMConfig(vocab_size=64, hidden_size=32, num_layers=1,
                      num_heads=4, num_kv_heads=4, intermediate_size=64),
        video_qformer=QFormerConfig(num_queries=4, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        audio_qformer=QFormerConfig(num_queries=2, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        video_dim=12, audio_dim=10, max_video_frames=8, fusion=fusion)
    model = AffectGPT(cfg)
    assert model.num_av_tokens == 2
    B, S = 2, 12
    labels = np.full((B, S), -100, np.int64)
    labels[:, -3:] = 5
    batch = {
        "video_feats": rng.normal(size=(B, 6, 12)).astype(np.float32),
        "audio_feats": rng.normal(size=(B, 5, 10)).astype(np.float32),
        "video_mask": np.ones((B, 6), np.int32),
        "audio_mask": np.ones((B, 5), np.int32),
        "input_ids": rng.integers(0, 64, size=(B, S)).astype(np.int32),
        "splice_start": np.full(B, 1, np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "labels": labels,
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    loss, logits = model.apply({"params": params}, batch)
    assert np.isfinite(float(loss))
    # masked frames must not affect attention pooling
    batch2 = dict(batch)
    vf = batch["video_feats"].copy()
    vf[:, 4:] = 99.0
    batch2["video_feats"] = vf
    vm = batch["video_mask"].copy()
    vm[:, 4:] = 0
    batch2["video_mask"] = vm
    vf_ref = batch["video_feats"].copy()
    vf_ref[:, 4:] = -99.0
    batch3 = dict(batch2, video_feats=vf_ref)
    l2, _ = model.apply({"params": params}, batch2)
    l3, _ = model.apply({"params": params}, batch3)
    if fusion == "attention":
        np.testing.assert_allclose(float(l2), float(l3), rtol=1e-5)


def test_runner_bf16_amp_mode():
    """compute_dtype='bf16' (the reference's AMP analogue): master weights
    stay f32, training still reduces loss, eval runs."""
    import jax
    import numpy as np

    from mertools_tpu.mllm import Runner, RunnerConfig

    model = _make_affectgpt(lora_r=2)
    rng = np.random.default_rng(1)
    init_batch = synth_mllm_batch(rng)
    params = model.init(jax.random.PRNGKey(1),
                        {k: np.asarray(v) for k, v in init_batch.items()}
                        )["params"]
    cfg = RunnerConfig(max_epoch=1, iters_per_epoch=30, init_lr=5e-3,
                       min_lr=1e-4, warmup_steps=5,
                       output_dir="/tmp/mllm_bf16_test",
                       compute_dtype="bf16")
    runner = Runner(cfg, model, params)

    def batches():
        while True:
            yield synth_mllm_batch(rng)

    gen = batches()
    stats = runner.train_epoch(0, gen)
    assert np.isfinite(stats["train_loss"])
    # master weights remain f32 (mixed precision, not a cast-down)
    leaf = runner.state.params["video_proj"]["kernel"]
    assert leaf.dtype == np.float32
    first = next(gen)
    loss0 = float(runner._eval_step(runner.state, runner.place(first)))
    assert np.isfinite(loss0)


def test_llm_remat_exact_and_saves_memory():
    """cfg.remat: identical loss/grads (remat is a pure scheduling change)
    and lower compiled temp memory on a deeper stack."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mertools_tpu.mllm import llm as L

    cfg = L.LLMConfig(vocab_size=64, hidden_size=64, num_layers=8,
                      num_heads=4, num_kv_heads=4, intermediate_size=256,
                      lora_r=2)
    base = L.LLM(cfg)
    rmt = L.LLM(dataclasses.replace(cfg, remat=True))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 64, size=(2, 64)))
    params = base.init(jax.random.PRNGKey(0), x)["params"]

    def loss(model):
        def f(p):
            return L.lm_loss(model.apply({"params": p}, x), labels)
        return f

    l0, g0 = jax.value_and_grad(loss(base))(params)
    l1, g1 = jax.value_and_grad(loss(rmt))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_flatten_with_path(g0)[0],
            jax.tree_util.tree_flatten_with_path(g1)[0]):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6, err_msg=str(p0))

    def temp_bytes(model):
        lowered = jax.jit(jax.grad(loss(model))).lower(params)
        return lowered.compile().memory_analysis().temp_size_in_bytes

    assert temp_bytes(rmt) < temp_bytes(base)


def test_frozen_component_flags():
    """Reference frozen_* yaml keys freeze the mapped param subtrees
    (affectgpt.py:44-48,121-226) — including LoRA under frozen_llm — and
    training leaves frozen leaves bit-identical."""
    import jax

    from mertools_tpu.mllm import trainable_labels
    from mertools_tpu.mllm.affectgpt import frozen_components

    frozen = frozen_components({
        "frozen_llm": True, "frozen_video_Qformer": True,
        "frozen_audio_proj": True, "frozen_video_proj": False})
    assert "llm" in frozen and "video_qformer" in frozen
    assert "frame_position_embedding" in frozen and "audio_proj" in frozen
    assert "video_proj" not in frozen

    model = _make_affectgpt(lora_r=2)
    rng = np.random.default_rng(0)
    batch = synth_mllm_batch(rng)
    params = model.init(jax.random.PRNGKey(0),
                        {k: np.asarray(v) for k, v in batch.items()})["params"]
    labels = trainable_labels(params, frozen)
    assert labels["llm"]["layer_0"]["q_proj"]["lora_a"] == "frozen"
    assert labels["video_qformer"]["query_tokens"] == "frozen"
    assert labels["audio_proj"]["kernel"] == "frozen"
    assert labels["video_proj"]["kernel"] == "train"

    # a train step must not touch frozen leaves
    from mertools_tpu.mllm.runner import Runner, RunnerConfig

    cfg = RunnerConfig(max_epoch=1, iters_per_epoch=1, batch_size=2,
                       warmup_steps=1, output_dir="/tmp/unused_frozen_test",
                       frozen=frozen)
    runner = Runner(cfg, model, params)
    before_q = np.asarray(params["video_qformer"]["query_tokens"])
    before_lora = np.asarray(params["llm"]["layer_0"]["q_proj"]["lora_a"])
    before_vproj = np.asarray(params["video_proj"]["kernel"])

    def it():
        while True:
            yield {k: np.asarray(v) for k, v in batch.items()}

    runner.train_epoch(0, it())
    after = runner.state.params
    np.testing.assert_array_equal(
        np.asarray(after["video_qformer"]["query_tokens"]), before_q)
    np.testing.assert_array_equal(
        np.asarray(after["llm"]["layer_0"]["q_proj"]["lora_a"]), before_lora)
    assert np.abs(np.asarray(after["video_proj"]["kernel"])
                  - before_vproj).max() > 0


def test_chunked_loss_matches_dense():
    """Round 5: cfg.loss_chunk computes the same loss AND gradients as the
    dense (B, S, V)-logits path without materializing them — incl. a
    ragged final chunk and -100 masking."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    model = _make_affectgpt()
    batch = synth_mllm_batch(rng, B=3, S=17)   # 16 shifted positions, chunk 5
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    cfg_c = dataclasses.replace(model.cfg, loss_chunk=5)
    model_c = type(model)(cfg_c)

    def loss_dense(p):
        loss, logits = model.apply({"params": p}, batch)
        assert logits is not None
        return loss

    def loss_chunked(p):
        loss, logits = model_c.apply({"params": p}, batch)
        assert logits is None
        return loss

    ld, gd = jax.value_and_grad(loss_dense)(params)
    lc, gc = jax.value_and_grad(loss_chunked)(params)
    assert abs(float(ld) - float(lc)) < 1e-5, (float(ld), float(lc))
    flat_d = jax.tree_util.tree_leaves(gd)
    flat_c = jax.tree_util.tree_leaves(gc)
    for a, b in zip(flat_d, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    # Runner path trains with the chunked loss
    from mertools_tpu.mllm.runner import Runner, RunnerConfig

    r = Runner(RunnerConfig(max_epoch=1, iters_per_epoch=1, batch_size=3,
                            warmup_steps=1, output_dir="/tmp/chunkloss"),
               model_c, jax.tree_util.tree_map(np.asarray, params))
    _, loss = r._train_step(r.state, batch)
    assert abs(float(loss) - float(ld)) < 1e-5


def test_llm_hidden_matches_call_trunk():
    """LLM.hidden == the final-norm hidden state of __call__ (the chunked
    loss seam must not drift from the logits path's trunk)."""
    import jax
    import jax.numpy as jnp

    from mertools_tpu.mllm.llm import LLM, LLMConfig

    cfg = LLMConfig.tiny(vocab=32)
    llm = LLM(cfg)
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(2, 9, cfg.hidden_size)).astype(np.float32)
    mask = np.ones((2, 9), np.int32)
    mask[1, 6:] = 0

    def both(m, e, a):
        h = m.hidden(e, a)
        logits, hs = m(e, a, output_hidden_states=True)
        return h, hs[-1]

    params = llm.init(jax.random.PRNGKey(0), jnp.asarray(emb),
                      jnp.asarray(mask), method=both)["params"]
    h, href = llm.apply({"params": params}, jnp.asarray(emb),
                        jnp.asarray(mask), method=both)
    np.testing.assert_allclose(np.asarray(h), np.asarray(href),
                               rtol=1e-6, atol=1e-6)
