"""Mesh parallelism tests on the 8-device virtual CPU platform: dp training
step, tp-sharded MLLM forward, and dp+tp combined."""

import numpy as np


def test_tp_llm_forward_matches_single_device():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mertools_tpu.core.mesh import make_mesh
    from mertools_tpu.mllm.llm import LLM, LLMConfig
    from mertools_tpu.parallel.tp import llm_param_specs, shard_params

    cfg = LLMConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                    num_kv_heads=4, intermediate_size=64)
    model = LLM(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 64, size=(4, 6)).astype(np.int32)
    def fwd_m(m, i):
        return m(m.embed(i))

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids[:1]),
                        method=fwd_m)["params"]

    def fwd(p, i):
        return model.apply({"params": p}, i, method=fwd_m)

    ref = np.asarray(jax.jit(fwd)(params, jnp.asarray(ids)))

    mesh = make_mesh(n_data=2, n_model=4)
    with mesh:
        sp = shard_params(mesh, params)
        batch = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P("data", None)))
        out = np.asarray(jax.jit(fwd)(sp, batch))
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # verify head-dim sharding actually applied
    qk = sp["layer_0"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, "model")


def test_affectgpt_dp_tp_train_step():
    """Full MLLM train step over a (2 data x 4 model) mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mertools_tpu.core.mesh import make_mesh
    from mertools_tpu.mllm import AffectGPT, AffectGPTConfig, LLMConfig, QFormerConfig
    from mertools_tpu.parallel.tp import llm_param_specs

    import sys
    sys.path.insert(0, "tests")
    from test_mllm import synth_mllm_batch

    cfg = AffectGPTConfig(
        llm=LLMConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=4, intermediate_size=64, lora_r=2),
        video_qformer=QFormerConfig(num_queries=4, hidden_size=16, num_layers=1,
                                    num_heads=2, intermediate_size=32),
        audio_qformer=QFormerConfig(num_queries=2, hidden_size=16, num_layers=1,
                                    num_heads=2, intermediate_size=32),
        video_dim=12, audio_dim=10, max_video_frames=6)
    model = AffectGPT(cfg)

    rng = np.random.default_rng(0)
    batch_np = synth_mllm_batch(rng, B=4)
    params = model.init(jax.random.PRNGKey(0), batch_np)["params"]

    mesh = make_mesh(n_data=2, n_model=4)
    specs = llm_param_specs(params)
    sharded = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)
    batch = {k: jax.device_put(np.asarray(v),
                               NamedSharding(mesh, P("data", *[None] * (np.asarray(v).ndim - 1))))
             for k, v in batch_np.items()}

    @jax.jit
    def step(p, b):
        def loss_fn(pp):
            loss, _ = model.apply({"params": pp}, b)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(p)
        # sgd-style update keeps the test free of optimizer state sharding
        new_p = jax.tree_util.tree_map(lambda x, g: x - 1e-3 * g, p, grads)
        return loss, new_p

    with mesh:
        loss, new_params = step(sharded, batch)
    assert np.isfinite(float(loss))
    # frozen-encoder inputs: grads flowed, params changed where trainable
    before = np.asarray(params["video_proj"]["kernel"])
    after = np.asarray(new_params["video_proj"]["kernel"])
    assert np.abs(after - before).max() > 0


def test_generate_under_tensor_parallel_mesh():
    """KV-cached generation with TP-sharded params on the 8-device mesh must
    reproduce single-device greedy outputs (serving-path mesh readiness)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mertools_tpu.core.mesh import make_mesh
    from mertools_tpu.mllm.generate import generate
    from mertools_tpu.mllm.llm import LLM, LLMConfig
    from mertools_tpu.parallel.tp import llm_param_specs

    cfg = LLMConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                    num_kv_heads=4, intermediate_size=64)
    model = LLM(cfg)

    def both(mdl, embeds, ids):
        mdl.embed(ids)
        return mdl(embeds)

    rng_l = np.random.default_rng(3)
    emb = rng_l.normal(size=(2, 6, 32)).astype(np.float32) * 0.1
    mask = np.ones((2, 6), np.int32)
    params = model.init(jax.random.PRNGKey(1), emb,
                        np.zeros((1, 1), np.int32), method=both)["params"]

    ref = np.asarray(generate(cfg, params, jnp.asarray(emb),
                              jnp.asarray(mask), max_new_tokens=6,
                              eos_token_id=95))

    mesh = make_mesh(n_data=4, n_model=2)
    specs = llm_param_specs(params)
    sharded = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)
    with mesh:
        got = np.asarray(generate(cfg, sharded, jnp.asarray(emb),
                                  jnp.asarray(mask), max_new_tokens=6,
                                  eos_token_id=95))
    np.testing.assert_array_equal(ref, got)


def test_audio_extraction_data_parallel_mesh():
    """Data-parallel extraction semantics on a 2-device mesh.

    Full sharded conv-encoder compiles are pathologically slow on the
    virtual CPU backend, so this checks the two load-bearing pieces
    directly: (a) the extractor's jitted pooled forward produces identical
    results for sharded vs single-device inputs, (b) extract() rounds batch
    sizes to multiples of the data-axis size.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mertools_tpu.core.mesh import make_mesh
    from mertools_tpu.encoders.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
    from mertools_tpu.features.audio import AudioExtractor

    cfg = Wav2Vec2Config(hidden_size=16, num_hidden_layers=4,
                         num_attention_heads=2, intermediate_size=32,
                         conv_dim=(8,), conv_kernel=(10,), conv_stride=(5,),
                         num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=2)
    enc = Wav2Vec2Encoder(cfg)
    params = enc.init(jax.random.PRNGKey(0),
                      np.zeros((1, 400), np.float32))["params"]
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    ex = AudioExtractor(cfg, params, buckets=(400,), sample_budget=800,
                        mesh=mesh)
    assert ex._n_data == 2

    rng_l = np.random.default_rng(0)
    batch = rng_l.normal(size=(2, 400)).astype(np.float32)
    lens = np.array([400, 300], np.int32)
    ref = np.asarray(AudioExtractor(cfg, params, buckets=(400,),
                                    sample_budget=800)._fwd_pooled(
        jax.device_put(params), jnp.asarray(batch), jnp.asarray(lens))[0])
    with mesh:
        got = np.asarray(ex._fwd_pooled(
            ex._params, jax.device_put(batch, ex._data_sharding(2)),
            jax.device_put(lens, ex._data_sharding(1)))[0])
    np.testing.assert_allclose(ref, got, rtol=2e-4, atol=2e-4)

    # batch-size rounding: sample_budget 800 / bucket 400 = 2 -> multiple of 2
    wavs = {f"c{i}": rng_l.normal(size=350).astype(np.float32)
            for i in range(3)}
    with mesh:
        out = ex.extract(wavs, level="UTT")
    assert len(out) == 3 and all(v.shape == (16,) for v in out.values())


def test_vision_extraction_data_parallel_mesh(rng):
    """FrameStreamExtractor over a data mesh == single-device extraction."""
    import jax

    from mertools_tpu.core.mesh import make_mesh
    from mertools_tpu.encoders.vit import ViTEncoder, dinov2_config
    from mertools_tpu.features.vision_zoo import vit_token_sum_extractor

    cfg = dinov2_config(hidden_size=16, num_layers=1, num_heads=2,
                        intermediate_size=32, image_size=28)
    enc = ViTEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0),
                      np.zeros((1, 28, 28, 3), np.float32))["params"]
    faces = {f"c{i}": (rng.random((3, 112, 112, 3)) * 255).astype(np.uint8)
             for i in range(5)}
    ref = vit_token_sum_extractor(cfg, params, batch_size=4,
                                  max_frames=2).extract(faces, level="UTT")
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    from mertools_tpu.features.vision_zoo import (FrameStreamExtractor,
                                                  IMAGENET_DEFAULT,
                                                  PreprocessSpec)
    spec = PreprocessSpec(image_size=28, mean=IMAGENET_DEFAULT[0],
                          std=IMAGENET_DEFAULT[1])

    def forward(p, pix):
        return enc.apply({"params": p}, pix).sum(axis=1)

    ex = FrameStreamExtractor(forward, params, spec, batch_size=4,
                              max_frames=2, mesh=mesh)
    assert ex.batch_size == 4    # rounded to a multiple of n_data
    with mesh:
        out = ex.extract(faces, level="UTT")
    for n in faces:
        np.testing.assert_allclose(out[n], ref[n], rtol=1e-5, atol=1e-6)
