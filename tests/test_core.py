"""Core registry/config/mesh tests."""

import numpy as np
import pytest

from mertools_tpu.core import globals_mer, mesh
from mertools_tpu.core.config import (PathRegistry, apply_dotted_overrides,
                                      merge_config, random_select)
from mertools_tpu.core.registry import Registry


def test_registry_roundtrip():
    reg = Registry()

    @reg.register_model("foo")
    class Foo:
        pass

    assert reg.get_model("foo") is Foo
    assert reg.names("model") == ["foo"]
    with pytest.raises(KeyError):
        reg.get_model("bar")


def test_registry_duplicate_raises():
    reg = Registry()
    reg.register("model", "x")(int)
    with pytest.raises(KeyError):
        reg.register("model", "x")(float)
    # same object re-registration is idempotent
    reg.register("model", "x")(int)


def test_globals():
    assert globals_mer.EMO2IDX_MER["neutral"] == 0
    assert len(globals_mer.EMOS_MER) == 6
    assert globals_mer.feature_dir_name("chinese-hubert-large", "UTT") == "chinese-hubert-large-UTT"


def test_path_registry(tmp_path):
    reg = PathRegistry()
    p = reg.register("MER2023", str(tmp_path / "mer2023"))
    assert p.label.endswith("label-6way.npz")
    assert "MER2023" in reg


def test_dotted_overrides():
    cfg = {"model": {"lr": 1e-4}, "run": {"epochs": 3}}
    out = apply_dotted_overrides(cfg, ["model.lr=1e-3", "run.device=tpu", "new.a.b=2"])
    assert out["model"]["lr"] == 1e-3
    assert out["run"]["device"] == "tpu"
    assert out["new"]["a"]["b"] == 2
    assert cfg["model"]["lr"] == 1e-4  # original untouched


def test_random_select_seeded():
    space = {"hidden_dim": [64, 128, 256], "lr": [1e-3, 1e-4], "fixed": 7}
    out = random_select(space, np.random.default_rng(0))
    assert out["hidden_dim"] in space["hidden_dim"]
    assert out["lr"] in space["lr"]
    assert out["fixed"] == 7
    out2 = random_select(space, np.random.default_rng(0))
    assert out == out2


def test_merge_config():
    assert merge_config({"a": 1, "b": 2}, {"b": 3}) == {"a": 1, "b": 3}


def test_mesh_8_devices():
    import jax

    assert len(jax.devices()) == 8  # conftest forces 8 virtual CPU devices
    m = mesh.make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m2 = mesh.make_mesh(n_data=4, n_model=2)
    assert m2.shape == {"data": 4, "model": 2}


def test_shard_batch_and_replicate():
    import jax
    import jax.numpy as jnp

    m = mesh.make_mesh()
    batch = {"x": np.ones((16, 3), np.float32), "y": np.zeros((16,), np.int32)}
    sharded = mesh.shard_batch(m, batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data", None)
    total = jax.jit(lambda b: jnp.sum(b["x"]))(sharded)
    assert float(total) == 48.0
    params = mesh.replicate(m, {"w": np.ones((3, 3), np.float32)})
    assert params["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_resolve_dataset_args(tmp_path, monkeypatch):
    """run.sh-style --dataset resolution: registry fills path args left as
    None; explicit values win; missing registry entry is a clear error."""
    import argparse

    import pytest

    from mertools_tpu.core import config as C

    yaml = tmp_path / "paths.yaml"
    yaml.write_text(
        "datasets:\n  MER2023:\n    root: %s\n" % tmp_path)
    monkeypatch.setenv("MERTOOLS_TPU_CONFIG", str(yaml))

    ns = argparse.Namespace(dataset="MER2023", audio_dir=None, save_dir=None)
    C.resolve_dataset_args(ns, audio_dir="audio", save_dir="features")
    assert ns.audio_dir.endswith("audio")
    assert ns.save_dir.endswith("features")

    ns = argparse.Namespace(dataset="MER2023", audio_dir="/x", save_dir=None)
    C.resolve_dataset_args(ns, audio_dir="audio", save_dir="features")
    assert ns.audio_dir == "/x"   # explicit wins

    ns = argparse.Namespace(dataset="NOPE", audio_dir=None, save_dir=None)
    with pytest.raises(SystemExit):
        C.resolve_dataset_args(ns, audio_dir="audio", save_dir="features")

    ns = argparse.Namespace(dataset=None, audio_dir=None, save_dir="/y")
    with pytest.raises(SystemExit):
        C.resolve_dataset_args(ns, audio_dir="audio", save_dir="features")
