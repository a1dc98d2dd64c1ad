"""E2E fine-tuning model + VideoMAE masked pretraining (fusion contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.models.e2e_model import (E2EConfig, E2EModel,
                                           VideoMAEPretrain, _patchify,
                                           e2e_param_labels)


def _text_backbone():
    from mertools_tpu.encoders.bert import BertConfig, BertEncoder
    cfg = BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=4,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32)
    return BertEncoder(cfg), 16


def test_e2e_text_contract(rng):
    backbone, dim = _text_backbone()
    model = E2EModel(E2EConfig("text", feat_dim=dim, hidden_dim=24,
                               output_dim1=6, output_dim2=1), backbone)
    batch = {"input_ids": rng.integers(0, 50, size=(2, 12)).astype(np.int32),
             "attention_mask": np.ones((2, 12), np.int32)}
    batch["attention_mask"][0, 8:] = 0
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    feats, emos, vals, inter = model.apply({"params": params}, batch)
    assert feats.shape == (2, 24) and emos.shape == (2, 6)
    assert vals.shape == (2, 1) and float(inter) == 0.0

    labels = e2e_param_labels(params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    lab = {jax.tree_util.keystr(p): v for p, v in flat}
    assert any(v == "backbone" for v in lab.values())
    assert any(v == "head" for v in lab.values())


def test_e2e_audio_segments(rng):
    from mertools_tpu.encoders.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
    cfg = Wav2Vec2Config(hidden_size=16, num_hidden_layers=4,
                         num_attention_heads=2, intermediate_size=32,
                         conv_dim=(8, 8), conv_kernel=(10, 3),
                         conv_stride=(5, 2), num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=2)
    model = E2EModel(E2EConfig("audio", feat_dim=16, hidden_dim=8),
                     Wav2Vec2Encoder(cfg))
    batch = {"audios": rng.normal(size=(2, 3, 800)).astype(np.float32)}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    feats, emos, vals, _ = model.apply({"params": params}, batch)
    assert feats.shape == (2, 8) and np.isfinite(np.asarray(emos)).all()


def test_videomae_pretrain_loss_decreases(rng):
    from mertools_tpu.encoders.vit import ViTEncoder, videomae_config
    import optax

    vc = videomae_config(hidden_size=24, num_layers=1, num_heads=2,
                         intermediate_size=48, image_size=16, patch_size=8,
                         num_frames=4, tubelet_size=2)
    model = VideoMAEPretrain(ViTEncoder(vc), decoder_dim=24,
                             decoder_layers=1, decoder_heads=2,
                             mask_ratio=0.5)
    videos = rng.normal(size=(2, 4, 16, 16, 3)).astype(np.float32)
    batch = {"videos": videos, "mask_seed": 1}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, b):
        def loss_fn(pp):
            return model.apply({"params": pp}, b)[3]
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    first = None
    for i in range(30):
        params, opt, loss = step(params, opt, batch)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.7 * first, (first, float(loss))


def test_patchify_shapes(rng):
    from mertools_tpu.encoders.vit import videomae_config
    vc = videomae_config(image_size=16, patch_size=8, num_frames=4,
                         tubelet_size=2)
    v = rng.normal(size=(2, 4, 16, 16, 3)).astype(np.float32)
    p = _patchify(jnp.asarray(v), vc)
    assert p.shape == (2, 2 * 2 * 2, 2 * 8 * 8 * 3)
    # first patch = first tubelet, top-left corner
    ref = v[0, 0:2, 0:8, 0:8].transpose(0, 1, 2, 3).reshape(-1)
    np.testing.assert_allclose(np.asarray(p)[0, 0], ref, atol=1e-6)


def test_e2e_cli_end_to_end(tmp_path, rng):
    """Raw-audio e2e fine-tuning through the full CV driver (tiny backbone)."""
    import struct

    from mertools_tpu.core.globals_mer import EMOS_MER
    from mertools_tpu.data import labels

    def write_wav(path, wav, sr=16000):
        pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2,
                                          2, 16))
            f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)

    audio = tmp_path / "audio"
    audio.mkdir()
    corpus = {}
    t = np.arange(8000) / 16000.0
    for i in range(20):
        e = i % 2  # two separable classes by tone frequency
        name = f"c{i:02d}"
        freq = 200.0 if e == 0 else 500.0
        write_wav(str(audio / f"{name}.wav"),
                  0.4 * np.sin(2 * np.pi * freq * t))
        corpus[name] = {"emo": EMOS_MER[e], "val": 0.0}
    labels.write_label_archive(str(tmp_path / "labels.npz"),
                               {"train": corpus})

    from mertools_tpu.cli.main_release import main
    result = main([
        "--dataset=MER2025", "--model=e2e_model", "--e2e_name=tiny-audio",
        f"--raw_audio_root={audio}", "--lr=1e-3", "--batch_size=8",
        "--epochs=4", "--seed=0", "--e2e_nseg=2", "--e2e_seglen=2000",
        "--savemodel",
        f"--save_root={tmp_path / 'saved'}",
        f"--features_root={tmp_path}", f"--label_path={tmp_path / 'labels.npz'}",
    ])
    assert result.cv["emofscore"] > 0.6  # tones are trivially separable

    # --savemodel persisted the fine-tuned backbone per fold in the
    # encoder's native layout (main-release.py:72-75 workflow)
    import glob as _glob

    import orbax.checkpoint as ocp

    saved = sorted(_glob.glob(str(tmp_path / "saved*" / "model" /
                                  "fold*_backbone")))
    assert saved, "no fine-tuned backbone checkpoints written"
    tree = ocp.PyTreeCheckpointer().restore(saved[0])
    assert isinstance(tree, dict) and tree


def test_videomae_pretrain_cli(tmp_path, rng):
    """Masked-video pretraining through the CV driver on face npy stores."""
    from mertools_tpu.core.globals_mer import EMOS_MER
    from mertools_tpu.data import labels

    faces = tmp_path / "faces"
    faces.mkdir()
    corpus = {}
    for i in range(10):
        name = f"f{i:02d}"
        np.save(faces / f"{name}.npy",
                rng.integers(0, 255, size=(6, 32, 32, 3), dtype=np.uint8))
        corpus[name] = {"emo": EMOS_MER[i % 2], "val": 0.0}
    labels.write_label_archive(str(tmp_path / "labels.npz"),
                               {"train": corpus})

    from mertools_tpu.cli.main_release import main
    result = main([
        "--dataset=MER2025", "--model=videomae_pretrain", "--e2e_name=tiny",
        f"--face_npy_root={faces}", "--e2e_nseg=4", "--lr=1e-3",
        "--batch_size=4", "--epochs=2", "--seed=0", "--mae_mask_ratio=0.5",
        "--mae_image_size=32",
        f"--save_root={tmp_path / 'saved'}",
        f"--features_root={tmp_path}",
        f"--label_path={tmp_path / 'labels.npz'}",
    ])
    assert result.cv is not None


def test_compact_u8_video_matches_precomputed(rng, tmp_path):
    """videos_u8 + on-device preprocessing == precomputed float frames."""
    import os

    from mertools_tpu.data.e2e_dataset import E2EDataset
    from mertools_tpu.encoders.vit_clip import (CLIPVisionConfig,
                                                CLIPVisionEncoder)
    from mertools_tpu.models.e2e_model import _CLIPEmbedWrapper

    face_root = str(tmp_path)
    names = ["a", "b"]
    for n in names:
        np.save(os.path.join(face_root, f"{n}.npy"),
                (rng.random((5, 48, 48, 3)) * 255).astype(np.uint8))
    emos, vals = [0, 1], [0.1, -0.2]

    S = 32
    ds_u8 = E2EDataset.build_video(names, emos, vals, face_root, n_frms=4,
                                   image_size=S, compact=True)
    ds_f = E2EDataset.build_video(names, emos, vals, face_root, n_frms=4,
                                  image_size=S, compact=False)
    assert ds_u8.arrays()["videos_u8"].dtype == np.uint8
    assert ds_u8.arrays()["videos_u8"].shape == (2, 4, 48, 48, 3)

    bcfg = CLIPVisionConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            image_size=S, patch_size=16, projection_dim=12)
    backbone = _CLIPEmbedWrapper(CLIPVisionEncoder(bcfg))
    model = E2EModel(E2EConfig("video_clip", feat_dim=12, hidden_dim=8,
                               image_size=S), backbone)
    b_u8 = {"videos_u8": ds_u8.arrays()["videos_u8"]}
    b_f = {"videos": ds_f.arrays()["videos"].astype(np.float32)}
    params = model.init(jax.random.PRNGKey(0), b_u8)["params"]
    f1, e1, v1, _ = model.apply({"params": params}, b_u8)
    f2, e2, v2, _ = model.apply({"params": params}, b_f)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_videomae_pretrain_u8_path(rng):
    from mertools_tpu.encoders.vit import ViTEncoder, videomae_config

    vcfg = videomae_config(hidden_size=24, num_layers=1, num_heads=2,
                           intermediate_size=48, image_size=32,
                           patch_size=16, num_frames=4, tubelet_size=2)
    model = VideoMAEPretrain(ViTEncoder(vcfg), mask_ratio=0.5)
    batch = {"videos_u8": (rng.random((2, 4, 48, 48, 3)) * 255
                           ).astype(np.uint8)}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    feats, _, _, loss = model.apply({"params": params}, batch)
    assert feats.shape == (2, 24)
    assert np.isfinite(float(loss)) and float(loss) > 0
