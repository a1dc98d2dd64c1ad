"""Face detector machinery: anchors, decode, NMS, and an end-to-end
trainability proof (synthetic bright-square "faces" localized to IoU>0.5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.ops import face_detect as FD


def test_anchor_layout():
    a = FD.generate_anchors()
    assert a.shape == (16 * 16 * 2 + 8 * 8 * 6, 4)
    assert (a[:, :2] > 0).all() and (a[:, :2] < 1).all()


def test_iou_and_nms():
    boxes = jnp.asarray([[0.1, 0.1, 0.5, 0.5],
                         [0.12, 0.12, 0.52, 0.52],   # overlaps #0
                         [0.6, 0.6, 0.9, 0.9]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    kept_boxes, kept_scores = FD.nms(boxes, scores, top_k=3, iou_thresh=0.4)
    kept_scores = np.asarray(kept_scores)
    # box 1 is suppressed by box 0; box 2 survives
    assert kept_scores[0] == pytest.approx(0.9)
    assert kept_scores[1] == pytest.approx(0.7)
    assert kept_scores[2] == -np.inf


def _synthetic(rng, B):
    """Bright square at random location on dark noise; returns imgs + gt."""
    imgs = rng.normal(size=(B, 128, 128, 3)).astype(np.float32) * 0.05 + 0.1
    gts = np.zeros((B, 4), np.float32)
    for b in range(B):
        s = rng.integers(28, 44)
        x0 = rng.integers(4, 128 - s - 4)
        y0 = rng.integers(4, 128 - s - 4)
        imgs[b, y0:y0 + s, x0:x0 + s] = 0.9
        gts[b] = [x0 / 128, y0 / 128, (x0 + s) / 128, (y0 + s) / 128]
    return imgs, gts


def test_detector_trains_and_localizes(rng):
    import optax

    model = FD.BlazeFace(width=16)
    anchors = jnp.asarray(FD.generate_anchors())
    imgs0, _ = _synthetic(rng, 4)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs0))["params"]
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, imgs, gts):
        def loss_fn(pp):
            scores, raw = model.apply({"params": pp}, imgs)
            return FD.detection_loss(scores, raw, anchors, gts)
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    for i in range(250):
        imgs, gts = _synthetic(rng, 8)
        params, opt, loss = step(params, opt, jnp.asarray(imgs),
                                 jnp.asarray(gts))

    det = FD.FaceDetector(params, width=16)
    imgs, gts = _synthetic(rng, 8)
    out, probs = det.detect(imgs)
    ious = np.asarray(FD.iou(jnp.asarray(out[:, :4]), jnp.asarray(gts)))
    # majority localized (tiny net, 60 steps): proves the full train->detect
    # machinery; real-face quality comes from converted public checkpoints
    assert (ious > 0.5).mean() >= 0.6, ious


def test_detect_faces_cli(tmp_path, rng):
    """detect-faces preprocess subcommand: frame npy + random detector
    params -> aligned (T', 112, 112, 3) BGR uint8 stores (plumbing check;
    localization quality is the detector-weight test above)."""
    from flax.traverse_util import flatten_dict

    from mertools_tpu.cli.preprocess import main

    model = FD.BlazeFace(width=16)
    imgs = rng.normal(size=(1, 128, 128, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs))["params"]
    pfile = tmp_path / "det.npz"
    np.savez(pfile, params=np.array(
        jax.tree_util.tree_map(np.asarray, params), dtype=object))

    vids = tmp_path / "frames"
    vids.mkdir()
    np.save(vids / "clipA.npy",
            rng.integers(0, 255, size=(4, 96, 96, 3), dtype=np.uint8))
    out = tmp_path / "faces"
    main(["detect-faces", f"--video_root={vids}", f"--save_root={out}",
          f"--detector_params={pfile}", "--detector_width=16",
          "--score_thresh=0.0"])
    arr = np.load(out / "clipA.npy")
    assert arr.dtype == np.uint8 and arr.shape[1:] == (112, 112, 3)
    assert 1 <= arr.shape[0] <= 4
