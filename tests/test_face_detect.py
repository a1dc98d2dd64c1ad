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


def test_tracked_detection_matches_full_sweep():
    """detect_face(prior=...) (round-4 ROI + scale-window tracking) finds
    the same face as the full pyramid when the prior is near-correct, and
    falls back to the full sweep when the prior is wrong."""
    import numpy as np

    from mertools_tpu.ops.face_haar import HaarFaceFrontend, _gray

    # synthetic frontal face (same recipe as the fidelity sweep)
    rng = np.random.default_rng(11)
    H, W, s, cx, cy = 240, 208, 100, 104, 120
    yy, xx = np.mgrid[:H, :W]
    img = np.full((H, W), 200.0)
    for (ex, ey, rx, ry, val) in (
            (0, 0, .55 * s, .75 * s, 195),
            (-.25 * s, -.15 * s, .14 * s, .08 * s, 60),
            (.25 * s, -.15 * s, .14 * s, .08 * s, 60),
            (0, .2 * s, .08 * s, .12 * s, 150),
            (0, .45 * s, .22 * s, .08 * s, 90)):
        m = (((xx - cx - ex) / rx) ** 2 + ((yy - cy - ey) / ry) ** 2) <= 1
        img[m] = val
    img += rng.normal(0, 2.0, img.shape)
    g = img.astype(np.float64)

    fe = HaarFaceFrontend(min_neighbors=1)
    full = fe.detect_face(g)
    assert full is not None

    tracked = fe.detect_face(g, prior=full)
    assert tracked is not None
    # IoU(full, tracked) high: same face
    def iou(a, b):
        ax0, ay0, ax1, ay1 = a[0], a[1], a[0] + a[2], a[1] + a[3]
        bx0, by0, bx1, by1 = b[0], b[1], b[0] + b[2], b[1] + b[3]
        iw = max(0, min(ax1, bx1) - max(ax0, bx0))
        ih = max(0, min(ay1, by1) - max(ay0, by0))
        inter = iw * ih
        return inter / (a[2] * a[3] + b[2] * b[3] - inter)
    assert iou(full, tracked) > 0.6, (full, tracked)

    # a nonsense prior (tiny box in the far corner) must fall back to the
    # full sweep and still find the face
    bad_prior = np.asarray([0.0, 0.0, 30.0, 30.0])
    recovered = fe.detect_face(g, prior=bad_prior)
    assert recovered is not None
    assert iou(full, recovered) > 0.9, (full, recovered)
