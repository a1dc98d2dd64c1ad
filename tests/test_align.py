"""Alignment-op semantics tests.

Golden behavior is the reference's func_mapping_feature
(MERBench/toolkit/utils/read_data.py:72-89): front-pad when short,
front-pad + consecutive mean-pool when long.
"""

import math

import numpy as np
import pytest

from mertools_tpu.ops import align


def ref_mapping(feature: np.ndarray, dst_len: int) -> np.ndarray:
    """Independent re-derivation of the reference formula (used as oracle)."""
    featlen, featdim = feature.shape
    if featlen == dst_len:
        return feature
    if featlen < dst_len:
        return np.concatenate([np.zeros((dst_len - featlen, featdim)), feature], 0)
    if featlen % dst_len == 0:
        pad_len, pool = 0, featlen // dst_len
    else:
        pad_len, pool = dst_len - featlen % dst_len, featlen // dst_len + 1
    padded = np.concatenate([np.zeros((pad_len, featdim)), feature], 0)
    return padded.reshape(dst_len, pool, featdim).mean(1)


@pytest.mark.parametrize("t,dst", [(5, 5), (3, 8), (8, 3), (12, 4), (13, 4), (1, 6), (100, 7)])
def test_map_feature_np_matches_reference_formula(rng, t, dst):
    x = rng.normal(size=(t, 4))
    np.testing.assert_allclose(align.map_feature_np(x, dst), ref_mapping(x, dst), atol=1e-12)


def test_front_padding_short():
    x = np.arange(6, dtype=np.float64).reshape(3, 2)
    out = align.map_feature_np(x, 5)
    assert out.shape == (5, 2)
    np.testing.assert_array_equal(out[:2], 0.0)  # padding at the FRONT
    np.testing.assert_array_equal(out[2:], x)


def test_mean_pool_long_divisible():
    x = np.arange(8, dtype=np.float64).reshape(8, 1)
    out = align.map_feature_np(x, 4)
    np.testing.assert_allclose(out[:, 0], [0.5, 2.5, 4.5, 6.5])


def test_mean_pool_long_nondivisible():
    # T=5, dst=3 -> pad 1 zero in front, pool=2: groups [0,x0],[x1,x2],[x3,x4]
    x = np.arange(1, 6, dtype=np.float64).reshape(5, 1)
    out = align.map_feature_np(x, 3)
    np.testing.assert_allclose(out[:, 0], [0.5, 2.5, 4.5])


@pytest.mark.parametrize("dst", [3, 7, 16])
def test_batched_matches_host(rng, dst):
    import jax.numpy as jnp

    lengths = np.array([3, 7, 16, 25, 1], dtype=np.int32)
    src = 32
    d = 6
    x = np.zeros((len(lengths), src, d), dtype=np.float32)
    golden = []
    for i, L in enumerate(lengths):
        xi = rng.normal(size=(L, d)).astype(np.float32)
        x[i, :L] = xi  # end-padded buffer layout
        golden.append(align.map_feature_np(xi, dst))
    out = np.asarray(align.map_feature_batched(jnp.asarray(x), jnp.asarray(lengths), dst))
    np.testing.assert_allclose(out, np.stack(golden), atol=1e-5)


def test_masked_mean_over_time(rng):
    import jax.numpy as jnp

    lengths = np.array([2, 5], dtype=np.int32)
    x = rng.normal(size=(2, 5, 3)).astype(np.float32)
    x[0, 2:] = 99.0  # garbage in padding must be ignored
    out = np.asarray(align.masked_mean_over_time(jnp.asarray(x), jnp.asarray(lengths)))
    np.testing.assert_allclose(out[0], x[0, :2].mean(0), atol=1e-5)
    np.testing.assert_allclose(out[1], x[1].mean(0), atol=1e-5)


def test_scale_compress_batched_matches_host(rng):
    import jax.numpy as jnp

    scale = 6
    lengths = np.array([4, 12, 23], dtype=np.int32)
    src, d = 24, 5
    x = np.zeros((3, src, d), dtype=np.float32)
    samples = []
    for i, L in enumerate(lengths):
        xi = rng.normal(size=(L, d)).astype(np.float32)
        x[i, :L] = xi
        samples.append(xi)
    golden = align.feature_scale_compress_np(samples, scale)
    dst = int(math.ceil(src / scale))
    y, new_len = align.scale_compress_batched(jnp.asarray(x), jnp.asarray(lengths), scale, dst)
    y, new_len = np.asarray(y), np.asarray(new_len)
    for i, g in enumerate(golden):
        assert new_len[i] == len(g)
        np.testing.assert_allclose(y[i, : len(g)], g, atol=1e-5)
        np.testing.assert_array_equal(y[i, len(g):], 0.0)


def test_align_to_text_np(rng):
    audios = [rng.normal(size=(9, 2)), rng.normal(size=(2, 2))]
    texts = [rng.normal(size=(4, 3)), rng.normal(size=(5, 3))]
    videos = [rng.normal(size=(4, 2)), rng.normal(size=(20, 2))]
    a, t, v = align.align_to_text_np(audios, texts, videos)
    for i in range(2):
        assert a[i].shape[0] == t[i].shape[0] == v[i].shape[0] == texts[i].shape[0]
    np.testing.assert_allclose(t[0], texts[0])  # same-length text is identity
