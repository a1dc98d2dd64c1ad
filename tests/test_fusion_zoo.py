"""Forward + gradient tests for every fusion model in the zoo."""

import numpy as np
import pytest

from mertools_tpu.core.config import Args

B, LA, LT, LV = 4, 9, 7, 7
DA, DT, DV = 10, 12, 8


def make_batch(rng, feat_type):
    if feat_type == "utt":
        batch = {
            "audios": rng.normal(size=(B, DA)).astype(np.float32),
            "texts": rng.normal(size=(B, DT)).astype(np.float32),
            "videos": rng.normal(size=(B, DV)).astype(np.float32),
        }
    elif feat_type == "frm_align":
        batch = {
            "audios": rng.normal(size=(B, LT, DA)).astype(np.float32),
            "texts": rng.normal(size=(B, LT, DT)).astype(np.float32),
            "videos": rng.normal(size=(B, LT, DV)).astype(np.float32),
        }
    else:  # frm_unalign
        batch = {
            "audios": rng.normal(size=(B, LA, DA)).astype(np.float32),
            "texts": rng.normal(size=(B, LT, DT)).astype(np.float32),
            "videos": rng.normal(size=(B, LV, DV)).astype(np.float32),
        }
    batch["emos"] = rng.integers(0, 6, size=B).astype(np.int32)
    batch["vals"] = rng.normal(size=B).astype(np.float32)
    return batch


# (model, extra args, supported feat types) — mirrors the reference matrix
# (MERBench/toolkit/models/__init__.py:25-44 comments)
ZOO = [
    ("attention", {}, ["utt", "frm_align", "frm_unalign"]),
    ("lf_dnn", {}, ["utt", "frm_align"]),
    ("tfn", {"hidden_dim": 16}, ["utt", "frm_align"]),
    ("lmf", {"rank": 3}, ["utt", "frm_align"]),
    ("misa", {"sim_weight": 0.1, "diff_weight": 0.1, "recon_weight": 0.1}, ["utt", "frm_align"]),
    ("mmim", {"cpc_layers": 2, "alpha": 0.1, "beta": 0.1}, ["utt", "frm_align"]),
    ("ef_lstm", {"num_layers": 2}, ["frm_align"]),
    ("mfn", {"mem_dim": 16}, ["frm_align"]),
    ("graph_mfn", {"mem_dim": 16}, ["frm_align"]),
    ("mfm", {"mem_dim": 16, "lda_xl": 0.1, "lda_xa": 0.1, "lda_xv": 0.1, "lda_mmd": 1.0}, ["frm_align"]),
    ("mctn", {"loss_weight": 0.3}, ["frm_align"]),
    ("mult", {"num_heads": 4, "layers": 2, "conv1d_kernel_size": 3}, ["frm_align", "frm_unalign"]),
]


@pytest.mark.parametrize("name,extra,feat_types", ZOO, ids=[z[0] for z in ZOO])
def test_forward_and_grads(rng, name, extra, feat_types):
    import jax
    import jax.numpy as jnp

    from mertools_tpu.models import get_model
    from mertools_tpu.ops import losses

    for feat_type in feat_types:
        batch = make_batch(rng, feat_type)
        args = Args(dict(model=name, hidden_dim=16, dropout=0.1, output_dim1=6,
                         output_dim2=1, feat_type=feat_type), **extra)
        model = get_model(args)
        params = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)["params"]

        feats, emos_out, vals_out, interloss = model.apply({"params": params}, batch, train=False)
        assert emos_out.shape == (B, 6), (name, feat_type, emos_out.shape)
        assert vals_out.shape == (B, 1)
        assert np.isfinite(np.asarray(emos_out)).all(), (name, feat_type)
        assert np.isfinite(float(interloss)), (name, feat_type)

        # gradient flows through the full loss in train mode
        def loss_fn(p):
            rngs = {"dropout": jax.random.PRNGKey(1), "mmd": jax.random.PRNGKey(2)}
            f, e, v, il = model.apply({"params": p}, batch, train=True, rngs=rngs)
            return il + losses.cross_entropy(e, batch["emos"]) + losses.mse(v, batch["vals"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss)), (name, feat_type)
        gnorm = jax.tree_util.tree_reduce(
            lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
        assert np.isfinite(gnorm) and gnorm > 0, (name, feat_type)


def test_attention_topn_forward(rng):
    import jax

    from mertools_tpu.models import get_model

    dims = [10, 12, 8, 6]
    batch = {f"feat{i}": rng.normal(size=(B, d)).astype(np.float32)
             for i, d in enumerate(dims)}
    args = Args(model="attention_topn", feat_dims=dims, hidden_dim=16,
                dropout=0.1, output_dim1=6, output_dim2=1)
    model = get_model(args)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)["params"]
    feats, emos_out, vals_out, interloss = model.apply({"params": params}, batch, train=False)
    assert emos_out.shape == (B, 6)
    assert feats.shape == (B, 16)


def test_mult_offset_mask():
    import numpy as np

    from mertools_tpu.models.mult import offset_causal_bias

    m = np.asarray(offset_causal_bias(3, 5))
    # query i attends key j iff j <= i + |5-3| = i + 2
    assert (m[0, :3] == 0).all() and np.isinf(m[0, 3:]).all()
    assert (m[2, :5] == 0).all()
    m2 = np.asarray(offset_causal_bias(4, 4))
    assert np.isinf(m2[0, 1:]).all() and (np.diag(m2) == 0).all()
