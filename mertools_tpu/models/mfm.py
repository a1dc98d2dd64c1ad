"""MFM: factorized multimodal representations (generative-discriminative).

Reference behavior (``MERBench/toolkit/models/mfm.py``): per-modality LSTM
encoders give z_l/z_a/z_v; an inner MFN gives last_hs -> z_y; MMD losses pull
every z toward a standard Gaussian (fresh Gaussian samples each call); factor
MLPs give f_* (hidden//2); LSTM decoders reconstruct each modality sequence
from concat(f_y, f_modality) (the decoder feeds back its own hidden state);
interloss = lda_mmd * sum(MMD) + sum(lda_x* · MSE(recon, input));
features = MLP(f_y) of dim hidden//2.

TPU-native: encoder/decoder recurrences are ``nn.scan``; the MMD Gaussian
draws use the 'mmd' rng stream (a fixed key at eval, matching torch's
eval-time behavior of still sampling but with dropout off).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .mfn import MFNBackbone
from .modules import SimpleClassifierHeads


def _mmd_gaussian(z: jnp.ndarray, key) -> jnp.ndarray:
    """RBF-kernel MMD between z and N(0, I) samples (mfm.py:11-31)."""
    real = jax.random.normal(key, z.shape, z.dtype)

    def kernel(x, y):
        d = x.shape[-1]
        sq = jnp.mean((x[:, None, :] - y[None, :, :]) ** 2, axis=-1) / d
        return jnp.exp(-sq)

    return kernel(real, real).mean() + kernel(z, z).mean() - 2.0 * kernel(real, z).mean()


class _EncLSTMStep(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, carry, x):
        carry, _ = nn.OptimizedLSTMCell(self.hidden, name="cell")(carry, x)
        return carry, None


class _DecLSTMStep(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, carry, _):
        (c, h), inp = carry
        (nc, nh), _ = nn.OptimizedLSTMCell(self.hidden, name="cell")((c, h), inp)
        return ((nc, nh), nh), nh  # next input is our own hidden state


class EncoderLSTM(nn.Module):
    """(B, T, D) -> last hidden -> Dense (mfm.py:33-55)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        zeros = jnp.zeros((B, self.hidden), x.dtype)
        scan = nn.scan(_EncLSTMStep, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        (c, h), _ = scan(self.hidden, name="step")((zeros, zeros), x)
        return nn.Dense(self.hidden, name="fc1")(h)


class DecoderLSTM(nn.Module):
    """Seed vector -> T autoregressive hidden states -> Dense to D
    (mfm.py:57-85: step 0 consumes the seed, later steps the previous h)."""

    hidden: int
    out_dim: int
    steps: int

    @nn.compact
    def __call__(self, seed):
        B = seed.shape[0]
        zeros = jnp.zeros((B, self.hidden), seed.dtype)
        scan = nn.scan(_DecLSTMStep, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        dummy = jnp.zeros((B, self.steps, 1), seed.dtype)
        _, hs = scan(self.hidden, name="step")(((zeros, zeros), seed), dummy)
        return nn.Dense(self.out_dim, name="fc1")(hs)  # (B, T, D)


@registry.register_model("mfm")
class MFM(FromArgsMixin, nn.Module):
    hidden_dim: int = 128
    mem_dim: int = 128
    dropout: float = 0.3
    window_dim: int = 2
    lda_xl: float = 0.1
    lda_xa: float = 0.1
    lda_xv: float = 0.1
    lda_mmd: float = 10.0
    output_dim1: int = 6
    output_dim2: int = 1
    feat_type: str = "frm_align"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        H = self.hidden_dim
        f_dim = H // 2
        out_dim = H // 2
        T = batch["texts"].shape[1]
        assert batch["audios"].shape[1] == T == batch["videos"].shape[1]

        z_l = EncoderLSTM(H, name="encoder_l")(batch["texts"])
        z_a = EncoderLSTM(H, name="encoder_a")(batch["audios"])
        z_v = EncoderLSTM(H, name="encoder_v")(batch["videos"])

        last_hs, _ = MFNBackbone(H, self.mem_dim, self.dropout, name="mfn_encoder")(batch, train)
        z_y = nn.Dense(H, name="last_to_zy_fc1")(last_hs)

        key = (self.make_rng("mmd") if self.has_rng("mmd") else jax.random.PRNGKey(0))
        keys = jax.random.split(key, 4)
        mmd = (_mmd_gaussian(z_l, keys[0]) + _mmd_gaussian(z_a, keys[1])
               + _mmd_gaussian(z_v, keys[2]) + _mmd_gaussian(z_y, keys[3]))

        def factor(name, z):
            x = nn.relu(nn.Dense(f_dim, name=f"{name}_fc1")(z))
            x = nn.Dropout(self.dropout, deterministic=not train, name=f"{name}_dropout")(x)
            return nn.relu(nn.Dense(f_dim, name=f"{name}_fc2")(x))

        f_y = factor("zy_to_fy", z_y)
        f_l = factor("zl_to_fl", z_l)
        f_a = factor("za_to_fa", z_a)
        f_v = factor("zv_to_fv", z_v)

        x_l_hat = DecoderLSTM(f_dim * 2, batch["texts"].shape[-1], T, name="decoder_l")(
            jnp.concatenate([f_y, f_l], axis=1))
        x_a_hat = DecoderLSTM(f_dim * 2, batch["audios"].shape[-1], T, name="decoder_a")(
            jnp.concatenate([f_y, f_a], axis=1))
        x_v_hat = DecoderLSTM(f_dim * 2, batch["videos"].shape[-1], T, name="decoder_v")(
            jnp.concatenate([f_y, f_v], axis=1))

        x = nn.relu(nn.Dense(f_dim, name="fy_to_y_fc1")(f_y))
        x = nn.Dropout(self.dropout, deterministic=not train, name="fy_to_y_dropout")(x)
        features = nn.Dense(out_dim, name="fy_to_y_fc2")(x)

        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)

        gen = (self.lda_xl * jnp.mean((x_l_hat - batch["texts"]) ** 2)
               + self.lda_xa * jnp.mean((x_a_hat - batch["audios"]) ** 2)
               + self.lda_xv * jnp.mean((x_v_hat - batch["videos"]) ** 2))
        interloss = self.lda_mmd * mmd + gen
        return features, emos_out, vals_out, interloss
