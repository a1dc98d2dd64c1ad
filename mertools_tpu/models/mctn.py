"""MCTN: Multimodal Cyclic Translation Network.

Reference behavior (``MERBench/toolkit/models/mctn.py``): all modalities are
zero-padded on the feature axis to a common width D = max(dims). A shared
seq2seq (bi-LSTM encoder, attention LSTM decoder) translates text->vision and
then vision_hat->text; a second seq2seq translates the encoder join ->audio.
The classifier runs an LSTM encoder over the first seq2seq's join states.
interloss = loss_weight * (MSE(video_hat, video) + MSE(text_hat, text) +
MSE(audio_hat, audio)).

Deviations from the reference, both documented:
  1. The reference feeds (B, T, D) tensors into non-batch-first torch LSTMs,
     so its recurrence actually runs over the *batch* axis (mctn.py forward).
     Here the recurrence runs over time, which is what the MCTN paper
     specifies.
  2. The reference's teacher-forcing branch is a no-op: both branches feed
     ``trg[t]`` (``top1 = trg[t,:]``, mctn.py Seq2Seq.forward), i.e. teacher
     forcing is always on. We implement that actual behavior (decoder always
     conditions on the ground-truth previous target), which also makes the
     decode a parallel scan.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .modules import LSTMEncoder, SimpleClassifierHeads


class _BiLSTMStep(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, carry, x):
        carry, h = nn.OptimizedLSTMCell(self.hidden, name="cell")(carry, x)
        return carry, h


def _run_lstm(x: jnp.ndarray, hidden: int, name: str, reverse: bool = False):
    """(B, T, D) -> (h_seq (B, T, H), final_h (B, H)) via scan."""
    B = x.shape[0]
    zeros = jnp.zeros((B, hidden), x.dtype)
    scan = nn.scan(_BiLSTMStep, variable_broadcast="params",
                   split_rngs={"params": False}, in_axes=1, out_axes=1,
                   reverse=reverse)
    (c, h), hs = scan(hidden, name=name)((zeros, zeros), x)
    return hs, h


class Seq2SeqEncoder(nn.Module):
    """Bidirectional LSTM; join = dropout(fwd+bwd outputs); s = tanh(fc(h_fwd
    + h_bwd)) (reference Encoder.forward)."""

    hidden: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        hs_f, h_f = _run_lstm(x, self.hidden, "fwd")
        hs_b, h_b = _run_lstm(x, self.hidden, "bwd", reverse=True)
        join = nn.Dropout(self.dropout, deterministic=not train)(hs_f + hs_b)
        s = jnp.tanh(nn.Dense(self.hidden, use_bias=False, name="fc")(h_f + h_b))
        return join, s  # (B, T, H), (B, H)


class _DecoderStep(nn.Module):
    """One decoder step: attention over join, bi-LSTM over a length-1 input,
    prediction from (dec_output, context) (reference Decoder.forward)."""

    hidden: int
    out_dim: int
    dropout: float
    train: bool

    @nn.compact
    def __call__(self, carry, trg_t):
        s, join = carry  # s: (B, H); join: (B, T, H)
        # attention (reference Attention.forward)
        T = join.shape[1]
        s_rep = jnp.repeat(s[:, None, :], T, axis=1)
        energy = jnp.tanh(nn.Dense(self.hidden, use_bias=False, name="attn")(
            jnp.concatenate([s_rep, join], axis=2)))
        a = nn.softmax(nn.Dense(1, use_bias=False, name="v")(energy)[..., 0], axis=1)
        c = jnp.einsum("bt,bth->bh", a, join)  # context

        rnn_in = jnp.concatenate([trg_t, c], axis=1)[:, None, :]  # (B, 1, D+H)
        hs_f, h_f = _run_lstm(rnn_in, self.hidden, "fwd")
        hs_b, h_b = _run_lstm(rnn_in, self.hidden, "bwd", reverse=True)
        dec_out = (hs_f + hs_b)[:, 0]
        new_s = h_f + h_b
        pred = nn.Dense(self.out_dim, name="fc_out")(jnp.concatenate([dec_out, c], axis=1))
        return (new_s, join), pred


class Seq2Seq(nn.Module):
    """Translate src (B, T, D) into trg (B, T, D_out) with always-on teacher
    forcing; step t consumes trg[t-1]; output[0] stays zero like the
    reference."""

    hidden: int
    out_dim: int
    dropout: float

    @nn.compact
    def __call__(self, src, trg, train: bool = False):
        join, s = Seq2SeqEncoder(self.hidden, self.dropout, name="encoder")(src, train)
        # inputs to steps 1..T-1 are trg[0..T-2]
        dec_inputs = trg[:, :-1, :]
        scan = nn.scan(_DecoderStep, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        step = scan(self.hidden, self.out_dim, self.dropout, train, name="decoder")
        _, preds = step((s, join), dec_inputs)  # (B, T-1, D_out)
        zeros = jnp.zeros(preds[:, :1].shape, preds.dtype)
        outputs = jnp.concatenate([zeros, preds], axis=1)  # (B, T, D_out)
        return join, outputs


@registry.register_model("mctn")
class MCTN(FromArgsMixin, nn.Module):
    hidden_dim: int = 128
    dropout: float = 0.1
    teacher_forcing_ratio: float = 0.5  # kept for config parity; see docstring
    loss_weight: float = 0.5
    output_dim1: int = 6
    output_dim2: int = 1
    feat_type: str = "frm_align"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        T = batch["texts"].shape[1]
        assert batch["audios"].shape[1] == T == batch["videos"].shape[1]
        D = max(batch["texts"].shape[-1], batch["audios"].shape[-1],
                batch["videos"].shape[-1])

        def pad(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, D - x.shape[-1])))

        text, audio, vision = pad(batch["texts"]), pad(batch["audios"]), pad(batch["videos"])

        seq2seq1 = Seq2Seq(self.hidden_dim, D, self.dropout, name="seq2seq1")
        seq2seq2 = Seq2Seq(self.hidden_dim, D, self.dropout, name="seq2seq2")

        join, video_1 = seq2seq1(text, vision, train)
        _, text_1 = seq2seq1(video_1, text, train)
        join, audio_1 = seq2seq2(join, audio, train)

        features = LSTMEncoder(self.hidden_dim, self.dropout, name="fc_out_0")(join, train)
        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)

        interloss = self.loss_weight * (
            jnp.mean((video_1 - vision) ** 2)
            + jnp.mean((text_1 - text) ** 2)
            + jnp.mean((audio_1 - audio) ** 2))
        return features, emos_out, vals_out, interloss
