"""MFN: Memory Fusion Network (delta-memory attention over 3 LSTMs).

Reference behavior (``MERBench/toolkit/models/mfn.py:9-144``): one LSTM cell
per modality stepped in lockstep over aligned sequences; at each step the
previous+current cell states (cStar, 6H with window 2) pass through a
softmax attention MLP, the attended vector through a tanh MLP to a memory
candidate, and two sigmoid gates blend the running memory; the final hidden
states + memory feed an MLP to hidden_dim//2 features.

TPU-native: the per-timestep Python loop becomes one ``nn.scan`` (lax.scan).
Per-step dropout masks are split per timestep like the reference's repeated
module calls.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .modules import SimpleClassifierHeads


class _MFNStep(nn.Module):
    hidden_dim: int
    mem_dim: int
    dropout: float
    train: bool

    @nn.compact
    def __call__(self, carry, xs):
        (c_l, h_l), (c_a, h_a), (c_v, h_v), mem = carry
        x_l, x_a, x_v = xs
        H = self.hidden_dim

        (nc_l, nh_l), _ = nn.OptimizedLSTMCell(H, name="lstm_l")((c_l, h_l), x_l)
        (nc_a, nh_a), _ = nn.OptimizedLSTMCell(H, name="lstm_a")((c_a, h_a), x_a)
        (nc_v, nh_v), _ = nn.OptimizedLSTMCell(H, name="lstm_v")((c_v, h_v), x_v)

        prev_cs = jnp.concatenate([c_l, c_a, c_v], axis=1)
        new_cs = jnp.concatenate([nc_l, nc_a, nc_v], axis=1)
        c_star = jnp.concatenate([prev_cs, new_cs], axis=1)  # (B, 6H)

        drop = lambda x, name: nn.Dropout(self.dropout, deterministic=not self.train,
                                          name=name)(x)
        att = nn.Dense(H, name="att1_fc1")(c_star)
        att = drop(nn.relu(att), "att1_dropout")
        att = nn.softmax(nn.Dense(c_star.shape[-1], name="att1_fc2")(att), axis=1)
        attended = att * c_star

        chat = nn.Dense(H, name="att2_fc1")(attended)
        chat = drop(nn.relu(chat), "att2_dropout")
        chat = jnp.tanh(nn.Dense(self.mem_dim, name="att2_fc2")(chat))

        both = jnp.concatenate([attended, mem], axis=1)
        g1 = nn.Dense(H, name="gamma1_fc1")(both)
        g1 = nn.sigmoid(nn.Dense(self.mem_dim, name="gamma1_fc2")(drop(nn.relu(g1), "gamma1_dropout")))
        g2 = nn.Dense(H, name="gamma2_fc1")(both)
        g2 = nn.sigmoid(nn.Dense(self.mem_dim, name="gamma2_fc2")(drop(nn.relu(g2), "gamma2_dropout")))
        mem = g1 * mem + g2 * chat

        return ((nc_l, nh_l), (nc_a, nh_a), (nc_v, nh_v), mem), None


class MFNBackbone(nn.Module):
    """Runs the MFN recurrence; returns (last_hs (B, 3H+mem), features)."""

    hidden_dim: int
    mem_dim: int
    dropout: float

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        H = self.hidden_dim
        B = batch["texts"].shape[0]
        assert batch["audios"].shape[1] == batch["texts"].shape[1] == batch["videos"].shape[1], \
            "MFN requires frame-aligned inputs"

        zeros = lambda d: jnp.zeros((B, d), batch["texts"].dtype)
        carry0 = ((zeros(H), zeros(H)), (zeros(H), zeros(H)), (zeros(H), zeros(H)),
                  zeros(self.mem_dim))
        scan = nn.scan(_MFNStep, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        step = scan(self.hidden_dim, self.mem_dim, self.dropout, train, name="step")
        carry, _ = step(carry0, (batch["texts"], batch["audios"], batch["videos"]))
        (_, h_l), (_, h_a), (_, h_v), mem = carry

        last_hs = jnp.concatenate([h_l, h_a, h_v, mem], axis=1)
        x = nn.relu(nn.Dense(H, name="out_fc1")(last_hs))
        x = nn.Dropout(self.dropout, deterministic=not train, name="out_dropout")(x)
        features = nn.Dense(H // 2, name="out_fc2")(x)
        return last_hs, features


@registry.register_model("mfn")
class MFN(FromArgsMixin, nn.Module):
    hidden_dim: int = 128
    mem_dim: int = 128
    dropout: float = 0.3
    window_dim: int = 2
    output_dim1: int = 6
    output_dim2: int = 1
    feat_type: str = "frm_align"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        assert self.window_dim == 2, "reference cStar uses a prev+new window (=2)"
        _, features = MFNBackbone(self.hidden_dim, self.mem_dim, self.dropout,
                                  name="backbone")(batch, train)
        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)
        return features, emos_out, vals_out, jnp.float32(0.0)
