"""Attention_TOPN: attention fusion over N (<=18) feature sets.

Reference behavior (``MER2024/toolkit/models/attention_topn.py:8-63``): one
MLP encoder per feature set, concat -> attention MLP -> N weights (no
softmax) -> weighted sum -> heads. The batch carries the feature sets as
``feat0..feat{N-1}`` (the reference packs top-N features into the "audio"
slot as a list; a dict of named keys is the static-shape-friendly layout).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import Args
from ..core.registry import registry
from .modules import MLPEncoder, SimpleClassifierHeads


@registry.register_model("attention_topn")
class AttentionTopN(nn.Module):
    feat_dims: Sequence[int] = ()
    hidden_dim: int = 128
    dropout: float = 0.3
    output_dim1: int = 6
    output_dim2: int = 1

    @classmethod
    def from_args(cls, args: Args):
        return cls(feat_dims=tuple(args.feat_dims or ()),
                   hidden_dim=args.hidden_dim or 128,
                   dropout=args.dropout if args.dropout is not None else 0.3,
                   output_dim1=args.output_dim1 if args.output_dim1 is not None else 6,
                   output_dim2=args.output_dim2 if args.output_dim2 is not None else 1)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        n = len(self.feat_dims)
        assert n >= 1, "attention_topn needs at least one feature set"
        hiddens = [MLPEncoder(self.hidden_dim, self.dropout, name=f"encoder{i}")(
            batch[f"feat{i}"], train) for i in range(n)]

        concat = jnp.concatenate(hiddens, axis=1)
        att = MLPEncoder(self.hidden_dim, self.dropout, name="attention_mlp")(concat, train)
        att = nn.Dense(n, name="fc_att")(att)  # (B, N), unnormalized

        stacked = jnp.stack(hiddens, axis=2)  # (B, H, N)
        features = jnp.einsum("bhn,bn->bh", stacked, att)

        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)
        return features, emos_out, vals_out, jnp.float32(0.0)
