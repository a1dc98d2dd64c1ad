"""Graph_MFN: MFN with a Dynamic Fusion Graph instead of the attention block.

Reference behavior (``MERBench/toolkit/models/graph_mfn.py``): per step, each
modality's (prev_h, new_h) pair passes a ReLU transform to a singleton node;
the DFG builds every 2-subset and the 3-subset node, scaling each incoming
vertex by a learned per-sample efficacy (19 efficacies for 3 modalities,
inner node width 100); the top node t_output drives the MFN-style memory
gates. Final features as in MFN.

The reference's powerset loops are static for 3 modalities, so the graph is
expressed here explicitly; the recurrence is one ``nn.scan``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import registry
from .base import FromArgsMixin
from .modules import SimpleClassifierHeads

_INNER = 100  # hardcoded pattern/efficacy inner width (graph_mfn.py:137-139)


class DynamicFusionGraph3(nn.Module):
    """3-modality DFG. Input: three (B, H) singletons -> (B, H) top node."""

    hidden_dim: int

    @nn.compact
    def __call__(self, s0, s1, s2):
        H = self.hidden_dim
        eff_in = jnp.concatenate([s0, s1, s2], axis=1)
        eff = nn.Dense(_INNER, name="efficacy_1")(eff_in)
        eff = nn.Dense(H, name="efficacy_2")(eff)
        eff = nn.Dense(19, name="efficacy_3")(eff)  # 6 pair + 6 triple + 7 top

        singles = {0: s0, 1: s1, 2: s2}
        outputs = dict(singles)
        # pair nodes: subsets (0,1),(0,2),(1,2); each consumes its 2 singletons
        pairs = [(0, 1), (0, 2), (1, 2)]
        k = 0
        for pair in pairs:
            inp = jnp.concatenate(
                [singles[m] * eff[:, k + j][:, None] for j, m in enumerate(pair)], axis=1)
            k += 2
            x = nn.Dense(_INNER, name=f"net_{pair[0]}{pair[1]}_1")(inp)
            outputs[pair] = nn.Dense(H, name=f"net_{pair[0]}{pair[1]}_2")(x)
        # triple node: consumes the 3 singletons + 3 pair nodes
        members = [0, 1, 2] + pairs
        inp = jnp.concatenate(
            [outputs[m] * eff[:, k + j][:, None] for j, m in enumerate(members)], axis=1)
        k += 6
        x = nn.Dense(_INNER, name="net_012_1")(inp)
        outputs[(0, 1, 2)] = nn.Dense(H, name="net_012_2")(x)
        # top node: everything
        members = [0, 1, 2] + pairs + [(0, 1, 2)]
        inp = jnp.concatenate(
            [outputs[m] * eff[:, k + j][:, None] for j, m in enumerate(members)], axis=1)
        x = nn.Dense(_INNER, name="t_network_1")(inp)
        return nn.Dense(H, name="t_network_2")(x)


class _GraphMFNStep(nn.Module):
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

        s_l = nn.relu(nn.Dense(H, name="l_transform")(jnp.concatenate([h_l, nh_l], axis=1)))
        s_a = nn.relu(nn.Dense(H, name="a_transform")(jnp.concatenate([h_a, nh_a], axis=1)))
        s_v = nn.relu(nn.Dense(H, name="v_transform")(jnp.concatenate([h_v, nh_v], axis=1)))

        attended = DynamicFusionGraph3(H, name="graph")(s_l, s_a, s_v)

        drop = lambda x, name: nn.Dropout(self.dropout, deterministic=not self.train,
                                          name=name)(x)
        chat = nn.Dense(H, name="att2_fc1")(attended)
        chat = jnp.tanh(nn.Dense(self.mem_dim, name="att2_fc2")(drop(nn.relu(chat), "att2_dropout")))
        both = jnp.concatenate([attended, mem], axis=1)
        g1 = nn.Dense(H, name="gamma1_fc1")(both)
        g1 = nn.sigmoid(nn.Dense(self.mem_dim, name="gamma1_fc2")(drop(nn.relu(g1), "gamma1_dropout")))
        g2 = nn.Dense(H, name="gamma2_fc1")(both)
        g2 = nn.sigmoid(nn.Dense(self.mem_dim, name="gamma2_fc2")(drop(nn.relu(g2), "gamma2_dropout")))
        mem = g1 * mem + g2 * chat

        return ((nc_l, nh_l), (nc_a, nh_a), (nc_v, nh_v), mem), None


@registry.register_model("graph_mfn")
class GraphMFN(FromArgsMixin, nn.Module):
    hidden_dim: int = 128
    mem_dim: int = 128
    dropout: float = 0.3
    output_dim1: int = 6
    output_dim2: int = 1
    feat_type: str = "frm_align"

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        H = self.hidden_dim
        B = batch["texts"].shape[0]
        assert batch["audios"].shape[1] == batch["texts"].shape[1] == batch["videos"].shape[1]

        zeros = lambda d: jnp.zeros((B, d), batch["texts"].dtype)
        carry0 = ((zeros(H), zeros(H)), (zeros(H), zeros(H)), (zeros(H), zeros(H)),
                  zeros(self.mem_dim))
        scan = nn.scan(_GraphMFNStep, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        step = scan(H, self.mem_dim, self.dropout, train, name="step")
        carry, _ = step(carry0, (batch["texts"], batch["audios"], batch["videos"]))
        (_, h_l), (_, h_a), (_, h_v), mem = carry

        last_hs = jnp.concatenate([h_l, h_a, h_v, mem], axis=1)
        x = nn.relu(nn.Dense(H, name="out_fc1")(last_hs))
        x = nn.Dropout(self.dropout, deterministic=not train, name="out_dropout")(x)
        features = nn.Dense(H // 2, name="out_fc2")(x)

        emos_out, vals_out = SimpleClassifierHeads(self.output_dim1, self.output_dim2)(features)
        return features, emos_out, vals_out, jnp.float32(0.0)
