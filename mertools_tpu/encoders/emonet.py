"""EmoNet (AffectNet FAN-hourglass) in Flax.

Reference: vendored ``MERBench/feature_extraction/visual/emonet/models/
emonet.py`` driven by ``extract_emonet_embedding.py`` — a frozen
face-alignment-network backbone (2 hourglass modules over InstanceNorm
ConvBlocks) whose heatmap-gated features feed an emotion head; the saved
feature is the 256-d pre-FC embedding (``return_embedding=True``,
extract loop at ``extract_emonet_embedding.py:20-32``). Input is a 256x256
RGB face in [0, 1] (ToTensor only, no normalization).

All norms are inference-pure: InstanceNorm2d in the reference has
affine=False / no running stats (plain per-sample spatial standardization),
and the head's BatchNorm1d converts to a frozen affine.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_P = jax.lax.Precision.HIGHEST


def instance_norm(x, eps: float = 1e-5):
    """Per-sample per-channel spatial standardization (torch InstanceNorm2d
    with affine=False)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _conv(ch, k, stride=1, pad=None, bias=False, name=None):
    if pad is None:
        pad = k // 2
    return nn.Conv(ch, (k, k), strides=(stride, stride),
                   padding=[(pad, pad)] * 2, use_bias=bias, name=name,
                   precision=_P)


class ConvBlock(nn.Module):
    """IN->relu->conv(out/2) | IN->relu->conv(out/4) | IN->relu->conv(out/4),
    concatenated, + residual (1x1 projection when channels change)."""
    out_planes: int

    @nn.compact
    def __call__(self, x):
        o = self.out_planes
        out1 = _conv(o // 2, 3, name="conv1")(nn.relu(instance_norm(x)))
        out2 = _conv(o // 4, 3, name="conv2")(nn.relu(instance_norm(out1)))
        out3 = _conv(o // 4, 3, name="conv3")(nn.relu(instance_norm(out2)))
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        if x.shape[-1] != o:
            x = _conv(o, 1, name="downsample")(nn.relu(instance_norm(x)))
        return out + x


class HourGlass(nn.Module):
    """Recursive depth-D hourglass over 256-ch ConvBlocks (emonet.py:65-108).
    Submodule names mirror the vendored 'b{1,2,2_plus,3}_{level}' keys."""
    depth: int = 4

    @nn.compact
    def __call__(self, x):
        def level(inp, lv):
            up1 = ConvBlock(256, name=f"b1_{lv}")(inp)
            low1 = nn.max_pool(inp, (2, 2), strides=(2, 2))
            low1 = ConvBlock(256, name=f"b2_{lv}")(low1)
            if lv > 1:
                low2 = level(low1, lv - 1)
            else:
                low2 = ConvBlock(256, name=f"b2_plus_{lv}")(low1)
            low3 = ConvBlock(256, name=f"b3_{lv}")(low2)
            B, H, W, C = low3.shape
            up2 = jax.image.resize(low3, (B, H * 2, W * 2, C),
                                   method="nearest")
            return up1 + up2

        return level(x, self.depth)


class FrozenBN1d(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.param("mean", nn.initializers.zeros, (C,))
        var = self.param("var", nn.initializers.ones, (C,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


class EmoNet(nn.Module):
    """(B, 256, 256, 3) RGB [0,1] -> 256-d embedding (default) or the
    expression/valence/arousal head outputs."""
    num_modules: int = 2
    n_expression: int = 8
    n_reg: int = 2
    n_blocks: int = 4

    @nn.compact
    def __call__(self, x, return_embedding: bool = True):
        x = nn.relu(instance_norm(
            _conv(64, 7, stride=2, pad=3, bias=True, name="conv1")(x)))
        x = ConvBlock(128, name="conv2")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(128, name="conv3")(x)
        x = ConvBlock(256, name="conv4")(x)

        previous = x
        hg_features = []
        tmp_out = None
        for i in range(self.num_modules):
            hg = HourGlass(4, name=f"m{i}")(previous)
            ll = ConvBlock(256, name=f"top_m_{i}")(hg)
            ll = nn.relu(instance_norm(
                _conv(256, 1, pad=0, bias=True, name=f"conv_last{i}")(ll)))
            tmp_out = _conv(68, 1, pad=0, bias=True, name=f"l{i}")(ll)
            if i < self.num_modules - 1:
                ll_b = _conv(256, 1, pad=0, bias=True, name=f"bl{i}")(ll)
                tmp_b = _conv(256, 1, pad=0, bias=True, name=f"al{i}")(tmp_out)
                previous = previous + ll_b + tmp_b
            hg_features.append(ll)

        hg_cat = jnp.concatenate(hg_features, axis=-1)
        mask = jnp.sum(tmp_out, axis=-1, keepdims=True)  # attention (emonet.py:202-205)
        hg_cat = hg_cat * mask
        emo_feat = jnp.concatenate([x, hg_cat], axis=-1)

        h = _conv(256, 1, pad=0, bias=True, name="conv1x1_input_emo_2")(emo_feat)
        for b in range(self.n_blocks):
            h = ConvBlock(256, name=f"emo_{b}")(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.avg_pool(h, (4, 4), strides=(4, 4))
        # torch flattens NCHW (channel-major); match it so converted
        # checkpoints keep feature ordering even when spatial dims remain
        embedding = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
        if return_embedding:
            return embedding
        out = nn.Dense(128, name="fc1", precision=_P)(embedding)
        out = nn.relu(FrozenBN1d(name="fc_bn")(out))
        out = nn.Dense(self.n_expression + self.n_reg, name="fc2",
                       precision=_P)(out)
        return {"expression": out[:, : -2], "valence": out[:, -2],
                "arousal": out[:, -1]}


# ---------------------------------------------------------------------------
# converter (vendored state-dict naming)
# ---------------------------------------------------------------------------


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _cw(w):
    return _t(w).transpose(2, 3, 1, 0)


def _convblock(sd, pre):
    blk = {"conv1": {"kernel": _cw(sd[f"{pre}.conv1.weight"])},
           "conv2": {"kernel": _cw(sd[f"{pre}.conv2.weight"])},
           "conv3": {"kernel": _cw(sd[f"{pre}.conv3.weight"])}}
    if f"{pre}.downsample.2.weight" in sd:
        blk["downsample"] = {"kernel": _cw(sd[f"{pre}.downsample.2.weight"])}
    return blk


def convert_torch_emonet(sd: dict, num_modules: int = 2,
                         n_blocks: int = 4) -> dict:
    """Vendored naming (emonet/models/emonet.py): conv1/bn1, conv2..4,
    m{i}.b*_{lv}, top_m_{i}, conv_last{i}, l{i}, bl{i}, al{i},
    conv1x1_input_emo_2, emo_net_2.{0,2,4,6} ConvBlocks, emo_fc_2.{0,1,3}."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    p: dict = {
        "conv1": {"kernel": _cw(sd["conv1.weight"]),
                  "bias": _t(sd["conv1.bias"])},
        "conv2": _convblock(sd, "conv2"),
        "conv3": _convblock(sd, "conv3"),
        "conv4": _convblock(sd, "conv4"),
        "conv1x1_input_emo_2": {
            "kernel": _cw(sd["conv1x1_input_emo_2.weight"]),
            "bias": _t(sd["conv1x1_input_emo_2.bias"])},
    }
    for i in range(num_modules):
        hg = {}
        for lv in range(1, 5):
            hg[f"b1_{lv}"] = _convblock(sd, f"m{i}.b1_{lv}")
            hg[f"b2_{lv}"] = _convblock(sd, f"m{i}.b2_{lv}")
            hg[f"b3_{lv}"] = _convblock(sd, f"m{i}.b3_{lv}")
        hg["b2_plus_1"] = _convblock(sd, "m%d.b2_plus_1" % i)
        p[f"m{i}"] = hg
        p[f"top_m_{i}"] = _convblock(sd, f"top_m_{i}")
        p[f"conv_last{i}"] = {"kernel": _cw(sd[f"conv_last{i}.weight"]),
                              "bias": _t(sd[f"conv_last{i}.bias"])}
        p[f"l{i}"] = {"kernel": _cw(sd[f"l{i}.weight"]),
                      "bias": _t(sd[f"l{i}.bias"])}
        if i < num_modules - 1:
            p[f"bl{i}"] = {"kernel": _cw(sd[f"bl{i}.weight"]),
                           "bias": _t(sd[f"bl{i}.bias"])}
            p[f"al{i}"] = {"kernel": _cw(sd[f"al{i}.weight"]),
                           "bias": _t(sd[f"al{i}.bias"])}
    for b in range(n_blocks):
        p[f"emo_{b}"] = _convblock(sd, f"emo_net_2.{2 * b}")
    if "emo_fc_2.0.weight" in sd:  # head optional (embedding-only ckpts)
        p["fc1"] = {"kernel": _t(sd["emo_fc_2.0.weight"]).T,
                    "bias": _t(sd["emo_fc_2.0.bias"])}
        p["fc_bn"] = {"scale": _t(sd["emo_fc_2.1.weight"]),
                      "bias": _t(sd["emo_fc_2.1.bias"]),
                      "mean": _t(sd["emo_fc_2.1.running_mean"]),
                      "var": _t(sd["emo_fc_2.1.running_var"])}
        p["fc2"] = {"kernel": _t(sd["emo_fc_2.3.weight"]).T,
                    "bias": _t(sd["emo_fc_2.3.bias"])}
    return p
