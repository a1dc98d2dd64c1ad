"""ResNet-family visual encoders: ResNet-50 / SENet-50 / MANet, in Flax.

Backs the reference's FER-embedding extractors
(``MERBench/feature_extraction/visual/extract_{ferplus,msceleb,imagenet,
manet,emonet}_embedding.py``): frozen torch CNNs applied per face frame with
the penultimate (global-average-pool) activation saved as the feature. Those
scripts load MatConvNet-converted "dag" ResNet50/SENet50 checkpoints
(``extract_ferplus_embedding.py:50-61``) or the vendored MANet
(``extract_manet_embedding.py:55-61``, architecture at
``manet/model/manet.py:165-268``).

TPU-first design notes:
- Inference-only encoders -> BatchNorm is a frozen affine (running stats are
  converted into (scale, bias, mean, var) parameters), so the whole network
  is a pure function XLA can fuse; no batch statistics.
- NHWC layout throughout (TPU-native conv layout), converters transpose from
  torch NCHW/OIHW.
- Whole frame *batches* (all sampled frames of many clips) go through one
  jitted forward; the reference runs per-video DataLoader loops.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


class FrozenBN(nn.Module):
    """Eval-mode BatchNorm: y = (x - mean) / sqrt(var + eps) * scale + bias."""
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


def conv(ch, k, stride=1, name=None, padding=None):
    if padding is None:
        padding = [(k // 2, k // 2)] * 2
    return nn.Conv(ch, (k, k), strides=(stride, stride), padding=padding,
                   use_bias=False, name=name, precision=_PRECISION)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_se: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.relu(FrozenBN(name="bn1")(conv(self.planes, 3, self.stride,
                                                "conv1")(x)))
        out = FrozenBN(name="bn2")(conv(self.planes, 3, 1, "conv2")(out))
        if self.use_se:
            out = _se(out, self.planes)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = FrozenBN(name="down_bn")(
                conv(self.planes, 1, self.stride, "down_conv")(x))
        return nn.relu(out + identity)


def _se(x, planes, reduction=16, name="se"):
    s = jnp.mean(x, axis=(1, 2))
    s = nn.relu(nn.Dense(planes // reduction, name=f"{name}_fc1",
                         precision=_PRECISION)(s))
    s = jax.nn.sigmoid(nn.Dense(planes, name=f"{name}_fc2",
                                precision=_PRECISION)(s))
    return x * s[:, None, None, :]


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    use_se: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        identity = x
        out = nn.relu(FrozenBN(name="bn1")(conv(self.planes, 1, 1, "conv1")(x)))
        out = nn.relu(FrozenBN(name="bn2")(conv(self.planes, 3, self.stride,
                                                "conv2")(out)))
        out = FrozenBN(name="bn3")(conv(out_ch, 1, 1, "conv3")(out))
        if self.use_se:
            out = _se(out, out_ch)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = FrozenBN(name="down_bn")(
                conv(out_ch, 1, self.stride, "down_conv")(x))
        return nn.relu(out + identity)


@dataclass(frozen=True)
class ResNetConfig:
    layers: tuple = (3, 4, 6, 3)       # ResNet-50
    block: str = "bottleneck"          # bottleneck | basic
    use_se: bool = False               # SENet-50
    width: int = 64
    embedding_dim: int = 2048


def resnet50_config(**kw):
    return ResNetConfig(**kw)


def senet50_config(**kw):
    return ResNetConfig(use_se=True, **kw)


def resnet18_config(**kw):
    return ResNetConfig(layers=(2, 2, 2, 2), block="basic",
                        embedding_dim=512, **kw)


class ResNet(nn.Module):
    """(B, H, W, 3) -> (B, embedding_dim) global-average-pool embedding."""
    cfg: ResNetConfig

    @nn.compact
    def __call__(self, x, return_spatial=False):
        c = self.cfg
        Block = Bottleneck if c.block == "bottleneck" else BasicBlock
        x = nn.relu(FrozenBN(name="bn1")(
            nn.Conv(c.width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1", precision=_PRECISION)(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, n_blocks in enumerate(c.layers):
            planes = c.width * (2 ** stage)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = Block(planes, stride, c.use_se,
                          name=f"layer{stage + 1}_{b}")(x)
        if return_spatial:
            return x
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# MANet (RAF-DB FER embedding; manet/model/manet.py:165-268)
# ---------------------------------------------------------------------------


class MulScaleBlock(nn.Module):
    """Two parallel 4-way hierarchical split-conv paths summed
    (manet.py:47-127)."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        sw = self.planes // 4
        identity = x
        out = nn.relu(FrozenBN(name="bn1")(conv(self.planes, 3, self.stride,
                                                "conv1")(x)))
        sp = jnp.split(out, 4, axis=-1)

        def chain(prefix):
            outs, prev = [], None
            for i in range(4):
                inp = sp[i] if prev is None else prev + sp[i]
                o = FrozenBN(name=f"{prefix}bn{i}")(
                    conv(sw, 3, 1, f"{prefix}conv{i}")(inp))
                outs.append(o)
                prev = nn.relu(o)
            return jnp.concatenate(outs, axis=-1)

        out = chain("a_") + chain("b_")
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = FrozenBN(name="down_bn")(
                conv(self.planes, 1, self.stride, "down_conv")(x))
        return nn.relu(out + identity)


class CBAM(nn.Module):
    """Channel gate (avg+max pooled MLP) then spatial gate (7x7 conv over
    [max,mean] channel pool) — attention.py:28-89."""
    planes: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        mlp1 = nn.Dense(self.planes // self.reduction, name="gate_fc1",
                        precision=_PRECISION)
        mlp2 = nn.Dense(self.planes, name="gate_fc2", precision=_PRECISION)
        att = (mlp2(nn.relu(mlp1(jnp.mean(x, axis=(1, 2))))) +
               mlp2(nn.relu(mlp1(jnp.max(x, axis=(1, 2))))))
        x = x * jax.nn.sigmoid(att)[:, None, None, :]
        pool = jnp.concatenate([jnp.max(x, -1, keepdims=True),
                                jnp.mean(x, -1, keepdims=True)], -1)
        sp = FrozenBN(eps=1e-5, name="spatial_bn")(
            nn.Conv(1, (7, 7), padding=[(3, 3), (3, 3)], use_bias=False,
                    name="spatial_conv", precision=_PRECISION)(pool))
        return x * jax.nn.sigmoid(sp)


class AttentionBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.relu(FrozenBN(name="bn1")(conv(self.planes, 3, self.stride,
                                                "conv1")(x)))
        out = FrozenBN(name="bn2")(conv(self.planes, 3, 1, "conv2")(out))
        out = CBAM(self.planes, name="cbam")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = FrozenBN(name="down_bn")(
                conv(self.planes, 1, self.stride, "down_conv")(x))
        return nn.relu(out + identity)


class MANet(nn.Module):
    """224x224 face -> 1024-d embedding (two 512-d branch embeddings
    concatenated, ``manet.py:268-276`` with return_embedding=True).

    Branch 1 splits the 28x28 stage-2 map into four 14x14 patches, runs a
    CBAM-attention ResNet column per patch, and re-tiles; branch 2 is a
    multi-scale column over the full map.
    """
    layers: tuple = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x):
        x = nn.relu(FrozenBN(name="bn1")(
            nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1", precision=_PRECISION)(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for b in range(self.layers[0]):
            x = BasicBlock(64, 1, name=f"layer1_{b}")(x)
        for b in range(self.layers[1]):
            x = BasicBlock(128, 2 if b == 0 else 1, name=f"layer2_{b}")(x)

        H = x.shape[1] // 2
        patches = [x[:, :H, :H], x[:, :H, H:], x[:, H:, :H], x[:, H:, H:]]
        outs = []
        for p_i, p in enumerate(patches):
            for b in range(self.layers[2]):
                p = AttentionBlock(256, 2 if b == 0 else 1,
                                   name=f"layer3_1_p{p_i + 1}_{b}")(p)
            for b in range(self.layers[3]):
                p = AttentionBlock(512, 1, name=f"layer4_1_p{p_i + 1}_{b}")(p)
            outs.append(p)
        top = jnp.concatenate([outs[0], outs[1]], axis=2)
        bot = jnp.concatenate([outs[2], outs[3]], axis=2)
        branch1 = jnp.mean(jnp.concatenate([top, bot], axis=1), axis=(1, 2))

        y = x
        for b in range(self.layers[2]):
            y = MulScaleBlock(256, 2 if b == 0 else 1, name=f"layer3_2_{b}")(y)
        for b in range(self.layers[3]):
            y = MulScaleBlock(512, 2 if b == 0 else 1, name=f"layer4_2_{b}")(y)
        branch2 = jnp.mean(y, axis=(1, 2))

        return jnp.concatenate([branch1, branch2], axis=-1)


# ---------------------------------------------------------------------------
# torch-state-dict converters
# ---------------------------------------------------------------------------


def _t(x):
    return np.asarray(x.detach().cpu().numpy())


def _cw(w):  # OIHW -> HWIO
    return _t(w).transpose(2, 3, 1, 0)


def _bn(sd, pre):
    return {"scale": _t(sd[f"{pre}.weight"]), "bias": _t(sd[f"{pre}.bias"]),
            "mean": _t(sd[f"{pre}.running_mean"]),
            "var": _t(sd[f"{pre}.running_var"])}


def convert_torch_resnet(cfg: ResNetConfig, sd: dict) -> dict:
    """torchvision-style naming: conv1/bn1, layer{s}.{b}.conv{i}/bn{i},
    layer{s}.{b}.downsample.{0,1}; optional SE 'se_module' Linears."""
    params = {"conv1": {"kernel": _cw(sd["conv1.weight"])},
              "bn1": _bn(sd, "bn1")}
    n_convs = 3 if cfg.block == "bottleneck" else 2
    for stage, n_blocks in enumerate(cfg.layers):
        for b in range(n_blocks):
            pre = f"layer{stage + 1}.{b}"
            blk = {}
            for i in range(1, n_convs + 1):
                blk[f"conv{i}"] = {"kernel": _cw(sd[f"{pre}.conv{i}.weight"])}
                blk[f"bn{i}"] = _bn(sd, f"{pre}.bn{i}")
            if f"{pre}.downsample.0.weight" in sd:
                blk["down_conv"] = {"kernel": _cw(sd[f"{pre}.downsample.0.weight"])}
                blk["down_bn"] = _bn(sd, f"{pre}.downsample.1")
            if cfg.use_se and f"{pre}.se_module.fc1.weight" in sd:
                blk["se_fc1"] = {"kernel": _t(sd[f"{pre}.se_module.fc1.weight"]).T,
                                 "bias": _t(sd[f"{pre}.se_module.fc1.bias"])}
                blk["se_fc2"] = {"kernel": _t(sd[f"{pre}.se_module.fc2.weight"]).T,
                                 "bias": _t(sd[f"{pre}.se_module.fc2.bias"])}
            params[f"layer{stage + 1}_{b}"] = blk
    return params


def _basic_block(sd, pre):
    blk = {"conv1": {"kernel": _cw(sd[f"{pre}.conv1.weight"])},
           "bn1": _bn(sd, f"{pre}.bn1"),
           "conv2": {"kernel": _cw(sd[f"{pre}.conv2.weight"])},
           "bn2": _bn(sd, f"{pre}.bn2")}
    if f"{pre}.downsample.0.weight" in sd:
        blk["down_conv"] = {"kernel": _cw(sd[f"{pre}.downsample.0.weight"])}
        blk["down_bn"] = _bn(sd, f"{pre}.downsample.1")
    return blk


def _mulscale_block(sd, pre):
    blk = {"conv1": {"kernel": _cw(sd[f"{pre}.conv1.weight"])},
           "bn1": _bn(sd, f"{pre}.bn1")}
    for j, (tpre, tmine) in enumerate([("1_2", "a_"), ("2_2", "b_")]):
        for i in range(4):
            blk[f"{tmine}conv{i}"] = {
                "kernel": _cw(sd[f"{pre}.conv{tpre}_{i + 1}.weight"])}
            blk[f"{tmine}bn{i}"] = _bn(sd, f"{pre}.bn{tpre}_{i + 1}")
    if f"{pre}.downsample.0.weight" in sd:
        blk["down_conv"] = {"kernel": _cw(sd[f"{pre}.downsample.0.weight"])}
        blk["down_bn"] = _bn(sd, f"{pre}.downsample.1")
    return blk


def _attention_block(sd, pre):
    blk = _basic_block(sd, pre)
    cb = f"{pre}.cbam"
    blk["cbam"] = {
        "gate_fc1": {"kernel": _t(sd[f"{cb}.ChannelGate.mlp.1.weight"]).T,
                     "bias": _t(sd[f"{cb}.ChannelGate.mlp.1.bias"])},
        "gate_fc2": {"kernel": _t(sd[f"{cb}.ChannelGate.mlp.3.weight"]).T,
                     "bias": _t(sd[f"{cb}.ChannelGate.mlp.3.bias"])},
        "spatial_conv": {"kernel": _cw(sd[f"{cb}.SpatialGate.spatial.conv.weight"])},
        "spatial_bn": _bn(sd, f"{cb}.SpatialGate.spatial.bn"),
    }
    return blk


def convert_torch_manet(sd: dict, layers=(2, 2, 2, 2)) -> dict:
    """Vendored MANet naming (manet/model/manet.py)."""
    params = {"conv1": {"kernel": _cw(sd["conv1.weight"])},
              "bn1": _bn(sd, "bn1")}
    for b in range(layers[0]):
        params[f"layer1_{b}"] = _basic_block(sd, f"layer1.{b}")
    for b in range(layers[1]):
        params[f"layer2_{b}"] = _basic_block(sd, f"layer2.{b}")
    for p in range(1, 5):
        for b in range(layers[2]):
            params[f"layer3_1_p{p}_{b}"] = _attention_block(
                sd, f"layer3_1_p{p}.{b}")
        for b in range(layers[3]):
            params[f"layer4_1_p{p}_{b}"] = _attention_block(
                sd, f"layer4_1_p{p}.{b}")
    for b in range(layers[2]):
        params[f"layer3_2_{b}"] = _mulscale_block(sd, f"layer3_2.{b}")
    for b in range(layers[3]):
        params[f"layer4_2_{b}"] = _mulscale_block(sd, f"layer4_2.{b}")
    return params
