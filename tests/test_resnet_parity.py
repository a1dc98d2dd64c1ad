"""Torch-eval-mode parity for the ResNet family (FrozenBN, padding, SE, CBAM).

Oracles are small torch modules built here with torchvision/vendored-MANet
state-dict naming, so the converters are exercised exactly as they will be
against real checkpoints (``extract_ferplus_embedding.py``,
``extract_manet_embedding.py``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.encoders import resnet as R

ATOL = 1e-4


def _torch_basic_block(torch, nn, cin, planes, stride):
    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            if stride != 1 or cin != planes:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes))
            else:
                self.downsample = None

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idt)
    return Block()


def _randomize_bn(model, torch):
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.normal_(1, 0.2)
            m.bias.data.normal_(0, 0.2)


def test_mini_resnet_basic_parity(rng):
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class Mini(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 8, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(8)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(_torch_basic_block(torch, nn, 8, 8, 1))
            self.layer2 = nn.Sequential(_torch_basic_block(torch, nn, 8, 16, 2))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            x = self.layer2(self.layer1(x))
            return x.mean(dim=(2, 3))

    model = Mini().eval()
    _randomize_bn(model, torch)
    cfg = R.ResNetConfig(layers=(1, 1), block="basic", width=8,
                         embedding_dim=16)
    params = R.convert_torch_resnet(cfg, dict(model.state_dict()))
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(R.ResNet(cfg).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=ATOL)


def test_mini_bottleneck_se_parity(rng):
    import torch
    import torch.nn as nn

    torch.manual_seed(1)

    class SEBottleneck(nn.Module):
        def __init__(self, cin, planes, stride):
            super().__init__()
            out_ch = planes * 4
            self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, out_ch, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(out_ch)
            self.se_module = nn.Module()
            self.se_module.fc1 = nn.Linear(out_ch, out_ch // 16)
            self.se_module.fc2 = nn.Linear(out_ch // 16, out_ch)
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch))

        def forward(self, x):
            idt = self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            s = out.mean(dim=(2, 3))
            s = torch.sigmoid(self.se_module.fc2(torch.relu(self.se_module.fc1(s))))
            out = out * s[:, :, None, None]
            return torch.relu(out + idt)

    class Mini(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 16, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(16)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(SEBottleneck(16, 16, 1))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            return self.layer1(x).mean(dim=(2, 3))

    model = Mini().eval()
    _randomize_bn(model, torch)
    cfg = R.ResNetConfig(layers=(1,), block="bottleneck", use_se=True,
                         width=16, embedding_dim=64)
    params = R.convert_torch_resnet(cfg, dict(model.state_dict()))
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(R.ResNet(cfg).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=ATOL)


def test_cbam_attention_block_parity(rng):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(2)
    planes = 16

    class TorchCBAMBlock(nn.Module):
        """AttentionBlock with vendored naming (manet.py:129-163,
        attention.py:28-89)."""

        def __init__(self, cin):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 3, 2, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, 2, bias=False),
                nn.BatchNorm2d(planes))
            self.cbam = nn.Module()
            self.cbam.ChannelGate = nn.Module()
            self.cbam.ChannelGate.mlp = nn.Sequential(
                nn.Flatten(), nn.Linear(planes, planes // 16 or 1), nn.ReLU(),
                nn.Linear(planes // 16 or 1, planes))
            self.cbam.SpatialGate = nn.Module()
            self.cbam.SpatialGate.spatial = nn.Module()
            self.cbam.SpatialGate.spatial.conv = nn.Conv2d(2, 1, 7, 1, 3,
                                                           bias=False)
            self.cbam.SpatialGate.spatial.bn = nn.BatchNorm2d(1, eps=1e-5)

        def forward(self, x):
            idt = self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            # channel gate
            mlp = self.cbam.ChannelGate.mlp
            att = mlp(F.avg_pool2d(out, out.shape[2:])) + \
                mlp(F.max_pool2d(out, out.shape[2:]))
            out = out * torch.sigmoid(att)[:, :, None, None]
            # spatial gate
            pool = torch.cat([out.max(1, keepdim=True)[0],
                              out.mean(1, keepdim=True)], 1)
            sp = self.cbam.SpatialGate.spatial.bn(
                self.cbam.SpatialGate.spatial.conv(pool))
            out = out * torch.sigmoid(sp)
            return torch.relu(out + idt)

    model = TorchCBAMBlock(8).eval()
    _randomize_bn(model, torch)
    sd = {f"blk.0.{k}": v for k, v in model.state_dict().items()}
    from mertools_tpu.encoders.resnet import _attention_block
    params = _attention_block(sd, "blk.0")
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(R.AttentionBlock(planes, 2).apply(
        {"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref.transpose(0, 2, 3, 1), atol=ATOL)


def test_manet_structure(rng):
    model = R.MANet(layers=(1, 1, 1, 1))
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = np.asarray(model.apply({"params": params}, x))
    assert out.shape == (1, 1024)  # two 512-d branch embeddings
    assert np.isfinite(out).all()
