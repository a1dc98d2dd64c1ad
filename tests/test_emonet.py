"""EmoNet (FAN-hourglass) parity against an in-test torch oracle built with
the vendored module naming (emonet/models/emonet.py structure)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.encoders.emonet import EmoNet, convert_torch_emonet

ATOL = 5e-4  # deep IN-normalized stack: fp32 accumulation differences


def _torch_emonet(torch, nn, F, num_modules=2, n_blocks=2):
    def conv3x3(cin, cout):
        return nn.Conv2d(cin, cout, 3, 1, 1, bias=False)

    class ConvBlock(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv1 = conv3x3(cin, cout // 2)
            self.conv2 = conv3x3(cout // 2, cout // 4)
            self.conv3 = conv3x3(cout // 4, cout // 4)
            if cin != cout:
                self.downsample = nn.Sequential(
                    nn.InstanceNorm2d(cin), nn.ReLU(True),
                    nn.Conv2d(cin, cout, 1, 1, bias=False))
            else:
                self.downsample = None

        def forward(self, x):
            res = x
            o1 = self.conv1(F.relu(F.instance_norm(x), True))
            o2 = self.conv2(F.relu(F.instance_norm(o1), True))
            o3 = self.conv3(F.relu(F.instance_norm(o2), True))
            out = torch.cat((o1, o2, o3), 1)
            if self.downsample is not None:
                res = self.downsample(res)
            return out + res

    class HourGlass(nn.Module):
        def __init__(self, depth=4):
            super().__init__()
            self.depth = depth
            for lv in range(1, depth + 1):
                self.add_module(f"b1_{lv}", ConvBlock(256, 256))
                self.add_module(f"b2_{lv}", ConvBlock(256, 256))
                self.add_module(f"b3_{lv}", ConvBlock(256, 256))
            self.add_module("b2_plus_1", ConvBlock(256, 256))

        def _fwd(self, lv, inp):
            up1 = self._modules[f"b1_{lv}"](inp)
            low1 = F.max_pool2d(inp, 2, stride=2)
            low1 = self._modules[f"b2_{lv}"](low1)
            if lv > 1:
                low2 = self._fwd(lv - 1, low1)
            else:
                low2 = self._modules["b2_plus_1"](low1)
            low3 = self._modules[f"b3_{lv}"](low2)
            up2 = F.interpolate(low3, scale_factor=2, mode="nearest")
            return up1 + up2

        def forward(self, x):
            return self._fwd(self.depth, x)

    class TorchEmoNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.num_modules = num_modules
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
            self.conv2 = ConvBlock(64, 128)
            self.conv3 = ConvBlock(128, 128)
            self.conv4 = ConvBlock(128, 256)
            for i in range(num_modules):
                self.add_module(f"m{i}", HourGlass(4))
                self.add_module(f"top_m_{i}", ConvBlock(256, 256))
                self.add_module(f"conv_last{i}", nn.Conv2d(256, 256, 1))
                self.add_module(f"l{i}", nn.Conv2d(256, 68, 1))
                if i < num_modules - 1:
                    self.add_module(f"bl{i}", nn.Conv2d(256, 256, 1))
                    self.add_module(f"al{i}", nn.Conv2d(68, 256, 1))
            n_in = 256 * (num_modules + 1)
            self.conv1x1_input_emo_2 = nn.Conv2d(n_in, 256, 1)
            mods = []
            for _ in range(n_blocks):
                mods.append(ConvBlock(256, 256))
                mods.append(nn.MaxPool2d(2, 2))
            self.emo_net_2 = nn.Sequential(*mods)
            self.avg_pool_2 = nn.AvgPool2d(4)

        def forward(self, x):
            x = F.relu(F.instance_norm(self.conv1(x)), True)
            x = F.max_pool2d(self.conv2(x), 2, stride=2)
            x = self.conv3(x)
            x = self.conv4(x)
            previous = x
            hg_features = []
            for i in range(self.num_modules):
                hg = self._modules[f"m{i}"](previous)
                ll = self._modules[f"top_m_{i}"](hg)
                ll = F.relu(F.instance_norm(
                    self._modules[f"conv_last{i}"](ll)), True)
                tmp_out = self._modules[f"l{i}"](ll)
                if i < self.num_modules - 1:
                    previous = previous + self._modules[f"bl{i}"](ll) + \
                        self._modules[f"al{i}"](tmp_out)
                hg_features.append(ll)
            cat = torch.cat(tuple(hg_features), dim=1)
            mask = torch.sum(tmp_out, dim=1, keepdim=True)
            cat = cat * mask
            feat = torch.cat((x, cat), dim=1)
            h = self.conv1x1_input_emo_2(feat)
            h = self.emo_net_2(h)
            h = self.avg_pool_2(h)
            return h.view(h.shape[0], -1)

    return TorchEmoNet()


def test_emonet_embedding_parity(rng):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)
    # shrunk geometry: 2 hourglass modules, 2 emo blocks, 64x64 input
    # (same ops/naming; full 256x256 x 4 blocks is just bigger); 128px input
    model = _torch_emonet(torch, nn, F, num_modules=2, n_blocks=2).eval()
    x = rng.normal(size=(2, 128, 128, 3)).astype(np.float32) * 0.2 + 0.5
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    params = convert_torch_emonet(dict(model.state_dict()), n_blocks=2)
    enc = EmoNet(n_blocks=2)
    out = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    # embedding shape follows input geometry; values must match the oracle
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=ATOL)
