"""End-to-end logit parity: reference-structured torch model -> converter ->
JAX model.  This is the checkpoint-parity gate (SURVEY.md §7 hard part #1):
if this passes, a released ``.pth`` will produce matching logits.

The torch model below restates the reference architecture
(network/deepv3plus.py DeepV3Plus + network/Resnet.py resnet50 + D16 surgery
+ network/memory.py read path) with the reference's state_dict naming, in
eval mode with gumbel off.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import MemoryConfig, ModelConfig
from pinthememory_tpu.models import build_model
from pinthememory_tpu.tools.convert_torch import convert_state_dict, merge_into_variables

NUM_CLASSES = 19


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            r = self.downsample(x)
        return F.relu(out + r)


def _make_stage(inplanes, planes, blocks, stride=1, dilation=1):
    downsample = None
    if stride != 1 or inplanes != planes * 4:
        downsample = nn.Sequential(
            nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4),
        )
    layers = [TBottleneck(inplanes, planes, stride, downsample, dilation)]
    for _ in range(1, blocks):
        layers.append(TBottleneck(planes * 4, planes, dilation=dilation))
    return nn.Sequential(*layers)


class TorchDeepR50V3PlusD(nn.Module):
    """Reference DeepR50V3PlusD (D16) with memory read, eval semantics."""

    def __init__(self, mem_dim=256):
        super().__init__()
        self.layer0 = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(3, stride=2, padding=1),
        )
        self.layer1 = _make_stage(64, 64, 3)
        self.layer2 = _make_stage(256, 128, 4, stride=2)
        self.layer3 = _make_stage(512, 256, 6, stride=2)
        self.layer4 = _make_stage(1024, 512, 3, stride=1, dilation=2)  # D16

        def cbr(cin, cout, k=1, d=1):
            p = d if k == 3 else 0
            return nn.Sequential(
                nn.Conv2d(cin, cout, k, padding=p, dilation=d, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

        class TASPP(nn.Module):
            def __init__(self):
                super().__init__()
                self.features = nn.ModuleList(
                    [cbr(2048, 256, 1)]
                    + [cbr(2048, 256, 3, r) for r in (6, 12, 18)]
                )
                self.img_pooling = nn.AdaptiveAvgPool2d(1)
                self.img_conv = cbr(2048, 256, 1)

            def forward(self, x):
                size = x.shape[2:]
                img = self.img_conv(self.img_pooling(x))
                img = F.interpolate(img, size=size, mode="bilinear", align_corners=True)
                out = img
                for f in self.features:
                    out = torch.cat((out, f(x)), 1)
                return out

        self.aspp = TASPP()
        self.bot_fine = cbr(256, 48, 1)
        self.bot_aspp = cbr(1280, 256, 1)
        self.final1 = nn.Sequential(
            nn.Conv2d(304, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(inplace=True),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(inplace=True))
        self.final2 = nn.Sequential(nn.Conv2d(256, NUM_CLASSES, 1, bias=True))
        self.dsn = nn.Sequential(
            nn.Conv2d(1024, 512, 3, padding=1),
            nn.BatchNorm2d(512), nn.ReLU(inplace=True), nn.Dropout2d(0.1),
            nn.Conv2d(512, NUM_CLASSES, 1, bias=True))

        class TMemory(nn.Module):
            def __init__(self):
                super().__init__()
                self.output = nn.Sequential(
                    nn.Conv2d(mem_dim * 2, mem_dim, 1, bias=False),
                    nn.BatchNorm2d(mem_dim), nn.ReLU(inplace=True))

                class TWrite(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.writefeat = nn.Sequential(
                            nn.Conv2d(mem_dim, mem_dim, 1, bias=False),
                            nn.BatchNorm2d(mem_dim))

                self.writenet = TWrite()
                self.clsfier = nn.Linear(mem_dim, NUM_CLASSES)
                self.m_items = F.normalize(
                    torch.rand((NUM_CLASSES, mem_dim)), dim=1)

            def read(self, query):
                q = F.normalize(query, dim=1).permute(0, 2, 3, 1).contiguous()
                b, h, w, d = q.shape
                score = torch.matmul(q, self.m_items.t()).view(b * h * w, -1)
                sm = F.softmax(score, dim=1)
                retrieved = torch.matmul(sm, self.m_items)
                cat = torch.cat((q.view(b * h * w, d), retrieved), dim=1)
                cat = cat.view(b, h, w, 2 * d).permute(0, 3, 1, 2).contiguous()
                return self.output(cat)

        self.memory = TMemory()

    def forward(self, x):
        size = x.shape[2:]
        x0 = self.layer0(x)
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        y = self.aspp(x4)
        dec0_up = self.bot_aspp(y)
        dec0_up = self.memory.read(dec0_up)
        dec0_fine = self.bot_fine(x1)
        dec0_up = F.interpolate(dec0_up, size=x1.shape[2:], mode="bilinear",
                                align_corners=True)
        dec0 = torch.cat([dec0_fine, dec0_up], 1)
        dec1 = self.final1(dec0)
        dec2 = self.final2(dec1)
        return F.interpolate(dec2, size=size, mode="bilinear", align_corners=True)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchDeepR50V3PlusD()
    # randomize BN running stats so eval-mode normalization is exercised
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


def test_full_model_logit_parity(torch_model):
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params, stats, m_items, report = convert_state_dict(
        sd, memory=torch_model.memory.m_items.numpy()
    )
    real_skips = [s for s in report.skipped if not s.endswith("num_batches_tracked")]
    assert not real_skips, real_skips

    mc = ModelConfig(arch="DeepR50V3PlusD", memory=MemoryConfig(enabled=True))
    model = build_model(mc)
    xin = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = jax.jit(
        lambda k: model.init(
            {"params": k}, xin, jnp.zeros((1, 64, 64), jnp.int32),
            jnp.asarray(m_items), train=False, with_aux=True, memory_writing=True,
            rng=jax.random.PRNGKey(1),
        )
    )(jax.random.PRNGKey(0))
    variables = merge_into_variables(variables, params, stats)

    out = jax.jit(
        lambda v, xx, m: model.apply(v, xx, None, m, train=False, with_aux=False)
    )(variables, xin, jnp.asarray(m_items))
    ours = np.asarray(out["main_out"])

    diff = np.abs(ours - ref).max()
    assert diff < 2e-3, f"logit max diff {diff}"
    # predictions must agree everywhere
    assert (ours.argmax(-1) == ref.argmax(-1)).mean() > 0.999


def test_converter_covers_all_reference_tensors(torch_model):
    sd = {f"module.{k}": v.numpy() for k, v in torch_model.state_dict().items()}
    params, stats, m_items, report = convert_state_dict(sd)
    # everything except num_batches_tracked must map
    expected_skips = {k for k in sd if k.endswith("num_batches_tracked")}
    assert set(report.skipped) == expected_skips
