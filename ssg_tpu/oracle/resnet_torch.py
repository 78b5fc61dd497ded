"""Torch-CPU ResNet oracle (torchvision-compatible, hand-written).

torchvision is not installed in this environment, so this module defines a
ResNet whose module tree and state_dict keys match torchvision's exactly
(``conv1``, ``bn1``, ``layer{1..4}.{i}.conv{1..3}`` / ``downsample.{0,1}``),
plus the SSG part-pooling head. Two uses (SURVEY.md §4.1, §5):

  * numerical parity oracle for the Flax model + weight converter
    (random weights, eval mode, fp32);
  * loader for real torchvision/reference checkpoints when provided
    (state_dict keys line up), feeding the torch->flax converter for the
    mAP parity runs.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNetBackbone(nn.Module):
    """torchvision-layout ResNet backbone (no fc/avgpool)."""

    def __init__(self, block, layers, last_stride=2):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=last_stride)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                          stride=stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)  # (B, C, h, w)


class TorchSSGResNet(nn.Module):
    """Torch twin of ssg_tpu.models.SSGResNet (same math, NCHW)."""

    def __init__(self, layers=(3, 4, 6, 3), block=TorchBottleneck,
                 num_features=0, num_classes=0, num_parts=3, norm=True,
                 last_stride=2):
        super().__init__()
        self.backbone = TorchResNetBackbone(block, layers, last_stride)
        self.num_features = num_features
        self.num_classes = num_classes
        self.num_parts = num_parts
        self.norm = norm
        out_c = 512 * block.expansion
        feat_dim = num_features if num_features > 0 else out_c
        for part in ("whole", "up", "down")[:num_parts]:
            if num_features > 0:
                setattr(self, f"feat_{part}", nn.Linear(out_c, num_features))
            setattr(self, f"feat_bn_{part}", nn.BatchNorm1d(feat_dim))
            if num_classes > 0:
                setattr(self, f"classifier_{part}", nn.Linear(feat_dim, num_classes))

    def forward(self, x):
        fmap = self.backbone(x)  # (B, C, h, w)
        h = fmap.shape[2]
        pools = [
            fmap.mean(dim=(2, 3)),
            fmap[:, :, : h // 2].mean(dim=(2, 3)),
            fmap[:, :, h // 2 :].mean(dim=(2, 3)),
        ][: self.num_parts]
        embeddings, logits = [], []
        for part, pooled in zip(("whole", "up", "down"), pools):
            y = pooled
            if self.num_features > 0:
                y = getattr(self, f"feat_{part}")(y)
            y = getattr(self, f"feat_bn_{part}")(y)
            emb = F.normalize(y) if (not self.training and self.norm) else y
            if self.num_classes > 0:
                logits.append(getattr(self, f"classifier_{part}")(y))
            embeddings.append(emb)
        out = {"embeddings": torch.stack(embeddings)}
        if logits:
            out["logits"] = torch.stack(logits)
        return out


def torch_resnet50_ssg(**kw) -> TorchSSGResNet:
    return TorchSSGResNet(layers=(3, 4, 6, 3), block=TorchBottleneck, **kw)
