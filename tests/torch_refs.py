"""Minimal torch models with torchvision's exact state_dict naming, used
to test torch->flax weight porting parity (torchvision itself is not
installed in this image; these replicate its ResNet/VGG structure)."""

import torch
import torch.nn as nn


class TorchBasicBlock(nn.Module):
    def __init__(self, in_ch, ch, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, ch, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or in_ch != ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, ch, 1, stride, bias=False),
                nn.BatchNorm2d(ch),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return self.relu(h + idt)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, in_ch, ch, stride=1):
        super().__init__()
        out = ch * 4
        self.conv1 = nn.Conv2d(in_ch, ch, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)
        self.conv3 = nn.Conv2d(ch, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or in_ch != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out, 1, stride, bias=False),
                nn.BatchNorm2d(out),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + idt)


class TorchResNet(nn.Module):
    """torchvision-naming ResNet."""

    def __init__(self, block, stage_sizes, num_classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        exp = getattr(block, "expansion", 1)
        in_ch = 64
        for stage, n in enumerate(stage_sizes):
            ch = 64 * (2**stage)
            blocks = []
            for i in range(n):
                stride = 2 if stage > 0 and i == 0 else 1
                blocks.append(block(in_ch, ch, stride))
                in_ch = ch * exp
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(in_ch, num_classes)

    def forward(self, x):
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in (1, 2, 3, 4):
            h = getattr(self, f"layer{i}")(h)
        h = h.mean(dim=(2, 3))
        return self.fc(h)


def torch_resnet18(num_classes):
    return TorchResNet(TorchBasicBlock, (2, 2, 2, 2), num_classes)


def torch_resnet50(num_classes):
    return TorchResNet(TorchBottleneck, (3, 4, 6, 3), num_classes)


def torch_vgg16(num_classes):
    """torchvision-naming VGG16 (features Sequential with interleaved
    ReLU/MaxPool indices, classifier.{0,3,6})."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for item in cfg:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, item, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_ch = item

    class TorchVGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)
            self.classifier = nn.Sequential(
                nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, num_classes),
            )

        def forward(self, x):
            h = self.features(x)
            h = torch.flatten(h, 1)
            return self.classifier(h)

    return TorchVGG()
