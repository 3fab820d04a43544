"""FULL-SIZE victim porting parity.

torchvision/timm are not installed in this environment, so each test
builds a full-architecture torch replica with the EXACT upstream
state-dict naming and forward semantics (layer layout transcribed from
the torchvision/timm sources the reference loads at ASR_fast.py:16-88,
fid_fast.py:11-20, test.py:38-107), randomizes every weight AND BatchNorm
running statistic, ports the real full-size state_dict through
:mod:`advshadow_tpu.victims.port`, and asserts logits parity at the
deployment resolution (224**2, 299**2 for InceptionV3).

Porting correctness is weight-agnostic: random-init full-architecture
parity is exactly as strong as pretrained parity (same keys, same shapes,
same math), without network access.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

torch.manual_seed(0)


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _randomize_norm_layers(model, seed=0):
    """Perturb BN/LN affine params and BN running stats so ports of the
    statistics are actually exercised (default 0-mean/1-var would hide a
    dropped running_mean)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.empty_like(buf).normal_(0, 0.1, generator=g))
            elif name.endswith("running_var"):
                buf.copy_(torch.empty_like(buf).uniform_(0.5, 1.5, generator=g))
        for name, p in model.named_parameters():
            if p.ndim == 1 and name.endswith("weight"):
                p.copy_(torch.empty_like(p).uniform_(0.75, 1.25, generator=g))
            elif p.ndim == 1 and name.endswith("bias"):
                p.copy_(torch.empty_like(p).normal_(0, 0.05, generator=g))


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _assert_logits_match(got, expected, atol):
    got, expected = np.asarray(got), np.asarray(expected)
    np.testing.assert_allclose(got, expected, atol=atol, rtol=1e-3)
    assert (got.argmax(-1) == expected.argmax(-1)).all()


# ---------------------------------------------------------------------------
# torchvision ResNet (torchvision/models/resnet.py layout)
# ---------------------------------------------------------------------------

class TvBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(h + identity)


class TvResNet(tnn.Module):
    def __init__(self, layers=(3, 4, 6, 3), num_classes=37):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)
        self.fc = tnn.Linear(512 * 4, num_classes)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        layers = [TvBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TvBottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.max_pool2d(h, 3, 2, 1)
        h = self.layer4(self.layer3(self.layer2(self.layer1(h))))
        h = h.mean(dim=(2, 3))
        return self.fc(h)


class TestResNet50FullScale:
    def test_resnet50_224(self):
        from advshadow_tpu.victims import resnet50
        from advshadow_tpu.victims.port import port_resnet

        tm = TvResNet((3, 4, 6, 3), num_classes=37).eval()
        _randomize_norm_layers(tm)
        sd = _sd(tm)
        assert len(sd) > 300  # real full-size state_dict
        variables = port_resnet(sd, stage_sizes=(3, 4, 6, 3))
        fm = resnet50(num_classes=37)
        x = np.random.default_rng(0).random((2, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(_nchw(x)).numpy()
        got = fm.apply(variables, jnp.asarray(x))
        _assert_logits_match(got, expected, atol=5e-3)


# ---------------------------------------------------------------------------
# torchvision VGG (features Sequential indices + classifier.{0,3,6})
# ---------------------------------------------------------------------------

_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")


class TvVGG(tnn.Module):
    def __init__(self, cfg=_VGG16_CFG, num_classes=37):
        super().__init__()
        layers, in_ch = [], 3
        for item in cfg:
            if item == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(in_ch, item, 3, padding=1),
                           tnn.ReLU(inplace=True)]
                in_ch = item
        self.features = tnn.Sequential(*layers)
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(True), tnn.Dropout(),
            tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout(),
            tnn.Linear(4096, num_classes),
        )

    def forward(self, x):
        h = self.features(x)
        return self.classifier(torch.flatten(h, 1))


class TestVGG16FullScale:
    def test_vgg16_224(self):
        from advshadow_tpu.victims import vgg16
        from advshadow_tpu.victims.port import port_vgg

        tm = TvVGG(num_classes=37).eval()
        variables = port_vgg(_sd(tm))
        fm = vgg16(num_classes=37)
        x = np.random.default_rng(1).random((1, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(_nchw(x)).numpy()
        got = fm.apply(variables, jnp.asarray(x))
        _assert_logits_match(got, expected, atol=5e-3)


# ---------------------------------------------------------------------------
# torchvision InceptionV3 (full, 299**2; the FID feature extractor)
# ---------------------------------------------------------------------------

class TvBasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


class TvInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TvBasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = TvBasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = TvBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TvBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TvBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TvBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TvBasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class TvInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TvBasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TvBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TvBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TvBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


class TvInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TvBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = TvBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = TvBasicConv2d(c7, c7, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7_3 = TvBasicConv2d(c7, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7dbl_1 = TvBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TvBasicConv2d(c7, c7, kernel_size=(7, 1),
                                            padding=(3, 0))
        self.branch7x7dbl_3 = TvBasicConv2d(c7, c7, kernel_size=(1, 7),
                                            padding=(0, 3))
        self.branch7x7dbl_4 = TvBasicConv2d(c7, c7, kernel_size=(7, 1),
                                            padding=(3, 0))
        self.branch7x7dbl_5 = TvBasicConv2d(c7, 192, kernel_size=(1, 7),
                                            padding=(0, 3))
        self.branch_pool = TvBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class TvInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TvBasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = TvBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TvBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TvBasicConv2d(192, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7x3_3 = TvBasicConv2d(192, 192, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7x3_4 = TvBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class TvInceptionE(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = TvBasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = TvBasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = TvBasicConv2d(384, 384, kernel_size=(1, 3),
                                          padding=(0, 1))
        self.branch3x3_2b = TvBasicConv2d(384, 384, kernel_size=(3, 1),
                                          padding=(1, 0))
        self.branch3x3dbl_1 = TvBasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TvBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TvBasicConv2d(384, 384, kernel_size=(1, 3),
                                             padding=(0, 1))
        self.branch3x3dbl_3b = TvBasicConv2d(384, 384, kernel_size=(3, 1),
                                             padding=(1, 0))
        self.branch_pool = TvBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class TvInceptionV3(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.Conv2d_1a_3x3 = TvBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TvBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TvBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TvBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TvBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TvInceptionA(192, 32)
        self.Mixed_5c = TvInceptionA(256, 64)
        self.Mixed_5d = TvInceptionA(288, 64)
        self.Mixed_6a = TvInceptionB(288)
        self.Mixed_6b = TvInceptionC(768, 128)
        self.Mixed_6c = TvInceptionC(768, 160)
        self.Mixed_6d = TvInceptionC(768, 160)
        self.Mixed_6e = TvInceptionC(768, 192)
        self.Mixed_7a = TvInceptionD(768)
        self.Mixed_7b = TvInceptionE(1280)
        self.Mixed_7c = TvInceptionE(2048)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        h = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        h = F.max_pool2d(h, 3, stride=2)
        h = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(h))
        h = F.max_pool2d(h, 3, stride=2)
        h = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(h)))
        h = self.Mixed_6a(h)
        h = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(h))))
        h = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(h)))
        h = h.mean(dim=(2, 3))
        return self.fc(h), h  # logits + 2048-d pool features


class TestInceptionV3FullScale:
    def test_inception_299(self):
        from advshadow_tpu.victims import inception_v3
        from advshadow_tpu.victims.port import port_inception

        tm = TvInceptionV3(num_classes=1000).eval()
        _randomize_norm_layers(tm)
        sd = _sd(tm)
        assert len(sd) > 500
        variables = port_inception(sd)
        fm = inception_v3(num_classes=1000)
        x = np.random.default_rng(2).random((1, 299, 299, 3)).astype(np.float32)
        with torch.no_grad():
            expected, feats = tm(_nchw(x))
        got = fm.apply(variables, jnp.asarray(x))
        _assert_logits_match(got, expected.numpy(), atol=5e-3)
        # the FID feature path too (fid_fast.py uses fc=Identity)
        got_feats = fm.apply(variables, jnp.asarray(x), return_features=True)
        np.testing.assert_allclose(np.asarray(got_feats), feats.numpy(),
                                   atol=5e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# timm ViT-B/16 (full 768/12/12 @ 224**2)
# ---------------------------------------------------------------------------

def _make_timm_vit(hidden, depth, heads, patch, size, num_classes):
    class TimmAttention(tnn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = tnn.Linear(hidden, hidden * 3)
            self.proj = tnn.Linear(hidden, hidden)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, heads, C // heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            attn = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
            attn = attn.softmax(dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(out)

    class TimmBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(hidden, eps=1e-6)
            self.attn = TimmAttention()
            self.norm2 = tnn.LayerNorm(hidden, eps=1e-6)
            self.mlp = tnn.Module()
            self.mlp.fc1 = tnn.Linear(hidden, hidden * 4)
            self.mlp.fc2 = tnn.Linear(hidden * 4, hidden)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))

    class TimmViT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = tnn.Module()
            self.patch_embed.proj = tnn.Conv2d(3, hidden, patch, patch)
            self.cls_token = tnn.Parameter(torch.randn(1, 1, hidden) * 0.02)
            n_tokens = (size // patch) ** 2 + 1
            self.pos_embed = tnn.Parameter(torch.randn(1, n_tokens, hidden) * 0.02)
            self.blocks = tnn.ModuleList([TimmBlock() for _ in range(depth)])
            self.norm = tnn.LayerNorm(hidden, eps=1e-6)
            self.head = tnn.Linear(hidden, num_classes)

        def forward(self, x):
            B = x.shape[0]
            h = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            h = torch.cat([self.cls_token.expand(B, -1, -1), h], dim=1)
            h = h + self.pos_embed
            for blk in self.blocks:
                h = blk(h)
            return self.head(self.norm(h)[:, 0])

    return TimmViT()


class TestViTB16FullScale:
    def test_vit_b16_224(self):
        from advshadow_tpu.victims import vit_b16
        from advshadow_tpu.victims.port import port_vit

        tm = _make_timm_vit(768, 12, 12, 16, 224, 37).eval()
        sd = _sd(tm)
        assert len(sd) > 150
        variables = port_vit(sd)
        fm = vit_b16(num_classes=37, image_size=224)
        x = np.random.default_rng(3).random((2, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(_nchw(x)).numpy()
        got = fm.apply(variables, jnp.asarray(x))
        _assert_logits_match(got, expected, atol=2e-3)

    def test_vit_s16_224(self):
        """DINOv2-small geometry (384/12/6)."""
        from advshadow_tpu.victims import vit_s16
        from advshadow_tpu.victims.port import port_vit

        tm = _make_timm_vit(384, 12, 6, 16, 224, 37).eval()
        variables = port_vit(_sd(tm))
        fm = vit_s16(num_classes=37, image_size=224)
        x = np.random.default_rng(4).random((2, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(_nchw(x)).numpy()
        got = fm.apply(variables, jnp.asarray(x))
        _assert_logits_match(got, expected, atol=2e-3)


# ---------------------------------------------------------------------------
# timm ConvNeXt-Tiny (full (3,3,9,3)x(96..768) @ 224**2)
# ---------------------------------------------------------------------------

def _make_timm_convnext(depths, dims, num_classes):
    class TimmBlock(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.conv_dw = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = tnn.LayerNorm(dim, eps=1e-6)
            self.mlp = tnn.Module()
            self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
            self.mlp.fc2 = tnn.Linear(4 * dim, dim)
            self.gamma = tnn.Parameter(torch.full((dim,), 1e-6))

        def forward(self, x):
            h = self.conv_dw(x).permute(0, 2, 3, 1)
            h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm(h))))
            return x + (self.gamma * h).permute(0, 3, 1, 2)

    class ChanLN(tnn.Module):
        def __init__(self, d):
            super().__init__()
            self.weight = tnn.Parameter(torch.ones(d))
            self.bias = tnn.Parameter(torch.zeros(d))

        def forward(self, x):
            h = x.permute(0, 2, 3, 1)
            h = F.layer_norm(h, (h.shape[-1],), self.weight, self.bias, 1e-6)
            return h.permute(0, 3, 1, 2)

    class TimmConvNeXt(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Sequential()
            self.stem.add_module("0", tnn.Conv2d(3, dims[0], 4, 4))
            self.stem.add_module("1", ChanLN(dims[0]))
            self.stages = tnn.ModuleList()
            for s, (depth, dim) in enumerate(zip(depths, dims)):
                stage = tnn.Module()
                if s > 0:
                    stage.downsample = tnn.Sequential()
                    stage.downsample.add_module("0", ChanLN(dims[s - 1]))
                    stage.downsample.add_module(
                        "1", tnn.Conv2d(dims[s - 1], dim, 2, 2))
                stage.blocks = tnn.ModuleList(
                    [TimmBlock(dim) for _ in range(depth)])
                self.stages.append(stage)
            self.head = tnn.Module()
            self.head.norm = tnn.LayerNorm(dims[-1], eps=1e-6)
            self.head.fc = tnn.Linear(dims[-1], num_classes)

        def forward(self, x):
            h = self.stem(x)
            for s, stage in enumerate(self.stages):
                if s > 0:
                    h = stage.downsample(h)
                for blk in stage.blocks:
                    h = blk(h)
            return self.head.fc(self.head.norm(h.mean(dim=(2, 3))))

    return TimmConvNeXt()


class TestConvNeXtTinyFullScale:
    def test_convnext_tiny_224(self):
        from advshadow_tpu.victims import convnext_tiny
        from advshadow_tpu.victims.port import port_convnext

        depths, dims = (3, 3, 9, 3), (96, 192, 384, 768)
        tm = _make_timm_convnext(depths, dims, 37).eval()
        _randomize_norm_layers(tm, seed=5)
        sd = _sd(tm)
        assert len(sd) > 150
        variables = port_convnext(sd, depths=depths)
        fm = convnext_tiny(num_classes=37)
        x = np.random.default_rng(5).random((1, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(_nchw(x)).numpy()
        got = fm.apply(variables, jnp.asarray(x))
        _assert_logits_match(got, expected, atol=5e-3)


# ---------------------------------------------------------------------------
# torchvision EfficientNetV2-S (full 40-block config @ 224**2)
# ---------------------------------------------------------------------------

def _tv_cna(cin, cout, k, s, act=True, groups=1):
    layers = [tnn.Conv2d(cin, cout, k, s, k // 2, groups=groups, bias=False),
              tnn.BatchNorm2d(cout, eps=1e-3)]
    if act:
        layers.append(tnn.SiLU(inplace=True))
    return tnn.Sequential(*layers)


class TvSE(tnn.Module):
    def __init__(self, ch, squeeze):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(F.silu(self.fc1(s))))


class TvBlockWrap(tnn.Module):
    """torchvision FusedMBConv/MBConv: inner Sequential named 'block',
    residual when stride 1 and channels match (stochastic depth = id)."""

    def __init__(self, block, residual):
        super().__init__()
        self.block = block
        self.residual = residual

    def forward(self, x):
        h = self.block(x)
        return x + h if self.residual else h


_V2S_STAGES = (  # (kind, expand, kernel, stride, out_ch, layers)
    ("fused", 1, 3, 1, 24, 2),
    ("fused", 4, 3, 2, 48, 4),
    ("fused", 4, 3, 2, 64, 4),
    ("mb", 4, 3, 2, 128, 6),
    ("mb", 6, 3, 1, 160, 9),
    ("mb", 6, 3, 2, 256, 15),
)


class TvEffNetV2S(tnn.Module):
    def __init__(self, num_classes=37):
        super().__init__()
        f = tnn.Sequential()
        f.add_module("0", _tv_cna(3, 24, 3, 2))
        in_ch = 24
        for si, (kind, e, k, s, out_ch, layers) in enumerate(_V2S_STAGES):
            stage = tnn.Sequential()
            for li in range(layers):
                stride = s if li == 0 else 1
                residual = stride == 1 and in_ch == out_ch
                blk = tnn.Sequential()
                if kind == "fused":
                    if e == 1:
                        blk.add_module("0", _tv_cna(in_ch, out_ch, k, stride))
                    else:
                        blk.add_module("0", _tv_cna(in_ch, in_ch * e, k, stride))
                        blk.add_module("1", _tv_cna(in_ch * e, out_ch, 1, 1,
                                                    act=False))
                else:
                    mid = in_ch * e
                    blk.add_module("0", _tv_cna(in_ch, mid, 1, 1))
                    blk.add_module("1", _tv_cna(mid, mid, k, stride,
                                                groups=mid))
                    blk.add_module("2", TvSE(mid, max(1, in_ch // 4)))
                    blk.add_module("3", _tv_cna(mid, out_ch, 1, 1, act=False))
                stage.add_module(str(li), TvBlockWrap(blk, residual))
                in_ch = out_ch
            f.add_module(str(si + 1), stage)
        f.add_module(str(len(_V2S_STAGES) + 1), _tv_cna(in_ch, 1280, 1, 1))
        self.features = f
        self.classifier = tnn.Sequential(tnn.Dropout(),
                                         tnn.Linear(1280, num_classes))

    def forward(self, x):
        h = self.features(x)
        return self.classifier(h.mean((2, 3)))


class TestEfficientNetV2SFullScale:
    def test_efficientnetv2_s_224(self):
        from advshadow_tpu.victims import efficientnetv2_s
        from advshadow_tpu.victims.port import port_efficientnetv2

        tm = TvEffNetV2S(num_classes=37).eval()
        _randomize_norm_layers(tm, seed=6)
        sd = _sd(tm)
        assert len(sd) > 600
        variables = port_efficientnetv2(sd)  # default V2-S stage layout
        fm = efficientnetv2_s(num_classes=37)
        x = np.random.default_rng(6).random((1, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(_nchw(x)).numpy()
        got = fm.apply(variables, jnp.asarray(x))
        _assert_logits_match(got, expected, atol=1e-2)


# ---------------------------------------------------------------------------
# timm Swin-Tiny (full (2,2,6,2)/96 @ 224**2, shifted windows)
# ---------------------------------------------------------------------------

def _t_window_partition(x, w):
    B, H, W, C = x.shape
    x = x.view(B, H // w, w, W // w, w, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _t_window_reverse(wins, w, H, W):
    B = wins.shape[0] // ((H // w) * (W // w))
    x = wins.view(B, H // w, W // w, w, w, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class TimmWindowAttention(tnn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.heads, self.window = heads, window
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(window), torch.arange(window), indexing="ij"))
        coords = coords.flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window - 1
        rel[:, :, 1] += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("relative_position_index", rel.sum(-1))

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = self.qkv(x).reshape(B_, N, 3, self.heads, C // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(B_ // nw, nw, self.heads, N, N) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(out)


def _t_shift_mask(H, W, w, shift):
    img = torch.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    wins = _t_window_partition(img, w).view(-1, w * w)
    diff = wins.unsqueeze(1) - wins.unsqueeze(2)
    return torch.where(diff != 0, torch.tensor(-100.0), torch.tensor(0.0))


class TimmSwinBlock(tnn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn = TimmWindowAttention(dim, heads, window)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)

    def forward(self, x):  # x: [B, H, W, C]
        B, H, W, C = x.shape
        h = self.norm1(x)
        mask = None
        if self.shift > 0:
            h = torch.roll(h, (-self.shift, -self.shift), dims=(1, 2))
            mask = _t_shift_mask(H, W, self.window, self.shift)
        wins = _t_window_partition(h, self.window)
        wins = self.attn(wins, mask)
        h = _t_window_reverse(wins, self.window, H, W)
        if self.shift > 0:
            h = torch.roll(h, (self.shift, self.shift), dims=(1, 2))
        x = x + h
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class TimmPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(4 * dim, eps=1e-5)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):  # [B, H, W, C]
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.reduction(self.norm(x))


class TimmSwin(tnn.Module):
    def __init__(self, embed_dim=96, depths=(2, 2, 6, 2),
                 heads=(3, 6, 12, 24), window=7, num_classes=37, size=224):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, embed_dim, 4, 4)
        self.patch_embed.norm = tnn.LayerNorm(embed_dim, eps=1e-5)
        self.layers = tnn.ModuleList()
        res = size // 4
        for s, depth in enumerate(depths):
            dim = embed_dim * (2 ** s)
            layer = tnn.Module()
            blocks = []
            for b in range(depth):
                w = min(window, res)
                shift = 0 if (b % 2 == 0 or w == res) else window // 2
                blocks.append(TimmSwinBlock(dim, heads[s], w, shift))
            layer.blocks = tnn.ModuleList(blocks)
            if s < len(depths) - 1:
                layer.downsample = TimmPatchMerging(dim)
                res //= 2
            self.layers.append(layer)
        last = embed_dim * (2 ** (len(depths) - 1))
        self.norm = tnn.LayerNorm(last, eps=1e-5)
        self.head = tnn.Module()
        self.head.fc = tnn.Linear(last, num_classes)

    def forward(self, x):  # NCHW in
        h = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        h = self.patch_embed.norm(h)
        for layer in self.layers:
            for blk in layer.blocks:
                h = blk(h)
            if hasattr(layer, "downsample"):
                h = layer.downsample(h)
        h = self.norm(h)
        return self.head.fc(h.mean(dim=(1, 2)))


class TestSwinTinyFullScale:
    def test_swin_tiny_224(self):
        from advshadow_tpu.victims import swin_tiny
        from advshadow_tpu.victims.port import port_swin

        tm = TimmSwin(num_classes=37).eval()
        sd = _sd(tm)
        assert len(sd) > 150
        variables = port_swin(
            {k: v for k, v in sd.items()
             if not k.endswith("relative_position_index")},
            depths=(2, 2, 6, 2))
        fm = swin_tiny(num_classes=37)
        x = np.random.default_rng(7).random((1, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(_nchw(x)).numpy()
        got = fm.apply(variables, jnp.asarray(x))
        _assert_logits_match(got, expected, atol=5e-3)
