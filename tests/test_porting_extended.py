"""Porting parity for the generic converter, ViT, and Inception-style
modules — logits compared against torch references built with the exact
upstream naming conventions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from advshadow_tpu.victims.port import (  # noqa: E402
    port_generic,
    port_vit,
)


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestGenericPorter:
    def test_inception_style_module(self):
        """BasicConv (conv+BN eps 1e-3) chain + fc, torchvision naming —
        the exact path :func:`port_inception` relies on."""

        class TorchBasicConv(tnn.Module):
            def __init__(self, cin, cout, k, s=1, p=0):
                super().__init__()
                self.conv = tnn.Conv2d(cin, cout, k, s, p, bias=False)
                self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

            def forward(self, x):
                return torch.relu(self.bn(self.conv(x)))

        class TorchMini(tnn.Module):
            def __init__(self):
                super().__init__()
                self.Conv2d_1a_3x3 = TorchBasicConv(3, 8, 3, 2)
                self.Mixed_5b = tnn.Module()
                self.Mixed_5b.branch1x1 = TorchBasicConv(8, 16, 1)
                self.fc = tnn.Linear(16, 5)

            def forward(self, x):
                h = self.Conv2d_1a_3x3(x)
                h = self.Mixed_5b.branch1x1(h)
                h = h.mean(dim=(2, 3))
                return self.fc(h)

        from flax import linen as nn

        from advshadow_tpu.victims.inception import _BasicConv

        class FlaxMini(nn.Module):
            @nn.compact
            def __call__(self, x):
                h = _BasicConv(8, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
                h = _BasicConv(16, (1, 1), name="Mixed_5b.branch1x1")(h)
                h = h.mean(axis=(1, 2))
                return nn.Dense(5, name="fc")(h)

        tm = TorchMini().eval()
        # flax nests Mixed_5b.branch1x1 as one name; rename joins the path
        variables = port_generic(_sd(tm), rename=_join_mixed)
        fm = FlaxMini()
        x = np.random.default_rng(0).random((2, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(fm.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, atol=1e-4)


def _join_mixed(parts):
    """'Mixed_5b.branch1x1.conv' -> ['Mixed_5b.branch1x1', 'conv'] to match
    the flax module name that contains a dot."""
    if parts and parts[0].startswith("Mixed"):
        return [".".join(parts[:2])] + parts[2:]
    return parts


class TestViTPorting:
    def test_vit_logits_match_torch(self):
        """timm-layout ViT (hidden 128 -> 2 heads of 64) vs flax port."""
        hidden, depth, heads, patch, size = 128, 2, 2, 8, 32

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
                h = self.mlp.fc2(tnn.functional.gelu(self.mlp.fc1(self.norm2(x))))
                return x + h

        class TimmViT(tnn.Module):
            def __init__(self):
                super().__init__()
                self.patch_embed = tnn.Module()
                self.patch_embed.proj = tnn.Conv2d(3, hidden, patch, patch)
                self.cls_token = tnn.Parameter(torch.randn(1, 1, hidden) * 0.02)
                n_tokens = (size // patch) ** 2 + 1
                self.pos_embed = tnn.Parameter(
                    torch.randn(1, n_tokens, hidden) * 0.02)
                self.blocks = tnn.ModuleList([TimmBlock() for _ in range(depth)])
                self.norm = tnn.LayerNorm(hidden, eps=1e-6)
                self.head = tnn.Linear(hidden, 7)

            def forward(self, x):
                B = x.shape[0]
                h = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
                cls = self.cls_token.expand(B, -1, -1)
                h = torch.cat([cls, h], dim=1) + self.pos_embed
                for blk in self.blocks:
                    h = blk(h)
                return self.head(self.norm(h)[:, 0])

        tm = TimmViT().eval()
        variables = port_vit(_sd(tm))

        from advshadow_tpu.victims import ViT

        fm = ViT(patch_size=patch, hidden_size=hidden, depth=depth,
                 num_heads=heads, num_classes=7, image_size=size)
        x = np.random.default_rng(1).random((2, size, size, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(fm.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, atol=2e-4)


class TestConvNeXtPorting:
    def test_convnext_logits_match_torch(self):
        """timm-layout mini ConvNeXt (depths (1,1), dims (8,16))."""
        depths, dims = (1, 1), (8, 16)

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
                h = self.norm(h)
                h = self.mlp.fc2(tnn.functional.gelu(self.mlp.fc1(h)))
                return x + (self.gamma * h).permute(0, 3, 1, 2)

        class TimmConvNeXt(tnn.Module):
            def __init__(self):
                super().__init__()
                self.stem = tnn.Sequential()
                self.stem.add_module("0", tnn.Conv2d(3, dims[0], 4, 4))

                class ChanLN(tnn.Module):
                    def __init__(self, d):
                        super().__init__()
                        self.weight = tnn.Parameter(torch.ones(d))
                        self.bias = tnn.Parameter(torch.zeros(d))

                    def forward(self, x):
                        h = x.permute(0, 2, 3, 1)
                        h = tnn.functional.layer_norm(
                            h, (h.shape[-1],), self.weight, self.bias, 1e-6)
                        return h.permute(0, 3, 1, 2)

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
                self.head.fc = tnn.Linear(dims[-1], 4)

            def forward(self, x):
                h = self.stem(x)
                for s, stage in enumerate(self.stages):
                    if s > 0:
                        h = stage.downsample(h)
                    for blk in stage.blocks:
                        h = blk(h)
                h = h.mean(dim=(2, 3))
                return self.head.fc(self.head.norm(h))

        from advshadow_tpu.victims import ConvNeXt
        from advshadow_tpu.victims.port import port_convnext

        tm = TimmConvNeXt().eval()
        variables = port_convnext(_sd(tm), depths=depths)
        fm = ConvNeXt(depths=depths, dims=dims, num_classes=4)
        x = np.random.default_rng(2).random((2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(fm.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, atol=1e-4)


class TestEfficientNetPorting:
    def test_efficientnetv2_logits_match_torch(self):
        """torchvision-layout mini EfficientNetV2: one fused(e1), one
        fused(e4, s2), one MBConv(e4, SE)."""

        def tv_cna(cin, cout, k, s, act=True, groups=1):
            layers = [tnn.Conv2d(cin, cout, k, s, k // 2, groups=groups,
                                 bias=False),
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
                s = torch.sigmoid(self.fc2(tnn.functional.silu(self.fc1(s))))
                return x * s

        class TvNet(tnn.Module):
            def __init__(self):
                super().__init__()
                f = tnn.Sequential()
                f.add_module("0", tv_cna(3, 8, 3, 2))               # stem
                # stage 0: fused e1 (single conv+bn+act), 8->8, s1
                s0 = tnn.Sequential()
                b = tnn.Module()
                b.block = tnn.Sequential()
                b.block.add_module("0", tv_cna(8, 8, 3, 1))
                s0.add_module("0", _Res(b.block, residual=True))
                f.add_module("1", s0)
                # stage 1: fused e4, 8->16, s2
                s1 = tnn.Sequential()
                blk = tnn.Sequential()
                blk.add_module("0", tv_cna(8, 32, 3, 2))
                blk.add_module("1", tv_cna(32, 16, 1, 1, act=False))
                s1.add_module("0", _Res(blk, residual=False))
                f.add_module("2", s1)
                # stage 2: mb e4 + SE, 16->24, s2
                s2 = tnn.Sequential()
                blk = tnn.Sequential()
                blk.add_module("0", tv_cna(16, 64, 1, 1))
                blk.add_module("1", tv_cna(64, 64, 3, 2, groups=64))
                blk.add_module("2", TvSE(64, max(1, 16 // 4)))
                blk.add_module("3", tv_cna(64, 24, 1, 1, act=False))
                s2.add_module("0", _Res(blk, residual=False))
                f.add_module("3", s2)
                f.add_module("4", tv_cna(24, 64, 1, 1))             # head
                self.features = f
                self.classifier = tnn.Sequential(
                    tnn.Dropout(), tnn.Linear(64, 6))

            def forward(self, x):
                h = self.features(x)
                h = h.mean((2, 3))
                return self.classifier(h)

        class _Res(tnn.Module):
            """torchvision block wrapper: names the inner Sequential
            'block' and applies the residual when shapes allow."""

            def __init__(self, block, residual):
                super().__init__()
                self.block = block
                self.residual = residual

            def forward(self, x):
                h = self.block(x)
                return x + h if self.residual else h

        from advshadow_tpu.victims.efficientnet import EfficientNetV2, \
            _StageCfg
        from advshadow_tpu.victims.port import port_efficientnetv2

        stages_flax = (
            _StageCfg("fused", 1, 3, 1, 8, 1),
            _StageCfg("fused", 4, 3, 2, 16, 1),
            _StageCfg("mb", 4, 3, 2, 24, 1),
        )
        tm = TvNet().eval()
        variables = port_efficientnetv2(
            _sd(tm), stages=(("fused", 1, 1), ("fused", 4, 1), ("mb", 4, 1)))
        fm = EfficientNetV2(stages=stages_flax, stem_ch=8, head_ch=64,
                            num_classes=6)
        x = np.random.default_rng(3).random((2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(fm.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, atol=1e-4)


class TestSwinPorting:
    def test_swin_port_mapping_and_forward(self):
        """Structural port test: a synthetic timm-named state dict ports
        into the flax SwinTransformer, the model runs, and spot weights
        land transposed in the right modules."""
        import jax

        from advshadow_tpu.victims import SwinTransformer
        from advshadow_tpu.victims.port import port_swin

        depths, dim, heads, window = (1, 1), 8, (2, 4), 7
        size = 56  # 4x4 patches -> 14x14 -> window 7 fits
        rng = np.random.default_rng(4)

        # build the timm-shaped dict from a flax init (guarantees shapes)
        fm = SwinTransformer(embed_dim=dim, depths=depths, num_heads=heads,
                             window=window, num_classes=3)
        x = jnp.zeros((1, size, size, 3))
        ref = jax.jit(fm.init)(jax.random.PRNGKey(0), x)["params"]

        sd = {}
        sd["patch_embed.proj.weight"] = rng.random((dim, 3, 4, 4)).astype(np.float32)
        sd["patch_embed.proj.bias"] = rng.random(dim).astype(np.float32)
        sd["patch_embed.norm.weight"] = np.ones(dim, np.float32)
        sd["patch_embed.norm.bias"] = np.zeros(dim, np.float32)
        for s, depth in enumerate(depths):
            d = dim * (2**s)
            for b in range(depth):
                t = f"layers.{s}.blocks.{b}"
                sd[f"{t}.norm1.weight"] = np.ones(d, np.float32)
                sd[f"{t}.norm1.bias"] = np.zeros(d, np.float32)
                sd[f"{t}.norm2.weight"] = np.ones(d, np.float32)
                sd[f"{t}.norm2.bias"] = np.zeros(d, np.float32)
                sd[f"{t}.attn.qkv.weight"] = rng.random((3 * d, d)).astype(np.float32)
                sd[f"{t}.attn.qkv.bias"] = rng.random(3 * d).astype(np.float32)
                sd[f"{t}.attn.proj.weight"] = rng.random((d, d)).astype(np.float32)
                sd[f"{t}.attn.proj.bias"] = rng.random(d).astype(np.float32)
                sd[f"{t}.attn.relative_position_bias_table"] = rng.random(
                    ((2 * window - 1) ** 2, heads[s])).astype(np.float32)
                sd[f"{t}.mlp.fc1.weight"] = rng.random((4 * d, d)).astype(np.float32)
                sd[f"{t}.mlp.fc1.bias"] = rng.random(4 * d).astype(np.float32)
                sd[f"{t}.mlp.fc2.weight"] = rng.random((d, 4 * d)).astype(np.float32)
                sd[f"{t}.mlp.fc2.bias"] = rng.random(d).astype(np.float32)
            if s < len(depths) - 1:
                sd[f"layers.{s}.downsample.norm.weight"] = np.ones(4 * d, np.float32)
                sd[f"layers.{s}.downsample.norm.bias"] = np.zeros(4 * d, np.float32)
                sd[f"layers.{s}.downsample.reduction.weight"] = rng.random(
                    (2 * d, 4 * d)).astype(np.float32)
        last = dim * (2 ** (len(depths) - 1))
        sd["norm.weight"] = np.ones(last, np.float32)
        sd["norm.bias"] = np.zeros(last, np.float32)
        sd["head.fc.weight"] = rng.random((3, last)).astype(np.float32)
        sd["head.fc.bias"] = rng.random(3).astype(np.float32)

        variables = port_swin(sd, depths=depths)
        # tree structure matches the flax init
        flat_ref = jax.tree_util.tree_flatten_with_path(ref)[0]
        flat_got = jax.tree_util.tree_flatten_with_path(
            variables["params"])[0]
        assert {jax.tree_util.keystr(k) for k, _ in flat_ref} == \
               {jax.tree_util.keystr(k) for k, _ in flat_got}
        # spot-check transposition
        np.testing.assert_allclose(
            variables["params"]["stage0_block0"]["attn"]["qkv"]["kernel"],
            sd["layers.0.blocks.0.attn.qkv.weight"].T)
        # the ported model runs
        out = fm.apply(variables, jnp.ones((1, size, size, 3)))
        assert out.shape == (1, 3) and np.all(np.isfinite(out))
