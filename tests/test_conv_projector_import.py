"""ConvolutionalProjector (Honeybee C-Abstractor) torch-golden parity + import.

The reference builds ``RegStage(depth, in, out, stride=1, dilation=1,
act_layer=nn.SiLU, norm_layer=LayerNorm2d)`` (reference nn_utils.py:265) with
timm defaults ``bottle_ratio=1, group_size=1, se_ratio=0.25,
downsample='conv1x1'``. timm is not installed in this image, so the always-on
golden here is a faithful torch reconstruction of that exact block (state-dict
key layout included: conv1.conv/conv1.bn/se.fc1/se.fc2/conv3/downsample);
``test_conv_projector_vs_real_timm`` upgrades to the true timm module when
timm is importable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.ckpt_import import convert_projector
from merv_tpu.nn.projectors import ConvolutionalProjector

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402


class LayerNorm2d(nn.LayerNorm):
    """timm LayerNorm2d: LayerNorm over C of NCHW."""

    def forward(self, x):
        return super().forward(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


class ConvNormAct(nn.Module):
    def __init__(self, cin, cout, k, groups=1, apply_act=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=k // 2, groups=groups, bias=False)
        self.bn = LayerNorm2d(cout, eps=1e-5)
        self.act = nn.SiLU() if apply_act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class SEModule(nn.Module):
    def __init__(self, channels, rd_channels):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, rd_channels, 1, bias=True)
        self.act = nn.SiLU()
        self.fc2 = nn.Conv2d(rd_channels, channels, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(self.act(self.fc1(s))))


class Bottleneck(nn.Module):
    """timm regnet.Bottleneck, stride=1, bottle_ratio=1, group_size=1."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = ConvNormAct(cin, cout, 1)
        self.conv2 = ConvNormAct(cout, cout, 3, groups=cout)  # group_size=1 -> depthwise
        self.se = SEModule(cout, rd_channels=max(1, int(round(cin * 0.25))))
        self.conv3 = ConvNormAct(cout, cout, 1, apply_act=False)
        self.downsample = ConvNormAct(cin, cout, 1, apply_act=False) if cin != cout else nn.Identity()
        self.act3 = nn.SiLU()

    def forward(self, x):
        shortcut = x
        x = self.conv3(self.se(self.conv2(self.conv1(x))))
        return self.act3(x + self.downsample(shortcut))


class RegStage(nn.Module):
    def __init__(self, depth, cin, cout):
        super().__init__()
        for i in range(depth):
            self.add_module(f"b{i + 1}", Bottleneck(cin if i == 0 else cout, cout))

    def forward(self, x):
        for m in self.children():
            x = m(x)
        return x


class TorchLinearProjector(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.projector = nn.Linear(d, d)

    def forward(self, x):
        return self.projector(x)


class TorchConvProjector(nn.Module):
    """Reference ConvolutionalProjector layout (nn_utils.py:249-296)."""

    def __init__(self, vision_dim, llm_dim, output_size, block_depth):
        super().__init__()
        self.output_size, self.llm_dim = output_size, llm_dim
        self.convolution_pooling = nn.Sequential(
            RegStage(block_depth, vision_dim, llm_dim),
            nn.AdaptiveAvgPool2d((output_size, output_size)),
            RegStage(block_depth, llm_dim, llm_dim),
        )
        self.projector = TorchLinearProjector(llm_dim)

    def forward(self, x):  # x: [B, F, N, C]
        B, F, N, C = x.shape
        H = int(round(N ** 0.5))
        y = x.reshape(B * F, H, H, C).permute(0, 3, 1, 2)
        y = self.convolution_pooling(y)
        y = y.permute(0, 2, 3, 1).reshape(B, F, self.output_size**2, self.llm_dim)
        y = self.projector(y)
        return y.reshape(B, F * self.output_size**2, -1)


@pytest.mark.parametrize("vision_dim,llm_dim", [(16, 16), (16, 24)])
def test_conv_projector_import_parity(vision_dim, llm_dim):
    torch.manual_seed(0)
    ref = TorchConvProjector(vision_dim, llm_dim, output_size=3, block_depth=2).eval()
    mod = ConvolutionalProjector(vision_dim, llm_dim, output_size=3, block_depth=2,
                                 output_frames=2, mlp_type="linear")
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), convert_projector(mod, ref.state_dict())
    )
    # structural check: imported tree matches init tree exactly
    init = mod.init(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(init)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(init)):
        assert a.shape == b.shape

    x = np.random.RandomState(1).randn(2, 2, 36, vision_dim).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(mod(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv_projector_vs_real_timm():
    """True timm golden — runs only where timm is installed."""
    timm_regnet = pytest.importorskip("timm.models.regnet")
    timm_layers = pytest.importorskip("timm.layers")
    torch.manual_seed(0)
    stage = timm_regnet.RegStage(
        depth=2, in_chs=16, out_chs=24, stride=1, dilation=1,
        act_layer=nn.SiLU, norm_layer=timm_layers.LayerNorm2d,
    ).eval()
    ours = RegStage(2, 16, 24).eval()
    missing, unexpected = ours.load_state_dict(stage.state_dict(), strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    x = torch.randn(2, 16, 6, 6)
    with torch.no_grad():
        np.testing.assert_allclose(ours(x).numpy(), stage(x).numpy(), rtol=1e-5, atol=1e-5)
