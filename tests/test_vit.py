"""Vision tower parity vs HF torch implementations (tiny random models)."""

import importlib.util
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.backbones.video.vision_import import import_vision_state_dict
from merv_tpu.models.backbones.video.vit import VisionTransformer, ViTConfig, tiny_vit_config

torch = pytest.importorskip("torch")


def _np(x):
    return x.detach().numpy()


def test_siglip_parity_hidden_states():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3, num_attention_heads=4,
        image_size=32, patch_size=8,
    )
    torch.manual_seed(0)
    model = SiglipVisionModel(hf_cfg).eval()

    cfg = tiny_vit_config(num_cls_tokens=0, pos_embed_includes_prefix=False, act="gelu_tanh")
    params = import_vision_state_dict(cfg, model.state_dict())
    vit = VisionTransformer(cfg)

    px = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(px), output_hidden_states=True).hidden_states[-2].numpy()
    ours = vit(params, jnp.asarray(px), skip_last_layers=1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_dinov2_registers_parity():
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3, num_attention_heads=4,
        image_size=32, patch_size=8, num_register_tokens=4, layerscale_value=1.0,
    )
    torch.manual_seed(1)
    model = Dinov2WithRegistersModel(hf_cfg).eval()

    cfg = tiny_vit_config(
        num_cls_tokens=1, num_register_tokens=4, pos_embed_includes_prefix=True,
        act="gelu", use_layerscale=True,
    )
    params = import_vision_state_dict(cfg, model.state_dict())
    vit = VisionTransformer(cfg)

    px = np.random.RandomState(1).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(px), output_hidden_states=True).hidden_states[-2].numpy()
    ours = vit(params, jnp.asarray(px), skip_last_layers=1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_vivit_tubelet_parity_last_hidden():
    from transformers import VivitConfig, VivitModel

    hf_cfg = VivitConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3, num_attention_heads=4,
        image_size=32, num_frames=8, tubelet_size=[2, 8, 8],
    )
    torch.manual_seed(2)
    model = VivitModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = tiny_vit_config(
        num_cls_tokens=1, pos_embed_includes_prefix=True, act="gelu_tanh", tubelet_t=2,
    )
    params = import_vision_state_dict(cfg, model.state_dict())
    vit = VisionTransformer(cfg)

    # HF Vivit input: [B, T, C, H, W]; ours: [B, C, T, H, W]
    px = np.random.RandomState(2).randn(2, 8, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(px)).last_hidden_state.numpy()
    ours = vit(params, jnp.asarray(px.transpose(0, 2, 1, 3, 4)), skip_last_layers=0, apply_final_norm=True)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def languagebind_modules():
    """Load the vendored LanguageBind video modeling standalone."""
    ref_dir = Path("/root/reference/merv/models/backbones/video/languagebind/video")
    if not ref_dir.exists():
        pytest.skip("reference languagebind not mounted")

    def load(name, fname, pkg):
        spec = importlib.util.spec_from_file_location(name, ref_dir / fname)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = pkg
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    pkg = "_ref_languagebind_video"
    import types

    pkg_mod = types.ModuleType(pkg)
    pkg_mod.__path__ = [str(ref_dir)]
    sys.modules[pkg] = pkg_mod
    load(f"{pkg}.configuration_video", "configuration_video.py", pkg)
    modeling = load(f"{pkg}.modeling_video", "modeling_video.py", pkg)
    config_mod = sys.modules[f"{pkg}.configuration_video"]
    return modeling, config_mod


def test_languagebind_temporal_attention_parity(languagebind_modules):
    modeling, config_mod = languagebind_modules

    vis_cfg = config_mod.CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3, num_attention_heads=4,
        image_size=32, patch_size=8, num_frames=4, add_time_attn=True,
        force_patch_dropout=0.0, hidden_act="quick_gelu",
    )
    # the vendored module predates transformers' pluggable attention interface
    vis_cfg._attn_implementation = "eager"
    torch.manual_seed(3)
    tower = modeling.CLIPVisionTransformer(vis_cfg).eval()

    cfg = tiny_vit_config(
        num_cls_tokens=1, pos_embed_includes_prefix=True, act="quick_gelu",
        layer_norm_eps=1e-5, pre_norm=True, patch_bias=False,
        temporal_attn=True, temporal_frames=4,
    )
    params = import_vision_state_dict(cfg, tower.state_dict())
    vit = VisionTransformer(cfg)

    B, T = 2, 4
    px = np.random.RandomState(3).randn(B, 3, T, 32, 32).astype(np.float32)
    with torch.no_grad():
        out = tower(pixel_values=torch.tensor(px), output_hidden_states=True, return_dict=True)
        ref = out.hidden_states[-2].numpy()  # [B, T, N, D]

    frames = px.transpose(0, 2, 1, 3, 4).reshape(B * T, 3, 32, 32)
    ours = vit(params, jnp.asarray(frames), skip_last_layers=1, frames=T)
    ours = np.asarray(ours).reshape(B, T, ours.shape[1], ours.shape[2])
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_pos_embed_resample_roundtrip():
    """Grid resampling: importing a larger-grid checkpoint into a smaller config."""
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        image_size=64, patch_size=8,  # 8x8 grid checkpoint
    )
    torch.manual_seed(4)
    model = SiglipVisionModel(hf_cfg).eval()
    cfg = tiny_vit_config(num_cls_tokens=0, pos_embed_includes_prefix=False, act="gelu_tanh", num_layers=2)
    # config is 32px/8 = 4x4 grid; import must resample 8x8 -> 4x4
    params = import_vision_state_dict(cfg, model.state_dict())
    assert params["pos_embed"].shape == (16, 64)
    vit = VisionTransformer(cfg)
    out = vit(params, jnp.zeros((1, 3, 32, 32)), skip_last_layers=1)
    assert out.shape == (1, 16, 64)


# NOTE: the scan-unroll schedule-only + override tests live in
# tests/test_scan_unroll.py — they need no torch and must not hide behind
# this module's importorskip.
