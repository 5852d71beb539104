"""Golden parity for the LanguageBind video tower vs the REFERENCE torch code.

The hardest port in the build (SURVEY.md §7 "Hard parts"): CLIP ViT with
per-layer temporal attention, reference
``merv/models/backbones/video/languagebind/video/modeling_video.py:94-186``
(CLIPEncoderLayer.add_time_attn) and the vision-transformer window semantics
(``:632-700``: ``rearrange('(b t) n d -> (b n) t d', t=config.num_frames)``
regardless of runtime frame count — 16 frames with a t=8 checkpoint attend in
two 8-frame windows).

These tests instantiate the *vendored torch module from the mounted reference
itself* (tiny random config — no pretrained weights needed), map its state
dict through :func:`import_vision_state_dict`, and assert the JAX tower
reproduces ``hidden_states[-2]`` to float32 tolerance. Same pattern as
``tests/test_prompters.py`` uses for prompt strings.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.backbones.video.vision_import import import_vision_state_dict
from merv_tpu.models.backbones.video.vit import VisionTransformer, ViTConfig

torch = pytest.importorskip("torch")

REF_VIDEO_DIR = Path("/root/reference/merv/models/backbones/video/languagebind/video")


def _load_vendored_modeling():
    """Load the reference's vendored modeling_video.py as a standalone package.

    Loading through ``merv.__init__`` would drag in the whole torch codebase;
    instead a synthetic package ``_ref_lbv`` hosts the two files so the
    relative ``.configuration_video`` import resolves.
    """
    if not REF_VIDEO_DIR.exists():
        pytest.skip("reference repo not mounted")
    if "_ref_lbv.modeling_video" in sys.modules:
        return sys.modules["_ref_lbv.modeling_video"]
    pkg = types.ModuleType("_ref_lbv")
    pkg.__path__ = [str(REF_VIDEO_DIR)]
    sys.modules["_ref_lbv"] = pkg
    for name in ("configuration_video", "modeling_video"):
        spec = importlib.util.spec_from_file_location(f"_ref_lbv.{name}", REF_VIDEO_DIR / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"_ref_lbv.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["_ref_lbv.modeling_video"]


def _tiny_torch_tower(num_frames: int, seed: int = 0):
    """Tiny vendored CLIPVisionTransformer with temporal attention enabled."""
    modeling = _load_vendored_modeling()
    config_mod = sys.modules["_ref_lbv.configuration_video"]
    cfg = config_mod.CLIPVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        add_time_attn=True,
        num_frames=num_frames,
        force_patch_dropout=0.0,
    )
    # the vendored config predates the attention-interface refactor; the
    # installed transformers dispatches on this attribute (None -> KeyError)
    cfg._attn_implementation = "eager"
    torch.manual_seed(seed)
    tower = modeling.CLIPVisionTransformer(cfg)
    # PreTrainedModel._init_weights never runs for a bare nn.Module, so
    # randomize what torch leaves at zero (class_embedding stays random;
    # temporal_embedding gets its documented normal init, modeling_video.py:107)
    with torch.no_grad():
        for layer in tower.encoder.layers:
            layer.temporal_embedding.normal_(std=cfg.hidden_size**-0.5)
    return tower.eval(), cfg


def _jax_cfg(num_frames: int) -> ViTConfig:
    # mirrors LANGUAGEBIND_VIDEO_LARGE at tiny scale (vit.py:323-328)
    return ViTConfig(
        image_size=32, patch_size=16, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4, num_cls_tokens=1,
        pos_embed_includes_prefix=True, act="quick_gelu", layer_norm_eps=1e-5,
        pre_norm=True, patch_bias=False, temporal_attn=True,
        temporal_frames=num_frames, compute_dtype=jnp.float32,
    )


def _ref_hidden_penultimate(tower, px: np.ndarray) -> np.ndarray:
    """hidden_states[-2] from the vendored tower; [B, T, N, D] (rearranged
    by CLIPVisionTransformer.forward, modeling_video.py:703-705)."""
    with torch.no_grad():
        out = tower(pixel_values=torch.tensor(px), output_hidden_states=True, return_dict=True)
    return out.hidden_states[-2].numpy()


@pytest.mark.parametrize("batch", [1, 2])
def test_languagebind_tower_parity(batch):
    """JAX tower == vendored torch tower at the checkpoint frame count."""
    T = 4
    tower, _ = _tiny_torch_tower(num_frames=T)
    cfg = _jax_cfg(T)
    params = import_vision_state_dict(cfg, tower.state_dict())
    vit = VisionTransformer(cfg)

    px = np.random.RandomState(3).randn(batch, 3, T, 32, 32).astype(np.float32)
    ref = _ref_hidden_penultimate(tower, px)  # [B, T, N, D]

    frames = px.transpose(0, 2, 1, 3, 4).reshape(batch * T, 3, 32, 32)
    ours = vit(params, jnp.asarray(frames), skip_last_layers=1, frames=T)
    ours = np.asarray(ours).reshape(batch, T, *ours.shape[1:])
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_languagebind_window_semantics_16_frames():
    """16-frame input through a t=8-style checkpoint == two independent
    temporal windows (reference rearrange with t=config.num_frames,
    modeling_video.py:135-160) — pins the window-grouping order (b t) -> b,t."""
    t_ckpt, F = 2, 4  # runtime frames = 2x the checkpoint window
    tower, _ = _tiny_torch_tower(num_frames=t_ckpt, seed=1)
    cfg = _jax_cfg(t_ckpt)
    params = import_vision_state_dict(cfg, tower.state_dict())
    vit = VisionTransformer(cfg)

    B = 2
    px = np.random.RandomState(7).randn(B, 3, F, 32, 32).astype(np.float32)
    # vendored tower: [B,C,F,H,W] -> (B*F) frame batch; each layer regroups
    # with t=t_ckpt, i.e. frames [0,1] and [2,3] form separate windows
    ref = _ref_hidden_penultimate(tower, px)  # [B, F, N, D]

    frames = px.transpose(0, 2, 1, 3, 4).reshape(B * F, 3, 32, 32)
    ours = vit(params, jnp.asarray(frames), skip_last_layers=1, frames=t_ckpt)
    ours = np.asarray(ours).reshape(B, F, *ours.shape[1:])
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_langbind_backbone_window_matches_reference_grouping():
    """LangBindVideoBackbone passes window=min(temporal_frames, F): with the
    production config (temporal_frames=8) a 16-frame video must form two
    8-frame windows exactly like the vendored code."""
    from merv_tpu.models.backbones.video.languagebind import LangBindVideoBackbone

    bb = LangBindVideoBackbone("languagebind-video-noclass", "resize-naive", num_frames=16)
    assert bb.vit_config.temporal_frames == 8
    # the __call__ window computation (languagebind.py:75)
    assert min(bb.vit_config.temporal_frames, 16) == 8
