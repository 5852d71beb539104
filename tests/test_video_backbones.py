"""Video backbone wrapper behavior: shapes, variants, transform contracts.

Uses tiny ViT configs (overridden via monkeypatched vit_config) so tests run
fast on CPU while exercising the real variant logic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.backbones.video import (
    DinoV2VideoBackbone,
    LangBindVideoBackbone,
    SiglipVideoBackbone,
    ViVITVideoBackbone,
)
from merv_tpu.models.backbones.video.vit import tiny_vit_config
from merv_tpu.preprocessing.transforms import VideoTransform


def _tiny(backbone, **cfg_overrides):
    """Patch a backbone instance to use a tiny ViT config (keeps variant logic)."""
    tiny = tiny_vit_config(**cfg_overrides)
    type(backbone).vit_config = property(lambda self, _t=tiny: dataclasses.replace(_t))
    return backbone


@pytest.fixture(autouse=True)
def _restore_vit_config():
    saved = {}
    for cls in (DinoV2VideoBackbone, SiglipVideoBackbone, ViVITVideoBackbone, LangBindVideoBackbone):
        saved[cls] = cls.__dict__.get("vit_config")
    yield
    for cls, prop in saved.items():
        if prop is None:
            if "vit_config" in cls.__dict__:
                delattr(cls, "vit_config")
        else:
            setattr(cls, "vit_config", prop)


def test_dinov2_all_tokens_shape(rng):
    bb = DinoV2VideoBackbone("dinov2-video-all-tokens", "resize-naive", default_image_size=32, num_frames=4)
    _tiny(bb, num_cls_tokens=1, num_register_tokens=4, use_layerscale=True)
    params = bb.init(rng)
    video = jnp.zeros((2, 4, 3, 32, 32))
    out = bb(params, video)
    # 32/8 = 4x4 grid = 16 patches per frame
    assert out.shape == (2, 4 * 16, 64)
    assert bb.num_patches == 4 * 16
    assert bb.spatial_resolution == 16
    assert bb.temporal_resolution == 4


def test_dinov2_classemb_at_first(rng):
    bb = DinoV2VideoBackbone("dinov2-video-classemb-at-first", "resize-naive", default_image_size=32, num_frames=4)
    _tiny(bb, num_cls_tokens=1, num_register_tokens=4, use_layerscale=True)
    params = bb.init(rng)
    out = bb(params, jnp.zeros((2, 4, 3, 32, 32)))
    assert out.shape == (2, 1 + 4 * 16, 64)


def test_siglip_all_no_cls(rng):
    bb = SiglipVideoBackbone("siglip-vit-b16-224px-all-no-cls", "resize-naive", default_image_size=32, num_frames=4)
    _tiny(bb, num_cls_tokens=0, pos_embed_includes_prefix=False, act="gelu_tanh")
    params = bb.init(rng)
    out = bb(params, jnp.zeros((2, 4, 3, 32, 32)))
    assert out.shape == (2, 4 * 16, 64)


def test_siglip_pooled_variant_constructs():
    # pooled (MAP-head) variants are supported since round 2 (test_attn_pool.py)
    bb = SiglipVideoBackbone("siglip-vit-b16-224px", "resize-naive")
    assert bb.class_token and bb.spatial_resolution == 1


def test_vivit_16frames_variant(rng):
    bb = ViVITVideoBackbone(
        "vivit-google-b-all-no-cls-16frames", "resize-naive", default_image_size=32, num_frames=8
    )
    _tiny(bb, num_cls_tokens=1, tubelet_t=2, tubelet_frames=8, act="gelu_tanh")
    params = bb.init(rng)
    out = bb(params, jnp.zeros((2, 8, 3, 32, 32)))
    # 8 frames / tubelet 2 = 4 temporal slices x 16 spatial
    assert out.shape == (2, 4 * 16, 64)
    assert bb.num_patches == 64
    assert bb.spatial_resolution == 16


def test_vivit_stride_variant(rng):
    bb = ViVITVideoBackbone("vivit-google-b-all-no-cls", "resize-naive", default_image_size=32, num_frames=8)
    _tiny(bb, num_cls_tokens=1, tubelet_t=2, tubelet_frames=8, act="gelu_tanh")
    params = bb.init(rng)
    out = bb(params, jnp.zeros((1, 8, 3, 32, 32)))
    assert out.shape == (1, 2 * 16, 64)  # temporal ::2 -> 2 slices


def test_languagebind_noclass(rng):
    bb = LangBindVideoBackbone(
        "languagebind-video-noclass", "resize-naive", default_image_size=32, num_frames=4, token="noclass"
    )
    _tiny(bb, num_cls_tokens=1, pre_norm=True, patch_bias=False, temporal_attn=True, temporal_frames=4, act="quick_gelu")
    params = bb.init(rng)
    out = bb(params, jnp.zeros((2, 3, 4, 32, 32)))  # [B, C, F, H, W]
    assert out.shape == (2, 4 * 16, 64)
    assert bb.token == "noclass"


def test_video_transform_shapes():
    tf = VideoTransform(target_size=32, resize_strategy="resize-naive")
    video = np.random.RandomState(0).randint(0, 255, size=(4, 48, 64, 3), dtype=np.uint8)
    out = tf(jnp.asarray(video))
    assert out.shape == (4, 3, 32, 32)

    tf_crop = VideoTransform(target_size=32, resize_strategy="resize-crop", shortest_edge=32)
    out = tf_crop(jnp.asarray(video))
    assert out.shape == (4, 3, 32, 32)

    tf_letter = VideoTransform(target_size=32, resize_strategy="letterbox")
    out = tf_letter(jnp.asarray(video))
    assert out.shape == (4, 3, 32, 32)

    tf_cf = VideoTransform(target_size=32, channels_first_time=True)
    out = tf_cf(jnp.asarray(video))
    assert out.shape == (3, 4, 32, 32)


def test_transform_normalization_values():
    # to_tensor (/255, CHW) + Normalize semantics, same-size path (no resize)
    video = np.random.RandomState(1).randint(0, 255, size=(2, 32, 32, 3), dtype=np.uint8)
    tf = VideoTransform(target_size=32, resize_strategy="resize-naive", mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    ours = np.asarray(tf(jnp.asarray(video)))
    ref = (video.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(ours, ref.transpose(0, 3, 1, 2), rtol=1e-5, atol=1e-5)
