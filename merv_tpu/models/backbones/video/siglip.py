"""SigLIP video backbone (per-frame ViT, no cls token).

Behavior parity with reference ``merv/models/backbones/video/siglip.py``:
penultimate-layer patch tokens for the ``all-no-cls`` variants (``:60-63``);
the ``all-tokens`` variants raise NotImplementedError exactly as the
reference does (``:72-77``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax

from merv_tpu.models.backbones.video.base_video import VideoBackbone
from merv_tpu.models.backbones.video.vit import SIGLIP_BASE_224, SIGLIP_SO400M_224, ViTConfig
from merv_tpu.preprocessing.transforms import SIGLIP_MEAN, SIGLIP_STD, VideoTransform

Array = jax.Array
PyTree = Any

SIGLIP_VISION_BACKBONES = {
    "siglip-vit-b16-224px": "vit_base_patch16_siglip_224",
    "siglip-vit-b16-224px-all-tokens": "vit_base_patch16_siglip_224",
    "siglip-vit-b16-224px-all-no-cls": "vit_base_patch16_siglip_224",
    "siglip-vit-b16-224px-classemb-at-first": "vit_base_patch16_siglip_224",
    "siglip-vit-b16-256px": "vit_base_patch16_siglip_256",
    "siglip-vit-b16-256px-all-tokens": "vit_base_patch16_siglip_256",
    "siglip-vit-b16-384px": "vit_base_patch16_siglip_384",
    "siglip-vit-b16-384px-all-tokens": "vit_base_patch16_siglip_384",
    "siglip-vit-so400m": "vit_so400m_patch14_siglip_224",
    "siglip-vit-so400m-all-tokens": "vit_so400m_patch14_siglip_224",
    "siglip-vit-so400m-384px": "vit_so400m_patch14_siglip_384",
    "siglip-vit-so400m-384px-all-tokens": "vit_so400m_patch14_siglip_384",
}


class SiglipVideoBackbone(VideoBackbone):
    def __init__(
        self, video_backbone_id: str, image_resize_strategy: str, default_image_size: int = 224, num_frames: int = 8
    ) -> None:
        super().__init__(video_backbone_id, image_resize_strategy, default_image_size, num_frames)
        assert video_backbone_id in SIGLIP_VISION_BACKBONES, video_backbone_id
        self.timm_path_or_url = SIGLIP_VISION_BACKBONES[video_backbone_id]
        self.class_token = "all-no-cls" not in video_backbone_id
        if "all-tokens" in video_backbone_id:
            # timm SigLIP has no class token; mirrors reference siglip.py:72-77
            raise NotImplementedError("SigLIP all-tokens variant is unsupported (no class token in SigLIP)")
        if "classemb-at-first" in video_backbone_id:
            # upstream-inconsistent: the reference's prefix-token tap returns
            # 196 tokens/frame while its num_patches claims num_frames —
            # the projector consistency assert fires (reference siglip.py:64-70
            # vs :165-169); refusing is safer than silently diverging
            raise NotImplementedError("SigLIP classemb-at-first is inconsistent upstream (no prefix tokens)")
        # pooled variants (class_token=True): timm's default forward = full
        # depth + final norm + MAP attention-pool head, one token per frame
        self.video_transform = VideoTransform(
            target_size=default_image_size,
            resize_strategy=image_resize_strategy,
            shortest_edge=default_image_size,
            interpolation="bicubic",
            mean=SIGLIP_MEAN,
            std=SIGLIP_STD,
        )

    @property
    def vit_config(self) -> ViTConfig:
        base = SIGLIP_SO400M_224 if "so400m" in self.identifier else SIGLIP_BASE_224
        return dataclasses.replace(
            base,
            image_size=self.default_image_size,
            attn_pool=self.class_token,
            attn_pool_heads=base.num_heads,
        )

    def __call__(self, params: PyTree, video_values: Array, is_image: Optional[Array] = None) -> Array:
        """video_values: [B, F, C, H, W] -> [B, F*196, D] (all-no-cls) or
        [B, F, D] (pooled variants: MAP head, one token per frame)."""
        B, F, C, H, W = video_values.shape
        frames = video_values.reshape(B * F, C, H, W)
        if self.class_token:
            pooled = self.vit(params, frames, apply_attn_pool=True)  # [BF, D]
            return pooled.reshape(B, F, self.embed_dim)
        feats = self.vit(params, frames, skip_last_layers=1)
        return feats.reshape(B, -1, self.embed_dim)

    @property
    def default_video_resolution(self) -> Tuple[int, int, int, int]:
        return (self.num_frames, 3, self.default_image_size, self.default_image_size)

    @property
    def embed_dim(self) -> int:
        return self.vit_config.hidden_size

    @property
    def num_patches(self) -> int:
        if self.class_token:
            return self.num_frames
        return self.num_frames * self.vit_config.num_patches

    @property
    def spatial_resolution(self) -> int:
        return self.num_patches // self.num_frames
