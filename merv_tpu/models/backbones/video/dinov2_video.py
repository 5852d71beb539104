"""DINOv2 video backbone (per-frame ViT-L/14 with registers).

Behavior parity with reference ``merv/models/backbones/video/dinov2_video.py``:
frames flattened to a per-frame ViT forward; variants select cls/register
handling (``:47-67``, ``:140-154``); feature tap is the penultimate block
without final norm (timm ``get_intermediate_layers n={L-2}``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from merv_tpu.models.backbones.video.base_video import VideoBackbone
from merv_tpu.models.backbones.video.vit import DINOV2_LARGE_REG4, ViTConfig
from merv_tpu.preprocessing.transforms import IMAGENET_MEAN, IMAGENET_STD, VideoTransform

Array = jax.Array
PyTree = Any

DINOv2_VISION_BACKBONES = {
    "dinov2-video": "vit_large_patch14_reg4_dinov2.lvd142m",
    "dinov2-video-all-tokens": "vit_large_patch14_reg4_dinov2.lvd142m",
    "dinov2-video-classemb-at-first": "vit_large_patch14_reg4_dinov2.lvd142m",
    "dinov2-video-all-token-with-cls": "vit_large_patch14_reg4_dinov2.lvd142m",
}


class DinoV2VideoBackbone(VideoBackbone):
    def __init__(
        self, video_backbone_id: str, image_resize_strategy: str, default_image_size: int = 224, num_frames: int = 8
    ) -> None:
        super().__init__(video_backbone_id, image_resize_strategy, default_image_size, num_frames)
        assert video_backbone_id in DINOv2_VISION_BACKBONES, video_backbone_id
        self.timm_path_or_url = DINOv2_VISION_BACKBONES[video_backbone_id]
        self.video_transform = VideoTransform(
            target_size=default_image_size,
            resize_strategy=image_resize_strategy,
            shortest_edge=default_image_size,
            interpolation="bicubic",
            mean=IMAGENET_MEAN,
            std=IMAGENET_STD,
        )

    @property
    def vit_config(self) -> ViTConfig:
        return dataclasses.replace(DINOV2_LARGE_REG4, image_size=self.default_image_size)

    def __call__(self, params: PyTree, video_values: Array, is_image: Optional[Array] = None) -> Array:
        """video_values: [B, F, C, H, W] -> [B, num_patches, 1024]."""
        B, F, C, H, W = video_values.shape
        frames = video_values.reshape(B * F, C, H, W)
        c = self.vit_config
        n_prefix = c.num_prefix_tokens

        if self.identifier == "dinov2-video":
            # cls token per frame, after all blocks + final norm (timm pooled fwd)
            feats = self.vit(params, frames, skip_last_layers=0, apply_final_norm=True)
            return feats[:, 0].reshape(B, F, c.hidden_size)

        feats = self.vit(params, frames, skip_last_layers=1)  # [BF, prefix+N, D]
        patches = feats[:, n_prefix:].reshape(B, -1, c.hidden_size)
        if "classemb-at-first" in self.identifier:
            cls = feats[:, :1].reshape(B, F, c.hidden_size).mean(axis=1, keepdims=True)
            return jnp.concatenate([cls, patches], axis=1)
        if "all-token-with-cls" in self.identifier:
            cls = feats[:, :1].reshape(B, F, c.hidden_size)
            return jnp.concatenate([cls, patches], axis=1)
        return patches

    @property
    def default_video_resolution(self) -> Tuple[int, int, int, int]:
        return (self.num_frames, 3, self.default_image_size, self.default_image_size)

    @property
    def embed_dim(self) -> int:
        return self.vit_config.hidden_size

    @property
    def num_patches(self) -> int:
        if "classemb-at-first" in self.identifier:
            return self.num_frames * self.vit_config.num_patches
        if "all-tokens" not in self.identifier and "all-token-with-cls" not in self.identifier:
            return self.num_frames
        return self.num_frames * self.vit_config.num_patches

    @property
    def spatial_resolution(self) -> int:
        return self.num_patches // self.num_frames
