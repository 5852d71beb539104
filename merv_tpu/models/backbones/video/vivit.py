"""ViViT video backbone (spatio-temporal tubelet transformer).

Behavior parity with reference ``merv/models/backbones/video/vivit.py``:
32-frame input with 2x16x16 tubelets -> [B, 3137, 768] last_hidden_state
(final layernorm applied — ViViT uses the *last* layer unlike the per-frame
towers); variants drop the cls token, keep all 16 temporal slices
(``-16frames``) or stride ``::2`` to 8 (``:100-118``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from merv_tpu.models.backbones.video.base_video import VideoBackbone
from merv_tpu.models.backbones.video.vit import VIVIT_BASE_16x2, ViTConfig
from merv_tpu.preprocessing.transforms import SIGLIP_MEAN, SIGLIP_STD, VideoTransform

Array = jax.Array
PyTree = Any

ViVIT_VISION_BACKBONES = {
    "vivit-google-b-cls-token": "google/vivit-b-16x2-kinetics400",
    "vivit-google-b-all-tokens": "google/vivit-b-16x2-kinetics400",
    "vivit-google-b-all-no-cls": "google/vivit-b-16x2-kinetics400",
    "vivit-google-b-all-no-cls-16frames": "google/vivit-b-16x2-kinetics400",
    "vivit-google-b-classemb-at-first-16frames": "google/vivit-b-16x2-kinetics400",
}


class ViVITVideoBackbone(VideoBackbone):
    def __init__(
        self, video_backbone_id: str, image_resize_strategy: str, default_image_size: int = 224, num_frames: int = 32
    ) -> None:
        super().__init__(video_backbone_id, image_resize_strategy, default_image_size, num_frames)
        assert video_backbone_id in ViVIT_VISION_BACKBONES, video_backbone_id
        self.huggingface_path_or_url = ViVIT_VISION_BACKBONES[video_backbone_id]
        # VivitImageProcessor: shortest_edge 256 -> center crop 224, mean/std 0.5
        self.video_transform = VideoTransform(
            target_size=default_image_size,
            resize_strategy=image_resize_strategy,
            shortest_edge=256,
            interpolation="bilinear",
            mean=SIGLIP_MEAN,
            std=SIGLIP_STD,
        )

    @property
    def vit_config(self) -> ViTConfig:
        return dataclasses.replace(
            VIVIT_BASE_16x2, image_size=self.default_image_size, tubelet_frames=self.num_frames
        )

    @property
    def _grid(self) -> int:
        return self.default_image_size // self.vit_config.patch_size  # 14

    @property
    def _temporal_slices(self) -> int:
        return self.num_frames // self.vit_config.tubelet_t  # 16 for 32 frames

    def __call__(self, params: PyTree, video_values: Array, is_image: Optional[Array] = None) -> Array:
        """video_values: [B, F, C, H, W] -> variant-dependent token features."""
        B, F, C, H, W = video_values.shape
        pixels = video_values.transpose(0, 2, 1, 3, 4)  # [B, C, T, H, W]
        feats = self.vit(params, pixels, skip_last_layers=0, apply_final_norm=True)
        D = self.embed_dim

        if "cls-token" in self.identifier:
            return feats[:, :1]
        if "all-no-cls" in self.identifier:
            t, s = self._temporal_slices, self._grid
            tokens = feats[:, 1:].reshape(B, t, s, s, D)
            if "16frames" in self.identifier:
                return tokens.reshape(B, t * s * s, D)
            tokens = tokens[:, ::2]
            return tokens.reshape(B, (t // 2) * s * s, D)
        if "classemb-at-first" in self.identifier:
            cls = feats[:, :1]
            return jnp.concatenate([cls, feats[:, 1:]], axis=1)
        return feats  # all-tokens: cls + patches

    @property
    def default_video_resolution(self) -> Tuple[int, int, int, int]:
        return (self.num_frames, 3, self.default_image_size, self.default_image_size)

    @property
    def embed_dim(self) -> int:
        return self.vit_config.hidden_size

    @property
    def num_patches(self) -> int:
        t, s = self._temporal_slices, self._grid
        if "cls-token" in self.identifier:
            return 1
        if "all-tokens" in self.identifier:
            return t * s * s + 1
        if "all-no-cls-16frames" in self.identifier:
            return t * s * s
        if "all-no-cls" in self.identifier:
            return t * s * s // 2
        if "classemb-at-first" in self.identifier:
            return t * s * s
        raise NotImplementedError(self.identifier)

    @property
    def spatial_resolution(self) -> int:
        if "all-no-cls" in self.identifier or "classemb-at-first" in self.identifier:
            return self._grid * self._grid
        return self.num_patches
