"""LanguageBind-Video backbone (CLIP ViT-L/14 with per-layer temporal attention).

Behavior parity with reference ``merv/models/backbones/video/languagebind/__init__.py``:
input ``[B, C, F, H, W]``, feature tap ``hidden_states[-2]`` -> ``[B, F, 257, 1024]``,
token modes ``average``/``classemb``/``noclass``/``classemb-at-first``
(``:79-103``). Temporal attention runs in windows of the checkpoint's
``num_frames`` (8), exactly as the vendored torch code groups
``rearrange('(b t) n d -> (b n) t d', t=config.t)`` regardless of the runtime
frame count (``modeling_video.py:135-160``) — so 16-frame MERV input attends in
two 8-frame windows.

The reference transform applies ``RandomHorizontalFlipVideo(p=0.5)`` even at
eval (``processing_video.py:63-80``); we deliberately drop that nondeterminism
(flag ``eval_flip`` restores it for strict reproduction experiments).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from merv_tpu.models.backbones.video.base_video import VideoBackbone
from merv_tpu.models.backbones.video.vit import LANGUAGEBIND_VIDEO_LARGE, ViTConfig
from merv_tpu.preprocessing.transforms import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD, VideoTransform

Array = jax.Array
PyTree = Any

_TOKEN_MODES = {
    "languagebind-video": None,
    "languagebind-video-averagetoken": "average",
    "languagebind-video-classemb": "classemb",
    "languagebind-video-noclass": "noclass",
    "languagebind-video-classemb-at-first": "classemb-at-first",
}


class LangBindVideoBackbone(VideoBackbone):
    def __init__(
        self,
        video_backbone_id: str,
        image_resize_strategy: str,
        default_image_size: int = 224,
        num_frames: int = 8,
        token: Optional[str] = None,
        eval_flip: bool = False,
    ) -> None:
        super().__init__(video_backbone_id, image_resize_strategy, default_image_size, num_frames)
        assert "languagebind-video" in video_backbone_id, video_backbone_id
        self.token = token if token is not None else _TOKEN_MODES.get(video_backbone_id)
        # LanguageBind normalizes then short-side-scales + center-crops; output [C, T, H, W]
        self.video_transform = VideoTransform(
            target_size=default_image_size,
            resize_strategy="resize-crop",
            shortest_edge=default_image_size,
            interpolation="bilinear",
            mean=OPENAI_DATASET_MEAN,
            std=OPENAI_DATASET_STD,
            channels_first_time=True,
            random_hflip_p=0.5 if eval_flip else 0.0,
        )

    @property
    def vit_config(self) -> ViTConfig:
        return dataclasses.replace(LANGUAGEBIND_VIDEO_LARGE, image_size=self.default_image_size)

    def __call__(self, params: PyTree, video_values: Array, is_image: Optional[Array] = None) -> Array:
        """video_values: [B, C, F, H, W] -> token features (mode-dependent)."""
        B, C, F, H, W = video_values.shape
        frames = video_values.transpose(0, 2, 1, 3, 4).reshape(B * F, C, H, W)
        c = self.vit_config
        window = min(c.temporal_frames, F)
        feats = self.vit(params, frames, skip_last_layers=1, frames=window)  # [BF, 257, D]
        N = feats.shape[1]
        feats = feats.reshape(B, F, N, c.hidden_size)

        if self.token == "average":
            feats = feats.mean(axis=-2)
        elif self.token == "classemb":
            feats = feats[:, :, 0, :]
        elif self.token == "noclass":
            feats = feats[:, :, 1:, :]
        elif self.token == "classemb-at-first":
            cls = feats[:, :, 0, :].mean(axis=1, keepdims=True)
            rest = feats[:, :, 1:, :].reshape(B, -1, self.embed_dim)
            return jnp.concatenate([cls, rest], axis=1)
        return feats.reshape(B, -1, self.embed_dim)

    @property
    def embed_dim(self) -> int:
        return self.vit_config.hidden_size

    @property
    def default_video_resolution(self) -> Tuple[int, int, int, int]:
        return (3, self.num_frames, self.default_image_size, self.default_image_size)

    @property
    def num_patches(self) -> int:
        per_frame = self.vit_config.num_patches + 1  # 257
        if self.token is None:
            return self.num_frames * per_frame
        if self.token in ("average", "classemb"):
            return self.num_frames
        if self.token in ("noclass", "classemb-at-first"):
            return self.num_frames * (per_frame - 1)
        return self.num_frames * per_frame

    @property
    def spatial_resolution(self) -> int:
        return self.num_patches // self.num_frames
