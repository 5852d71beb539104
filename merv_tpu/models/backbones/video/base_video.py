"""Video backbone abstraction.

Contract parity with the reference ``VideoBackbone`` ABC (reference
``merv/models/backbones/video/base_video.py:56-105``): a backbone maps
``video_values`` to ``[B, num_patches, embed_dim]`` token features and exposes
``embed_dim`` / ``num_patches`` / ``spatial_resolution`` /
``temporal_resolution`` / ``default_video_resolution`` /
``get_video_transform()``.

Functional-JAX differences: backbones hold no parameters — ``init`` /
``load_state_dict`` produce a pytree and ``__call__(params, video_values)`` is
pure. The FSDP-wrap policy of the reference is replaced by sharding-rule
participation (params flow through :func:`merv_tpu.parallel.fsdp_specs`).
"""

from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod
from typing import Any, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from merv_tpu.models.backbones.video.vision_import import import_vision_state_dict
from merv_tpu.models.backbones.video.vit import VisionTransformer, ViTConfig
from merv_tpu.preprocessing.transforms import VideoTransform

Array = jax.Array
PyTree = Any


class VideoBackbone(ABC):
    def __init__(
        self,
        video_backbone_id: str,
        image_resize_strategy: str,
        default_image_size: int = 224,
        num_frames: int = 8,
    ) -> None:
        self.identifier = video_backbone_id
        self.image_resize_strategy = image_resize_strategy
        self.default_image_size = default_image_size
        self.num_frames = num_frames
        # Layer-scan unroll override (None = the config default, tuned for
        # serving). Training sets this per stage via
        # materialize.train_tower_scan_unroll: the serving plateau (12)
        # widens remat live-ranges under the finetune step and blows the
        # v5e-8 16 GiB/device fit (memory_proof: 18.26 GiB vs 15.88 at 4);
        # align fits at 12 and runs ~4% faster.
        self.scan_unroll: Optional[int] = None

    # -- params ----------------------------------------------------------------------

    @property
    @abstractmethod
    def vit_config(self) -> ViTConfig: ...

    @property
    def vit(self) -> VisionTransformer:
        cfg = self.vit_config
        if self.scan_unroll is not None and hasattr(cfg, "scan_unroll"):
            cfg = dataclasses.replace(cfg, scan_unroll=self.scan_unroll)
        return VisionTransformer(cfg)

    def init(self, key: Array) -> PyTree:
        return self.vit.init(key)

    def load_state_dict(self, state: Mapping[str, Any], param_dtype: Any = jnp.bfloat16) -> PyTree:
        """Import a timm/HF checkpoint state dict (see vision_import.py)."""
        return import_vision_state_dict(self.vit_config, state, param_dtype=param_dtype)

    # -- forward ---------------------------------------------------------------------

    @abstractmethod
    def __call__(self, params: PyTree, video_values: Array, is_image: Optional[Array] = None) -> Array:
        """video_values -> [B, num_patches, embed_dim]."""

    # -- metadata --------------------------------------------------------------------

    def get_video_transform(self) -> VideoTransform:
        return self.video_transform

    @property
    @abstractmethod
    def default_video_resolution(self) -> Tuple[int, int, int, int]: ...

    @property
    @abstractmethod
    def embed_dim(self) -> int: ...

    @property
    @abstractmethod
    def num_patches(self) -> int: ...

    @property
    @abstractmethod
    def spatial_resolution(self) -> int: ...

    @property
    def temporal_resolution(self) -> int:
        assert self.num_patches % self.spatial_resolution == 0
        return self.num_patches // self.spatial_resolution

    @property
    def half_precision_dtype(self) -> Any:
        return jnp.bfloat16
