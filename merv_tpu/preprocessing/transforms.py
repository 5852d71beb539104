"""Fused on-device video preprocessing (resize / crop / normalize).

The reference runs per-frame torchvision PIL transforms inside dataloader
workers (reference ``dinov2_video.py:93-124``, ``vivit.py:53-92``,
``languagebind/video/processing_video.py:63-80``). TPU-native redesign: decode
produces raw uint8 ``[T, H, W, C]`` on the host, and the entire
resize->crop->scale->normalize pipeline runs on-device as one jitted XLA
program per backbone (fused elementwise + gather), per the BASELINE north star.

Resize strategies mirror the reference contract:
- ``resize-naive``: direct resize to (S, S)
- ``resize-crop``: shortest-edge resize + center crop
- ``letterbox``: pad to square with the normalization-mean fill, then resize
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)
HIERA_MEAN = (0.45, 0.45, 0.45)
HIERA_STD = (0.225, 0.225, 0.225)


@dataclass(frozen=True)
class VideoTransform:
    """Per-backbone video preprocessing. ``__call__``: uint8 [T,H,W,C] -> [T,C,S,S] float."""

    target_size: int = 224
    resize_strategy: str = "resize-naive"
    shortest_edge: Optional[int] = None  # for resize-crop (e.g. ViViT 256 -> crop 224)
    interpolation: str = "bicubic"  # jax.image.resize method
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    channels_first_time: bool = False  # output [C,T,S,S] (LanguageBind) instead of [T,C,S,S]
    # whole-video horizontal flip probability. The reference's LanguageBind
    # transform applies RandomHorizontalFlipVideo(p=0.5) even at eval
    # (reference processing_video.py:72); we default it OFF and expose it for
    # strict-reproduction runs. Host-side randomness — not usable under jit.
    random_hflip_p: float = 0.0
    dtype: Any = jnp.float32

    def __call__(self, video: Array) -> Array:
        """video: uint8/float [T, H, W, C] -> normalized [T, C, S, S] (or [C, T, S, S])."""
        if self.random_hflip_p > 0:
            import numpy as _np

            if _np.random.rand() < self.random_hflip_p:
                video = jnp.asarray(video)[:, :, ::-1]
        x = jnp.asarray(video).astype(jnp.float32) / 255.0
        T, H, W, C = x.shape
        S = self.target_size

        if self.resize_strategy == "resize-naive":
            x = jax.image.resize(x, (T, S, S, C), method=self.interpolation)
        elif self.resize_strategy == "resize-crop":
            se = self.shortest_edge or S
            if H < W:
                nh, nw = se, max(1, int(round(W * se / H)))
            else:
                nh, nw = max(1, int(round(H * se / W))), se
            x = jax.image.resize(x, (T, nh, nw, C), method=self.interpolation)
            top, left = (nh - S) // 2, (nw - S) // 2
            x = jax.lax.dynamic_slice(x, (0, top, left, 0), (T, S, S, C))
        elif self.resize_strategy == "letterbox":
            m = max(H, W)
            pad_h, pad_w = (m - H) // 2, (m - W) // 2
            fill = jnp.asarray(self.mean, jnp.float32)
            x = jnp.pad(
                x,
                ((0, 0), (pad_h, m - H - pad_h), (pad_w, m - W - pad_w), (0, 0)),
                constant_values=0.0,
            )
            # emulate constant fill with the mean color
            mask = jnp.zeros((m, m, 1), jnp.float32).at[pad_h : pad_h + H, pad_w : pad_w + W].set(1.0)
            x = x * mask + (1.0 - mask) * fill
            x = jax.image.resize(x, (T, S, S, C), method=self.interpolation)
        else:
            raise ValueError(f"Unknown resize strategy {self.resize_strategy!r}")

        mean = jnp.asarray(self.mean, jnp.float32)
        std = jnp.asarray(self.std, jnp.float32)
        x = (x - mean) / std
        x = x.transpose(0, 3, 1, 2)  # [T, C, S, S]
        if self.channels_first_time:
            x = x.transpose(1, 0, 2, 3)  # [C, T, S, S]
        return x.astype(self.dtype)

    # -- split pipeline: host geometry (dataloader workers) + device finish ---------
    #
    # The training path decodes + resizes on the host (cv2, uint8 — 4x smaller
    # host->device transfer than fp32) and fuses scale/normalize/transpose into
    # the jitted forward program (BASELINE north star: on-device preprocessing).

    def host_geometry(self, video: Any) -> Any:
        """uint8 [T, H, W, C] numpy -> uint8 [T, S, S, C] numpy (resize/crop/letterbox)."""
        import cv2
        import numpy as np

        video = np.asarray(video)
        assert video.ndim == 4, video.shape
        if self.random_hflip_p > 0 and np.random.rand() < self.random_hflip_p:
            video = video[:, :, ::-1]
        T, H, W, C = video.shape
        S = self.target_size
        interp = {"bicubic": cv2.INTER_CUBIC, "bilinear": cv2.INTER_LINEAR}[self.interpolation]

        def resize_all(frames, size_hw):
            return np.stack([cv2.resize(f, (size_hw[1], size_hw[0]), interpolation=interp) for f in frames])

        if self.resize_strategy == "resize-naive":
            out = resize_all(video, (S, S))
        elif self.resize_strategy == "resize-crop":
            se = self.shortest_edge or S
            if H < W:
                nh, nw = se, max(1, int(round(W * se / H)))
            else:
                nh, nw = max(1, int(round(H * se / W))), se
            out = resize_all(video, (nh, nw))
            top, left = (nh - S) // 2, (nw - S) // 2
            out = out[:, top : top + S, left : left + S]
        elif self.resize_strategy == "letterbox":
            m = max(H, W)
            pad_h, pad_w = (m - H) // 2, (m - W) // 2
            fill = np.asarray([int(round(v * 255)) for v in self.mean], video.dtype)
            canvas = np.empty((T, m, m, C), video.dtype)
            canvas[...] = fill
            canvas[:, pad_h : pad_h + H, pad_w : pad_w + W] = video
            out = resize_all(canvas, (S, S))
        else:
            raise ValueError(f"Unknown resize strategy {self.resize_strategy!r}")
        return np.ascontiguousarray(out)

    def device_finish(self, x: Array) -> Array:
        """uint8/float [..., T, S, S, C] -> normalized [..., T, C, S, S]
        (or [..., C, T, S, S] for channels_first_time); jit-friendly, batched."""
        x = jnp.asarray(x).astype(jnp.float32) / 255.0
        mean = jnp.asarray(self.mean, jnp.float32)
        std = jnp.asarray(self.std, jnp.float32)
        x = (x - mean) / std
        nd = x.ndim
        perm = tuple(range(nd - 4)) + (nd - 4, nd - 1, nd - 3, nd - 2)  # [.., T, C, S, S]
        x = x.transpose(perm)
        if self.channels_first_time:
            swap = list(range(nd))
            swap[nd - 4], swap[nd - 3] = swap[nd - 3], swap[nd - 4]
            x = x.transpose(swap)
        return x.astype(self.dtype)


def subsample_frames(video: Array, num_frames: int) -> Array:
    """Stride-subsample a [T, ...] video to num_frames (reference merv.py:804-806)."""
    T = video.shape[0]
    if T == num_frames:
        return video
    stride = max(1, T // num_frames)
    return video[::stride][:num_frames]


def uniform_frame_indices(total: int, num_frames: int) -> Any:
    """np.linspace frame sampling used by load_video (reference datasets.py:125-140)."""
    import numpy as np

    return np.linspace(0, max(total - 1, 0), num_frames).astype(int)
