"""Preprocessing package.

Lazy exports: model modules import ``merv_tpu.preprocessing.transforms``
directly, and eagerly importing datasets here would cycle back through
``merv_tpu.models`` — so dataset/factory symbols resolve on first access.
"""

from merv_tpu.preprocessing.transforms import VideoTransform, subsample_frames, uniform_frame_indices
from merv_tpu.preprocessing.video_io import load_video, open_video

__all__ = [
    "AlignVideoDataset",
    "FinetuneVideoDataset",
    "VideoTransform",
    "get_dataset_and_collator",
    "host_video_resolutions",
    "load_video",
    "open_video",
    "subsample_frames",
    "uniform_frame_indices",
]

_LAZY = {
    "AlignVideoDataset": "merv_tpu.preprocessing.datasets",
    "FinetuneVideoDataset": "merv_tpu.preprocessing.datasets",
    "get_dataset_and_collator": "merv_tpu.preprocessing.materialize",
    "host_video_resolutions": "merv_tpu.preprocessing.materialize",
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
