from merv_tpu.preprocessing.datasets import AlignVideoDataset, FinetuneVideoDataset
from merv_tpu.preprocessing.materialize import get_dataset_and_collator, host_video_resolutions
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
