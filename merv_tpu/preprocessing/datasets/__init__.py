from merv_tpu.preprocessing.datasets.datasets import AlignVideoDataset, FinetuneVideoDataset

__all__ = ["AlignVideoDataset", "FinetuneVideoDataset"]
