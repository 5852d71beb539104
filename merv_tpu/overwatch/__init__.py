from merv_tpu.overwatch.overwatch import DistributedOverwatch, PureOverwatch, initialize_overwatch

__all__ = ["DistributedOverwatch", "PureOverwatch", "initialize_overwatch"]
