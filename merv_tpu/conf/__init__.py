from merv_tpu.conf.datasets import DatasetConfig, DatasetRegistry
from merv_tpu.conf.models import ModelConfig, ModelRegistry

__all__ = ["DatasetConfig", "DatasetRegistry", "ModelConfig", "ModelRegistry"]
