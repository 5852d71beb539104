from merv_tpu.training.materialize import TRAIN_STRATEGIES, get_train_strategy
from merv_tpu.training.metrics import JSONLinesTracker, Metrics, Tracker, WeightsBiasesTracker
from merv_tpu.training.strategies import DDPStrategy, FSDPStrategy, TrainingStrategy

__all__ = [
    "DDPStrategy",
    "FSDPStrategy",
    "JSONLinesTracker",
    "Metrics",
    "TRAIN_STRATEGIES",
    "Tracker",
    "TrainingStrategy",
    "WeightsBiasesTracker",
    "get_train_strategy",
]
