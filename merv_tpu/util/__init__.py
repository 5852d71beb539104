from merv_tpu.util.batching_utils import SplitModalitySampler
from merv_tpu.util.data_utils import PaddedCollatorForLanguageModeling
from merv_tpu.util.flops_utils import get_statistics
from merv_tpu.util.seed_utils import set_global_seed, worker_init_function

__all__ = [
    "PaddedCollatorForLanguageModeling",
    "SplitModalitySampler",
    "get_statistics",
    "set_global_seed",
    "worker_init_function",
]
