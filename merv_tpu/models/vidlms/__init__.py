from merv_tpu.models.vidlms.base_vidlm import IGNORE_INDEX, VidLM
from merv_tpu.models.vidlms.merv import MERV, causal_lm_loss

__all__ = ["IGNORE_INDEX", "MERV", "VidLM", "causal_lm_loss"]
