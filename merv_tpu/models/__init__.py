from merv_tpu.models.materialize import (
    LLM_BACKBONES,
    VIDEO_BACKBONES,
    get_llm_backbone_and_tokenizer,
    get_video_backbone_and_transform,
    get_vidlm,
)
from merv_tpu.models.vidlms import MERV, VidLM

__all__ = [
    "LLM_BACKBONES",
    "MERV",
    "VIDEO_BACKBONES",
    "VidLM",
    "get_llm_backbone_and_tokenizer",
    "get_video_backbone_and_transform",
    "get_vidlm",
]
