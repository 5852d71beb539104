from merv_tpu.models.backbones.video.base_video import VideoBackbone
from merv_tpu.models.backbones.video.dinov2_video import DinoV2VideoBackbone
from merv_tpu.models.backbones.video.hiera import HieraVideoBackbone
from merv_tpu.models.backbones.video.languagebind import LangBindVideoBackbone
from merv_tpu.models.backbones.video.siglip import SiglipVideoBackbone
from merv_tpu.models.backbones.video.vivit import ViVITVideoBackbone
from merv_tpu.preprocessing.transforms import VideoTransform

__all__ = [
    "DinoV2VideoBackbone",
    "HieraVideoBackbone",
    "LangBindVideoBackbone",
    "SiglipVideoBackbone",
    "VideoBackbone",
    "VideoTransform",
    "ViVITVideoBackbone",
]
