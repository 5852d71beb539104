"""VidLM abstraction.

Capability parity with the reference ``VidLM(nn.Module, GenerationMixin, ABC)``
(reference ``merv/models/vidlms/base_vidlm.py:30-108``): holds the composed
backbones and exposes the trainable-module bookkeeping used by checkpointing
and stage freezing. The HF GenerationMixin plumbing (``_reorder_cache``,
``prepare_inputs_for_generation``) has no analogue — generation runs through
the two-program prefill/decode path in :mod:`merv_tpu.models.generation`.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, List, Optional, Sequence

import jax

from merv_tpu.models.backbones.llm.base_llm import LLMBackbone
from merv_tpu.models.backbones.video.base_video import VideoBackbone

Array = jax.Array
PyTree = Any

IGNORE_INDEX = -100


class VidLM(ABC):
    def __init__(
        self,
        model_family: str,
        model_id: str,
        video_backbones: List[VideoBackbone],
        llm_backbone: LLMBackbone,
        enable_mixed_precision_training: bool = True,
    ) -> None:
        self.model_family = model_family
        self.model_id = model_id
        self.video_backbones = video_backbones
        self.llm_backbone = llm_backbone
        self.enable_mixed_precision_training = enable_mixed_precision_training

        # module-keyed checkpoint layout (reference merv.py:235-237)
        self.all_module_keys: List[str] = ["llm_backbone", "projectors", "video_backbone", "feature_fusion"]
        self.trainable_module_keys: List[str] = []

    @abstractmethod
    def init(self, key: Array) -> PyTree: ...

    @abstractmethod
    def forward(self, params: PyTree, **kwargs: Any): ...

    @abstractmethod
    def freeze_backbones(self, stage: str) -> None: ...

    @property
    def llm_max_length(self) -> int:
        return self.llm_backbone.llm_max_length
