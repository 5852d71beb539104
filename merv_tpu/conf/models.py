"""Model configuration registry.

Schema parity with the reference's draccus ``ModelConfig`` (reference
``merv/conf/models.py:26-96``): identical field names, defaults, and registered
variants (``merv-base`` ``:100-147``, ``merv-full`` ``:150-157``, four
single-encoder baselines ``:160-186``, ``reproduction-llava-v15+13b``
``:189-192``), so run configs and ``config.json`` dumps are interchangeable.

TPU-specific notes:
- ``*_train_strategy`` values keep the reference names (``fsdp-shard-grad-op``,
  ``fsdp-full-shard``) but map onto JAX mesh sharding strategies
  (see ``merv_tpu/training/materialize.py``): on TPU both are implemented as
  parameter/optimizer sharding over the ``fsdp`` mesh axis via NamedSharding;
  "shard-grad-op" shards only optimizer state + grads (ZeRO-2-like), while
  "full-shard" also shards parameters (ZeRO-3-like).
- ``enable_mixed_precision_training`` selects bf16 compute (native on TPU).
"""

from dataclasses import dataclass, field
from enum import Enum, unique
from typing import List, Optional, Union

from merv_tpu.conf.registry import ChoiceRegistry
from merv_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass
class ModelConfig(ChoiceRegistry):
    # fmt: off
    model_id: str                                           # Unique Model ID that fully specifies a given variant
    arch_specifier: str                                     # Projector architecture grammar:
                                                            #   {,no-align} + {avg,attntv,conv,3davg,3dconv} + {linear,mlp}
    feature_fusion: str                                     # Fusion strategy (e.g. "cross_attention_avg_lq")

    # Pretrained Backbones
    video_backbone_ids: List[str]                           # Video backbone registry ids (1-4 encoders)
    llm_backbone_id: str                                    # LLM backbone registry id

    # Backbone Parameters
    image_resize_strategy: str                              # < resize-naive | resize-crop | letterbox >
    llm_max_length: int                                     # Max LLM context length
    num_frames: Union[int, List[int]]                       # Frames sampled per video backbone
    projector_token_length: int                             # Tokens per frame-slot after projection; must be square
    visual_feature_length: int                              # Total visual tokens after projection; must match across encoders

    # === Multi-Stage Optimization Hyperparameters ===
    # Align Stage
    align_epochs: int
    align_max_steps: Optional[int]
    align_global_batch_size: int
    align_per_device_batch_size: int

    align_learning_rate: float
    align_weight_decay: float
    align_max_grad_norm: float
    align_lr_scheduler_type: str
    align_warmup_ratio: float

    align_train_strategy: str

    # Finetune Stage
    finetune_epochs: int
    finetune_max_steps: Optional[int]
    finetune_global_batch_size: int
    finetune_per_device_batch_size: int

    finetune_learning_rate: float
    finetune_weight_decay: float
    finetune_max_grad_norm: float
    finetune_lr_scheduler_type: str
    finetune_warmup_ratio: float

    finetune_train_strategy: str
    # fmt: on

    # Activation checkpointing (jax.checkpoint/remat on LLM decoder layers)
    enable_gradient_checkpointing: bool = True

    # Intermediate checkpointing interval (optimizer steps)
    save_checkpoint_after: int = 512

    # bf16 mixed-precision compute (native on TPU MXU)
    enable_mixed_precision_training: bool = True
    reduce_in_full_precision: bool = False

    def __post_init__(self) -> None:
        if isinstance(self.num_frames, int):
            overwatch.info(f"Inflating num_frames {self.num_frames} from int to list...")
            self.num_frames = [self.num_frames for _ in range(len(self.video_backbone_ids))]


@dataclass
class MERV_Base(ModelConfig):
    model_id: str = "merv-base"
    arch_specifier: str = "no-align+3davg+linear"
    feature_fusion: str = "cross_attention_avg_lq"

    video_backbone_ids: List[str] = field(
        default_factory=lambda: [
            "languagebind-video-noclass",
            "dinov2-video-all-tokens",
            "vivit-google-b-all-no-cls-16frames",
            "siglip-vit-b16-224px-all-no-cls",
        ]
    )
    llm_backbone_id: str = "llama2-7b-pure"
    image_resize_strategy: str = "resize-naive"
    llm_max_length: int = 2048
    num_frames: Union[int, List[int]] = field(default_factory=lambda: [16, 16, 32, 16])
    projector_token_length: int = 64
    visual_feature_length: int = 1024

    # Align Stage
    align_epochs: int = 1
    align_max_steps: Optional[int] = None
    align_global_batch_size: int = 256
    align_per_device_batch_size: int = 16

    align_learning_rate: float = 1e-3
    align_weight_decay: float = 0.0
    align_max_grad_norm: float = 1.0
    align_lr_scheduler_type: str = "linear-warmup+cosine-decay"
    align_warmup_ratio: float = 0.03

    align_train_strategy: str = "fsdp-shard-grad-op"

    # Finetune Stage
    finetune_epochs: int = 1
    finetune_max_steps: Optional[int] = None
    finetune_global_batch_size: int = 128
    finetune_per_device_batch_size: int = 8

    finetune_learning_rate: float = 2e-5
    finetune_weight_decay: float = 0.1
    finetune_max_grad_norm: float = 1.0
    finetune_lr_scheduler_type: str = "linear-warmup+cosine-decay"
    finetune_warmup_ratio: float = 0.03

    finetune_train_strategy: str = "fsdp-full-shard"


@dataclass
class MERV_Full(MERV_Base):
    model_id: str = "merv-full"
    arch_specifier: str = "3davg+linear"
    align_train_strategy: str = "fsdp-full-shard"
    align_learning_rate: float = 1e-4


@dataclass
class LanguageBind_Single_Encoder(MERV_Base):
    model_id: str = "languagebind-single"
    video_backbone_ids: List[str] = field(default_factory=lambda: ["languagebind-video-noclass"])
    num_frames: Union[int, List[int]] = field(default_factory=lambda: [16])


@dataclass
class DINOv2_Single_Encoder(MERV_Base):
    model_id: str = "dinov2-single"
    video_backbone_ids: List[str] = field(default_factory=lambda: ["dinov2-video-all-tokens"])
    num_frames: Union[int, List[int]] = field(default_factory=lambda: [16])


@dataclass
class ViViT_Single_Encoder(MERV_Base):
    model_id: str = "vivit-single"
    video_backbone_ids: List[str] = field(default_factory=lambda: ["vivit-google-b-all-no-cls-16frames"])
    num_frames: Union[int, List[int]] = field(default_factory=lambda: [32])


@dataclass
class SigLIP_Single_Encoder(MERV_Base):
    model_id: str = "siglip-single"
    video_backbone_ids: List[str] = field(default_factory=lambda: ["siglip-vit-b16-224px-all-no-cls"])
    num_frames: Union[int, List[int]] = field(default_factory=lambda: [16])


@dataclass
class LLaVa_v15_Reproduction_13B(MERV_Base):
    model_id: str = "reproduction-llava-v15+13b"
    llm_backbone_id: str = "vicuna-v15-13b"


@unique
class ModelRegistry(Enum):
    MERV_BASE = MERV_Base
    MERV_FULL = MERV_Full

    LANGUAGEBIND_SINGLE = LanguageBind_Single_Encoder
    DINOV2_SINGLE = DINOv2_Single_Encoder
    VIVIT_SINGLE = ViViT_Single_Encoder
    SIGLIP_SINGLE = SigLIP_Single_Encoder

    LLAVA_REPRO_13B = LLaVa_v15_Reproduction_13B

    @property
    def model_id(self) -> str:
        return self.value.model_id


for model_variant in ModelRegistry:
    ModelConfig.register_subclass(model_variant.model_id, model_variant.value)
