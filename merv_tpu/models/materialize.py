"""Factory layer: string-keyed registries → instantiated backbones / VidLMs.

Registry parity with the reference (reference ``merv/models/materialize.py:31-101``):
identical backbone-id strings resolve to the TPU-native classes, and the
``get_*`` entry points keep the reference signatures
(``get_video_backbone_and_transform`` ``:107``,
``get_llm_backbone_and_tokenizer`` ``:132``, ``get_vidlm`` ``:154``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from merv_tpu.models.backbones.llm.base_llm import LLM_SPECS, LLMBackbone
from merv_tpu.models.backbones.video import (
    DinoV2VideoBackbone,
    HieraVideoBackbone,
    LangBindVideoBackbone,
    SiglipVideoBackbone,
    VideoBackbone,
    ViVITVideoBackbone,
)
from merv_tpu.models.vidlms import MERV, VidLM
from merv_tpu.preprocessing.transforms import VideoTransform

# fmt: off
# === Video Backbone Registry (ids match reference models/materialize.py:31-73) ===
VIDEO_BACKBONES: Dict[str, Dict[str, Any]] = {
    # === DINOv2 ===
    "dinov2-video": {"cls": DinoV2VideoBackbone, "kwargs": {"default_image_size": 224}},
    "dinov2-video-all-tokens": {"cls": DinoV2VideoBackbone, "kwargs": {"default_image_size": 224}},
    "dinov2-video-all-token-with-cls": {"cls": DinoV2VideoBackbone, "kwargs": {"default_image_size": 224}},
    "dinov2-video-classemb-at-first": {"cls": DinoV2VideoBackbone, "kwargs": {"default_image_size": 224}},

    # === LanguageBind Video ===
    "languagebind-video": {"cls": LangBindVideoBackbone, "kwargs": {"default_image_size": 224}},
    "languagebind-video-averagetoken": {"cls": LangBindVideoBackbone, "kwargs": {"default_image_size": 224, "token": "average"}},
    "languagebind-video-classemb": {"cls": LangBindVideoBackbone, "kwargs": {"default_image_size": 224, "token": "classemb"}},
    "languagebind-video-noclass": {"cls": LangBindVideoBackbone, "kwargs": {"default_image_size": 224, "token": "noclass"}},
    "languagebind-video-classemb-at-first": {"cls": LangBindVideoBackbone, "kwargs": {"default_image_size": 224, "token": "classemb-at-first"}},

    # === ViViT ===
    "vivit-google-b-cls-token": {"cls": ViVITVideoBackbone, "kwargs": {"default_image_size": 224}},
    "vivit-google-b-all-tokens": {"cls": ViVITVideoBackbone, "kwargs": {"default_image_size": 224}},
    "vivit-google-b-all-no-cls": {"cls": ViVITVideoBackbone, "kwargs": {"default_image_size": 224}},
    "vivit-google-b-all-no-cls-16frames": {"cls": ViVITVideoBackbone, "kwargs": {"default_image_size": 224}},
    "vivit-google-b-classemb-at-first-16frames": {"cls": ViVITVideoBackbone, "kwargs": {"default_image_size": 224}},

    # === SigLIP ===
    "siglip-vit-b16-224px": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},
    "siglip-vit-b16-224px-all-tokens": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},
    "siglip-vit-b16-224px-all-no-cls": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},
    "siglip-vit-b16-224px-classemb-at-first": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},
    "siglip-vit-b16-256px": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},
    "siglip-vit-b16-256px-all-tokens": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},
    "siglip-vit-b16-384px": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},
    "siglip-vit-b16-384px-all-tokens": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},
    "siglip-vit-so400m": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},
    "siglip-vit-so400m-all-tokens": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},
    "siglip-vit-so400m-384px": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},
    "siglip-vit-so400m-384px-all-tokens": {"cls": SiglipVideoBackbone, "kwargs": {"default_image_size": 224}},

    # === Hiera ===
    "hiera-base-video": {"cls": HieraVideoBackbone, "kwargs": {"default_image_size": 224}},
    "hiera-base-video-noft": {"cls": HieraVideoBackbone, "kwargs": {"default_image_size": 224}},
    "hiera-base-plus-video": {"cls": HieraVideoBackbone, "kwargs": {"default_image_size": 224}},
    "hiera-base-plus-video-noft": {"cls": HieraVideoBackbone, "kwargs": {"default_image_size": 224}},
    "hiera-large-video": {"cls": HieraVideoBackbone, "kwargs": {"default_image_size": 224}},
    "hiera-large-video-noft": {"cls": HieraVideoBackbone, "kwargs": {"default_image_size": 224}},
}

# === Language Model Registry (reference models/materialize.py:77-101) ===
LLM_BACKBONES: Dict[str, Dict[str, Any]] = {llm_id: {"cls": LLMBackbone, "kwargs": {}} for llm_id in LLM_SPECS}
# fmt: on


# Tower layer-scan unroll under the TRAINING step (unroll is schedule-only:
# numerics are identical at any factor, pinned by
# tests/test_vit.py::test_scan_unroll_is_schedule_only). The serving default
# (ViTConfig.scan_unroll=12, the measured v5e plateau) widens remat
# live-ranges under the FINETUNE gradient step and breaks the 16 GiB/device
# v5e-8 fit (memory_proof: 18.26 GiB at 12 vs 15.88 at 4). The ALIGN step
# fits at 12 (14.72 GiB) and runs ~4% faster there (bench_train on v5e-1:
# 5.97 ex/s at 12 vs 5.76 at 4), so the unroll is chosen per stage.
TRAIN_TOWER_SCAN_UNROLL = 4  # finetune-safe factor (any-stage fallback)
TRAIN_TOWER_SCAN_UNROLL_ALIGN = 12


def train_tower_scan_unroll(stage: str) -> int:
    """Tower layer-scan unroll for a training ``stage`` (see table above).

    Keyed on what the stage TRAINS, not on its name: only the LLM-frozen
    stages (align / second_align — projector-only training, see
    ``merv.py::freeze_backbones``) are memory-proven at unroll 12. Every
    stage that trains the LLM (finetune, full-align, second_finetune,
    full-finetune) takes the finetune-proven factor — ``full-align`` in
    particular trains the LLM despite its name.
    """
    return TRAIN_TOWER_SCAN_UNROLL_ALIGN if stage in ("align", "second_align") else TRAIN_TOWER_SCAN_UNROLL


def get_video_backbone_and_transform(
    video_backbone_ids: List[str],
    image_resize_strategy: str,
    num_frames: List[int],
    scan_unroll: Optional[int] = None,
) -> Tuple[List[VideoBackbone], List[VideoTransform]]:
    """Instantiate video backbones + their per-backbone transforms.

    ``scan_unroll`` overrides the towers' layer-scan unroll factor (training
    passes ``train_tower_scan_unroll(stage)``; serving keeps the config
    default).
    """
    backbones, transforms = [], []
    for vb_id, nf in zip(video_backbone_ids, num_frames):
        if vb_id not in VIDEO_BACKBONES:
            raise ValueError(f"Video Backbone `{vb_id}` is not supported!")
        entry = VIDEO_BACKBONES[vb_id]
        vb = entry["cls"](vb_id, image_resize_strategy, num_frames=nf, **entry["kwargs"])
        if scan_unroll is not None:
            vb.scan_unroll = scan_unroll
        backbones.append(vb)
        transforms.append(vb.get_video_transform())
    return backbones, transforms


def get_llm_backbone_and_tokenizer(
    llm_backbone_id: str,
    llm_max_length: int = 2048,
    hf_token: Optional[str] = None,
    inference_mode: bool = False,
    sequence_parallel: bool = False,
    pipeline_parallel: bool = False,
    pp_microbatches: int = 0,
) -> Tuple[LLMBackbone, Any]:
    if llm_backbone_id not in LLM_BACKBONES:
        raise ValueError(f"LLM Backbone `{llm_backbone_id}` is not supported!")
    llm = LLMBackbone(
        llm_backbone_id, llm_max_length=llm_max_length, hf_token=hf_token,
        inference_mode=inference_mode, sequence_parallel=sequence_parallel,
        pipeline_parallel=pipeline_parallel, pp_microbatches=pp_microbatches,
    )
    return llm, llm.tokenizer


def get_vidlm(
    model_id: str,
    arch_specifier: str,
    feature_fusion: Optional[str],
    video_backbones: List[VideoBackbone],
    llm_backbone: LLMBackbone,
    enable_mixed_precision_training: bool = True,
    projector_token_length: int = 64,
    visual_feature_length: int = 512,
    pre_proj_layernorm: bool = False,
) -> VidLM:
    """Compose the VidLM (reference models/materialize.py:154-179)."""
    return MERV(
        model_id,
        video_backbones,
        llm_backbone,
        enable_mixed_precision_training=enable_mixed_precision_training,
        arch_specifier=arch_specifier,
        feature_fusion=feature_fusion,
        projector_token_length=projector_token_length,
        visual_feature_length=visual_feature_length,
        pre_proj_layernorm=pre_proj_layernorm,
    )
