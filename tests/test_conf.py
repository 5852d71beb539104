"""Config system tests: registry round-trips, CLI overrides, schema parity."""

import json

from merv_tpu.conf import ModelConfig, ModelRegistry
from merv_tpu.conf.models import MERV_Base
from merv_tpu.conf.registry import build_config, decode, encode


def test_registry_contains_reference_variants():
    # ids must match reference merv/conf/models.py registrations
    for mid in ["merv-base", "merv-full", "languagebind-single", "dinov2-single", "vivit-single", "siglip-single"]:
        cls = ModelConfig.get_choice_class(mid)
        cfg = cls()
        assert cfg.model_id == mid


def test_merv_base_defaults_match_reference():
    cfg = MERV_Base()
    assert cfg.arch_specifier == "no-align+3davg+linear"
    assert cfg.feature_fusion == "cross_attention_avg_lq"
    assert cfg.video_backbone_ids == [
        "languagebind-video-noclass",
        "dinov2-video-all-tokens",
        "vivit-google-b-all-no-cls-16frames",
        "siglip-vit-b16-224px-all-no-cls",
    ]
    assert cfg.llm_backbone_id == "llama2-7b-pure"
    assert cfg.num_frames == [16, 16, 32, 16]
    assert cfg.projector_token_length == 64
    assert cfg.visual_feature_length == 1024
    assert cfg.align_global_batch_size == 256
    assert cfg.align_per_device_batch_size == 16
    assert cfg.align_learning_rate == 1e-3
    assert cfg.finetune_learning_rate == 2e-5
    assert cfg.align_train_strategy == "fsdp-shard-grad-op"
    assert cfg.finetune_train_strategy == "fsdp-full-shard"
    assert cfg.llm_max_length == 2048


def test_num_frames_int_inflation():
    cfg = MERV_Base(num_frames=8)
    assert cfg.num_frames == [8, 8, 8, 8]


def test_encode_decode_roundtrip():
    cfg = ModelConfig.get_choice_class("merv-full")()
    blob = json.dumps(encode(cfg))
    restored = decode(ModelConfig, json.loads(blob))
    assert restored == cfg
    assert restored.model_id == "merv-full"


def test_decode_ignores_unknown_keys():
    data = encode(MERV_Base())
    data["some_legacy_field"] = 123
    restored = decode(ModelConfig, data)
    assert restored.model_id == "merv-base"


def test_cli_overrides():
    from dataclasses import dataclass, field

    @dataclass
    class Top:
        model: ModelConfig = field(default_factory=MERV_Base)
        seed: int = 7
        run_id: str = "test"

    cfg = build_config(
        Top,
        {
            "model.type": "merv-full",
            "model.num_frames": "[8,8,16,8]",
            "model.align_learning_rate": "5e-4",
            "seed": "42",
        },
    )
    assert cfg.model.model_id == "merv-full"
    assert cfg.model.num_frames == [8, 8, 16, 8]
    assert cfg.model.align_learning_rate == 5e-4
    assert cfg.seed == 42


def test_cli_entry_points_parse_string_annotations():
    """Every script uses `from __future__ import annotations`, so the
    @wrap()-ed entry point's config annotation arrives as a STRING — the
    decorator must resolve it or `python scripts/<any>.py --help` crashes
    (it did: tests had only ever passed cfg= directly, bypassing the CLI)."""
    import pytest

    import scripts.eval_mcq as mcq
    import scripts.eval_openended as oe
    import scripts.pretrain_video as ptv

    for entry in (mcq.evaluate, oe.evaluate, ptv.pretrain):
        with pytest.raises(SystemExit):  # --help prints and exits cleanly
            entry(args=["--help"])

    # a real flag round-trips through the CLI parser into the dataclass
    with pytest.raises(FileNotFoundError):
        mcq.evaluate(args=["--eval_dataset", "no_such_dataset", "--batch_size", "2"])
