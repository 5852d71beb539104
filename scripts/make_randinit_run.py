"""Create a random-init full-size run directory for offline serving smoke tests.

Writes runs/merv-full-randinit/ with the real merv-full config.json and a
random projector+fusion checkpoint, so the eval CLI can exercise the complete
serving path (load_vid -> batched generate -> chunk/merge/score) on hardware
without any downloaded weights:

    python scripts/make_randinit_run.py
    python scripts/eval_mcq.py --model_path merv-full-randinit \
        --eval_dataset dummy_mcq --batch_size 2 --max_new_tokens 16 \
        --allow_random_weights true --quantize_llm true

Outputs are meaningless (random weights) — this certifies the PATH, not the
model. --quantize_llm is required single-chip (bf16 7B does not fit 16 GB).
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from pathlib import Path


import json

import jax


def main() -> None:
    run_dir = Path("runs/merv-full-randinit")
    (run_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
    model_cfg = {
        "model_id": "merv-full",
        "arch_specifier": "3davg+linear",
        "feature_fusion": "cross_attention_avg_lq",
        "video_backbone_ids": [
            "languagebind-video-noclass", "dinov2-video-all-tokens",
            "vivit-google-b-all-no-cls-16frames", "siglip-vit-b16-224px-all-no-cls",
        ],
        "llm_backbone_id": "llama2-7b-pure",
        "image_resize_strategy": "resize-naive",
        "llm_max_length": 2048,
        "num_frames": [16, 16, 32, 16],
        "projector_token_length": 64,
        "visual_feature_length": 1024,
    }
    (run_dir / "config.json").write_text(json.dumps({"model": model_cfg}))

    from merv_tpu.models.materialize import (
        get_llm_backbone_and_tokenizer,
        get_video_backbone_and_transform,
        get_vidlm,
    )
    from merv_tpu.training.checkpointing import save_checkpoint

    towers, _ = get_video_backbone_and_transform(
        model_cfg["video_backbone_ids"],
        image_resize_strategy="resize-naive", num_frames=model_cfg["num_frames"],
    )
    llm, _tok = get_llm_backbone_and_tokenizer(
        model_cfg["llm_backbone_id"], llm_max_length=2048, inference_mode=True
    )
    vidlm = get_vidlm(
        model_cfg["model_id"], model_cfg["arch_specifier"], model_cfg["feature_fusion"],
        towers, llm,
        projector_token_length=model_cfg["projector_token_length"],
        visual_feature_length=model_cfg["visual_feature_length"],
    )
    # init only the trainables, on host (no need to materialize the 7B LLM)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    shapes = jax.eval_shape(lambda: vidlm.init(jax.random.PRNGKey(0)))
    sub = {k: shapes[k] for k in ("projectors", "feature_fusion")}
    params = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(jax.random.PRNGKey(0), s.shape, jnp.float32) * 0.02).astype(s.dtype),
        sub,
    )
    save_checkpoint(run_dir, 1, 0, 9.9, params, ["projectors", "feature_fusion"])
    print(f"run dir ready: {run_dir}")


if __name__ == "__main__":
    main()
