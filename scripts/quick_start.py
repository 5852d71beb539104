"""Canonical inference example (parity: reference ``scripts/quick_start.py``)."""

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from pathlib import Path

from merv_tpu.models.load_vid import load_vid


def main() -> None:
    # Load a pretrained VidLM (local run dir under runs/, or registry id like "merv-full")
    model_path = "merv-full"
    vidlm, params, model_cfg = load_vid(model_path, get_model_cfg=True)

    # Build a prompt with the model's chat template
    prompt_builder = vidlm.llm_backbone.prompt_builder_fn(model_family="merv")
    prompt_builder.add_turn(role="human", message="What is happening in this video?")
    prompt_text = prompt_builder.get_prompt()

    # Generate from a video file
    video_path = Path("assets/video_demo.mp4")
    generated_text = vidlm.generate(
        params,
        video_path,
        prompt_text,
        do_sample=False,
        max_new_tokens=512,
        num_frames=model_cfg.num_frames,
    )
    print(generated_text)


if __name__ == "__main__":
    main()
