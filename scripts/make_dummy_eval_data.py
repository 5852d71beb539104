"""Generate the dummy eval fixtures (analogue of the reference's
``eval_data/dummy_mcq`` / ``dummy_openended`` sanity-check sets,
reference ``EVALUATION.md:8-39``) with synthetic solid-color videos.

Run once to (re)create eval_data/; the fixtures are committed so tests and the
eval drivers work out of the box.
"""

from __future__ import annotations

from pathlib import Path


import json
from pathlib import Path

import numpy as np
from PIL import Image

COLORS = {
    "red": (220, 40, 40),
    "green": (40, 200, 70),
    "blue": (40, 80, 220),
}


def make_video(path: Path, color: str, frames: int = 8, size: int = 64) -> None:
    rgb = COLORS[color]
    rng = np.random.RandomState(sum(rgb))
    imgs = []
    for _ in range(frames):
        arr = np.zeros((size, size, 3), np.uint8)
        arr[..., 0], arr[..., 1], arr[..., 2] = rgb
        arr = np.clip(arr.astype(int) + rng.randint(-12, 12, arr.shape), 0, 255).astype(np.uint8)
        imgs.append(Image.fromarray(arr))
    imgs[0].save(path, save_all=True, append_images=imgs[1:], duration=100)


def main(root: Path = Path("eval_data")) -> None:
    # --- dummy_mcq ---
    mcq = root / "dummy_mcq"
    (mcq / "videos").mkdir(parents=True, exist_ok=True)
    questions, answers = [], []
    options = ["red", "green", "blue"]
    for i, color in enumerate(["red", "green", "blue", "red", "blue", "green"]):
        vid = f"color_{i}"
        make_video(mcq / "videos" / f"{vid}.gif", color)
        questions.append(
            {
                "video_name": vid,
                "num_option": 3,
                "question_id": f"dummy_mcq_{i}",
                "options": options,
                "question": "Which color dominates this video?",
            }
        )
        answers.append(
            {
                "video_name": vid,
                "question_id": f"dummy_mcq_{i}",
                "answer_id": options.index(color),
                "answer": color,
            }
        )
    (mcq / "test_q.json").write_text(json.dumps(questions, indent=1))
    (mcq / "test_a.json").write_text(json.dumps(answers, indent=1))

    # --- dummy_openended ---
    oe = root / "dummy_openended"
    (oe / "videos").mkdir(parents=True, exist_ok=True)
    questions, answers = [], []
    for i, color in enumerate(["red", "green", "blue"]):
        vid = f"scene_{i}"
        make_video(oe / "videos" / f"{vid}.gif", color)
        questions.append(
            {
                "video_name": vid,
                "question_id": f"dummy_oe_{i}",
                "question": "Describe the dominant color of the video.",
            }
        )
        answers.append(
            {"video_name": vid, "question_id": f"dummy_oe_{i}", "answer": f"The video is mostly {color}."}
        )
    (oe / "test_q.json").write_text(json.dumps(questions, indent=1))
    (oe / "test_a.json").write_text(json.dumps(answers, indent=1))

    # --- dummy_openended_scaled: the many-questions-per-video serving shape
    # (reference eval sets ask several questions per video) — 4 videos x 8
    # questions, sized for the VidLM-level prefix-caching A/B
    # (scripts/bench_vidlm_prefix.py)
    oes = root / "dummy_openended_scaled"
    (oes / "videos").mkdir(parents=True, exist_ok=True)
    questions, answers = [], []
    qtexts = [
        "Describe the dominant color of the video.",
        "What color fills most of the frame?",
        "Is the scene mostly warm or cool in tone?",
        "Summarize what this video shows.",
        "Does the color change over time?",
        "Name the primary hue visible here.",
        "How would you caption this clip?",
        "What single word best describes the footage?",
    ]
    for i, color in enumerate(["red", "green", "blue", "red"]):
        vid = f"scene_{i}"
        make_video(oes / "videos" / f"{vid}.gif", color)
        for j, qt in enumerate(qtexts):
            qid = f"dummy_oes_{i}_{j}"
            questions.append({"video_name": vid, "question_id": qid, "question": qt})
            answers.append(
                {"video_name": vid, "question_id": qid, "answer": f"The video is mostly {color}."}
            )
    (oes / "test_q.json").write_text(json.dumps(questions, indent=1))
    (oes / "test_a.json").write_text(json.dumps(answers, indent=1))
    print(f"Wrote dummy eval fixtures under {root}/")


if __name__ == "__main__":
    main()
