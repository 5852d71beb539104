"""Host input-pipeline benchmark: video decode + per-encoder transforms.

Measures the per-worker host-side cost of producing ONE training/eval sample
for the 4-encoder merv-full config: native C++ decode (indexed seek, 32-frame
uniform sample — the max across encoders) plus all four per-encoder
host-geometry transforms. Reports samples/sec/worker and how many dataloader
workers are needed to keep up with the measured device prefill rate — the
check that the pipeline (reference: decord + 2 torch workers,
``merv/preprocessing/datasets/datasets.py:344-354``) does not starve the TPU.

Usage: python scripts/bench_loader.py [--seconds 10] (measurement window)
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import time
from pathlib import Path


import json
import os

import numpy as np

DEVICE_VIDEOS_PER_SEC = 5.6  # measured merv-full prefill rate (BASELINE.md)


def make_fixture(path: Path, seconds: int = 10, fps: int = 30, size: int = 320) -> Path:
    """Synthesize a realistic test clip (moving gradient, mp4v)."""
    import cv2

    if path.exists():
        return path
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (size, size))
    assert w.isOpened(), "cv2 VideoWriter unavailable"
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for t in range(seconds * fps):
        frame = np.stack(
            [
                (127 + 127 * np.sin(6.28 * (xx + t / 40.0))),
                (127 + 127 * np.cos(6.28 * (yy - t / 55.0))),
                np.full_like(xx, (t * 3) % 255),
            ],
            axis=-1,
        ).astype(np.uint8)
        w.write(frame)
    w.release()
    return path


def main() -> None:
    import argparse

    from merv_tpu.models.materialize import get_video_backbone_and_transform
    from merv_tpu.preprocessing.video_io import load_video

    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0, help="measurement window")
    args = ap.parse_args()

    fixture = make_fixture(Path(os.environ.get("BENCH_LOADER_VIDEO", "/tmp/bench_loader.mp4")))

    ids = [
        "languagebind-video-noclass", "dinov2-video-all-tokens",
        "vivit-google-b-all-no-cls-16frames", "siglip-vit-b16-224px-all-no-cls",
    ]
    frames = [16, 16, 32, 16]
    backbones, transforms = get_video_backbone_and_transform(
        ids, image_resize_strategy="resize-naive", num_frames=frames,
    )

    def one_sample():
        video = load_video(str(fixture), num_frames=max(frames))  # [32, H, W, C] uint8
        outs = []
        for tf, nf in zip(transforms, frames):
            sub = video[:: max(frames) // nf]
            outs.append(tf.host_geometry(sub))
        return outs

    one_sample()  # warm caches (decoder index, any lazy init)
    n = 0
    t0 = time.perf_counter()
    while (dt := time.perf_counter() - t0) < args.seconds:
        one_sample()
        n += 1
    rate = n / dt
    workers = DEVICE_VIDEOS_PER_SEC / rate
    print(json.dumps({
        "metric": "host pipeline samples/sec/worker (decode 32f + 4 transforms)",
        "value": round(rate, 2), "unit": "samples/sec",
        "workers_to_saturate_device": round(workers, 1),
    }))


if __name__ == "__main__":
    main()
