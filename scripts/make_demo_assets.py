"""Build the committed demo asset: a genuine MP4 bitstream for quick_start.

The reference ships demo media under ``assets/`` consumed by its
``scripts/quick_start.py`` (reference scripts/quick_start.py:20-28). This
zero-egress environment cannot download media, so the asset is ENCODED
in-repo: ``merv_tpu/native/videoenc.cpp`` (same system FFmpeg dev libs as the
in-repo decoder) writes a synthetic moving-gradient MP4. The resulting file
is committed; rerun this script only to regenerate it.

The point of a real bitstream (vs the GIF fixtures tests use): quick_start
and the preprocessing path then exercise an actual container demux + MPEG-4
decode through ``load_video`` / the native decoder — the code path real
user videos take.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SRC = ROOT / "merv_tpu" / "native" / "videoenc.cpp"
TOOL = ROOT / "merv_tpu" / "native" / "videoenc"
OUT = ROOT / "assets" / "video_demo.mp4"


def main() -> None:
    OUT.parent.mkdir(exist_ok=True)
    cmd = ["g++", "-O2", "-std=c++17", "-o", str(TOOL), str(SRC),
           "-lavformat", "-lavcodec", "-lavutil"]
    subprocess.run(cmd, check=True)
    subprocess.run([str(TOOL), str(OUT), "48", "128", "8"], check=True)
    size = OUT.stat().st_size
    print(f"wrote {OUT} ({size} bytes)")
    # sanity: the repo's own loader must decode it
    sys.path.insert(0, str(ROOT))
    from merv_tpu.preprocessing.video_io import load_video

    frames = load_video(OUT, num_frames=8)
    print(f"load_video -> {frames.shape} {frames.dtype}")
    assert frames.shape[0] == 8


if __name__ == "__main__":
    main()
