"""Dataset download driver (parity: reference ``scripts/preprocess.py``).

Run with: ``python scripts/preprocess.py --dataset_id <DATASET_ID>``
"""

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from pathlib import Path


from dataclasses import dataclass
from pathlib import Path

import merv_tpu.conf.registry as draccus
from merv_tpu.overwatch import initialize_overwatch
from merv_tpu.preprocessing.download import convert_to_jpg, download_extract

overwatch = initialize_overwatch(__name__)


@dataclass
class PreprocessConfig:
    # fmt: off
    dataset_id: str = "llava-v1.5-instruct"     # Dataset to fetch (see merv_tpu/preprocessing/download.py)
    root_dir: Path = Path("data")               # Root directory for datasets
    # fmt: on


@draccus.wrap()
def preprocess(cfg: PreprocessConfig) -> None:
    overwatch.info(f"Downloading & Extracting `{cfg.dataset_id}` to `{cfg.root_dir / 'download'}`")
    download_extract(cfg.dataset_id, root_dir=cfg.root_dir)

    # OCR-VQA images ship as GIF/PNG; the annotations expect JPG
    if cfg.dataset_id == "llava-v1.5-instruct":
        convert_to_jpg(cfg.root_dir / "download" / cfg.dataset_id / "ocr_vqa" / "images")


if __name__ == "__main__":
    preprocess()
