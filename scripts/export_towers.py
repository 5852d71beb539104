"""Export pretrained vision-tower weights to $MERV_TPU_TOWER_DIR safetensors.

The reference pulls tower weights at model-build time from timm
(``merv/models/backbones/video/dinov2_video.py:40-45``, ``siglip.py:53-58``),
HF transformers (``vivit.py:42-47``), the vendored LanguageBind loader
(``languagebind/__init__.py:60-63``) and torch hub (``hiera.py:22-29``).
TPU serving hosts are often air-gapped, so this script converts each torch
checkpoint ONCE into ``{identifier}.safetensors`` files that
:func:`merv_tpu.models.backbones.video.vision_import.load_pretrained_tower`
resolves locally. The stored keys are the ORIGINAL torch state-dict names —
the JAX mapping happens at load time, so one export serves every token-mode
variant of a tower family.

Usage:
    python scripts/export_towers.py --out /path/to/towers \
        --towers languagebind-video-noclass dinov2-video-all-tokens \
                 vivit-google-b-all-no-cls-16frames siglip-vit-b16-224px-all-no-cls \
        [--source languagebind=/path/to/LanguageBind_Video_merge_snapshot] \
        [--source hiera=/path/to/hiera_base_plus_16x224.mae_k400.pth] \
        [--online]

Sources per family (local path always wins; network only with --online):
- dinov2 / siglip: timm checkpoint cache (or hub with --online)
- vivit:           HF transformers cache (or hub with --online)
- languagebind:    an HF snapshot dir (safetensors / pytorch_model.bin) or a
                   raw torch checkpoint; keys filtered to ``vision_model.*``
- hiera:           original-repo ``.pth`` (torch hub layout, ``model_state``)
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from pathlib import Path


import argparse
import os
from typing import Dict

from merv_tpu.models.backbones.video.vision_import import (
    extract_hiera_state,
    extract_languagebind_state,
    to_numpy_state,
)
from merv_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

DEFAULT_TOWERS = [
    "languagebind-video-noclass",
    "dinov2-video-all-tokens",
    "vivit-google-b-all-no-cls-16frames",
    "siglip-vit-b16-224px-all-no-cls",
    "hiera-base-plus-video",
]


def _family(identifier: str) -> str:
    for fam in ("languagebind", "dinov2", "vivit", "siglip", "hiera"):
        if identifier.startswith(fam):
            return fam
    raise ValueError(f"unknown tower family for {identifier}")


def export_tower(identifier: str, out_dir: Path, sources: Dict[str, str], online: bool) -> Path:
    from merv_tpu.models.materialize import get_video_backbone_and_transform

    fam = _family(identifier)
    (backbone,), _ = get_video_backbone_and_transform([identifier], image_resize_strategy="resize-naive")

    if fam == "languagebind":
        state = extract_languagebind_state(sources.get(fam), online)
    elif fam == "hiera":
        state = extract_hiera_state(sources.get(fam), online)
    elif fam == "vivit":
        from transformers import VivitModel

        model = VivitModel.from_pretrained(backbone.huggingface_path_or_url, local_files_only=not online)
        state = to_numpy_state(model.state_dict())
    else:  # dinov2 / siglip via timm
        import timm

        if not online:
            os.environ.setdefault("HF_HUB_OFFLINE", "1")
        model = timm.create_model(backbone.timm_path_or_url, pretrained=True)
        state = to_numpy_state(model.state_dict())

    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"{identifier}.safetensors"
    from safetensors.numpy import save_file

    save_file(state, str(out_path))

    # round-trip validation through the real load path
    os.environ["MERV_TPU_TOWER_DIR"] = str(out_dir)
    from merv_tpu.models.backbones.video.vision_import import load_pretrained_tower

    params = load_pretrained_tower(backbone)
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    overwatch.info(f"exported {identifier}: {len(state)} tensors -> {out_path} ({n / 1e6:.1f}M params verified)")
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--out", type=Path, default=Path(os.environ.get("MERV_TPU_TOWER_DIR", "towers")))
    ap.add_argument("--towers", nargs="+", default=DEFAULT_TOWERS)
    ap.add_argument("--source", action="append", default=[], metavar="FAMILY=PATH",
                    help="local checkpoint override, e.g. languagebind=/ckpts/LanguageBind_Video_merge")
    ap.add_argument("--online", action="store_true", help="allow network fetch from HF hub / torch hub")
    args = ap.parse_args()

    sources = dict(s.split("=", 1) for s in args.source)
    failures = []
    for ident in args.towers:
        try:
            export_tower(ident, args.out, sources, args.online)
        except Exception as e:
            overwatch.error(f"export failed for {ident}: {type(e).__name__}: {e}")
            failures.append(ident)
    if failures:
        raise SystemExit(f"failed towers: {failures}")
    overwatch.info(f"all towers exported; set MERV_TPU_TOWER_DIR={args.out}")


if __name__ == "__main__":
    main()
