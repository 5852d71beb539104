"""Full-model logit parity vs the PyTorch reference (the BASELINE north star).

Loads the SAME released checkpoint into both stacks and measures end-to-end
prefill-logit deltas on a fixture video:

- reference side: the mounted torch codebase at ``--reference_root``
  (load path ``merv/models/load_vid.py:49-127`` ->
  ``merv/models/vidlms/merv.py:246-299``), forward in fp32 on CPU;
- our side: ``merv_tpu.load_vid`` on the same run dir (torch ``.pt``
  checkpoints import via ``models/ckpt_import.py``; towers resolve through
  ``$MERV_TPU_TOWER_DIR`` — run ``scripts/export_towers.py`` first; base LLM
  via ``$MERV_TPU_LLM_DIR``).

Two parity layers are reported:
1. **transform parity** — each tower's preprocessing on the same decoded
   frames (the reference's eval-time ``RandomHorizontalFlipVideo(p=0.5)`` in
   the LanguageBind pipeline is forced off on BOTH sides for determinism,
   reference ``processing_video.py:72``);
2. **model parity** — the reference's pixel tensors fed into BOTH models,
   full-sequence logits compared; PASS iff max-abs delta <= --threshold
   (default 1e-2, the BASELINE.json requirement).

Expected output with real weights (v5e host with exported towers):

    {"transform_max_delta": {...each tower <= 2e-3...},
     "logit_max_abs_delta": <float>, "threshold": 0.01, "pass": true}

Without weights present the script exits 2 with a clear message (it never
falls back to random weights — that would make the check meaningless).
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import sys
from pathlib import Path


import argparse
import json
from typing import Any, Dict, List, Optional

import numpy as np


def compare_logits(ref: np.ndarray, ours: np.ndarray, threshold: float) -> Dict[str, Any]:
    """Align shapes ([B, T, V] with possibly differing padded vocab) and diff.

    The reference resizes embeddings to a multiple of 64 (llama2.py:74-76);
    both sides therefore share the padded vocab, but we guard on the overlap
    anyway so a greedy-equivalence check is still meaningful if they differ.
    """
    assert ref.ndim == ours.ndim == 3, (ref.shape, ours.shape)
    assert ref.shape[:2] == ours.shape[:2], f"sequence mismatch: {ref.shape} vs {ours.shape}"
    v = min(ref.shape[2], ours.shape[2])
    r, o = ref[..., :v].astype(np.float32), ours[..., :v].astype(np.float32)
    delta = np.abs(r - o)
    argmax_match = float(np.mean(r.argmax(-1) == o.argmax(-1)))
    return {
        "logit_max_abs_delta": float(delta.max()),
        "logit_mean_abs_delta": float(delta.mean()),
        "greedy_argmax_agreement": argmax_match,
        "threshold": threshold,
        "pass": bool(delta.max() <= threshold),
    }


def _disable_reference_eval_flip(ref_model) -> None:
    """Strip RandomHorizontalFlipVideo from reference video transforms
    (nondeterministic even at eval, reference processing_video.py:63-80)."""
    for vb in ref_model.video_backbones:
        t = getattr(vb, "video_transform", None)
        inner = getattr(t, "transform", None) or getattr(t, "transforms", None)
        chain = getattr(inner, "transforms", inner if isinstance(inner, list) else None)
        if chain is not None:
            for i, op in enumerate(list(chain)):
                if type(op).__name__ == "RandomHorizontalFlipVideo":
                    chain.remove(op)


def _reference_logits(args, frames_thw3: np.ndarray, prompt: str):
    """Torch reference forward -> (logits [1,T,V], pixel tensors, input_ids)."""
    sys.path.insert(0, str(args.reference_root))
    import torch

    from merv.models.load_vid import load_vid as ref_load_vid  # noqa: E402

    torch.manual_seed(7)
    model = ref_load_vid(str(args.run_dir), hf_token=args.hf_token)
    model = model.to(torch.float32).eval()
    _disable_reference_eval_flip(model)

    tokenizer = model.llm_backbone.tokenizer
    input_ids = tokenizer(prompt, truncation=True, return_tensors="pt").input_ids

    video = torch.from_numpy(frames_thw3.transpose(0, 3, 1, 2))  # [T, C, H, W] uint8
    num_frames = [vb.num_frames for vb in model.video_backbones]
    video_values = [
        vb.video_transform(video[:: max(num_frames) // nf]).unsqueeze(0).to(torch.float32)
        for vb, nf in zip(model.video_backbones, num_frames)
    ]
    with torch.no_grad():
        out = model(
            input_ids=input_ids,
            attention_mask=torch.ones_like(input_ids),
            video_values=video_values,
            is_image=torch.zeros(1, dtype=torch.bool),
        )
    return (
        out.logits.float().numpy(),
        [v.numpy() for v in video_values],
        input_ids.numpy(),
    )


def _our_logits(args, frames_thw3: np.ndarray, prompt: str, ref_pixels: Optional[List[np.ndarray]]):
    import jax.numpy as jnp

    from merv_tpu.models.load_vid import load_vid

    vidlm, params, model_cfg = load_vid(str(args.run_dir), get_model_cfg=True)

    tokenizer = vidlm.llm_backbone.tokenizer
    ids = tokenizer(prompt, truncation=True)["input_ids"]
    input_ids = jnp.asarray([ids], jnp.int32)
    attention_mask = jnp.ones_like(input_ids)

    # our own transform pipeline (for the transform-parity report)
    our_pixels = []
    nf = model_cfg.num_frames
    for vb, n in zip(vidlm.video_backbones, nf):
        t = vb.get_video_transform()
        our_pixels.append(np.asarray(t(frames_thw3[:: max(nf) // n]))[None])

    pixels = ref_pixels if ref_pixels is not None else our_pixels
    videos = [jnp.asarray(p, jnp.float32) for p in pixels]
    out = vidlm.forward(params, input_ids, attention_mask, videos)
    return np.asarray(out["logits"], np.float32), our_pixels


def _fixture_frames(args) -> np.ndarray:
    if args.video is not None:
        from merv_tpu.preprocessing.video_io import load_video

        return np.asarray(load_video(args.video, num_frames=args.max_frames))
    # deterministic synthetic fixture (structure gradients, not noise)
    t = np.linspace(0, 1, args.max_frames, dtype=np.float32)[:, None, None, None]
    yy, xx = np.mgrid[0:224, 0:224].astype(np.float32) / 224.0
    base = np.stack([xx, yy, (xx + yy) / 2], axis=-1)[None]
    return np.clip((base * (0.25 + 0.75 * t)) * 255, 0, 255).astype(np.uint8)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--run_dir", type=Path, required=True,
                    help="reference-format run dir: config.json + checkpoints/latest-checkpoint.pt")
    ap.add_argument("--reference_root", type=Path, default=Path("/root/reference"))
    ap.add_argument("--video", type=Path, default=None, help="fixture video (default: synthetic gradient clip)")
    ap.add_argument("--prompt", default="In: What is happening in this video?\nOut: ")
    ap.add_argument("--threshold", type=float, default=1e-2)
    ap.add_argument("--max_frames", type=int, default=32)
    ap.add_argument("--hf_token", default=None)
    ap.add_argument("--own_transforms", action="store_true",
                    help="feed each side its own preprocessing instead of the reference pixels "
                         "(measures transform+model parity jointly)")
    args = ap.parse_args()

    if not (args.reference_root / "merv").exists():
        print(f"parity_check: reference not mounted at {args.reference_root}", file=sys.stderr)
        return 2
    frames = _fixture_frames(args)

    try:
        ref_logits, ref_pixels, _ = _reference_logits(args, frames, args.prompt)
    except Exception as e:
        print(f"parity_check: reference model unavailable ({type(e).__name__}: {e}). "
              f"Real tower/LLM weights are required — this check never runs on random init.", file=sys.stderr)
        return 2
    our_logits, our_pixels = _our_logits(args, frames, args.prompt, None if args.own_transforms else ref_pixels)

    transform_delta = {
        vb_id: float(np.max(np.abs(r.astype(np.float32) - o.astype(np.float32))))
        for vb_id, r, o in zip(
            json.load(open(args.run_dir / "config.json"))["model"]["video_backbone_ids"], ref_pixels, our_pixels
        )
        if r.shape == o.shape
    }
    report = {"transform_max_delta": transform_delta, **compare_logits(ref_logits, our_logits, args.threshold)}
    print(json.dumps(report))
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
