"""VidLM-level prefix-caching A/B: the many-questions-per-video serving claim
measured end to end through the PRODUCT surface (``scripts/eval_openended.py``)
on the full-size 4-tower merv-full model.

Workload: ``eval_data/dummy_openended_scaled`` — 4 videos x 8 questions (the
shape of the reference's eval sets, which ask several questions per video).
Three modes, each in its own subprocess (fresh HBM) with
``--serving_passes 2``: the workload is served twice IN-PROCESS and the
reported wall is the second pass, so every mode's one-time jit compiles
(minutes through the remote-compile tunnel; cache-key-stable only while the
source tree is fixed) land in pass 1 and the number is steady-state serving
— what a full-size eval set (hundreds of questions per program set) sees:

- ``engine_shared``   — ``--use_engine --share_video_prefix``: towers + the
  [BOS | visual] prefill run ONCE per video (``register_prefix_video``);
  every question admits suffix-only against the shared KV.
- ``engine_unshared`` — ``--use_engine --share_video_prefix false``: the
  engine still retires slots per-answer, but every question pays the full
  tower + prefill pipeline.
- ``group``           — ``--batch_size 4`` group-synchronous
  ``generate_batch``: the reference-shaped serving loop (reference
  ``merv/models/vidlms/merv.py:779-830`` recomputes the full video prefill
  per question; our group path batches questions but shares nothing).

Prints ONE JSON line with questions/sec per mode and the shared/unshared +
shared/group ratios — the VidLM-level number that retires the 1.71x LLM-level
proxy (BASELINE.md "Engine prefix caching").

Requires ``runs/merv-full-randinit`` (``python scripts/make_randinit_run.py``)
— random weights: identical compute, no pretrained numerics needed for a
throughput A/B.

ENV: BENCH_VP_MAX_NEW (default 32) decode budget per question;
BENCH_VP_SLOTS (default 4) engine slots / group batch size.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
RUN = "merv-full-randinit"
DATASET = "dummy_openended_scaled"


def _run_once(mode: str, max_new: int, slots: int) -> dict:
    """One eval_openended subprocess; returns parsed serving telemetry."""
    result_dir = ROOT / "eval_result" / RUN
    if result_dir.exists():
        # stale *_done.jsonl satisfy the resume filter and the run would
        # "complete" without touching the chip
        shutil.rmtree(result_dir)
    args = [
        sys.executable, str(ROOT / "scripts" / "eval_openended.py"),
        "--model_path", RUN, "--eval_dataset", DATASET,
        "--allow_random_weights", "true", "--quantize_llm", "true",
        "--int8_kv", "true", "--max_new_tokens", str(max_new),
        "--skip_flops", "true", "--serving_passes", "2",
    ]
    # single-chip HBM budget beside the int8 7B + bf16 towers: engine slot
    # cache (slots x 2048 int8 rows) + registered video prefixes (~0.26 GiB
    # each at int8) cap prefix_budget at 2; the group path's measured
    # single-chip max is batch 2 (bsz 3+ OOMs beside the 4-tower prefill —
    # verify notes / BASELINE.md), so each mode runs its best feasible config.
    if mode == "engine_shared":
        args += ["--use_engine", "true", "--share_video_prefix", "true",
                 "--engine_slots", str(slots), "--prefix_budget", "2"]
    elif mode == "engine_unshared":
        args += ["--use_engine", "true", "--share_video_prefix", "false",
                 "--engine_slots", str(slots)]
    elif mode == "group":
        args += ["--batch_size", "2"]
    else:
        raise ValueError(mode)
    t0 = time.perf_counter()
    proc = subprocess.run(args, capture_output=True, text=True, cwd=ROOT)
    wall_total = time.perf_counter() - t0
    log = proc.stdout + proc.stderr
    if proc.returncode != 0:
        sys.stderr.write(log[-4000:])
        raise SystemExit(f"mode {mode} failed (rc={proc.returncode})")
    # the eval driver prints one machine-readable JSON line on stdout (the
    # console log line-wraps and cannot be parsed reliably)
    stats = None
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{") and "serving_wall_s" in line:
            stats = json.loads(line)
            break
    if stats is None:
        sys.stderr.write(log[-4000:])
        raise SystemExit(f"mode {mode}: no serving-wall JSON line in output")
    stats["proc_s"] = round(wall_total, 2)
    return stats


def main() -> None:
    max_new = int(os.environ.get("BENCH_VP_MAX_NEW", "32"))
    slots = int(os.environ.get("BENCH_VP_SLOTS", "4"))
    if not (ROOT / "runs" / RUN).exists():
        subprocess.run([sys.executable, str(ROOT / "scripts" / "make_randinit_run.py")],
                       check=True, cwd=ROOT)
    out = {"dataset": DATASET, "max_new_tokens": max_new, "slots": slots}
    for mode in ("engine_shared", "engine_unshared", "group"):
        # one subprocess per mode; --serving_passes 2 inside it makes the
        # reported wall the steady-state second pass
        out[mode] = _run_once(mode, max_new, slots)
    qs = {m: out[m]["questions_per_sec"] for m in ("engine_shared", "engine_unshared", "group")}
    out["shared_vs_unshared"] = round(qs["engine_shared"] / qs["engine_unshared"], 3)
    out["shared_vs_group"] = round(qs["engine_shared"] / qs["group"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
