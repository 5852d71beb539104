"""Offline batch serving CLI: continuous batching over a request file.

The reference has no serving entry point at all — its inference story is the
bs=1 ``scripts/generate.py``-style REPL via HF generate (reference
``merv/models/vidlms/merv.py:779-830``). This driver serves a JSONL of
requests through the continuous-batching engine (per-slot KV pointers, one
compiled decode program) with optional batched speculative decoding, and
writes a results JSONL.

Request file: one JSON object per line:
    {"request_id": "q1", "prompt": "In: what happens?\\nOut: ",
     "video": "path/to/clip.mp4",        # optional; null/absent = text-only
     "max_new_tokens": 128}               # optional, default --max_new_tokens

Usage:
    python scripts/serve.py --model_path runs/<run-id> --requests reqs.jsonl \
        --output out.jsonl --slots 4 --quantize_llm true [--speculative 4]
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Union


from merv_tpu.util.cache import enable_compile_cache

enable_compile_cache()

import merv_tpu.conf.registry as draccus
from merv_tpu.models.generation import GenerationConfig
from merv_tpu.models.load_vid import load_vid
from merv_tpu.overwatch import initialize_overwatch
from merv_tpu.serving import ContinuousBatchingEngine, Request

overwatch = initialize_overwatch(__name__)


@dataclass
class ServeConfig:
    # fmt: off
    model_path: Union[str, Path] = "merv-full"
    requests: Path = Path("requests.jsonl")
    output: Path = Path("serve_results.jsonl")

    slots: int = 4                       # concurrent decode slots
    max_len: int = 4096                  # per-slot prompt+output bound
    steps_per_sync: int = 8              # decode steps between host syncs
    max_new_tokens: int = 128            # default per-request budget
    do_sample: bool = False
    temperature: float = 1.0
    top_p: float = 1.0
    min_length: int = 1

    quantize_llm: bool = False           # weight-only int8 LLM (fits 7B on one v5e)
    int8_kv: bool = False                # int8 KV cache
    speculative: int = 0                 # batched prompt-lookup speculation: draft length gamma
    speculative_ngram: int = 2
    speculative_autodisable: bool = True  # two-way monitor: plain decode below break-even,
    #                                     # re-enable (gamma from the measured cost curve)
    #                                     # when the trailing acceptance estimate recovers
    share_video_prefix: bool = True      # one tower+prefix prefill per distinct video
    prefix_budget: int = 4               # max simultaneously registered prefixes (HBM)
    resume: bool = True                  # skip request_ids already in --output
    allow_random_weights: bool = False   # structure/throughput testing ONLY
    # fmt: on


@draccus.wrap()
def serve(cfg: ServeConfig) -> None:
    local_run = Path("runs") / str(cfg.model_path)
    src = str(local_run) if local_run.exists() else str(cfg.model_path)
    vidlm, params = load_vid(
        src, allow_random_weights=cfg.allow_random_weights, quantize_llm=cfg.quantize_llm
    )

    # resume protocol (mirrors the eval drivers' jsonl resume, reference
    # scripts/eval_openended.py chunk/merge/resume): results append line-by-
    # line THE MOMENT each request finishes, so a crash mid-run loses at most
    # the in-flight slots; rerunning skips everything already on disk
    done: set = set()
    if cfg.resume and Path(cfg.output).exists():
        with open(cfg.output) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        done.add(str(json.loads(line)["request_id"]))
                    except (json.JSONDecodeError, KeyError):
                        continue  # torn final line from a crash — rewrite it
        if done:
            overwatch.info(f"Resuming: {len(done)} results already in {cfg.output}")

    tok = vidlm.llm_backbone.tokenizer
    stop = vidlm.llm_backbone.stop_token_id
    out_f = open(cfg.output, "a" if cfg.resume else "w")
    totals = {"tokens": 0, "errors": 0}

    def write_result(res) -> None:
        ids = res.token_ids.tolist()
        if stop in ids:
            ids = ids[: ids.index(stop)]
        totals["tokens"] += len(ids)
        rec = {
            "request_id": res.request_id,
            "text": tok.decode(ids, skip_special_tokens=True).strip(),
            "finish_reason": res.finish_reason,
            "num_tokens": len(ids),
        }
        if res.finish_reason == "error":
            rec["error"] = res.error
            totals["errors"] += 1
        out_f.write(json.dumps(rec) + "\n")
        out_f.flush()

    gcfg = GenerationConfig(
        max_new_tokens=cfg.max_new_tokens, do_sample=cfg.do_sample,
        temperature=cfg.temperature, top_p=cfg.top_p, min_length=cfg.min_length,
        eos_token_id=vidlm.llm_backbone.stop_token_id,
        pad_token_id=vidlm.llm_backbone.pad_token_id,
        kv_cache_dtype="int8" if cfg.int8_kv else None,
    )
    engine = ContinuousBatchingEngine.for_vidlm(
        vidlm, params, slots=cfg.slots, max_len=cfg.max_len,
        steps_per_sync=cfg.steps_per_sync, config=gcfg,
        speculative_gamma=cfg.speculative, speculative_ngram=cfg.speculative_ngram,
        speculative_autodisable=cfg.speculative_autodisable,
        result_callback=write_result,
    )

    n, skipped = 0, 0
    pending = []
    video_counts: dict = {}
    with open(cfg.requests) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            rid = str(r.get("request_id", n + skipped))
            if rid in done:
                skipped += 1
                continue
            pending.append((rid, r))
            vid = r.get("video")
            if isinstance(vid, str):
                video_counts[vid] = video_counts.get(vid, 0) + 1
            n += 1

    # Prefix caching: eval sets ask several questions per video (the
    # reference recomputes towers + the full video prefill per question,
    # reference merv/models/vidlms/merv.py:779-830); register each repeated
    # video ONCE so its requests admit suffix-only. Prefixes are device
    # buffers (~0.27 GB each at 7B int8 / 1025 rows), so registration runs in
    # WAVES of --prefix_budget with unregister after each wave — hundreds of
    # distinct videos never exceed budget x prefix HBM. A video whose prefix
    # build fails (corrupt file) falls back to normal requests — the engine
    # then fails those per-request, preserving fault isolation.
    def submit_plain(rid: str, r: dict) -> None:
        engine.submit(Request(
            request_id=rid,
            prompt_text=r["prompt"],
            video=r.get("video"),
            max_new_tokens=int(r.get("max_new_tokens", cfg.max_new_tokens)),
        ))

    overwatch.info(
        f"Serving {n} requests on {cfg.slots} slots"
        + (f" ({skipped} already done, skipped)" if skipped else "")
    )
    t0 = time.perf_counter()
    if cfg.share_video_prefix:
        shared_videos = [v for v, c in video_counts.items() if c >= 2]
        by_video: dict = {v: [] for v in shared_videos}
        rest = []
        for rid, r in pending:
            vid = r.get("video")
            if isinstance(vid, str) and vid in by_video:
                by_video[vid].append((rid, r))
            else:
                rest.append((rid, r))
        if shared_videos:
            overwatch.info(
                f"{len(shared_videos)} videos shared by "
                f"{sum(len(v) for v in by_video.values())} requests — serving in "
                f"waves of {cfg.prefix_budget} prefixes"
            )
        budget = max(cfg.prefix_budget, 1)
        for w in range(0, len(shared_videos), budget):
            wave = shared_videos[w : w + budget]
            live = []
            for vid in wave:
                pid = f"video:{vid}"
                try:
                    engine.register_prefix_video(pid, vid)
                except Exception as e:
                    overwatch.warning(
                        f"prefix build failed for {vid} ({type(e).__name__}: {e}) "
                        f"— its {len(by_video[vid])} requests serve un-shared"
                    )
                    rest.extend(by_video[vid])
                    continue
                live.append(pid)
                for rid, r in by_video[vid]:
                    engine.submit(Request(
                        request_id=rid, prompt_text=r["prompt"], prefix_id=pid,
                        max_new_tokens=int(r.get("max_new_tokens", cfg.max_new_tokens)),
                    ))
            engine.run()
            for pid in live:
                engine.unregister_prefix(pid)
        for rid, r in rest:
            submit_plain(rid, r)
    else:
        for rid, r in pending:
            submit_plain(rid, r)
    engine.run()  # rest / un-shared requests (prefix waves already ran above)
    wall = time.perf_counter() - t0
    out_f.close()

    s = engine.stats
    overwatch.info(
        f"Served {n} requests in {wall:.1f}s ({totals['tokens'] / max(wall, 1e-9):.1f} tok/s) — "
        f"slot utilization {s.slot_utilization:.1%}, {s.prefills} prefills, "
        f"{s.decode_chunks} chunks"
        + (f", {s.prefix_admissions} suffix-only admissions" if s.prefix_admissions else "")
        + (f", {s.errors} failed (finish_reason=error)" if s.errors else "")
        + (f", {s.tokens_per_step:.2f} tokens/verify-step" if cfg.speculative else "")
    )
    # phase attribution (the same telemetry the eval drivers emit): admit_s
    # includes first-invocation jit compiles on a cold process — see
    # BASELINE.md "Round 5" on separating compile cost from steady serving
    ttft = sorted(s.ttft_s)
    overwatch.info(
        f"Phases: admit {s.admit_s:.2f}s, decode {s.decode_s:.2f}s, "
        f"prefill stall share {s.prefill_stall_share:.3f}"
        + (f", ttft p50 {1e3 * ttft[len(ttft) // 2]:.0f}ms" if ttft else "")
    )
    overwatch.info(f"Results -> {cfg.output}")


if __name__ == "__main__":
    serve()
