"""Serving-mode benchmark: continuous batching vs group-synchronous decode,
and speculative-verify step overhead.

Workload: R requests with mixed answer budgets (the regime continuous
batching exists for — the reference's HF path and our own ``generate_batch``
pad every group to its slowest member). Random weights never emit EOS, so
per-request ``max_new_tokens`` plays the role of the answer length —
deterministic and reproducible.

Reports one JSON line:
- ``group_tok_s``: group-synchronous batched generate (batch = slots,
  every group decodes to its max budget) — the round-2 serving baseline;
- ``engine_tok_s``: the continuous-batching engine on the same workload;
- ``engine_util``: fraction of decode slot-steps spent on live requests;
- ``spec_step_overhead``: time of a gamma+1 speculative verify step over a
  plain decode step (the "verification is free" claim — HBM-bound decode
  should give ~1.0x);
- ``spec_tokens_per_step``: realized acceptance on this workload (random
  weights: whatever greedy cycles produce; real weights: workload-dependent).

ENV: BENCH_LLM_LAYERS (default 16), BENCH_SLOTS (4), BENCH_REQUESTS (16),
BENCH_STEPS_PER_SYNC (8), BENCH_GAMMA (4), BENCH_INT8 / BENCH_INT8_KV.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from merv_tpu.util.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_model, make_bench_params  # noqa: E402
from merv_tpu.models.generation import GenerationConfig, generate  # noqa: E402
from merv_tpu.serving.engine import ContinuousBatchingEngine, Request  # noqa: E402


def _workload(n_requests: int, max_len: int, seed: int = 0):
    """Mixed prompt lengths + answer budgets (deterministic)."""
    rng = np.random.RandomState(seed)
    reqs = []
    for i in range(n_requests):
        plen = int(rng.choice([12, 24, 40, 56]))
        budget = int(rng.choice([8, 16, 48, 96]))
        assert plen + budget <= max_len
        ids = rng.randint(4, 1000, (plen,)).astype(np.int32)
        reqs.append(Request(f"r{i}", input_ids=ids, max_new_tokens=budget))
    return reqs


def _phase(phase: str) -> dict:
    """Run ONE measurement phase in this process and return its partials.

    Phases run in separate subprocesses at full depth: one phase's compiled
    programs + donated buffers left on the chip can push the next phase over
    the HBM edge (observed: group baseline then engine RESOURCE_EXHAUSTED at
    depth 32 int8) — the same poisoning bench.py isolates its fallback
    configs against.
    """
    on_cpu = jax.devices()[0].platform == "cpu"
    layers = int(os.environ.get("BENCH_LLM_LAYERS", "16"))
    slots = int(os.environ.get("BENCH_SLOTS", "4"))
    n_requests = int(os.environ.get("BENCH_REQUESTS", "16"))
    steps_per_sync = int(os.environ.get("BENCH_STEPS_PER_SYNC", "8"))
    gamma = int(os.environ.get("BENCH_GAMMA", "4"))
    int8 = os.environ.get("BENCH_INT8", "0") == "1"
    int8_kv = os.environ.get("BENCH_INT8_KV", "0") == "1"

    model = build_model(layers, tiny=on_cpu)
    decoder = model.llm_backbone.decoder
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    params = make_bench_params(shapes, int8=int8)["llm_backbone"]

    max_len = 160
    gcfg = GenerationConfig(
        max_new_tokens=96, eos_token_id=2, pad_token_id=0,
        kv_cache_dtype="int8" if int8_kv else None,
    )
    reqs = _workload(n_requests, max_len)
    total_tokens = sum(r.max_new_tokens for r in reqs)
    out = {
        "layers": layers, "slots": slots, "requests": n_requests,
        "total_new_tokens": total_tokens, "int8": int8, "int8_kv": int8_kv,
        "platform": jax.devices()[0].platform,
    }

    # --- group-synchronous baseline: batch = slots, decode to the group max
    def run_group() -> float:
        t0 = time.perf_counter()
        for s in range(0, len(reqs), slots):
            group = reqs[s : s + slots]
            gmax = max(r.max_new_tokens for r in group)
            plen = max(len(r.input_ids) for r in group)
            plen = -(-plen // 16) * 16
            ids = np.zeros((slots, plen), np.int32)
            mask = np.zeros((slots, plen), np.int32)
            for b, r in enumerate(group):
                ids[b, : len(r.input_ids)] = r.input_ids
                mask[b, : len(r.input_ids)] = 1
            cfg_g = GenerationConfig(
                max_new_tokens=gmax, eos_token_id=2, pad_token_id=0,
                kv_cache_dtype=gcfg.kv_cache_dtype,
            )
            toks = generate(
                decoder, params, input_ids=jnp.asarray(ids),
                attention_mask=jnp.asarray(mask), config=cfg_g,
            )
            toks.block_until_ready()
        return time.perf_counter() - t0

    # --- continuous batching engine (fresh engine per timed run: state resets)
    def run_engine(spec: int):
        eng = ContinuousBatchingEngine(
            decoder, params, slots=slots, max_len=max_len,
            steps_per_sync=steps_per_sync, config=gcfg, length_bucket=16,
            speculative_gamma=spec,
        )
        t0 = time.perf_counter()
        eng.run(list(reqs))
        return time.perf_counter() - t0, eng.stats

    if phase == "group":
        run_group()  # compile
        out["group_s"] = min(run_group() for _ in range(2))
    elif phase == "engine":
        run_engine(0)  # compile
        engine_s, stats = min((run_engine(0) for _ in range(2)), key=lambda x: x[0])
        out.update(engine_s=engine_s, engine_decode_steps=stats.decode_steps,
                   engine_util=round(stats.slot_utilization, 3))
    elif phase == "spec":
        run_engine(gamma)  # compile
        spec_s, spec_stats = min((run_engine(gamma) for _ in range(2)), key=lambda x: x[0])
        out.update(spec_s=spec_s, spec_decode_steps=spec_stats.decode_steps,
                   spec_tokens_per_step=round(spec_stats.tokens_per_step, 3))
    else:
        raise ValueError(f"unknown BENCH_PHASE {phase!r}")
    return out


def main() -> None:
    phase = os.environ.get("BENCH_PHASE", "all")
    if phase != "all":
        print(json.dumps(_phase(phase)))
        return

    # orchestrate: one subprocess per phase (fresh device state each)
    import subprocess

    parts = {}
    for ph in ("group", "engine", "spec"):
        env = dict(os.environ, BENCH_PHASE=ph)
        proc = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True, text=True
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise SystemExit(f"phase {ph} failed (rc={proc.returncode})")
        parts[ph] = json.loads(proc.stdout.strip().splitlines()[-1])

    total_tokens = parts["group"]["total_new_tokens"]
    group_s = parts["group"]["group_s"]
    engine_s = parts["engine"]["engine_s"]
    spec_s = parts["spec"]["spec_s"]
    # per-step overhead of the gamma+1 verify vs the plain decode step:
    # compare decode-only step rates (chunks * steps / time is polluted by
    # prefills, so derive from the two engine runs' step counts)
    plain_step_s = engine_s / max(parts["engine"]["engine_decode_steps"], 1)
    spec_step_s = spec_s / max(parts["spec"]["spec_decode_steps"], 1)

    result = {
        "metric": "serving",
        "layers": parts["group"]["layers"],
        "slots": parts["group"]["slots"],
        "requests": parts["group"]["requests"],
        "total_new_tokens": total_tokens,
        "group_tok_s": round(total_tokens / group_s, 2),
        "engine_tok_s": round(total_tokens / engine_s, 2),
        "engine_vs_group": round(group_s / engine_s, 3),
        "engine_util": parts["engine"]["engine_util"],
        "spec_tok_s": round(total_tokens / spec_s, 2),
        "spec_tokens_per_step": parts["spec"]["spec_tokens_per_step"],
        "spec_step_overhead": round(spec_step_s / plain_step_s, 3),
        "int8": parts["group"]["int8"],
        "int8_kv": parts["group"]["int8_kv"],
        "platform": parts["group"]["platform"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
