"""Decode throughput + TTFT benchmark (BASELINE metrics 2 and 3).

Measures on one chip, random bf16 weights:
- p50 TTFT: multimodal prefill (4 towers + fusion + LLM prefill) to first token;
- decode tokens/sec: the KV-cache `lax.scan` decode loop (ONE device program
  for all steps — the tunnel RTT is paid once per generation, not per token).

Prints one JSON line with both numbers.
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import json
import os


from merv_tpu.util.cache import enable_compile_cache

enable_compile_cache()
import time

import jax
import jax.numpy as jnp
import numpy as np


from merv_tpu.benchkit import build_model  # noqa: E402
from merv_tpu.models.backbones.llm.transformer import KVCache  # noqa: E402
from merv_tpu.models.generation import GenerationConfig, _decode_scan  # noqa: E402


def main() -> None:
    layers = int(os.environ.get("BENCH_LLM_LAYERS", "16"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    steps = int(os.environ.get("BENCH_DECODE_STEPS", "128"))
    model = build_model(layers, tiny=jax.devices()[0].platform == "cpu")

    from merv_tpu.benchkit import make_bench_params

    int8 = os.environ.get("BENCH_INT8", "0") == "1"
    int8_kv = os.environ.get("BENCH_INT8_KV", "0") == "1"
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    params = make_bench_params(shapes, int8=int8)

    T = 64
    input_ids = jnp.full((batch, T), 5, jnp.int32).at[:, 0].set(1)
    attention_mask = jnp.ones((batch, T), jnp.int32)
    videos = [jnp.zeros((batch, *vb.default_video_resolution), jnp.bfloat16) for vb in model.video_backbones]
    dec = model.llm_backbone.decoder
    cfg = dec.cfg
    V = model.visual_feature_length
    total = T + V

    @jax.jit
    def prefill(params, input_ids, attention_mask, videos):
        feats = model.encode_videos(params, videos)
        visual, _ = model.project_and_fuse(params, feats)
        embeds, mask, _ = model.embed_multimodal(params, input_ids, attention_mask, visual)
        cache = KVCache.create(
            cfg, batch, total + steps,
            dtype=(jnp.int8 if int8_kv else cfg.compute_dtype),
        )
        logits, cache = dec(params["llm_backbone"], inputs_embeds=embeds,
                            attention_mask=mask.astype(jnp.int32), kv_cache=cache)
        first = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1).astype(jnp.int32)
        return first, cache

    gen_cfg = GenerationConfig(max_new_tokens=steps, eos_token_id=-1, pad_token_id=0)

    def decode(first, cache, n):
        start = jnp.full((batch,), total, jnp.int32)
        return _decode_scan(dec, params["llm_backbone"], first, cache, None, start,
                            jax.random.PRNGKey(0), gen_cfg, n)[0]

    # --- TTFT: prefill + first-token fetch (tunnel RTT included — that IS TTFT here)
    first, cache = prefill(params, input_ids, attention_mask, videos)
    int(first[0])  # warm compile + force
    ttfts = []
    for _ in range(3):
        t0 = time.perf_counter()
        f2, cache = prefill(params, input_ids, attention_mask, videos)
        int(f2[0])
        ttfts.append(time.perf_counter() - t0)
    ttft_p50 = sorted(ttfts)[len(ttfts) // 2]

    # --- decode: scan over steps, RTT amortized via (t_N - t_1)/(N-1).
    # The decode program donates the cache buffer, so each timing call gets a
    # fresh cache from an (untimed) prefill.
    def timed_decode(n: int) -> float:
        f2, cache2 = prefill(params, input_ids, attention_mask, videos)
        int(f2[0])  # force prefill completion outside the timed region
        t0 = time.perf_counter()
        int(decode(f2, cache2, n)[0, -1])
        return time.perf_counter() - t0

    timed_decode(1)  # compile
    timed_decode(steps)  # compile
    t1 = min(timed_decode(1) for _ in range(2))
    tN = min(timed_decode(steps) for _ in range(2))
    per_tok = max((tN - t1) / (steps - 1), 1e-9)
    towers_tag = os.environ.get("BENCH_TOWERS", "merv")
    print(json.dumps({
        "metric": f"{towers_tag} decode tokens/sec + p50 TTFT (llm depth {layers}/32, bsz {batch}"
                  + (", int8 weights" if int8 else "")
                  + (", int8 kv" if int8_kv else "") + ")",
        "decode_tokens_per_sec": round(batch / per_tok, 2),
        "ttft_p50_sec": round(ttft_p50, 4),
        "unit": "tokens/sec; sec",
    }))


if __name__ == "__main__":
    main()
