"""Per-stage prefill breakdown for the merv-full bench model.

Times each compute stage of the headline benchmark (bench.py) separately on
the real chip: each of the four video towers, the projector+fusion program,
and the Llama-2-7B prefill — using the same pipelined-dispatch difference
timing as bench.py so tunnel RTT cancels. Use this to find where the
prefill milliseconds actually go before optimizing.

Usage:  python scripts/bench_breakdown.py [--layers 32] [--batch 2]
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.util.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from merv_tpu.benchkit import build_model, make_bench_params  # noqa: E402


def difftime(fn, *args, iters=8, reps=3):
    def timed(it):
        t0 = time.perf_counter()
        for _ in range(it):
            out = fn(*args)
        jax.tree_util.tree_map(lambda x: float(jnp.ravel(x)[0].astype(jnp.float32)),
                               jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    timed(1)
    timed(1)
    t1 = min(timed(2) for _ in range(reps))
    t2 = min(timed(iters) for _ in range(reps))
    return (t2 - t1) / (iters - 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--text_len", type=int, default=64)
    args = ap.parse_args()

    model = build_model(args.layers)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    params = make_bench_params(shapes)

    B, T = args.batch, args.text_len
    input_ids = jnp.full((B, T), 5, jnp.int32).at[:, 0].set(1)
    attention_mask = jnp.ones((B, T), jnp.int32)
    videos = [
        jnp.asarray(np.random.randn(B, *vb.default_video_resolution), jnp.bfloat16)
        for vb in model.video_backbones
    ]

    total = 0.0
    # each tower separately
    for i, vb in enumerate(model.video_backbones):
        tower_fn = jax.jit(
            lambda p, v, _i=i: model.video_backbones[_i](p["video_backbones"][str(_i)], v)
        )
        dt = difftime(tower_fn, params, videos[i])
        total += dt
        print(f"tower[{i}] {vb.identifier:42s} {dt*1e3:8.1f} ms")

    feats = jax.jit(lambda p, v: model.encode_videos(p, v))(params, videos)
    proj_fn = jax.jit(lambda p, f: model.project_and_fuse(p, f)[0])
    dt = difftime(proj_fn, params, feats)
    total += dt
    print(f"projectors+fusion {'':32s} {dt*1e3:8.1f} ms")

    visual = proj_fn(params, feats)
    emb_fn = jax.jit(lambda p, i, m, v: model.embed_multimodal(p, i, m, v)[:2])
    embeds, mask = emb_fn(params, input_ids, attention_mask, visual)

    def llm_fn(p, e, m):
        last = jnp.sum(m, axis=1).astype(jnp.int32) - 1
        logits, _ = model.llm_backbone.decoder(
            p["llm_backbone"], inputs_embeds=e, attention_mask=m.astype(jnp.int32),
            logits_indices=last,
        )
        return logits[:, 0]

    llm_jit = jax.jit(llm_fn)
    dt = difftime(llm_jit, params, embeds, mask)
    total += dt
    seq = embeds.shape[1]
    flops = 2 * 6.7e9 * seq * B
    print(f"llm prefill (seq={seq}) {'':27s} {dt*1e3:8.1f} ms   ({flops/dt/1e12:.0f} TFLOPs)")
    print(f"sum of stages {'':36s} {total*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
