"""Below-attention-granularity tower profiling (VERDICT r2 weak #1).

`bench_breakdown.py` stops at whole-stage timing; this script decomposes one
tower's milliseconds into synthetic single-op programs at the tower's EXACT
shapes, all timed with the same pipelined-dispatch difference method (tunnel
RTT cancels; trust ratios and deltas, not absolutes):

- the full tower forward (reference point, matches bench_breakdown),
- GEMM-only chain: lax.scan over the per-layer qkv/proj/fc1/fc2 GEMMs,
- attention-only chain: one attention per layer at the frame shape,
- patch-embed conv alone,
- LayerNorm-only and GELU-only chains (elementwise/bandwidth cost),
- plus candidate-optimization variants (fp32 vs bf16 input cast).

Usage:  python scripts/bench_tower_ops.py [--tower dinov2|languagebind|siglip|vivit] [--batch 2]
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.util.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from merv_tpu.benchkit import build_model, make_bench_params  # noqa: E402

TOWER_IDX = {"languagebind": 0, "dinov2": 1, "vivit": 2, "siglip": 3}


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
    ap.add_argument("--tower", default="dinov2", choices=sorted(TOWER_IDX))
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    model = build_model(2)  # LLM depth irrelevant here
    i = TOWER_IDX[args.tower]
    vb = model.video_backbones[i]
    cfg = vb.vit_config
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    params = make_bench_params(shapes)
    tp = params["video_backbones"][str(i)]

    B = args.batch
    video = jnp.asarray(np.random.randn(B, *vb.default_video_resolution), jnp.bfloat16)

    rows = []

    def bench(name, fn, *fargs):
        dt = difftime(jax.jit(fn), *fargs)
        rows.append((name, dt * 1e3))
        print(f"{name:44s} {dt*1e3:8.2f} ms", file=sys.stderr)
        return dt

    # --- reference point: the full tower ---------------------------------
    bench("full tower", lambda p, v: vb(p, v), tp, video)

    # --- synthetic components at exact shapes ------------------------------
    E, L = cfg.hidden_size, cfg.num_layers
    heads = cfg.num_heads
    hd = E // heads
    # frame-image count x tokens (per-frame ViTs flatten [B,F]->rows)
    if args.tower == "vivit":
        n_img, T = B, 3137
    else:
        n_img = B * vb.num_frames
        T = vb.spatial_resolution + getattr(cfg, "num_cls_tokens", 0) + getattr(cfg, "num_register_tokens", 0)
    I = cfg.intermediate_size if hasattr(cfg, "intermediate_size") else 4 * E
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n_img, T, E), jnp.bfloat16)
    Wqkv = jax.random.normal(key, (L, E, 3 * E), jnp.bfloat16) * 0.02
    Wproj = jax.random.normal(key, (L, E, E), jnp.bfloat16) * 0.02
    Wfc1 = jax.random.normal(key, (L, E, I), jnp.bfloat16) * 0.02
    Wfc2 = jax.random.normal(key, (L, I, E), jnp.bfloat16) * 0.02

    def gemms(x, ws):
        def body(h, w):
            wq, wp, w1, w2 = w
            a = h @ wq
            h = a[..., :E] @ wp
            m = h @ w1
            h = m @ w2
            return h, None

        h, _ = jax.lax.scan(body, x, ws)
        return h

    flops = 2 * n_img * T * (E * 3 * E + E * E + 2 * E * I) * L
    dt = bench(f"GEMM chain (L={L}, rows={n_img}x{T})", gemms, x, (Wqkv, Wproj, Wfc1, Wfc2))
    print(f"    -> {flops/dt/1e12:.0f} effective TFLOPs", file=sys.stderr)

    from merv_tpu.ops.attention import attention

    q = jax.random.normal(key, (n_img, heads, T, hd), jnp.bfloat16)

    def attn_chain(q):
        def body(h, _):
            return attention(h, h, h), None

        h, _ = jax.lax.scan(body, q, jnp.arange(L))
        return h

    bench(f"attention chain (L={L}, [{n_img},{heads},{T},{hd}])", attn_chain, q)

    def ln_chain(x):
        def body(h, _):
            mu = h.mean(-1, keepdims=True)
            v = ((h - mu) ** 2).mean(-1, keepdims=True)
            return ((h - mu) * jax.lax.rsqrt(v + 1e-6)).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, jnp.arange(2 * L))
        return h

    bench(f"LayerNorm chain (2L={2*L})", ln_chain, x)

    xm = jax.random.normal(key, (n_img, T, I), jnp.bfloat16)

    def gelu_chain(x):
        def body(h, _):
            return jax.nn.gelu(h).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, jnp.arange(L))
        return h

    bench(f"GELU chain (L={L}, [{n_img},{T},{I}])", gelu_chain, xm)

    # patch embed conv at the tower's real input geometry
    if args.tower != "vivit":
        img = jax.random.normal(key, (n_img, 3, 224, 224), jnp.bfloat16)
        patch = 14 if args.tower in ("dinov2", "languagebind") else 16
        Wc = jax.random.normal(key, (E, 3, patch, patch), jnp.bfloat16) * 0.02

        def patch_embed(img, Wc):
            return jax.lax.conv_general_dilated(
                img, Wc, (patch, patch), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )

        bench(f"patch-embed conv ({patch}x{patch})", patch_embed, img, Wc)

    # candidate: does an fp32 input (the training-path transform default)
    # slow the tower? (device_finish dtype choice)
    bench("full tower, fp32 input", lambda p, v: vb(p, v), tp, video.astype(jnp.float32))

    import json

    print(json.dumps({"tower": args.tower, "batch": B,
                      "components_ms": {n: round(v, 2) for n, v in rows}}))


if __name__ == "__main__":
    main()
