"""Tower-attention implementation A/B on the real chip (round-4 gap hunt).

The round-3 op profile localized ~12 ms/tower between the bare small-attention
kernel chain (6.0 ms) and the in-model attention cost (18.0 ms ablation delta)
for DINOv2, plus ~20 ms in LanguageBind's temporal branch (BASELINE.md "Tower
op-level profile"). This script times WHOLE TOWERS at the production shapes
under each attention implementation so fusion-boundary effects are included —
per-op timing provably missed them:

- ``small``   — current production: transpose-free Pallas kernel (kt layout)
- ``xla_kt``  — same einsum layout, pure-XLA softmax chain (no pallas_call
                boundary; XLA may fuse with neighbors)
- ``xla``     — plain linear + transpose + XLA attention (the pre-round-3 form)

Each impl runs in a fresh subprocess (the env override is read at trace time;
a shared process would reuse the first impl's compiled programs).

Usage:  python scripts/bench_tower_attn.py            # orchestrate all impls
        TOWER_ATTN_IMPL=small python scripts/bench_tower_attn.py --one
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import os
import sys
import time


from merv_tpu.util.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.benchkit import build_model, make_bench_params  # noqa: E402

# towers of the merv set worth A/B-ing (vivit/siglip dispatch elsewhere):
TOWERS = {0: "languagebind", 1: "dinov2"}


def difftime(fn, *args, iters=8, reps=3):
    def timed(it):
        t0 = time.perf_counter()
        for _ in range(it):
            out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: float(jnp.ravel(x)[0].astype(jnp.float32)),
            jax.tree_util.tree_leaves(out)[0],
        )
        return time.perf_counter() - t0

    timed(1)
    timed(1)
    t1 = min(timed(2) for _ in range(reps))
    t2 = min(timed(iters) for _ in range(reps))
    return (t2 - t1) / (iters - 2)


def run_one(batch: int) -> dict:
    impl = os.environ.get("TOWER_ATTN_IMPL", "small")
    if impl == "fused_block":
        # round-5: the whole-layer fused kernel (LN + qkv + attention +
        # o-proj + LayerScale + residual in ONE pallas program,
        # ops/fused_vit_block.py); spatial attention dispatch untouched
        os.environ["MERV_TPU_FUSED_VIT_BLOCK"] = "1"
    elif impl != "default":
        os.environ["MERV_TPU_TOWER_ATTN"] = impl
    model = build_model(2)  # LLM depth irrelevant: towers only
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    params = make_bench_params(shapes)

    out = {"impl": impl}
    for i, name in TOWERS.items():
        vb = model.video_backbones[i]
        video = jnp.asarray(
            np.random.RandomState(i).randn(batch, *vb.default_video_resolution), jnp.bfloat16
        )
        fn = jax.jit(lambda p, v, _i=i: model.video_backbones[_i](p["video_backbones"][str(_i)], v))
        out[name + "_ms"] = round(difftime(fn, params, video) * 1e3, 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", action="store_true", help="single-impl mode (TOWER_ATTN_IMPL env)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--impls", default="small,xla_kt,xla")
    args = ap.parse_args()

    if args.one:
        print(json.dumps(run_one(args.batch)))
        return

    import subprocess

    rows = []
    for impl in args.impls.split(","):
        env = dict(os.environ, TOWER_ATTN_IMPL=impl)
        proc = subprocess.run(
            [sys.executable, __file__, "--one", "--batch", str(args.batch)],
            env=env, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise SystemExit(f"impl {impl} failed (rc={proc.returncode})")
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                rows.append(json.loads(line))
                break
            except json.JSONDecodeError:
                continue
        else:
            raise SystemExit(f"impl {impl} printed no JSON")
        print(rows[-1], file=sys.stderr)
    print(json.dumps({"batch": args.batch, "rows": rows}))


if __name__ == "__main__":
    main()
