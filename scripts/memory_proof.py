"""Compiler-verified v5e-8 training-memory proof (no hardware required).

BASELINE.md's "~13 h vs 24 h on v5e-8" projection was analytic; this script
closes the MEMORY half of the claim with the compiler: it AOT-lowers the REAL
full-depth train step — the exact ``make_train_step``/``jit_train_step``
program the strategy runs (32-layer Llama-2-7B + all four towers, remat,
grad-accumulation scan, AdamW, stage freezing) — over a virtual 8-device
``fsdp`` mesh with the production shardings, and records
``compiled.memory_analysis()`` per-device HBM numbers. Nothing is
materialized: parameter/optimizer trees exist only as ShapeDtypeStructs.

Recipes come straight from the registered model config (reference anchor
``/root/reference/README.md:22`` 8-GPU node; recipes
``/root/reference/merv/conf/models.py:122-147``):

- align:    gbs 256, per-device 16, strategy from ``align_train_strategy``
- finetune: gbs 128, per-device 8,  fsdp-full-shard

Exits non-zero if any stage's estimated per-device peak exceeds the 16 GiB
v5e HBM budget. Caveat recorded in BASELINE.md: buffer assignment is from the
CPU backend (same SPMD partitioning and HLO; fusion details differ from the
TPU backend), so treat the numbers as a compiler-level feasibility proof, not
a profiler measurement.

Usage: python scripts/memory_proof.py [--stage align|finetune|both]
       [--llm-layers 32] [--model merv-full] [--seq-len 2048] [--json-out PATH]
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import os
import sys

# must precede any jax import: force the virtual 8-device CPU platform even
# when the environment pins a hardware platform (e.g. JAX_PLATFORMS=axon)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import argparse
import dataclasses
import json
import time
from typing import Any, Dict, List, Tuple


# virtual device count must be fixed before the backend initializes, which
# happens on first real jax use — peek argv ahead of the full parse
_N_DEVICES = 8
if "--devices" in sys.argv:
    _N_DEVICES = int(sys.argv[sys.argv.index("--devices") + 1])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", _N_DEVICES)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

PyTree = Any
GIB = 1024**3
V5E_HBM_GIB = 16.0


def build_flagship(
    model_id: str, num_llm_layers: int, llm_size: str = "7b",
    pipeline_parallel: bool = False, sequence_parallel: bool = False,
):
    """Full-scale model + host transforms (mirrors scripts/pretrain_video.py)."""
    from merv_tpu.conf.models import ModelConfig
    from merv_tpu.models.backbones.llm.base_llm import LLMBackbone, LLMSpec
    from merv_tpu.models.backbones.llm.prompting import PurePromptBuilder
    from merv_tpu.models.backbones.llm.transformer import LLAMA2_7B, LLAMA2_13B
    from merv_tpu.models.materialize import (
        get_video_backbone_and_transform,
        get_vidlm,
    )

    cfg = ModelConfig.get_choice_class(model_id)()
    towers, transforms = get_video_backbone_and_transform(
        cfg.video_backbone_ids,
        image_resize_strategy=cfg.image_resize_strategy,
        num_frames=cfg.num_frames,
    )
    base = LLAMA2_13B if llm_size == "13b" else LLAMA2_7B
    if num_llm_layers <= 0:
        num_llm_layers = base.num_layers
    dec = dataclasses.replace(base, num_layers=num_llm_layers, param_dtype=jnp.bfloat16)
    spec = LLMSpec("llama2", f"__local__/llama2-{llm_size}", dec, PurePromptBuilder, pad_token_id=32000)
    llm = LLMBackbone(
        f"llama2-{llm_size}-pure", llm_max_length=cfg.llm_max_length, spec=spec,
        pipeline_parallel=pipeline_parallel, sequence_parallel=sequence_parallel,
    )
    model = get_vidlm(
        model_id, cfg.arch_specifier, cfg.feature_fusion, towers, llm,
        projector_token_length=cfg.projector_token_length,
        visual_feature_length=cfg.visual_feature_length,
    )
    return model, transforms, cfg


def stage_recipe(cfg, stage: str) -> Dict[str, Any]:
    p = "align" if "align" in stage else "finetune"
    return dict(
        global_batch_size=getattr(cfg, f"{p}_global_batch_size"),
        per_device_batch_size=getattr(cfg, f"{p}_per_device_batch_size"),
        learning_rate=getattr(cfg, f"{p}_learning_rate"),
        weight_decay=getattr(cfg, f"{p}_weight_decay"),
        max_grad_norm=getattr(cfg, f"{p}_max_grad_norm"),
        lr_scheduler_type=getattr(cfg, f"{p}_lr_scheduler_type"),
        warmup_ratio=getattr(cfg, f"{p}_warmup_ratio"),
        train_strategy=getattr(cfg, f"{p}_train_strategy"),
    )


def sds(shape, dtype, sharding=None):
    return jax.ShapeDtypeStruct(tuple(shape), dtype, sharding=sharding)


def lower_stage(
    model, transforms, cfg, stage: str, seq_len: int,
    pdbs: int = 0, loss_chunk_size: int = 256,
    mesh_pipe: int = 1, mesh_seq: int = 1, n_devices: int = 8,
) -> Tuple[Any, Dict[str, Any]]:
    from merv_tpu.parallel import MeshConfig, batch_spec, build_mesh
    from merv_tpu.training.optimizers import build_optimizer, build_schedule
    from merv_tpu.training.train_step import (
        TrainState, jit_train_step, make_loss_fn, make_train_step, train_state_specs,
    )

    recipe = stage_recipe(cfg, stage)
    if pdbs:
        # v5e-8 recipe adjustment: same global batch (identical gradient math;
        # equal microbatches make the accumulation mean exact), smaller
        # per-device batch with more accumulation steps
        recipe["per_device_batch_size"] = pdbs
    # activation constraints are scoped inside jit_train_step's trace
    # production per-stage tower unroll (align fits v5e-8 at 12; finetune
    # needs 4 — see materialize.train_tower_scan_unroll)
    from merv_tpu.models.materialize import train_tower_scan_unroll
    for vb in model.video_backbones:
        vb.scan_unroll = train_tower_scan_unroll(stage)
    mesh_cfg = MeshConfig(data=1, fsdp=-1, tensor=1, seq=mesh_seq, pipe=mesh_pipe)
    mesh = build_mesh(mesh_cfg)
    # batch parallelism spans data x fsdp only (sp/pp split per-example work)
    world = mesh.shape["data"] * mesh.shape["fsdp"]
    accum = recipe["global_batch_size"] // recipe["per_device_batch_size"] // world
    assert accum >= 1, (recipe, world)
    micro = recipe["per_device_batch_size"] * world

    model.freeze_backbones(stage)

    # --- abstract state: nothing materialized -------------------------------
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    # frozen towers serve in half precision (base_strategy.run_setup contract)
    params = dict(params)
    params["video_backbones"] = {
        k: jax.tree_util.tree_map(lambda s, _vb=vb: sds(s.shape, _vb.half_precision_dtype), sub)
        for (k, sub), vb in zip(params["video_backbones"].items(), model.video_backbones)
    }
    mask = model.trainable_mask(params)
    schedule = build_schedule(recipe["lr_scheduler_type"], recipe["learning_rate"], 1000, recipe["warmup_ratio"])
    tx = build_optimizer(params, schedule, recipe["weight_decay"], recipe["max_grad_norm"], trainable_mask=mask)
    opt_state = jax.eval_shape(tx.init, params)
    state = TrainState(params, opt_state, sds((), jnp.int32))
    specs = train_state_specs(state, mesh, strategy=recipe["train_strategy"])

    def with_shardings(tree, spec_tree):
        return jax.tree_util.tree_map(
            lambda s, p: sds(s.shape, s.dtype, NamedSharding(mesh, p)), tree, spec_tree,
            is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct),
        )

    state_in = TrainState(
        with_shardings(state.params, specs.params),
        with_shardings(state.opt_state, specs.opt_state),
        sds((), jnp.int32, NamedSharding(mesh, P())),
    )

    # --- abstract batch in the production layout ([accum, micro, ...]) ------
    bspec = batch_spec(mesh)
    def bshape(shape):
        spec = P(*((None,) + tuple(bspec))) if accum > 1 else P(*bspec)
        lead = (accum, micro) if accum > 1 else (micro,)
        return lead + tuple(shape), NamedSharding(mesh, spec)

    def bsds(shape, dtype):
        shp, sh = bshape(shape)
        return sds(shp, dtype, sh)

    batch = {
        "input_ids": bsds((seq_len,), jnp.int32),
        "attention_mask": bsds((seq_len,), jnp.int32),
        "labels": bsds((seq_len,), jnp.int32),
        "is_multimodal": bsds((), jnp.bool_),
        "is_image": bsds((), jnp.bool_),
        # host-geometry uint8 frames [T, S, S, C] per tower (collator contract)
        "video_values": [
            bsds((vb.num_frames, vb.default_image_size, vb.default_image_size, 3), jnp.uint8)
            for vb in model.video_backbones
        ],
    }

    loss_fn = make_loss_fn(
        model, remat=True, video_transforms=transforms,
        loss_chunk_size=loss_chunk_size or None,
    )
    step = make_train_step(loss_fn, tx, grad_accumulation_steps=accum, trainable_mask=mask)
    jitted = jit_train_step(step, specs, mesh)

    t0 = time.time()
    lowered = jitted.lower(state_in, batch)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0

    ma = compiled.memory_analysis()
    arg, temp, out, alias = (
        ma.argument_size_in_bytes, ma.temp_size_in_bytes,
        ma.output_size_in_bytes, ma.alias_size_in_bytes,
    )
    # donated state aliases outputs; live set at peak ~= args + temps + the
    # non-aliased output slice. Report the compiler's own peak too.
    # CAVEAT: the CPU backend does not implement buffer donation, so `alias`
    # under-reports what the TPU backend aliases (the whole donated TrainState)
    # — `estimated_peak_donated_gib` assumes TPU-style state aliasing (outputs
    # reuse the donated state buffers; only scalar metrics are fresh).
    est_peak = arg + temp + max(out - alias, 0)
    est_peak_donated = arg + temp
    info = {
        "stage": stage,
        "strategy": recipe["train_strategy"],
        "mesh": dict(mesh.shape),
        "accum": accum,
        "per_device_batch_size": recipe["per_device_batch_size"],
        "micro_batch_global": micro,
        "seq_len_text": seq_len,
        "tower_scan_unroll": train_tower_scan_unroll(stage),
        "loss_chunk_size": loss_chunk_size,
        "argument_gib": arg / GIB,
        "temp_gib": temp / GIB,
        "output_gib": out / GIB,
        "alias_gib": alias / GIB,
        "compiler_peak_gib": ma.peak_memory_in_bytes / GIB,
        "estimated_peak_gib": est_peak / GIB,
        "estimated_peak_donated_gib": est_peak_donated / GIB,
        "fits_16gib": est_peak_donated / GIB <= V5E_HBM_GIB,
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
    }
    return compiled, info


def lower_serving(
    llm_size: str, num_layers: int, slots: int, max_len: int,
    steps_per_sync: int = 8, int8_weights: bool = True, int8_kv: bool = False,
    bucket: int = 1024, spec_gamma: int = 0, tensor: int = 1,
) -> Dict[str, Any]:
    """AOT-lower the continuous-batching engine's REAL programs — the decode
    chunk (``serving/engine.py::_decode_chunk``) and the bucket prefill
    (``_llm_prefill``) — at full depth with the production serving weight
    layout (packed q/k/v + gate/up, optional weight-only int8), and report
    per-device HBM. Closes the "does 13B *serving* fit one v5e?" question the
    training proofs left open (13B int8 weights ~= 13 GB; reference 13B config
    ``/root/reference/merv/conf/models.py:189-192``). ``tensor>1`` lowers the
    SAME programs under the engine's tensor-parallel serving mode (Megatron
    head-split params, kv-head-sharded slot cache — serving/engine.py mesh
    branch) and reports PER-CHIP memory."""
    from merv_tpu.models.backbones.llm.transformer import (
        LLAMA2_7B, LLAMA2_13B, KVCache, LlamaDecoder, pack_serving_params,
    )
    from merv_tpu.models.generation import GenerationConfig
    from merv_tpu.nn.quantization import quantize_tree
    from merv_tpu.serving.engine import _decode_chunk, _decode_chunk_spec, _llm_prefill

    base = LLAMA2_13B if llm_size == "13b" else LLAMA2_7B
    if num_layers > 0:
        base = dataclasses.replace(base, num_layers=num_layers)
    cfg = dataclasses.replace(base, param_dtype=jnp.bfloat16)
    dec = LlamaDecoder(cfg)

    def assemble(p):
        # TP keys on unpacked q/k/v paths (load_vid auto-disables packing)
        if tensor <= 1:
            p = pack_serving_params(p)
        return quantize_tree(p) if int8_weights else p

    params = jax.eval_shape(lambda: assemble(dec.init(jax.random.PRNGKey(0))))

    mesh = None
    if tensor > 1:
        from merv_tpu.parallel import MeshConfig, build_mesh, llm_tensor_parallel_rules
        from merv_tpu.parallel.mesh import TENSOR_AXIS
        from merv_tpu.parallel.sharding import path_str

        mesh = build_mesh(MeshConfig(data=1, fsdp=-1, tensor=tensor))
        rules = llm_tensor_parallel_rules()

        def place(path, leaf):
            s = rules.spec_for(path_str(path), leaf)
            return sds(leaf.shape, leaf.dtype, NamedSharding(mesh, s if s is not None else P()))

        params = jax.tree_util.tree_map_with_path(place, params)

    def per_device_gib(tree):
        total = 0
        for s in jax.tree_util.tree_leaves(tree):
            shape = (
                s.sharding.shard_shape(s.shape)
                if getattr(s, "sharding", None) is not None
                else s.shape
            )
            total += int(np.prod(shape)) * s.dtype.itemsize
        return total / GIB

    weight_gib = per_device_gib(params)

    gcfg = GenerationConfig(
        max_new_tokens=128, eos_token_id=2, pad_token_id=0,
        kv_cache_dtype="int8" if int8_kv else None,
    )
    cache_dtype = jnp.int8 if int8_kv else cfg.compute_dtype
    rows = max_len + (spec_gamma + 1 if spec_gamma else 0)
    cache = jax.eval_shape(lambda: KVCache.create(cfg, slots, rows, dtype=cache_dtype))
    cache = cache._replace(length=sds((slots,), jnp.int32))
    if mesh is not None:
        from merv_tpu.parallel.mesh import TENSOR_AXIS

        hspec = NamedSharding(mesh, P(None, None, TENSOR_AXIS, None, None))
        repl = NamedSharding(mesh, P())

        def reshard(s, sh):
            return None if s is None else sds(s.shape, s.dtype, sh)

        cache = KVCache(
            reshard(cache.k, hspec), reshard(cache.v, hspec),
            reshard(cache.length, repl),
            reshard(cache.k_scale, hspec), reshard(cache.v_scale, hspec),
        )
    rng = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    last_tok, done = sds((slots,), jnp.int32), sds((slots,), jnp.bool_)

    t0 = time.time()
    if spec_gamma:
        hc = max_len + 2 * spec_gamma + 8
        decode_c = _decode_chunk_spec.lower(
            dec, params, cache, last_tok, done, gcfg, steps_per_sync,
            spec_gamma, 2, sds((slots, hc), jnp.int32), sds((slots,), jnp.int32), rng,
        ).compile()
    else:
        decode_c = _decode_chunk.lower(
            dec, params, cache, last_tok, done, gcfg, steps_per_sync, rng,
        ).compile()
    prefill_c = jax.jit(_llm_prefill, static_argnums=(0, 2)).lower(
        dec, params, gcfg, sds((1, bucket), jnp.int32), sds((1, bucket), jnp.int32), rng,
    ).compile()
    t_compile = time.time() - t0

    def peak(c):
        ma = c.memory_analysis()
        # donated buffers (cache) alias outputs on TPU
        return (ma.argument_size_in_bytes + ma.temp_size_in_bytes) / GIB

    decode_gib, prefill_gib = peak(decode_c), peak(prefill_c)
    worst = max(decode_gib, prefill_gib)
    info = {
        "stage": "serving",
        "llm": llm_size,
        "llm_layers": cfg.num_layers,
        "tensor": tensor,
        "int8_weights": int8_weights,
        "int8_kv": int8_kv,
        "slots": slots,
        "max_len": max_len,
        "prefill_bucket": bucket,
        "spec_gamma": spec_gamma,
        "weights_gib": round(weight_gib, 2),
        "decode_chunk_gib": round(decode_gib, 2),
        "prefill_gib": round(prefill_gib, 2),
        "estimated_peak_donated_gib": worst,
        "fits_16gib": worst <= V5E_HBM_GIB,
        "compile_s": round(t_compile, 1),
    }
    return info


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="both", choices=["align", "finetune", "both", "serving"])
    ap.add_argument("--model", default="merv-full")
    ap.add_argument("--llm", default="7b", choices=["7b", "13b"])
    ap.add_argument("--llm-layers", type=int, default=0, help="0 = chosen LLM's full depth")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--pdbs", type=int, default=0, help="per-device batch override (0 = recipe value)")
    ap.add_argument("--loss-chunk", type=int, default=256, help="chunked-CE block (0 = direct loss)")
    ap.add_argument("--devices", type=int, default=8, help="virtual device count (v5e-8, v5e-16, ...)")
    ap.add_argument("--mesh-pipe", type=int, default=1, help="pipeline stages ('pp' axis)")
    ap.add_argument("--mesh-seq", type=int, default=1, help="sequence-parallel ring size ('sp' axis)")
    ap.add_argument("--mesh-tensor", type=int, default=1, help="serving: tensor-parallel width")
    ap.add_argument("--slots", type=int, default=8, help="serving: engine decode slots")
    ap.add_argument("--max-len", type=int, default=2048, help="serving: per-slot prompt+output bound")
    ap.add_argument("--prefill-bucket", type=int, default=2048, help="serving: largest prefill bucket")
    ap.add_argument("--spec-gamma", type=int, default=0, help="serving: speculative draft length")
    ap.add_argument("--no-int8-weights", action="store_true", help="serving: bf16 weights")
    ap.add_argument("--int8-kv", action="store_true", help="serving: int8 KV cache")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    if args.stage == "serving":
        info = lower_serving(
            args.llm, args.llm_layers, args.slots, args.max_len,
            int8_weights=not args.no_int8_weights, int8_kv=args.int8_kv,
            bucket=args.prefill_bucket, spec_gamma=args.spec_gamma,
            tensor=args.mesh_tensor,
        )
        print(
            f"[serving ] {info['llm']} x{info['llm_layers']}L tp={info['tensor']} "
            f"weights={info['weights_gib']:.2f} GiB  "
            f"decode={info['decode_chunk_gib']:.2f} GiB  prefill={info['prefill_gib']:.2f} GiB  "
            f"(slots={info['slots']}, max_len={info['max_len']}, "
            f"int8_w={info['int8_weights']}, int8_kv={info['int8_kv']}, "
            f"compile {info['compile_s']}s)  fits16={info['fits_16gib']}",
            file=sys.stderr,
        )
        summary = {"model": "llm-serving", "llm": args.llm, "stages": [info]}
        print(json.dumps(summary))
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(summary, f, indent=2)
        return 0 if info["fits_16gib"] else 1

    model, transforms, cfg = build_flagship(
        args.model, args.llm_layers, llm_size=args.llm,
        pipeline_parallel=args.mesh_pipe > 1, sequence_parallel=args.mesh_seq > 1,
    )
    stages = ["align", "finetune"] if args.stage == "both" else [args.stage]
    rows: List[Dict[str, Any]] = []
    ok = True
    for stage in stages:
        _, info = lower_stage(
            model, transforms, cfg, stage, args.seq_len,
            pdbs=args.pdbs, loss_chunk_size=args.loss_chunk,
            mesh_pipe=args.mesh_pipe, mesh_seq=args.mesh_seq, n_devices=args.devices,
        )
        rows.append(info)
        ok = ok and info["fits_16gib"]
        print(
            f"[{info['stage']:8s}] strategy={info['strategy']:18s} accum={info['accum']} "
            f"args={info['argument_gib']:.2f} GiB  temps={info['temp_gib']:.2f} GiB  "
            f"est peak={info['estimated_peak_donated_gib']:.2f} GiB/device (donated; "
            f"{info['estimated_peak_gib']:.2f} undonated)  "
            f"(compile {info['compile_s']}s)  fits16={info['fits_16gib']}",
            file=sys.stderr,
        )

    summary = {
        "model": args.model, "llm": args.llm, "llm_layers": args.llm_layers,
        "devices": args.devices, "mesh_pipe": args.mesh_pipe, "mesh_seq": args.mesh_seq,
        "stages": rows,
    }
    print(json.dumps(summary))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(summary, f, indent=2)
    if not ok:
        print("FAIL: a stage exceeds the 16 GiB/device v5e HBM budget", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
