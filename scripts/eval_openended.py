"""Open-ended QA evaluation (parity: reference ``scripts/eval_openended.py``).

Same chunked jsonl protocol as eval_mcq plus:
- resume from partial output, including re-chunking across different
  ``num_chunks`` (reference ``:102-150``);
- FLOPs/params stat dump once per model (``:96-100``);
- per-video try/except so one corrupt file never kills a shard (``:169-188``).
Scoring happens downstream in ``eval_gpt_batch.py`` (LLM judge).
"""

from __future__ import annotations

try:  # installed (`pip install -e .`); else fall back to the source checkout
    import merv_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from pathlib import Path


import glob
import json
import os
import time

from merv_tpu.util.cache import enable_compile_cache

enable_compile_cache()
from dataclasses import dataclass
from pathlib import Path
from typing import Union

import merv_tpu.conf.registry as draccus
from merv_tpu.models.load_vid import load_vid
from merv_tpu.overwatch import initialize_overwatch
from merv_tpu.util.flops_utils import get_statistics
from merv_tpu.util.prefetch import prefetch_map

from scripts.eval_mcq import _resolve_video, get_chunk

overwatch = initialize_overwatch(__name__)


@dataclass
class EvalConfig:
    # fmt: off
    model_path: Union[str, Path] = "merv-full"
    hf_token: Union[str, Path] = Path(".hf_token")

    do_sample: bool = False
    temperature: float = 1.0
    max_new_tokens: int = 512
    min_length: int = 1
    eval_dataset: str = "MSVD"
    num_chunks: int = 1
    chunk_idx: int = 0
    filename_question: str = "test_q"
    filename_answer: str = "test_a"
    eval_data_root: Path = Path("eval_data")
    eval_result_root: Path = Path("eval_result")
    skip_flops: bool = False
    batch_size: int = 1                             # questions per prefill (TPU batching win)
    allow_random_weights: bool = False              # random-init fallback (speed tests ONLY)
    quantize_llm: bool = False                      # weight-only int8 LLM serving (fits 7B on one v5e)
    int8_kv: bool = False                           # int8 KV cache (decode HBM bytes ~2x less; see BASELINE.md)
    mesh_seq: int = 1                               # sp-sharded KV cache over N chips (long-video serving)
    speculative: int = 0                            # prompt-lookup speculative decoding: draft length gamma
    #                                               # (batch_size 1 only; lossless — greedy: same tokens, sampling:
    #                                               # same distribution; fewer HBM-bound decode steps; SERVING.md)
    speculative_autodisable: bool = True            # (engine only) two-way monitor: fall back to plain decode
    #                                               # below break-even, re-enable when the trailing acceptance
    #                                               # estimate recovers (gamma re-picked from the measured curve)
    use_engine: bool = False                        # continuous-batching engine serving: per-slot retirement
    #                                               # (short answers free their slot; ~2.5x over group-sync decode)
    #                                               # + shared-video prefix caching (towers + [BOS|visual] prefill
    #                                               # once per video). Composes with --speculative / --int8_kv /
    #                                               # --mesh_seq; --batch_size is ignored (slots replace groups).
    engine_slots: int = 4                           # concurrent decode slots (HBM-bound: KV rows x slots)
    serving_passes: int = 1                         # serve the workload N times in-process and report the
    #                                               # LAST pass: first-invocation jit compiles (minutes through
    #                                               # a remote-compile tunnel) land in pass 1, so passes >= 2
    #                                               # measures steady-state serving; results written once
    share_video_prefix: bool = True                 # with --use_engine: suffix-only admission per repeated video
    prefix_budget: int = 4                          # max simultaneously registered prefixes (HBM bound)
    # fmt: on


@draccus.wrap()
def evaluate(cfg: EvalConfig) -> None:
    if cfg.speculative > 0 and cfg.batch_size != 1:
        raise ValueError(
            "--speculative requires --batch_size 1: per-row acceptance counts "
            "desync a shared batch cache (serve batched speculation through "
            "the continuous-batching engine, scripts/serve.py)"
        )
    result_dir = Path(cfg.eval_result_root) / str(cfg.model_path)
    result_dir.mkdir(parents=True, exist_ok=True)

    benchmark = cfg.eval_dataset.replace("_token", "")
    benchmark_dir = Path(cfg.eval_data_root) / benchmark
    questions = json.load(open(benchmark_dir / f"{cfg.filename_question}.json"))
    overwatch.info(f"Number of Questions in {benchmark}: {len(questions)}")
    all_questions_id = {item["question_id"] for item in questions}
    questions = get_chunk(questions, cfg.num_chunks, cfg.chunk_idx)

    answers = json.load(open(benchmark_dir / f"{cfg.filename_answer}.json"))
    answers_dict = {item["question_id"]: item for item in answers}

    local_run = Path("runs") / str(cfg.model_path)
    src = str(local_run) if local_run.exists() else str(cfg.model_path)
    serve_mesh = None
    if cfg.mesh_seq > 1:
        # sp-sharded KV-cache serving (merv_tpu/ops/ring_attention.py
        # sharded_cache_attention): cache memory + attention FLOPs are L/n/chip
        from merv_tpu.parallel import MeshConfig, build_mesh

        serve_mesh = build_mesh(MeshConfig(data=1, fsdp=-1, tensor=1, seq=cfg.mesh_seq))
    vidlm, params, model_cfg = load_vid(
        src, get_model_cfg=True, allow_random_weights=cfg.allow_random_weights,
        quantize_llm=cfg.quantize_llm,
        mesh=serve_mesh,
    )
    if serve_mesh is not None:
        vidlm.llm_backbone.sequence_parallel = True  # decoder re-reads at trace

    # FLOPs/params once per model (reference :96-100)
    flops_path = result_dir / "flops.json"
    if not flops_path.exists() and not cfg.skip_flops:
        overwatch.info("Getting model statistics: FLOPs + Params")
        gflops, n_params = get_statistics(vidlm, num_frames=model_cfg.num_frames)
        overwatch.info(f"Model GFLOPs: {gflops}, Params: {n_params}")
        json.dump({"gflops": gflops, "params": n_params}, open(flops_path, "w"))

    tag = f"{cfg.eval_dataset}_pred_{cfg.num_chunks}"
    temp_output_path = result_dir / f"{tag}_{cfg.chunk_idx}.jsonl"
    done_output_path = result_dir / f"{tag}_{cfg.chunk_idx}_done.jsonl"
    merged_path = result_dir / f"{cfg.eval_dataset}_pred_merge.jsonl"

    # --- resume logic (reference :102-150) ---
    done_lines = []
    if done_output_path.exists():
        done_lines = open(done_output_path).readlines()
        done_ids = {json.loads(x)["question_id"] for x in done_lines}
        questions = [q for q in questions if q["question_id"] not in done_ids]
    elif temp_output_path.exists():
        done_lines = open(temp_output_path).readlines()
        done_ids = {json.loads(x)["question_id"] for x in done_lines}
        questions = [q for q in questions if q["question_id"] not in done_ids]
    else:
        previous = set(glob.glob(str(result_dir / f"{cfg.eval_dataset}_pred_*.jsonl"))) - set(
            glob.glob(str(result_dir / f"{tag}_*.jsonl"))
        )
        raw = [line for p in previous for line in open(p).readlines()]
        try:
            done_dict = {json.loads(x)["question_id"]: x for x in raw}
        except Exception:
            done_dict = {}
        done_lines = [done_dict[q["question_id"]] for q in questions if q["question_id"] in done_dict]
        questions = [q for q in questions if q["question_id"] not in done_dict]

    def _prep(question):
        prompt_builder = vidlm.llm_backbone.prompt_builder_fn(model_family="merv")
        prompt_builder.add_turn(role="human", message=question["question"])
        clip = dict(
            clip_start_sec=question["time"][0] if "time" in question else 0.0,
            clip_end_sec=question["time"][1] if "time" in question else None,
            end_frame=question.get("end_frame"),
        )
        return prompt_builder.get_prompt(), clip

    def _generate_one(question, prompt_text, clip):
        video_name = _resolve_video(benchmark_dir, question["video_name"])
        return vidlm.generate(
            params, video_name, prompt_text,
            do_sample=cfg.do_sample, temperature=cfg.temperature,
            max_new_tokens=cfg.max_new_tokens, min_length=cfg.min_length,
            num_frames=model_cfg.num_frames, kv_cache_dtype=("int8" if cfg.int8_kv else None),
            mesh=serve_mesh, speculative_gamma=cfg.speculative, **clip,
        )

    def _clip(question):
        return dict(
            clip_start_sec=question["time"][0] if "time" in question else 0.0,
            clip_end_sec=question["time"][1] if "time" in question else None,
            end_frame=question.get("end_frame"),
        )

    def _decode_group(group):
        """Host-side: resolve + decode the group's videos to uint8 arrays.
        Runs ahead of the device in prefetch_map threads, so group N+1
        decodes while group N generates."""
        from merv_tpu.models.vidlms.merv import _load_media

        arrays = []
        for q in group:
            # per-item catch: one corrupt video must not poison the group's
            # good decodes (they'd be re-decoded by the per-item fallback)
            try:
                name = _resolve_video(benchmark_dir, q["video_name"])
                arrays.append(_load_media(name, max(model_cfg.num_frames), **_clip(q)))
            except Exception as e:
                arrays.append(e)
        return arrays

    if cfg.use_engine:
        _engine_eval(
            cfg, vidlm, params, model_cfg, serve_mesh, questions, answers_dict,
            benchmark_dir, _prep, _clip, done_lines, temp_output_path,
        )
        os.rename(temp_output_path, done_output_path)
        _merge_chunks(cfg, result_dir, tag, all_questions_id, merged_path)
        return

    groups = [questions[s : s + cfg.batch_size] for s in range(0, len(questions), cfg.batch_size)]

    # --serving_passes N: like the engine path, extra in-process passes push
    # first-invocation jit compiles into pass 1 and the LAST pass measures
    # steady-state serving; results are written once, on the final pass
    passes = max(cfg.serving_passes, 1)
    pass_walls = []
    with open(temp_output_path, "w") as f:
        for line in done_lines:  # re-emit carried-over results
            f.write(line if line.endswith("\n") else line + "\n")
        for p in range(passes):
            write_results = p == passes - 1
            decoded_iter = (
                prefetch_map(groups, _decode_group) if cfg.batch_size > 1
                else ((g, None) for g in groups)
            )
            serve_t0 = time.perf_counter()
            for start, (group, decoded) in zip(range(0, len(questions), cfg.batch_size), decoded_iter):
                prepped = [_prep(q) for q in group]
                preds = [None] * len(group)
                if cfg.batch_size > 1:
                    # one prefill + one decode program per group (same TPU batching
                    # win as eval_mcq); video failures fall back to the per-item
                    # path below so one corrupt file never drops the whole group
                    try:
                        if isinstance(decoded, Exception):
                            raise decoded
                        good = [i for i, a in enumerate(decoded) if not isinstance(a, Exception)]
                        if len(good) < len(group):
                            overwatch.error(f"{len(group) - len(good)} item(s) failed host decode; batching the rest")
                        if good:
                            sub_preds = vidlm.generate_batch(
                                params, [decoded[i] for i in good], [prepped[i][0] for i in good],
                                num_frames=model_cfg.num_frames, max_new_tokens=cfg.max_new_tokens,
                                do_sample=cfg.do_sample, temperature=cfg.temperature,
                                min_length=cfg.min_length, pad_to_batch=cfg.batch_size,
                            kv_cache_dtype=("int8" if cfg.int8_kv else None), mesh=serve_mesh,
                            )
                            for i, p in zip(good, sub_preds):
                                preds[i] = p
                    except Exception as e:
                        overwatch.error(f"Batched generate failed ({type(e).__name__}: {e}); retrying per-item")
                        preds = [None] * len(group)
                for question, (prompt_text, clip), pred in zip(group, prepped, preds):
                    try:
                        if pred is None:  # bsz-1 path or batch-failure retry
                            pred = _generate_one(question, prompt_text, clip)
                        if write_results:
                            out = {**question, **answers_dict[question["question_id"]]}
                            out["pred"] = pred
                            f.write(json.dumps(out) + "\n")
                    except Exception as e:  # per-video fault tolerance (reference :169-188)
                        overwatch.error(f"Failed on {question.get('question_id')}: {type(e).__name__}: {e}")
                # flush per group so a killed shard loses at most one group
                # (the old 100-boundary heuristic never fired at batch_size 1,
                # buffering the whole run against the resume machinery)
                f.flush()
            pass_walls.append(time.perf_counter() - serve_t0)
    wall = pass_walls[-1]
    if questions:
        overwatch.info(
            f"Serving wall: {wall:.2f}s for {len(questions)} questions = "
            f"{len(questions) / wall:.3f} questions/sec"
            + (f" (pass 1 incl. compiles: {pass_walls[0]:.2f}s)" if passes > 1 else "")
        )
        print(json.dumps({
            "serving_wall_s": round(wall, 2), "questions": len(questions),
            "questions_per_sec": round(len(questions) / wall, 4) if wall else 0.0,
            "passes": passes, "cold_wall_s": round(pass_walls[0], 2),
        }), flush=True)
    os.rename(temp_output_path, done_output_path)
    _merge_chunks(cfg, result_dir, tag, all_questions_id, merged_path)


def _merge_chunks(cfg, result_dir, tag, all_questions_id, merged_path) -> None:
    """Last finisher merges (reference :198-215)."""
    all_jsonls = glob.glob(str(result_dir / f"{tag}_*_done.jsonl"))
    all_done_items = {
        item["question_id"]: item
        for jsonl in all_jsonls
        for line in open(jsonl).readlines()
        if line.strip() and (item := json.loads(line))
    }
    if len(all_questions_id - set(all_done_items.keys())) == 0:
        with open(merged_path, "w") as f:
            for item in all_done_items.values():
                f.write(json.dumps(item) + "\n")
        for jsonl in all_jsonls:
            os.remove(jsonl)
        overwatch.info(f"Merged predictions -> {merged_path}; score with scripts/eval_gpt_batch.py")


def _engine_eval(
    cfg, vidlm, params, model_cfg, serve_mesh, questions, answers_dict,
    benchmark_dir, _prep, _clip, done_lines, temp_output_path,
) -> None:
    """Continuous-batching engine serving for open-ended eval.

    Replaces the group-synchronous loop: a fixed pool of decode slots stays
    live (short answers retire their slot immediately — the measured 2.47x
    over group decode, BASELINE.md), and repeated videos register a shared
    [BOS | visual] prefix ONCE so their questions admit suffix-only (the
    measured 1.71x admission win at the LLM level, more at VidLM level where
    towers also amortize). Questions group by (video, clip) — a clipped
    question shares a prefix only with identically-clipped ones. Waves of
    --prefix_budget prefixes bound HBM. Per-request fault isolation replaces
    the group loop's per-video try/except (reference :169-188): a corrupt
    video fails only its own questions. Results stream through the engine's
    result_callback into the chunk file (flushed per result), so the jsonl
    resume protocol holds: a killed shard loses at most the in-flight slots.
    """
    from merv_tpu.models.generation import GenerationConfig
    from merv_tpu.models.vidlms.merv import _load_media
    from merv_tpu.serving import ContinuousBatchingEngine, Request

    tok = vidlm.llm_backbone.tokenizer
    stop = vidlm.llm_backbone.stop_token_id
    gcfg = GenerationConfig(
        max_new_tokens=cfg.max_new_tokens, do_sample=cfg.do_sample,
        temperature=cfg.temperature, min_length=cfg.min_length,
        eos_token_id=stop, pad_token_id=vidlm.llm_backbone.pad_token_id,
        kv_cache_dtype=("int8" if cfg.int8_kv else None),
    )
    by_q = {str(q["question_id"]): q for q in questions}

    # extra passes re-serve the identical workload in-process so the LAST
    # pass measures steady-state serving (first-invocation jit compiles —
    # minutes through a remote-compile tunnel — all land in pass 1); results
    # are written only on the final pass, so answers and the resume protocol
    # are unchanged
    passes = max(cfg.serving_passes, 1)
    write_results = passes == 1
    register_s = [0.0]
    with open(temp_output_path, "w") as f:
        for line in done_lines:  # re-emit carried-over results
            f.write(line if line.endswith("\n") else line + "\n")

        def on_result(res) -> None:
            if not write_results:
                return
            q = by_q[res.request_id]
            if res.finish_reason == "error":
                # per-item fault tolerance (reference :169-188): log + skip —
                # the resume machinery re-attempts it on the next run
                overwatch.error(f"Failed on {res.request_id}: {res.error}")
                return
            ids = res.token_ids.tolist()
            if stop in ids:
                ids = ids[: ids.index(stop)]
            out = {**q, **answers_dict[q["question_id"]]}
            out["pred"] = tok.decode(ids, skip_special_tokens=True).strip()
            f.write(json.dumps(out) + "\n")
            f.flush()  # a killed shard loses at most the in-flight slots

        engine = ContinuousBatchingEngine.for_vidlm(
            vidlm, params, slots=cfg.engine_slots,
            max_len=vidlm.llm_backbone.llm_max_length, steps_per_sync=8,
            config=gcfg, length_bucket=64, speculative_gamma=cfg.speculative,
            speculative_autodisable=cfg.speculative_autodisable,
            mesh=serve_mesh, result_callback=on_result,
        )

        # group questions by (video, clip): identical prefixes share towers +
        # the [BOS | visual] prefill via engine prefix caching
        vgroups: dict = {}
        order = []
        for q in questions:
            key = (q["video_name"], tuple(sorted(_clip(q).items())))
            if key not in vgroups:
                vgroups[key] = []
                order.append(key)
            vgroups[key].append(q)

        budget = max(cfg.prefix_budget, 1)
        wave_keys: list = []

        def run_wave() -> None:
            if not wave_keys:
                return
            live = []
            for key in wave_keys:
                video_name, clip_items = key
                group = vgroups[key]
                shared = cfg.share_video_prefix and len(group) >= 2
                video = None
                try:
                    path = _resolve_video(benchmark_dir, video_name)
                    video = _load_media(path, max(model_cfg.num_frames), **dict(clip_items))
                except Exception as e:
                    overwatch.error(
                        f"{len(group)} question(s) failed: video {video_name} "
                        f"({type(e).__name__}: {e})"
                    )
                    continue
                pid = None
                if shared:
                    pid = f"video:{video_name}:{hash(clip_items) & 0xFFFFFFFF:x}"
                    try:
                        _rt0 = time.perf_counter()
                        engine.register_prefix_video(pid, video, num_frames=model_cfg.num_frames)
                        register_s[-1] += time.perf_counter() - _rt0
                        live.append(pid)
                    except Exception as e:
                        overwatch.error(
                            f"prefix build failed for {video_name} "
                            f"({type(e).__name__}: {e}) — serving un-shared"
                        )
                        pid = None
                for q in group:
                    prompt_text, _ = _prep(q)
                    engine.submit(Request(
                        request_id=str(q["question_id"]), prompt_text=prompt_text,
                        video=None if pid else video, prefix_id=pid,
                        max_new_tokens=cfg.max_new_tokens,
                    ))
            engine.run()
            for pid in live:
                engine.unregister_prefix(pid)
            wave_keys.clear()

        pass_walls = []
        prev = None
        for p in range(passes):
            write_results = p == passes - 1
            if p:
                register_s.append(0.0)
            s = engine.stats
            prev = (s.admit_s, s.decode_s, s.prefills, s.prefix_admissions,
                    s.errors, len(s.ttft_s))
            pt0 = time.perf_counter()
            for key in order:
                wave_keys.append(key)
                if len(wave_keys) >= budget:
                    run_wave()
            run_wave()
            pass_walls.append(time.perf_counter() - pt0)

    # final-pass deltas: with extra warmup passes the cumulative stats would
    # double-count, and the LAST pass is the steady-state measurement
    s = engine.stats
    admit_s = s.admit_s - prev[0]
    decode_s = s.decode_s - prev[1]
    prefills = s.prefills - prev[2]
    prefix_admissions = s.prefix_admissions - prev[3]
    errors = s.errors - prev[4]
    ttft = sorted(s.ttft_s[prev[5]:])
    wall = pass_walls[-1]
    served = len(questions) - errors
    overwatch.info(
        f"Engine served chunk: slot utilization {s.slot_utilization:.1%}, "
        f"{prefills} prefills ({prefix_admissions} suffix-only), "
        f"{s.decode_chunks} chunks"
        + (f", {errors} failed" if errors else "")
        + (f", {s.tokens_per_step:.2f} tokens/verify-step" if cfg.speculative else "")
    )
    # with --serving_passes 1 the wall includes first-program compiles
    # (minutes through a remote-compile tunnel); passes >= 2 report the
    # final in-process pass = steady state. The plain-stdout JSON line is
    # machine-readable (scripts/bench_vidlm_prefix.py; the console log
    # line-wraps)
    overwatch.info(
        f"Serving wall: {wall:.2f}s for {served} questions = "
        f"{served / wall:.3f} questions/sec"
        + (f" (pass 1 incl. compiles: {pass_walls[0]:.2f}s)" if passes > 1 else "")
    )
    print(json.dumps({
        "serving_wall_s": round(wall, 2), "questions": served,
        "questions_per_sec": round(served / wall, 4) if wall else 0.0,
        "prefills": prefills, "prefix_admissions": prefix_admissions,
        "passes": passes, "cold_wall_s": round(pass_walls[0], 2),
        "admit_s": round(admit_s, 2), "decode_s": round(decode_s, 2),
        "register_s": round(register_s[-1], 2),
        "ttft_p50_ms": round(1e3 * ttft[len(ttft) // 2], 1) if ttft else None,
    }), flush=True)


if __name__ == "__main__":
    evaluate()
