"""Continuous-batching serving engine (merv_tpu/serving/engine.py).

The reference serves bs=1 prompt-at-a-time through HF ``generate`` (reference
``merv/models/vidlms/merv.py:779-830``); our batched ``generate_ids`` already
beats that, and the engine goes further: per-slot KV-cache pointers so short
answers release their slot while long ones keep decoding. These tests pin

- exact greedy parity with ``generation.generate`` (the engine is an
  admission policy, not a different decoder),
- per-slot cache-pointer correctness across slot reuse (a retired slot's
  stale rows must never leak into its successor),
- int8 KV-cache mode,
- the compiled-program contract: ONE decode program + one prefill program
  per prompt-length bucket, regardless of request count,
- the full-VidLM frontend (multimodal prefill via the model's own pipeline).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.backbones.llm.transformer import KVCache, LlamaDecoder, tiny_decoder_config
from merv_tpu.models.generation import GenerationConfig, generate
from merv_tpu.serving.engine import ContinuousBatchingEngine, Request

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def decoder_and_params():
    cfg = tiny_decoder_config(compute_dtype=jnp.float32, param_dtype=jnp.float32)
    dec = LlamaDecoder(cfg)
    return dec, dec.init(KEY)


def _prompts(lens, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(4, 30, (n,)).astype(np.int32) for n in lens]


def _reference_rows(dec, params, prompts, gcfg):
    return [
        np.asarray(generate(dec, params, input_ids=jnp.asarray(p[None]), config=gcfg)[0])
        for p in prompts
    ]


def test_engine_matches_generate_greedy(decoder_and_params):
    """5 requests through 2 slots == 5 independent generate() calls, token for
    token (greedy). Exercises admission, slot retirement, and reuse."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 3, 9, 2, 7])
    refs = _reference_rows(dec, params, prompts, gcfg)

    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=3, config=gcfg, length_bucket=4
    )
    results = eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)])
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    # prefills counts PROGRAMS — batched admission may fuse same-bucket
    # requests, so 5 requests need at most 5 (and at least 3: buckets 4/8/12)
    assert 3 <= eng.stats.prefills <= 5
    # 5 requests through 2 slots requires slot reuse
    assert eng.stats.slot_steps_active > 0 and eng.stats.decode_chunks >= 3


def test_engine_program_count_contract(decoder_and_params):
    """One decode program total; prefill programs bounded regardless of
    request count (compiles are minutes on hardware). Under the default
    gated cross-bucket fusion, every admission event whose buckets pass the
    gate shares ONE fused bucket — so the prefill program count is bounded
    by (1 + log2(slots)) pow2 batch sizes at that single bucket. With
    fusion off, the bound is buckets x (1 + log2(slots))."""
    from merv_tpu.serving import engine as engine_mod

    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=1, pad_token_id=0)
    # two distinct buckets: lens 2,3 -> 8; lens 9,12 -> 16
    prompts = _prompts([2, 9, 3, 12, 2, 11])
    reqs = lambda: [  # noqa: E731
        Request(f"r{i}", input_ids=p, max_new_tokens=4) for i, p in enumerate(prompts)
    ]

    # default: fused admission. 16 <= fuse_max_bucket and 16 <= 4 x 8, so the
    # 8/16 buckets fuse — every prefill program runs at bucket 16.
    decode_cache0 = engine_mod._decode_chunk._cache_size()
    eng = ContinuousBatchingEngine(
        dec, params, slots=3, max_len=32, steps_per_sync=2, config=gcfg, length_bucket=8
    )
    prefill_cache0 = eng._jit_prefill._cache_size()
    eng.run(reqs())
    # post-fusion programs only ever saw the fused bucket...
    assert eng.stats.prefill_buckets == [16]
    # ...while telemetry still records the true pre-fusion distribution
    assert sorted(set(eng.stats.admit_buckets)) == [8, 16]
    assert len(eng.stats.admit_buckets) == len(prompts)
    # one fused bucket x pow2 batch sizes {1, 2, 4}: at most 3 programs
    assert eng._jit_prefill._cache_size() - prefill_cache0 <= 3
    assert engine_mod._decode_chunk._cache_size() - decode_cache0 <= 1

    # fusion off: one program per (bucket, pow2-batch) pair — 2 buckets x
    # batch sizes {1, 2, 4}: at most 6 programs; both buckets materialize.
    eng2 = ContinuousBatchingEngine(
        dec, params, slots=3, max_len=32, steps_per_sync=2, config=gcfg,
        length_bucket=8, fuse_admission_buckets=False,
    )
    prefill_cache0 = eng2._jit_prefill._cache_size()
    eng2.run(reqs())
    assert sorted(eng2.stats.prefill_buckets) == [8, 16]
    assert eng2._jit_prefill._cache_size() - prefill_cache0 <= 6
    assert engine_mod._decode_chunk._cache_size() - decode_cache0 <= 1


def test_engine_fusion_gate_bounds_pad_spread(decoder_and_params):
    """A near-max-length prompt must NOT drag short prompts into its
    compute-bound prefill: with bucket spread past ``fuse_max_ratio`` the
    gate splits the admission event into separate fused groups (and past
    ``fuse_max_bucket`` long buckets never absorb anything). Token parity
    with generate() is preserved either way."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=1, pad_token_id=0)
    # buckets: 2,3 -> 8; 50 -> 56 (with length_bucket=8). 56 > 4x8, so the
    # short group stays at 8 and the long prompt prefills at its own bucket.
    prompts = _prompts([2, 3, 50])
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=3, max_len=64, steps_per_sync=2, config=gcfg, length_bucket=8
    )
    results = eng.run(
        [Request(f"r{i}", input_ids=p, max_new_tokens=4) for i, p in enumerate(prompts)]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    assert sorted(eng.stats.prefill_buckets) == [8, 56]
    assert sorted(set(eng.stats.admit_buckets)) == [8, 56]

    # same workload with a permissive ratio: everything fuses to 56
    eng2 = ContinuousBatchingEngine(
        dec, params, slots=3, max_len=64, steps_per_sync=2, config=gcfg,
        length_bucket=8, fuse_max_ratio=8,
    )
    results2 = eng2.run(
        [Request(f"r{i}", input_ids=p, max_new_tokens=4) for i, p in enumerate(prompts)]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results2[f"r{i}"].token_ids, ref), i
    assert eng2.stats.prefill_buckets == [56]

    # fuse_max_bucket gate: cap below 56 and even a permissive ratio cannot
    # pull the short buckets up to a compute-bound length
    eng3 = ContinuousBatchingEngine(
        dec, params, slots=3, max_len=64, steps_per_sync=2, config=gcfg,
        length_bucket=8, fuse_max_ratio=8, fuse_max_bucket=32,
    )
    results3 = eng3.run(
        [Request(f"r{i}", input_ids=p, max_new_tokens=4) for i, p in enumerate(prompts)]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results3[f"r{i}"].token_ids, ref), i
    assert sorted(eng3.stats.prefill_buckets) == [8, 56]


def test_engine_slot_reuse_no_stale_leak(decoder_and_params):
    """A long prompt retires, then a SHORT prompt reuses its slot: the stale
    cache rows past the short prompt's length must be invisible. Run enough
    decode steps that a leak would change the argmax stream."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=10, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([14, 13, 2, 3])  # long ones first, shorts admitted after
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=4, config=gcfg, length_bucket=2
    )
    results = eng.run(
        [Request(f"r{i}", input_ids=p, max_new_tokens=10) for i, p in enumerate(prompts)]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i


def test_engine_int8_kv(decoder_and_params):
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=6, eos_token_id=1, pad_token_id=0, kv_cache_dtype="int8")
    prompts = _prompts([5, 3, 7])
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=2, config=gcfg, length_bucket=4
    )
    results = eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=6) for i, p in enumerate(prompts)])
    assert eng._cache.k.dtype == jnp.int8 and eng._cache.k_scale is not None
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i


def test_engine_heterogeneous_budgets_and_eos(decoder_and_params):
    """Per-request max_new_tokens: short-budget rows retire early and their
    freed slots serve later requests; outputs still match generate()."""
    dec, params = decoder_and_params
    prompts = _prompts([4, 6, 5])
    budgets = [2, 7, 1]
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=3,
        config=GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0),
        length_bucket=4,
    )
    results = eng.run(
        [Request(f"r{i}", input_ids=p, max_new_tokens=b) for i, (p, b) in enumerate(zip(prompts, budgets))]
    )
    for i, (p, b) in enumerate(zip(prompts, budgets)):
        gcfg = GenerationConfig(max_new_tokens=b, eos_token_id=1, pad_token_id=0)
        ref = np.asarray(generate(dec, params, input_ids=jnp.asarray(p[None]), config=gcfg)[0])
        got = results[f"r{i}"].token_ids
        assert got.shape == (b,)
        assert np.array_equal(got, ref), i
        assert results[f"r{i}"].finish_reason in ("eos", "budget")


def test_engine_admission_guard(decoder_and_params):
    """Over-budget request: rejected BEFORE any device prefill is paid, as an
    error RESULT (finish_reason="error") — the run continues, nothing raises
    (the reference's per-item fault absorption philosophy, reference
    scripts/eval_openended.py:169-188)."""
    dec, params = decoder_and_params
    eng = ContinuousBatchingEngine(
        dec, params, slots=1, max_len=16,
        config=GenerationConfig(max_new_tokens=12, eos_token_id=1, pad_token_id=0),
        length_bucket=4,
    )
    results = eng.run([Request("big", input_ids=_prompts([8])[0], max_new_tokens=12)])
    assert results["big"].finish_reason == "error"
    assert "exceeds engine max_len" in results["big"].error
    assert eng.stats.prefills == 0  # validated host-side, no device work paid
    assert eng.stats.errors == 1


def test_engine_poisoned_request_isolated(decoder_and_params):
    """One poisoned request (no input_ids -> prep error) among good ones: the
    rest complete with exact outputs; the poisoned one gets an error result
    instead of killing every in-flight slot."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 9, 3], seed=21)
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=3, config=gcfg, length_bucket=4
    )
    reqs = [Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)]
    reqs.insert(1, Request("bad", input_ids=None, max_new_tokens=8))  # poisoned
    results = eng.run(reqs)
    assert results["bad"].finish_reason == "error"
    assert "input_ids" in results["bad"].error
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    assert eng.stats.errors == 1


def test_engine_poisoned_video_isolated():
    """VidLM frontend: a request whose video fails to decode (missing file)
    errors alone; the other multimodal/unimodal requests still serve, and the
    over-budget pre-check counts visual tokens (prepared_len)."""
    from tests.test_merv_vidlm import _make_merv

    m = _make_merv()
    params = m.init(KEY)
    video = (np.random.RandomState(3).rand(4, 32, 32, 3) * 255).astype(np.uint8)
    stop = m.llm_backbone.stop_token_id
    gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=stop, pad_token_id=0)

    ids, mask, vids, is_mm = m._prepare_batch_inputs([video], ["In: a?\nOut: "], length_bucket=8)
    ref = np.asarray(m.generate_ids(
        params, jnp.asarray(ids), jnp.asarray(mask), vids,
        is_multimodal=jnp.asarray(is_mm), max_new_tokens=4,
    )[0])

    eng = ContinuousBatchingEngine.for_vidlm(
        m, params, slots=2, max_len=128, steps_per_sync=2, config=gcfg, length_bucket=8
    )
    results = eng.run([
        Request("good", prompt_text="In: a?\nOut: ", video=video, max_new_tokens=4),
        Request("corrupt", prompt_text="In: b?\nOut: ", video="/nonexistent/clip.mp4",
                max_new_tokens=4),
        Request("overbudget", prompt_text="In: c?\nOut: ", video=video,
                max_new_tokens=125),  # visual tokens + prompt + 125 > 128
    ])
    assert np.array_equal(results["good"].token_ids, ref)
    assert results["corrupt"].finish_reason == "error"
    assert results["overbudget"].finish_reason == "error"
    assert "exceeds engine max_len" in results["overbudget"].error
    assert eng.stats.errors == 2


def test_engine_batched_admission_parity(decoder_and_params):
    """Several same-bucket requests pending with several free slots: they
    prefill in ONE program (batched admission) and outputs stay exactly equal
    to solo generate() calls."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 6, 7, 5], seed=22)  # all bucket 8
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=4, max_len=32, steps_per_sync=3, config=gcfg, length_bucket=8
    )
    results = eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)])
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    # all four admitted together -> one prefill program served all of them
    assert eng.stats.prefills == 1
    assert eng.stats.batched_admissions == 4


def test_engine_batch_admissions_off(decoder_and_params):
    """batch_admissions=False (the churn A/B knob) forces per-request
    prefills; outputs stay exact and the wall-time attribution stats
    (admit_s / decode_s / prefill_stall_share) populate."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 6, 7, 5], seed=22)
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=4, max_len=32, steps_per_sync=3, config=gcfg,
        length_bucket=8, batch_admissions=False,
    )
    results = eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)])
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    assert eng.stats.prefills == 4
    assert eng.stats.batched_admissions == 0
    assert eng.stats.admit_s > 0 and eng.stats.decode_s > 0
    assert 0.0 < eng.stats.prefill_stall_share < 1.0


def test_engine_async_admission_parity(decoder_and_params):
    """async_admission=True (default) pipelines prefill -> insert -> next
    decode chunk without a blocking first-token readback; token streams,
    finish reasons, and prefill counts must be IDENTICAL to blocking
    placement across the tricky cases: max_new_tokens=1 (immediate budget
    finish resolves at the next chunk sync), slot churn through reuse, and
    speculative mode (the draft-corpus hist update stays device-side)."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 3, 9, 2, 7, 6], seed=77)
    budgets = [8, 1, 5, 1, 8, 3]

    def run(async_adm: bool, spec: int = 0):
        eng = ContinuousBatchingEngine(
            dec, params, slots=2, max_len=48, steps_per_sync=3, config=gcfg,
            length_bucket=4, async_admission=async_adm, speculative_gamma=spec,
        )
        res = eng.run(
            [Request(f"r{i}", input_ids=p, max_new_tokens=b)
             for i, (p, b) in enumerate(zip(prompts, budgets))]
        )
        return res, eng.stats

    res_async, st_async = run(True)
    res_sync, st_sync = run(False)
    for i in range(len(prompts)):
        a, s = res_async[f"r{i}"], res_sync[f"r{i}"]
        assert np.array_equal(a.token_ids, s.token_ids), i
        assert a.finish_reason == s.finish_reason, i
    assert st_async.prefills == st_sync.prefills

    # speculative mode: async placement writes the first token into the
    # device draft corpus without a readback; streams stay identical
    res_sa, _ = run(True, spec=2)
    res_ss, _ = run(False, spec=2)
    for i in range(len(prompts)):
        assert np.array_equal(res_sa[f"r{i}"].token_ids, res_ss[f"r{i}"].token_ids), i

    # budget guard still fires host-side BEFORE the device prefill
    eng = ContinuousBatchingEngine(
        dec, params, slots=1, max_len=16, config=gcfg, length_bucket=4,
        async_admission=True,
    )
    results = eng.run([Request("big", input_ids=_prompts([12])[0], max_new_tokens=12)])
    assert results["big"].finish_reason == "error"
    assert eng.stats.prefills == 0


def test_engine_cross_bucket_admission_fusion(decoder_and_params):
    """Pending admissions in DIFFERENT length buckets fuse into one prefill
    program (every row padded to the largest pending bucket) and outputs stay
    exactly equal to solo generate() calls. Short-prompt prefill is
    weight-stream-bound, so the pad FLOPs are free — this turns the churn
    regime's one-program-per-bucket into one-program-per-admission-event."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([3, 6, 11, 14], seed=31)  # buckets 4 / 8 / 12 / 16
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=4, max_len=48, steps_per_sync=3, config=gcfg, length_bucket=4
    )
    results = eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)])
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    assert eng.stats.prefills == 1  # four buckets, ONE program
    assert eng.stats.batched_admissions == 4

    # fusion off: one program per distinct bucket (the pre-round-4 behavior)
    eng2 = ContinuousBatchingEngine(
        dec, params, slots=4, max_len=48, steps_per_sync=3, config=gcfg,
        length_bucket=4, fuse_admission_buckets=False,
    )
    results2 = eng2.run(
        [Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results2[f"r{i}"].token_ids, ref), i
    assert eng2.stats.prefills == 4


def test_engine_prefix_cross_bucket_fusion(decoder_and_params):
    """Same-prefix suffix admissions in different buckets fuse into one
    suffix-prefill program, token-identical to the unfused path."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=6, eos_token_id=1, pad_token_id=0)
    rng = np.random.RandomState(7)
    prefix_ids = rng.randint(4, 30, (9,)).astype(np.int32)
    suffixes = [rng.randint(4, 30, (n,)).astype(np.int32) for n in (3, 6, 10)]

    def build(fuse):
        eng = ContinuousBatchingEngine(
            dec, params, slots=4, max_len=64, steps_per_sync=3, config=gcfg,
            length_bucket=4, fuse_admission_buckets=fuse,
        )
        eng.register_prefix("vid", _build_prefix(dec, params, prefix_ids))
        return eng, eng.run([
            Request(f"s{i}", input_ids=s, max_new_tokens=6, prefix_id="vid")
            for i, s in enumerate(suffixes)
        ])

    eng_f, res_f = build(True)
    eng_u, res_u = build(False)
    for i in range(len(suffixes)):
        assert np.array_equal(res_f[f"s{i}"].token_ids, res_u[f"s{i}"].token_ids), i
    assert eng_f.stats.prefills == 1
    assert eng_u.stats.prefills == 3


def test_engine_result_callback_incremental(decoder_and_params):
    """result_callback fires the moment each request finishes (the serve.py
    incremental-write/resume protocol), including error results."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=6, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 3], seed=23)
    seen = []
    eng = ContinuousBatchingEngine(
        dec, params, slots=1, max_len=32, steps_per_sync=2, config=gcfg,
        length_bucket=4, result_callback=lambda res: seen.append(res.request_id),
    )
    reqs = [Request(f"r{i}", input_ids=p, max_new_tokens=6) for i, p in enumerate(prompts)]
    reqs.append(Request("bad", input_ids=None))
    results = eng.run(reqs)
    assert sorted(seen) == sorted(results.keys())
    # 1 slot: r0 must have been reported before r1 finished (incremental)
    assert seen.index("r0") < seen.index("r1")


def test_engine_speculative_autodisable(decoder_and_params):
    """A workload with no n-gram repetition realizes ~1.0 tokens/step; with
    autodisable on, the engine falls back to plain decode after the probe
    window — outputs stay exact across the switch."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=24, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 9, 3, 7], seed=24)
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=48, steps_per_sync=4, config=gcfg,
        length_bucket=4, speculative_gamma=3, speculative_autodisable=True,
    )
    eng._spec_probe_steps = 8  # shrink the probe window for the test
    results = eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=24) for i, p in enumerate(prompts)])
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    # the windowed monitor either disabled at least once, or every window
    # genuinely cleared break-even (then spec legitimately stayed on)
    assert eng.stats.spec_disables >= 1 or eng.stats.tokens_per_step >= eng.spec_break_even


def test_sim_spec_estimator_ends_of_spectrum():
    """The host acceptance simulator (exact mirror of greedy speculation over
    an already-emitted stream): a perfectly periodic stream realizes ~gamma+1
    tokens/step; a stream with no repeated n-grams realizes 1.0."""
    from merv_tpu.serving.engine import _sim_spec_steps

    gamma, ngram, pad = 4, 2, 0
    periodic = [3, 7, 5, 9] * 16
    steps, emitted = _sim_spec_steps(periodic, 8, gamma, ngram, pad)
    assert emitted / steps > 3.0, (steps, emitted)
    novel = list(range(10, 74))  # strictly increasing: no previous occurrence
    steps, emitted = _sim_spec_steps(novel, 8, gamma, ngram, pad)
    assert emitted == steps  # 1.0 tokens/step: every draft rejects


def test_spec_monitor_two_way_transitions(decoder_and_params):
    """Drifting workload state machine, driven directly: a below-break-even
    window disables speculation; while disabled, a recovered trailing
    acceptance estimate re-enables it with gamma picked from the measured
    cost curve, and the device draft corpus is rebuilt from host history."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=64, steps_per_sync=2, config=gcfg,
        length_bucket=4, speculative_gamma=2,
    )
    eng._spec_probe_steps = 4

    # cold phase: 4 verify steps emitting 4 tokens (1.0/step, below 1.2)
    eng._spec_monitor(4, 4)
    assert eng.spec_gamma == 0 and eng._spec_off_by_monitor
    assert eng.stats.spec_disables == 1

    # still cold: estimator window below break-even x margin -> stays off
    eng._est_win_steps, eng._est_win_emitted = 4, 4
    eng._spec_monitor(0, 0)
    assert eng.spec_gamma == 0 and eng._spec_off_by_monitor

    # repetitive phase: plant a live slot with a PERIOD-4 history and a hot
    # estimator window -> re-enable, gamma from the cost curve. A period-P
    # stream can never draft more than P real tokens per step (the drafter's
    # most recent suffix occurrence sits one period before the end), so
    # acceptance caps at P+1 for every gamma >= P and the argmax picks the
    # CHEAPEST gamma that saturates: gamma=4 here (5/1.309 beats 5/1.367).
    slot = eng._slots[0]
    slot.request = Request("r0", input_ids=np.arange(4, dtype=np.int32), max_new_tokens=8)
    slot.done = False
    slot.prompt_ids = [3, 7, 5, 9] * 3
    slot.emitted = [3, 7, 5, 9] * 8
    eng._est_win_steps, eng._est_win_emitted = 4, 16  # 4.0/step est
    eng._spec_monitor(0, 0)
    assert eng.spec_gamma == 4, eng.spec_gamma
    assert not eng._spec_off_by_monitor
    assert eng.stats.spec_reenables == 1
    # device hist rebuilt from host history
    h = slot.prompt_ids + slot.emitted
    assert int(eng._hist_len[0]) == len(h)
    assert np.array_equal(np.asarray(eng._hist[0][: len(h)]), np.asarray(h))
    assert int(eng._hist_len[1]) == 0  # empty slot stayed empty

    # drift cold again -> second disable
    eng._spec_monitor(4, 4)
    assert eng.spec_gamma == 0 and eng.stats.spec_disables == 2

    # period-12 history: gamma=8 now drafts 8 real tokens per step
    # (9/1.367 = 6.58 beats gamma=4's 5/1.309 = 3.82) -> the argmax scales up
    seq = [3, 7, 5, 9, 11, 13, 17, 19, 23, 29, 31, 37]
    slot.prompt_ids = seq * 2
    slot.emitted = seq * 6
    eng._est_win_steps, eng._est_win_emitted = 4, 16
    eng._spec_monitor(0, 0)
    assert eng.spec_gamma == 8, eng.spec_gamma
    assert eng.stats.spec_reenables == 2


def test_spec_two_way_token_identity_under_drift(decoder_and_params):
    """Integration: tiny probe window forces the monitor to exercise real
    transitions on a mixed workload; emitted tokens must equal plain
    generate() for every request regardless of how often the engine
    switched programs (greedy speculation is exact-match)."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=20, eos_token_id=1, pad_token_id=0)
    # mix: novel prompts (cold) + a long repetitive prompt (hot n-grams)
    prompts = _prompts([5, 9], seed=77) + [np.asarray([3, 7, 5, 9] * 5, np.int32)]
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=64, steps_per_sync=2, config=gcfg,
        length_bucket=4, speculative_gamma=2,
    )
    eng._spec_probe_steps = 4  # force frequent windows
    eng._spec_reenable_margin = 1.0
    results = eng.run(
        [Request(f"r{i}", input_ids=p, max_new_tokens=20) for i, p in enumerate(prompts)]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i


def test_engine_sampling_runs(decoder_and_params):
    """Sampling mode: engine completes and emits only in-vocab tokens (the rng
    stream differs from generate()'s by construction, so no parity claim)."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(
        max_new_tokens=5, do_sample=True, temperature=0.8, top_p=0.9,
        eos_token_id=1, pad_token_id=0,
    )
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=2, config=gcfg, length_bucket=4,
        rng=jax.random.PRNGKey(7),
    )
    results = eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=5) for i, p in enumerate(_prompts([4, 6]))])
    V = dec.cfg.vocab_size
    for r in results.values():
        assert r.token_ids.shape == (5,) and (r.token_ids >= 0).all() and (r.token_ids < V).all()


# ---------------------------------------------------------------------------
# per-slot KVCache semantics at the decoder level
# ---------------------------------------------------------------------------


def test_per_slot_decode_matches_scalar(decoder_and_params):
    """Vector-length cache decode == per-row scalar-cache decode (the
    primitive the engine is built on; transformer.py per_slot path)."""
    dec, params = decoder_and_params
    cfg = dec.cfg
    MAX, lens = 16, [5, 3]
    prompts = _prompts(lens, seed=1)

    refs, smalls = [], []
    for ids in prompts:
        cache = KVCache.create(cfg, 1, MAX, dtype=jnp.float32)
        logits, cache = dec(params, input_ids=jnp.asarray(ids[None]), kv_cache=cache)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        step_logits, _ = dec(params, input_ids=nxt[:, None], kv_cache=cache)
        refs.append(np.asarray(step_logits[:, 0]))
        smalls.append((cache, nxt))

    big = KVCache.create(cfg, 2, MAX, dtype=jnp.float32)
    k, v = big.k, big.v
    for slot, (c, _) in enumerate(smalls):
        k = jax.lax.dynamic_update_slice(k, c.k, (0, slot, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(v, c.v, (0, slot, 0, 0, 0))
    bigc = KVCache(k, v, jnp.asarray(lens, jnp.int32))
    toks = jnp.concatenate([s[1] for s in smalls])
    step_logits, bigc2 = dec(params, input_ids=toks[:, None], kv_cache=bigc)
    for b in range(2):
        np.testing.assert_allclose(np.asarray(step_logits[:, 0])[b], refs[b][0], rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(bigc2.length), np.asarray(lens) + 1)


def test_per_slot_multi_token_matches_scalar(decoder_and_params):
    """T>1 per-slot forward (the batched speculative verify): logits AND
    written cache rows match per-row scalar-cache forwards at each row's own
    offset — per-row causal offsets, [B,T] scatter writes."""
    dec, params = decoder_and_params
    cfg = dec.cfg
    MAX, T, lens = 16, 3, [5, 3]
    rng = np.random.RandomState(2)
    prompts = [rng.randint(4, 30, (1, n)).astype(np.int32) for n in lens]
    steps = rng.randint(4, 30, (2, T)).astype(np.int32)

    ref_logits, ref_caches = [], []
    for b, ids in enumerate(prompts):
        cache = KVCache.create(cfg, 1, MAX, dtype=jnp.float32)
        _, cache = dec(params, input_ids=jnp.asarray(ids), kv_cache=cache)
        lg, cache = dec(params, input_ids=jnp.asarray(steps[b : b + 1]), kv_cache=cache)
        ref_logits.append(np.asarray(lg[0]))
        ref_caches.append(cache)

    big = KVCache.create(cfg, 2, MAX, dtype=jnp.float32)
    k, v = big.k, big.v
    for slot, ids in enumerate(prompts):
        c = KVCache.create(cfg, 1, MAX, dtype=jnp.float32)
        _, c = dec(params, input_ids=jnp.asarray(ids), kv_cache=c)
        k = jax.lax.dynamic_update_slice(k, c.k, (0, slot, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(v, c.v, (0, slot, 0, 0, 0))
    bigc = KVCache(k, v, jnp.asarray(lens, jnp.int32))
    lg, bigc2 = dec(params, input_ids=jnp.asarray(steps), kv_cache=bigc)
    assert np.array_equal(np.asarray(bigc2.length), np.asarray(lens) + T)
    for b in range(2):
        np.testing.assert_allclose(np.asarray(lg[b]), ref_logits[b], rtol=1e-5, atol=1e-5)
        # the scatter wrote each row's block at its own offset
        n = lens[b]
        np.testing.assert_allclose(
            np.asarray(bigc2.k[:, b, :, n : n + T]), np.asarray(ref_caches[b].k[:, 0, :, n : n + T]),
            rtol=1e-6, atol=1e-6,
        )


# ---------------------------------------------------------------------------
# full-VidLM frontend
# ---------------------------------------------------------------------------


def test_engine_for_vidlm_matches_generate_ids():
    """Multimodal continuous batching: engine output == per-request
    generate_ids through the full pipeline (towers -> fusion -> splice)."""
    from tests.test_merv_vidlm import _make_merv

    m = _make_merv()
    params = m.init(KEY)
    videos = [
        (np.random.RandomState(3).rand(4, 32, 32, 3) * 255).astype(np.uint8),
        None,  # unimodal row
        (np.random.RandomState(4).rand(4, 32, 32, 3) * 255).astype(np.uint8),
    ]
    prompts = ["In: a?\nOut: ", "In: what is happening here today?\nOut: ", "In: b?\nOut: "]

    stop = m.llm_backbone.stop_token_id
    gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=stop, pad_token_id=0)

    refs = []
    for vid, prompt in zip(videos, prompts):
        ids, mask, vids, is_mm = m._prepare_batch_inputs([vid], [prompt], length_bucket=8)
        out = m.generate_ids(
            params, jnp.asarray(ids), jnp.asarray(mask), vids,
            is_multimodal=jnp.asarray(is_mm), max_new_tokens=4,
        )
        refs.append(np.asarray(out[0]))

    eng = ContinuousBatchingEngine.for_vidlm(
        m, params, slots=2, max_len=128, steps_per_sync=2, config=gcfg, length_bucket=8
    )
    results = eng.run(
        [Request(f"r{i}", prompt_text=p, video=v, max_new_tokens=4)
         for i, (p, v) in enumerate(zip(prompts, videos))]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i


# ---------------------------------------------------------------------------
# batched speculative decoding (per-slot drafts, one [B, gamma+1] verify)
# ---------------------------------------------------------------------------


def test_engine_speculative_matches_generate(decoder_and_params):
    """Speculative engine == plain generate(), token for token, across slot
    reuse and heterogeneous prompts — per-slot acceptance is lossless."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=10, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 3, 9, 2, 7], seed=4)
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=3, config=gcfg,
        length_bucket=4, speculative_gamma=3,
    )
    results = eng.run(
        [Request(f"r{i}", input_ids=p, max_new_tokens=10) for i, p in enumerate(prompts)]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    assert eng.stats.spec_steps > 0
    assert eng.stats.tokens_per_step >= 1.0


def test_engine_speculative_repetitive_accepts(decoder_and_params):
    """Cyclic generation (this seed's greedy output enters a period-19 cycle):
    once the history repeats, drafts must actually accept (tokens_per_step >
    1) while staying exact — the per-slot pointer-rollback stress."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=30, eos_token_id=1, pad_token_id=0)
    prompts = [
        np.array([5, 6, 7, 8, 5, 6, 7, 8, 5, 6], np.int32),
        np.array([11, 12, 11, 12, 11, 12, 11], np.int32),
    ]
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=48, steps_per_sync=4, config=gcfg,
        length_bucket=4, speculative_gamma=4,
    )
    results = eng.run(
        [Request(f"r{i}", input_ids=p, max_new_tokens=30) for i, p in enumerate(prompts)]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    assert eng.stats.tokens_per_step > 1.0, eng.stats


def test_engine_speculative_int8_kv(decoder_and_params):
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0,
                            kv_cache_dtype="int8")
    prompts = _prompts([6, 4], seed=9)
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=2, config=gcfg,
        length_bucket=4, speculative_gamma=2,
    )
    results = eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)])
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i


def test_engine_speculative_budget_freeze(decoder_and_params):
    """A prompt sized so prompt+budget == max_len: the freeze guard must keep
    the pointer inside the (max_len + gamma + 1)-row buffer while the full
    budget is still served exactly."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=12, eos_token_id=1, pad_token_id=0)
    p = _prompts([8], seed=11)[0]
    ref = _reference_rows(dec, params, [p], gcfg)[0]
    eng = ContinuousBatchingEngine(
        dec, params, slots=1, max_len=20, steps_per_sync=5, config=gcfg,
        length_bucket=4, speculative_gamma=3,
    )
    results = eng.run([Request("r0", input_ids=p, max_new_tokens=12)])
    assert np.array_equal(results["r0"].token_ids, ref)
    assert int(np.asarray(eng._cache.length)[0]) <= eng._cache.k.shape[3]


def test_engine_speculative_sampling(decoder_and_params):
    """Speculative engine with do_sample: rejection-sampling acceptance.
    top_k=1 makes the sampling distribution an exact delta at the argmax, so
    the output must equal the greedy reference deterministically (real
    temperatures are distributionally lossless — the acceptance math is
    pinned by test_spec_accept_marginals)."""
    dec, params = decoder_and_params
    greedy = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 3, 7], seed=12)
    refs = _reference_rows(dec, params, prompts, greedy)
    sharp = GenerationConfig(max_new_tokens=8, do_sample=True, top_k=1,
                             eos_token_id=1, pad_token_id=0)
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=3, config=sharp,
        length_bucket=4, speculative_gamma=3,
    )
    results = eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)])
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    # and a real-temperature run completes with valid tokens
    eng2 = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=2,
        config=GenerationConfig(max_new_tokens=5, do_sample=True, temperature=1.1,
                                top_p=0.95, eos_token_id=1, pad_token_id=0),
        length_bucket=4, speculative_gamma=2, rng=jax.random.PRNGKey(11),
    )
    res2 = eng2.run([Request(f"s{i}", input_ids=p, max_new_tokens=5) for i, p in enumerate(prompts)])
    V = dec.cfg.vocab_size
    for r in res2.values():
        assert (r.token_ids >= 0).all() and (r.token_ids < V).all()


def test_engine_for_vidlm_speculative():
    """Full multimodal continuous batching WITH batched speculation: output ==
    per-request generate_ids; text prompt ids seed each slot's draft corpus."""
    from tests.test_merv_vidlm import _make_merv

    m = _make_merv()
    params = m.init(KEY)
    videos = [
        (np.random.RandomState(5).rand(4, 32, 32, 3) * 255).astype(np.uint8),
        None,
    ]
    prompts = ["In: a?\nOut: ", "In: what is happening?\nOut: "]
    stop = m.llm_backbone.stop_token_id
    gcfg = GenerationConfig(max_new_tokens=5, eos_token_id=stop, pad_token_id=0)

    refs = []
    for vid, prompt in zip(videos, prompts):
        ids, mask, vids, is_mm = m._prepare_batch_inputs([vid], [prompt], length_bucket=8)
        out = m.generate_ids(
            params, jnp.asarray(ids), jnp.asarray(mask), vids,
            is_multimodal=jnp.asarray(is_mm), max_new_tokens=5,
        )
        refs.append(np.asarray(out[0]))

    eng = ContinuousBatchingEngine.for_vidlm(
        m, params, slots=2, max_len=128, steps_per_sync=2, config=gcfg,
        length_bucket=8, speculative_gamma=2,
    )
    results = eng.run(
        [Request(f"r{i}", prompt_text=p, video=v, max_new_tokens=5)
         for i, (p, v) in enumerate(zip(prompts, videos))]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i


def test_engine_under_tensor_parallel_mesh(decoder_and_params):
    """Continuous batching under TP serving: Megatron-split params + a
    kv-head-sharded slot cache on a tensor=2 mesh, outputs identical to the
    single-device engine (multi-chip continuous batching)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from merv_tpu.parallel import MeshConfig, build_mesh, llm_tensor_parallel_rules
    from merv_tpu.parallel.sharding import path_str

    dec, params = decoder_and_params
    mesh = build_mesh(MeshConfig(data=1, fsdp=-1, tensor=2))
    rules = llm_tensor_parallel_rules()

    def _spec(path, leaf):
        s = rules.spec_for(path_str(path), leaf)
        return NamedSharding(mesh, s if s is not None else P())

    tp_params = jax.device_put(
        params, jax.tree_util.tree_map_with_path(_spec, params)
    )

    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 3, 9], seed=6)
    refs = _reference_rows(dec, params, prompts, gcfg)

    for gamma in (0, 2):
        eng = ContinuousBatchingEngine(
            dec, tp_params, slots=2, max_len=32, steps_per_sync=3, config=gcfg,
            length_bucket=4, mesh=mesh, speculative_gamma=gamma,
        )
        assert not eng._cache.k.sharding.is_fully_replicated  # kv heads sharded
        results = eng.run(
            [Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)]
        )
        for i, ref in enumerate(refs):
            assert np.array_equal(results[f"r{i}"].token_ids, ref), (gamma, i)


def test_engine_tensor_parallel_int8_weights(decoder_and_params):
    """TP serving with weight-only int8 (the 13B-per-v5e mode): kernel_q AND
    scale leaves genuinely shard over the tensor axis (the rule table keys on
    kernel_q — a miss would silently replicate 12 GiB of 13B weights), and
    outputs match the unquantized-unsharded reference within int8 rounding
    (greedy streams are compared on the SAME quantized weights instead)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from merv_tpu.nn.quantization import quantize_tree
    from merv_tpu.parallel import MeshConfig, build_mesh, llm_tensor_parallel_rules
    from merv_tpu.parallel.mesh import TENSOR_AXIS
    from merv_tpu.parallel.sharding import path_str

    dec, params = decoder_and_params
    qparams = quantize_tree(params)
    mesh = build_mesh(MeshConfig(data=1, fsdp=-1, tensor=2))
    rules = llm_tensor_parallel_rules()

    def _spec(path, leaf):
        s = rules.spec_for(path_str(path), leaf)
        return NamedSharding(mesh, s if s is not None else P())

    tp_q = jax.device_put(qparams, jax.tree_util.tree_map_with_path(_spec, qparams))
    attn = tp_q["layers"]["attn"]
    assert attn["q_proj"]["kernel_q"].sharding.spec == P(None, None, TENSOR_AXIS)
    assert attn["q_proj"]["scale"].sharding.spec == P(None, None, TENSOR_AXIS)
    assert attn["o_proj"]["kernel_q"].sharding.spec == P(None, TENSOR_AXIS, None)

    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 3], seed=41)
    # reference: single-device engine on the SAME quantized weights
    ref_eng = ContinuousBatchingEngine(
        dec, qparams, slots=2, max_len=32, steps_per_sync=3, config=gcfg, length_bucket=4
    )
    refs = ref_eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)])
    eng = ContinuousBatchingEngine(
        dec, tp_q, slots=2, max_len=32, steps_per_sync=3, config=gcfg,
        length_bucket=4, mesh=mesh,
    )
    results = eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)])
    for i in range(len(prompts)):
        assert np.array_equal(results[f"r{i}"].token_ids, refs[f"r{i}"].token_ids), i


def test_engine_under_sequence_parallel_mesh(decoder_and_params):
    """Continuous batching WITH the sp-sharded KV cache (the two headline
    serving capabilities composed): per-slot pointer vectors replicate, only
    the cache's rows dim shards over sp, per-row causal offsets ride into the
    cross-chip softmax merge — outputs identical to the single-device engine
    across mixed budgets and slot reuse (incl. speculative gamma>0, whose
    T=gamma+1 verify needs the per-row offsets)."""
    from merv_tpu.parallel import MeshConfig, build_mesh

    dec, params = decoder_and_params
    dec_sp = dataclasses.replace(dec, cfg=dataclasses.replace(dec.cfg, sequence_parallel=True))
    mesh = build_mesh(MeshConfig(data=1, fsdp=-1, tensor=1, seq=2))

    gcfg = GenerationConfig(max_new_tokens=10, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 3, 9, 2], seed=31)
    budgets = [10, 4, 7, 10]
    refs = []
    for p, b in zip(prompts, budgets):
        c = dataclasses.replace(gcfg, max_new_tokens=b)
        refs.append(np.asarray(generate(dec, params, input_ids=jnp.asarray(p[None]), config=c)[0]))

    for gamma in (0, 2):
        eng = ContinuousBatchingEngine(
            dec_sp, params, slots=2, max_len=32, steps_per_sync=3, config=gcfg,
            length_bucket=4, mesh=mesh, speculative_gamma=gamma,
        )
        from merv_tpu.parallel.mesh import SEQ_AXIS

        # the cache's rows dim is genuinely sharded over sp
        spec = eng._cache.k.sharding.spec
        assert spec[3] == SEQ_AXIS, spec
        results = eng.run(
            [Request(f"r{i}", input_ids=p, max_new_tokens=b)
             for i, (p, b) in enumerate(zip(prompts, budgets))]
        )
        for i, ref in enumerate(refs):
            assert np.array_equal(results[f"r{i}"].token_ids, ref), (gamma, i)


def test_engine_admission_prefetch(decoder_and_params):
    """Host prep of the queue head overlaps decode chunks: admissions after
    the first chunk hit the prefetched payload, outputs unchanged."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    prompts = _prompts([5, 3, 9, 2], seed=13)
    refs = _reference_rows(dec, params, prompts, gcfg)
    eng = ContinuousBatchingEngine(
        dec, params, slots=1, max_len=32, steps_per_sync=2, config=gcfg, length_bucket=4
    )
    results = eng.run([Request(f"r{i}", input_ids=p, max_new_tokens=8) for i, p in enumerate(prompts)])
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    # 1 slot, 4 requests: requests 2-4 admit after chunks ran -> prefetch hits
    assert eng.stats.prefetch_hits >= 2, eng.stats


# ---------------------------------------------------------------------------
# shared-prefix caching (engine-level: suffix-only admission)
# ---------------------------------------------------------------------------


def _build_prefix(dec, params, prefix_ids, kv_cache_dtype=None):
    from merv_tpu.models.generation import prefill_prefix

    embeds = dec.embed_input_ids(params, jnp.asarray(prefix_ids[None]))
    return prefill_prefix(dec, params, inputs_embeds=embeds, kv_cache_dtype=kv_cache_dtype)


def test_engine_prefix_caching_matches_full_prompt(decoder_and_params):
    """Requests naming a registered prefix prefill suffix-only, yet outputs
    are token-identical to full-prompt generate() on [prefix | suffix] —
    prefix caching is an admission optimization, not a different decoder.
    Same-(prefix, bucket) admissions share one prefill program."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=6, eos_token_id=1, pad_token_id=0)
    rng = np.random.RandomState(5)
    shared = rng.randint(4, 30, (7,)).astype(np.int32)
    suffixes = _prompts([3, 4, 2, 3], seed=6)
    refs = _reference_rows(
        dec, params, [np.concatenate([shared, s]) for s in suffixes], gcfg
    )

    eng = ContinuousBatchingEngine(
        dec, params, slots=4, max_len=32, steps_per_sync=2, config=gcfg, length_bucket=4
    )
    eng.register_prefix("vid0", _build_prefix(dec, params, shared))
    results = eng.run(
        [Request(f"r{i}", input_ids=s, max_new_tokens=6, prefix_id="vid0")
         for i, s in enumerate(suffixes)]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    assert eng.stats.prefix_admissions == 4
    # all four suffixes land in the Tb=4 bucket -> ONE grouped prefill program
    assert eng.stats.prefills == 1
    assert eng.stats.batched_admissions == 4


def test_engine_prefix_mixed_with_plain_and_slot_reuse(decoder_and_params):
    """Prefix and plain requests interleave through shared slots; a slot
    vacated by a prefix request is safely reused by a plain one (and vice
    versa) because the splice resets the per-slot pointer either way."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=5, eos_token_id=1, pad_token_id=0)
    shared = np.random.RandomState(8).randint(4, 30, (6,)).astype(np.int32)
    suffixes = _prompts([2, 3], seed=9)
    plains = _prompts([5, 8], seed=10)
    refs_prefix = _reference_rows(
        dec, params, [np.concatenate([shared, s]) for s in suffixes], gcfg
    )
    refs_plain = _reference_rows(dec, params, plains, gcfg)

    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=2, config=gcfg, length_bucket=4
    )
    eng.register_prefix("p", _build_prefix(dec, params, shared))
    reqs = [
        Request("s0", input_ids=suffixes[0], max_new_tokens=5, prefix_id="p"),
        Request("n0", input_ids=plains[0], max_new_tokens=5),
        Request("s1", input_ids=suffixes[1], max_new_tokens=5, prefix_id="p"),
        Request("n1", input_ids=plains[1], max_new_tokens=5),
    ]
    results = eng.run(reqs)
    assert np.array_equal(results["s0"].token_ids, refs_prefix[0])
    assert np.array_equal(results["s1"].token_ids, refs_prefix[1])
    assert np.array_equal(results["n0"].token_ids, refs_plain[0])
    assert np.array_equal(results["n1"].token_ids, refs_plain[1])
    assert eng.stats.prefix_admissions == 2


def test_engine_prefix_fault_isolation(decoder_and_params):
    """Unknown prefix ids, empty suffixes, and over-budget prefix requests
    fail per-request (finish_reason='error') BEFORE any device prefill; the
    rest of the batch completes."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=1, pad_token_id=0)
    shared = np.random.RandomState(11).randint(4, 30, (6,)).astype(np.int32)
    good = _prompts([3], seed=12)[0]
    ref = _reference_rows(dec, params, [np.concatenate([shared, good])], gcfg)[0]

    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=16, steps_per_sync=2, config=gcfg, length_bucket=4
    )
    eng.register_prefix("p", _build_prefix(dec, params, shared))
    results = eng.run([
        Request("ok", input_ids=good, max_new_tokens=4, prefix_id="p"),
        Request("unknown", input_ids=good, max_new_tokens=4, prefix_id="nope"),
        Request("empty", input_ids=np.zeros((0,), np.int32), max_new_tokens=4, prefix_id="p"),
        # P=6 + suffix 3 + budget 12 > max_len 16
        Request("overbudget", input_ids=good, max_new_tokens=12, prefix_id="p"),
    ])
    assert np.array_equal(results["ok"].token_ids, ref)
    for rid in ("unknown", "empty", "overbudget"):
        assert results[rid].finish_reason == "error", rid
    assert eng.stats.errors == 3
    # only the good request paid a prefill
    assert eng.stats.prefills == 1


def test_engine_register_prefix_validation(decoder_and_params):
    """register_prefix rejects KV-dtype mismatches and prefixes that leave no
    room under max_len — loudly, at registration (programmer errors, not
    per-request faults)."""
    from merv_tpu.models.generation import VideoPrefix

    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=1, pad_token_id=0)
    shared = np.random.RandomState(13).randint(4, 30, (6,)).astype(np.int32)
    eng = ContinuousBatchingEngine(
        dec, params, slots=1, max_len=32, steps_per_sync=2, config=gcfg, length_bucket=4
    )
    # VideoPrefix built for int8 serving cannot register on a bf16/fp32 engine
    vp = VideoPrefix(
        cache=_build_prefix(dec, params, shared, kv_cache_dtype="int8"),
        bos_ids=(), kv_cache_dtype="int8",
    )
    with pytest.raises(ValueError, match="kv_cache_dtype"):
        eng.register_prefix("bad-dtype", vp)
    # bare-cache dtype mismatch caught too
    with pytest.raises(ValueError, match="dtype"):
        eng.register_prefix("bad-dtype2", _build_prefix(dec, params, shared, kv_cache_dtype="int8"))
    # a prefix as long as max_len leaves no room for suffix + generation
    long_ids = np.random.RandomState(14).randint(4, 30, (32,)).astype(np.int32)
    with pytest.raises(ValueError, match="no room"):
        eng.register_prefix("too-long", _build_prefix(dec, params, long_ids))


def test_engine_prefix_int8_kv(decoder_and_params):
    """Prefix caching composes with int8 KV serving: the registered prefix is
    quantized, the suffix prefill writes quantized rows, outputs match the
    int8 full-prompt engine path."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(
        max_new_tokens=5, eos_token_id=1, pad_token_id=0, kv_cache_dtype="int8"
    )
    shared = np.random.RandomState(15).randint(4, 30, (6,)).astype(np.int32)
    suffixes = _prompts([3, 2], seed=16)

    # reference: the same engine WITHOUT prefix caching on the full prompts
    ref_eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=2, config=gcfg, length_bucket=4
    )
    ref_results = ref_eng.run(
        [Request(f"r{i}", input_ids=np.concatenate([shared, s]), max_new_tokens=5)
         for i, s in enumerate(suffixes)]
    )

    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=2, config=gcfg, length_bucket=4
    )
    eng.register_prefix("p", _build_prefix(dec, params, shared, kv_cache_dtype="int8"))
    results = eng.run(
        [Request(f"r{i}", input_ids=s, max_new_tokens=5, prefix_id="p")
         for i, s in enumerate(suffixes)]
    )
    for i in range(len(suffixes)):
        # int8 KV quantizes per-position on write: the prefix path and the
        # full-prompt path quantize identical k/v rows, so outputs match
        assert np.array_equal(results[f"r{i}"].token_ids, ref_results[f"r{i}"].token_ids), i


def test_engine_prefix_speculative(decoder_and_params):
    """Prefix caching composes with batched speculative decoding: the suffix
    ids seed the draft corpus, outputs stay exact (greedy spec is lossless)."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=6, eos_token_id=1, pad_token_id=0)
    shared = np.random.RandomState(17).randint(4, 30, (6,)).astype(np.int32)
    suffixes = _prompts([3, 4], seed=18)
    refs = _reference_rows(
        dec, params, [np.concatenate([shared, s]) for s in suffixes], gcfg
    )
    eng = ContinuousBatchingEngine(
        dec, params, slots=2, max_len=32, steps_per_sync=2, config=gcfg,
        length_bucket=4, speculative_gamma=2,
    )
    eng.register_prefix("p", _build_prefix(dec, params, shared))
    results = eng.run(
        [Request(f"r{i}", input_ids=s, max_new_tokens=6, prefix_id="p")
         for i, s in enumerate(suffixes)]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i


def test_engine_for_vidlm_prefix_video():
    """VidLM engine prefix caching: register a video ONCE, serve several
    questions suffix-only — outputs token-identical to full multimodal
    requests through the same engine (the reference's eval regime: several
    questions per video, reference merv.py:779-830 recomputes everything)."""
    from tests.test_merv_vidlm import _make_merv

    m = _make_merv()
    params = m.init(KEY)
    video = (np.random.RandomState(21).rand(4, 32, 32, 3) * 255).astype(np.uint8)
    prompts = ["In: a?\nOut: ", "In: what is happening?\nOut: ", "In: b?\nOut: "]
    stop = m.llm_backbone.stop_token_id
    gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=stop, pad_token_id=0)

    ref_eng = ContinuousBatchingEngine.for_vidlm(
        m, params, slots=2, max_len=128, steps_per_sync=2, config=gcfg, length_bucket=8
    )
    refs = ref_eng.run(
        [Request(f"r{i}", prompt_text=p, video=video, max_new_tokens=4)
         for i, p in enumerate(prompts)]
    )

    eng = ContinuousBatchingEngine.for_vidlm(
        m, params, slots=2, max_len=128, steps_per_sync=2, config=gcfg, length_bucket=8
    )
    eng.register_prefix_video("vid", video)
    results = eng.run(
        [Request(f"r{i}", prompt_text=p, max_new_tokens=4, prefix_id="vid")
         for i, p in enumerate(prompts)]
    )
    for i in range(len(prompts)):
        assert np.array_equal(results[f"r{i}"].token_ids, refs[f"r{i}"].token_ids), i
    assert eng.stats.prefix_admissions == 3
    # towers ran once (inside register_prefix_video), not per request; the
    # suffix prefills are LLM-only and batch per (prefix, bucket)
    assert eng.stats.prefills <= 3


def test_engine_unregister_prefix(decoder_and_params):
    """unregister_prefix frees the registry entry: later requests naming it
    fail per-request (wave-based serving: scripts/serve.py --prefix_budget),
    while re-registering under the same id works."""
    dec, params = decoder_and_params
    gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=1, pad_token_id=0)
    shared = np.random.RandomState(19).randint(4, 30, (6,)).astype(np.int32)
    suf = _prompts([3], seed=20)[0]
    ref = _reference_rows(dec, params, [np.concatenate([shared, suf])], gcfg)[0]

    eng = ContinuousBatchingEngine(
        dec, params, slots=1, max_len=32, steps_per_sync=2, config=gcfg, length_bucket=4
    )
    eng.register_prefix("p", _build_prefix(dec, params, shared))
    r1 = eng.run([Request("a", input_ids=suf, max_new_tokens=4, prefix_id="p")])
    assert np.array_equal(r1["a"].token_ids, ref)

    eng.unregister_prefix("p")
    r2 = eng.run([Request("b", input_ids=suf, max_new_tokens=4, prefix_id="p")])
    assert r2["b"].finish_reason == "error"

    eng.register_prefix("p", _build_prefix(dec, params, shared))
    r3 = eng.run([Request("c", input_ids=suf, max_new_tokens=4, prefix_id="p")])
    assert np.array_equal(r3["c"].token_ids, ref)


def test_engine_prefix_under_sequence_parallel_mesh(decoder_and_params):
    """Prefix caching composes with the sp-sharded slot cache: the registered
    prefix replicates, the suffix prefill's [prefix | suffix] rows splice
    into the rows-sharded slot cache through GSPMD, and outputs stay
    identical to single-device full-prompt generate()."""
    from merv_tpu.parallel import MeshConfig, build_mesh
    from merv_tpu.parallel.mesh import SEQ_AXIS

    dec, params = decoder_and_params
    dec_sp = dataclasses.replace(dec, cfg=dataclasses.replace(dec.cfg, sequence_parallel=True))
    mesh = build_mesh(MeshConfig(data=1, fsdp=-1, tensor=1, seq=2))

    gcfg = GenerationConfig(max_new_tokens=6, eos_token_id=1, pad_token_id=0)
    shared = np.random.RandomState(33).randint(4, 30, (6,)).astype(np.int32)
    suffixes = _prompts([3, 4], seed=34)
    refs = _reference_rows(
        dec, params, [np.concatenate([shared, s]) for s in suffixes], gcfg
    )

    eng = ContinuousBatchingEngine(
        dec_sp, params, slots=2, max_len=32, steps_per_sync=2, config=gcfg,
        length_bucket=4, mesh=mesh,
    )
    assert eng._cache.k.sharding.spec[3] == SEQ_AXIS
    eng.register_prefix("p", _build_prefix(dec, params, shared))
    results = eng.run(
        [Request(f"r{i}", input_ids=s, max_new_tokens=6, prefix_id="p")
         for i, s in enumerate(suffixes)]
    )
    for i, ref in enumerate(refs):
        assert np.array_equal(results[f"r{i}"].token_ids, ref), i
    assert eng.stats.prefix_admissions == 2
