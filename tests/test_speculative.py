"""Prompt-lookup speculative decoding (generation.generate_speculative).

Speculation must be LOSSLESS: greedy output token-for-token identical to
plain ``generate`` for every (gamma, ngram, prompt, budget) — acceptance only
changes how many forwards it takes, never what comes out. The reference has
no speculative path at all (HF bs=1 generate, reference
``merv/models/vidlms/merv.py:779-830``); this is TPU-native headroom past the
decode HBM bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.backbones.llm.transformer import LlamaDecoder, tiny_decoder_config
from merv_tpu.models.generation import (
    GenerationConfig,
    _ngram_propose,
    generate,
    generate_speculative,
)

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def dp():
    cfg = tiny_decoder_config(compute_dtype=jnp.float32, param_dtype=jnp.float32)
    dec = LlamaDecoder(cfg)
    return dec, dec.init(KEY)


def _ref(dec, params, ids, gcfg, mask=None):
    return np.asarray(
        generate(dec, params, input_ids=jnp.asarray(ids), attention_mask=mask, config=gcfg)[0]
    )


@pytest.mark.parametrize("gamma,ngram", [(1, 1), (2, 2), (4, 2), (6, 3)])
def test_speculative_matches_generate(dp, gamma, ngram):
    dec, params = dp
    gcfg = GenerationConfig(max_new_tokens=12, eos_token_id=1, pad_token_id=0)
    for seed, n in [(0, 7), (1, 3), (2, 15)]:
        ids = np.random.RandomState(seed).randint(4, 30, (1, n)).astype(np.int32)
        ref = _ref(dec, params, ids, gcfg)
        got = np.asarray(
            generate_speculative(
                dec, params, input_ids=jnp.asarray(ids), config=gcfg, gamma=gamma, ngram=ngram
            )[0]
        )
        assert np.array_equal(got, ref), (seed, gamma, ngram, got, ref)


def test_speculative_with_padded_prompt(dp):
    """Right-padded prompt + attention_mask: pads are excluded from both the
    cache mask and the lookup corpus."""
    dec, params = dp
    gcfg = GenerationConfig(max_new_tokens=10, eos_token_id=1, pad_token_id=0)
    ids = np.zeros((1, 12), np.int32)
    ids[0, :7] = np.random.RandomState(3).randint(4, 30, (7,))
    mask = np.zeros((1, 12), np.int32)
    mask[0, :7] = 1
    ref = _ref(dec, params, ids, gcfg, mask=jnp.asarray(mask))
    got = np.asarray(
        generate_speculative(
            dec, params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            config=gcfg, gamma=3,
        )[0]
    )
    assert np.array_equal(got, ref)


def test_speculative_repetitive_prompt_accepts(dp):
    """A repetitive prompt (the prompt-lookup sweet spot) must still be exact.
    This is the stale-cache-row stress: long accepted runs advance the write
    pointer by gamma+1 while rejections roll it back."""
    dec, params = dp
    gcfg = GenerationConfig(max_new_tokens=16, eos_token_id=1, pad_token_id=0)
    ids = np.array([[5, 6, 7, 8, 5, 6, 7, 8, 5, 6]], np.int32)
    ref = _ref(dec, params, ids, gcfg)
    for gamma in (2, 4):
        got = np.asarray(
            generate_speculative(dec, params, input_ids=jnp.asarray(ids), config=gcfg, gamma=gamma)[0]
        )
        assert np.array_equal(got, ref), gamma


def test_speculative_int8_kv(dp):
    dec, params = dp
    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0, kv_cache_dtype="int8")
    ids = np.random.RandomState(5).randint(4, 30, (1, 6)).astype(np.int32)
    ref = _ref(dec, params, ids, gcfg)
    got = np.asarray(
        generate_speculative(dec, params, input_ids=jnp.asarray(ids), config=gcfg, gamma=3)[0]
    )
    assert np.array_equal(got, ref)


def test_speculative_rejects_batch(dp):
    dec, params = dp
    with pytest.raises(ValueError, match="B=1"):
        generate_speculative(
            dec, params, input_ids=jnp.ones((2, 4), jnp.int32),
            config=GenerationConfig(max_new_tokens=4),
        )


def test_spec_accept_marginals():
    """Rejection sampling against a delta proposal must reproduce the target
    distribution EXACTLY at every position — accepted-draft mass plus residual
    resampling mass — whatever the draft is (the losslessness proof, checked
    empirically on a tiny categorical)."""
    from merv_tpu.models.generation import _spec_accept

    V, gamma, N = 6, 2, 40000
    rng = np.random.RandomState(0)
    p = rng.dirichlet(np.ones(V), size=gamma + 1)  # target dists per position
    probs = jnp.asarray(np.broadcast_to(p, (N, gamma + 1, V)), jnp.float32)
    # draft position 0 = the mode (high acceptance), position 1 = the least
    # likely token (high rejection) — both must come out exact
    draft = jnp.asarray(
        np.broadcast_to([int(p[0].argmax()), int(p[1].argmin())], (N, gamma)), jnp.int32
    )
    toks, emit_n = _spec_accept(probs, draft, jax.random.PRNGKey(1), pad_id=-1)
    toks, emit_n = np.asarray(toks), np.asarray(emit_n)

    # position 0 always emits; its marginal must be p[0]
    freq0 = np.bincount(toks[:, 0], minlength=V) / N
    np.testing.assert_allclose(freq0, p[0], atol=0.015)
    # position 1 emits only when draft 0 accepted; CONDITIONAL marginal = p[1]
    m1 = emit_n >= 2
    assert 0.2 < m1.mean() < 1.0  # the mode draft accepts often but not always
    freq1 = np.bincount(toks[m1, 1], minlength=V) / m1.sum()
    np.testing.assert_allclose(freq1, p[1], atol=0.02)
    # emit counts: 1 + accepted(+bonus); acceptance rate of the mode draft ~= p0(mode)
    np.testing.assert_allclose(m1.mean(), p[0].max(), atol=0.015)


def test_speculative_sampling_greedy_limit(dp):
    """do_sample with top_k=1 makes the filtered distribution an EXACT delta
    at the argmax: speculative sampling must then reproduce the greedy output
    exactly — a deterministic end-to-end check of the sampling plumbing
    (acceptance probability p(argmax)=1, the residual branch unreachable, the
    bonus sample the argmax; the rejection-sampling MATH itself is pinned by
    test_spec_accept_marginals). A near-zero TEMPERATURE would not work:
    logits within ~1e-4 of the max keep real mass and the sampler would
    legitimately pick either — observed on this seed at position 9."""
    dec, params = dp
    for seed, n in [(8, 5), (9, 11)]:
        ids = np.random.RandomState(seed).randint(4, 30, (1, n)).astype(np.int32)
        greedy = GenerationConfig(max_new_tokens=10, eos_token_id=1, pad_token_id=0)
        ref = _ref(dec, params, ids, greedy)
        sharp = GenerationConfig(max_new_tokens=10, do_sample=True, top_k=1,
                                 eos_token_id=1, pad_token_id=0)
        for gamma in (2, 4):
            got = np.asarray(generate_speculative(
                dec, params, input_ids=jnp.asarray(ids), config=sharp,
                gamma=gamma, rng=jax.random.PRNGKey(3),
            )[0])
            assert np.array_equal(got, ref), (seed, gamma)


def test_speculative_sampling_runs_and_valid(dp):
    """Real-temperature sampling through the speculative path: valid tokens,
    correct shapes, runs to budget or EOS."""
    dec, params = dp
    ids = np.random.RandomState(8).randint(4, 30, (1, 5)).astype(np.int32)
    gcfg = GenerationConfig(max_new_tokens=6, do_sample=True, temperature=1.2,
                            top_p=0.95, eos_token_id=1, pad_token_id=0)
    out = np.asarray(generate_speculative(
        dec, params, input_ids=jnp.asarray(ids), config=gcfg, gamma=3,
        rng=jax.random.PRNGKey(5),
    )[0])
    V = dec.cfg.vocab_size
    assert out.shape == (6,) and (out >= 0).all() and (out < V).all()


def test_ngram_propose_finds_most_recent():
    #                0  1  2  3  4  5  6  7  8
    hist = jnp.array([9, 5, 6, 3, 5, 6, 4, 5, 6] + [0] * 7, jnp.int32)
    # current suffix (5, 6) at 7..8; most recent PREVIOUS occurrence at 4..5 -> next is 4
    draft = _ngram_propose(hist, jnp.int32(9), gamma=2, ngram=2, pad_id=0)
    assert draft.tolist() == [4, 5]
    # no previous occurrence at ANY level -> pads
    hist2 = jnp.array([9, 8, 7, 6, 5] + [0] * 11, jnp.int32)
    draft2 = _ngram_propose(hist2, jnp.int32(5), gamma=2, ngram=2, pad_id=0)
    assert draft2.tolist() == [0, 0]
    # cascade: bigram suffix (8, 5) is novel, but unigram 5 occurred at 1 -> next is 6
    hist3 = jnp.array([9, 5, 6, 3, 8, 5] + [0] * 10, jnp.int32)
    draft3 = _ngram_propose(hist3, jnp.int32(6), gamma=2, ngram=2, pad_id=0)
    assert draft3.tolist() == [6, 3]
    # longest level wins over a more recent shorter match: suffix (5, 6) matches
    # at 1 even though unigram 6 also occurs later at 6
    hist4 = jnp.array([9, 5, 6, 3, 7, 8, 6, 5, 6] + [0] * 7, jnp.int32)
    draft4 = _ngram_propose(hist4, jnp.int32(9), gamma=1, ngram=2, pad_id=0)
    assert draft4.tolist() == [3]


def test_speculative_jits_to_one_program(dp):
    """The whole speculative generation (prefill + while-loop) compiles as one
    program and is re-invocable with different prompt contents."""
    dec, params = dp
    gcfg = GenerationConfig(max_new_tokens=10, eos_token_id=1, pad_token_id=0)
    fn = jax.jit(
        lambda p, ids: generate_speculative(dec, p, input_ids=ids, config=gcfg, gamma=3)
    )
    for seed in (0, 1):
        ids = np.random.RandomState(seed).randint(4, 30, (1, 8)).astype(np.int32)
        ref = _ref(dec, params, ids, gcfg)
        assert np.array_equal(np.asarray(fn(params, jnp.asarray(ids))[0]), ref)


def test_vidlm_speculative_matches_plain():
    """Full multimodal pipeline: speculative generate() == plain generate()
    (text ids as draft corpus, embeds prefill, visual-token rope offsets)."""
    from tests.test_merv_vidlm import _make_merv

    m = _make_merv()
    params = m.init(KEY)
    video = (np.random.RandomState(7).rand(4, 32, 32, 3) * 255).astype(np.uint8)
    for vid, prompt in [
        (video, "In: describe what is happening in the video?\nOut: "),
        (None, "In: a text only question?\nOut: "),
    ]:
        plain = m.generate(params, vid, prompt, max_new_tokens=6)
        spec = m.generate(params, vid, prompt, max_new_tokens=6, speculative_gamma=3)
        assert spec == plain, (prompt, spec, plain)
