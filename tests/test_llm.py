"""Decoder correctness: logit parity vs HF torch Llama/Qwen2, KV-cache consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merv_tpu.models.backbones.llm.hf_import import export_llama_state_dict, import_llama_state_dict
from merv_tpu.models.backbones.llm.transformer import DecoderConfig, KVCache, LlamaDecoder

TINY = DecoderConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=3,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    max_position_embeddings=256,
    rope_theta=10000.0,
    compute_dtype=jnp.float32,  # fp32 for tight parity checks
)


def _hf_llama(cfg: DecoderConfig, attention_bias: bool = False):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        attention_bias=attention_bias,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def hf_and_ours():
    torch = pytest.importorskip("torch")
    model = _hf_llama(TINY)
    state = model.state_dict()
    params = import_llama_state_dict(TINY, state)
    return model, LlamaDecoder(TINY), params, torch


def test_logit_parity_full_sequence(hf_and_ours):
    model, dec, params, torch = hf_and_ours
    rng = np.random.RandomState(0)
    ids = rng.randint(0, TINY.vocab_size, size=(2, 17))
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()
    ours, _ = dec(params, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_logit_parity_with_padding_mask(hf_and_ours):
    model, dec, params, torch = hf_and_ours
    rng = np.random.RandomState(1)
    ids = rng.randint(0, TINY.vocab_size, size=(2, 12))
    mask = np.ones((2, 12), dtype=np.int64)
    mask[0, 8:] = 0  # right padding on row 0
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).logits.numpy()
    ours, _ = dec(params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    # compare only valid positions
    np.testing.assert_allclose(np.asarray(ours)[0, :8], ref[0, :8], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours)[1], ref[1], rtol=2e-4, atol=2e-4)


def test_kv_cache_prefill_then_decode_matches_full(hf_and_ours):
    _, dec, params, _ = hf_and_ours
    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(0, TINY.vocab_size, size=(2, 16)))

    full_logits, _ = dec(params, input_ids=ids)

    cache = KVCache.create(TINY, batch=2, max_len=32, dtype=jnp.float32)
    pre_logits, cache = dec(params, input_ids=ids[:, :10], kv_cache=cache)
    np.testing.assert_allclose(np.asarray(pre_logits), np.asarray(full_logits[:, :10]), rtol=1e-4, atol=1e-4)

    # decode the remaining 6 tokens one by one
    for t in range(10, 16):
        step_logits, cache = dec(params, input_ids=ids[:, t : t + 1], kv_cache=cache)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]), rtol=1e-4, atol=1e-4
        )
    assert int(cache.length) == 16


def test_int8_kv_cache_close_to_full(hf_and_ours):
    """int8 KV cache (per-position scales) tracks the full-precision decode:
    greedy argmax must match and logits stay within quantization tolerance."""
    _, dec, params, _ = hf_and_ours
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(0, TINY.vocab_size, size=(2, 16)))

    full_logits, _ = dec(params, input_ids=ids)

    cache = KVCache.create(TINY, batch=2, max_len=32, dtype=jnp.int8)
    assert cache.k.dtype == jnp.int8 and cache.k_scale is not None
    pre_logits, cache = dec(params, input_ids=ids[:, :10], kv_cache=cache)
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(full_logits[:, :10]), rtol=0.05, atol=0.05
    )
    for t in range(10, 16):
        step_logits, cache = dec(params, input_ids=ids[:, t : t + 1], kv_cache=cache)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]), rtol=0.05, atol=0.05
        )
        assert np.array_equal(
            np.argmax(np.asarray(step_logits[:, 0]), -1), np.argmax(np.asarray(full_logits[:, t]), -1)
        )
    assert int(cache.length) == 16


def test_int8_kv_generate_matches_bf16_greedy(hf_and_ours):
    """End-to-end generate with kv_cache_dtype='int8' produces the same greedy
    tokens as the full-precision cache on the tiny model."""
    _, dec, params, _ = hf_and_ours
    from merv_tpu.models.generation import GenerationConfig, generate

    ids = jnp.asarray(np.random.RandomState(4).randint(3, TINY.vocab_size, size=(2, 9)))
    base = generate(dec, params, input_ids=ids,
                    config=GenerationConfig(max_new_tokens=8, eos_token_id=-1, pad_token_id=0))
    q = generate(dec, params, input_ids=ids,
                 config=GenerationConfig(max_new_tokens=8, eos_token_id=-1, pad_token_id=0,
                                         kv_cache_dtype="int8"))
    assert np.array_equal(np.asarray(base), np.asarray(q))


def test_qwen_style_bias_and_gqa():
    torch = pytest.importorskip("torch")
    cfg = DecoderConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96, num_layers=2,
        num_heads=6, num_kv_heads=2, head_dim=8, rope_theta=1000000.0,
        rms_norm_eps=1e-6, attention_bias=True, compute_dtype=jnp.float32,
    )
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=False, use_sliding_window=False,
    )
    torch.manual_seed(1)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    params = import_llama_state_dict(cfg, model.state_dict())
    dec = LlamaDecoder(cfg)

    ids = np.random.RandomState(3).randint(0, cfg.vocab_size, size=(1, 9))
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()
    ours, _ = dec(params, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_packed_serving_params_bit_exact():
    """pack_serving_params (stored-packed qkv + gate/up GEMMs) must be a pure
    layout change: logits match the unpacked tree to GEMM-tiling rounding
    (wide vs narrow GEMMs reduce in different K orders, so exact bitwise
    equality does not hold), including biases (qwen-style) and GQA splits."""
    from merv_tpu.models.backbones.llm.transformer import pack_serving_params

    cfg = DecoderConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96, num_layers=3,
        num_heads=6, num_kv_heads=2, head_dim=8, attention_bias=True,
        compute_dtype=jnp.float32,
    )
    dec = LlamaDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    packed = pack_serving_params(params)
    assert "qkv_proj" in packed["layers"]["attn"] and "q_proj" not in packed["layers"]["attn"]
    assert "gate_up_proj" in packed["layers"]["mlp"]

    ids = jnp.asarray(np.random.RandomState(0).randint(0, cfg.vocab_size, size=(2, 11)))
    mask = jnp.ones_like(ids).at[1, 8:].set(0)
    ref, _ = dec(params, input_ids=ids, attention_mask=mask)
    got, _ = dec(packed, input_ids=ids, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # decode path with KV cache also runs the packed layout
    cache = KVCache.create(cfg, 2, 16, dtype=jnp.float32)
    _, cache = dec(packed, input_ids=ids, attention_mask=mask, kv_cache=cache)
    step, _ = dec(packed, input_ids=ids[:, -1:], kv_cache=cache)
    assert np.isfinite(np.asarray(step)).all()


def test_export_roundtrip(hf_and_ours):
    model, dec, params, _ = hf_and_ours
    state = export_llama_state_dict(TINY, params)
    reimported = import_llama_state_dict(TINY, state)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(params), jax.tree_util.tree_leaves_with_path(reimported)
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_remat_matches_no_remat(hf_and_ours):
    _, dec, params, _ = hf_and_ours
    ids = jnp.asarray(np.random.RandomState(4).randint(0, TINY.vocab_size, size=(1, 8)))
    a, _ = dec(params, input_ids=ids, remat=False)
    b, _ = dec(params, input_ids=ids, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_greedy_generation_matches_hf(hf_and_ours):
    model, dec, params, torch = hf_and_ours
    from merv_tpu.models.generation import GenerationConfig, generate

    ids = np.random.RandomState(5).randint(3, TINY.vocab_size, size=(1, 7))
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor(ids), max_new_tokens=12, do_sample=False,
            eos_token_id=-1, pad_token_id=0,
        ).numpy()[:, 7:]
    ours = generate(
        dec, params, input_ids=jnp.asarray(ids),
        config=GenerationConfig(max_new_tokens=12, eos_token_id=-1, pad_token_id=0),
    )
    np.testing.assert_array_equal(np.asarray(ours), hf_out)


def test_batched_padded_generation_consistent(hf_and_ours):
    _, dec, params, _ = hf_and_ours
    from merv_tpu.models.generation import GenerationConfig, generate

    rng = np.random.RandomState(6)
    a = rng.randint(3, TINY.vocab_size, size=(1, 9))
    b = rng.randint(3, TINY.vocab_size, size=(1, 5))
    cfg = GenerationConfig(max_new_tokens=8, eos_token_id=-1, pad_token_id=0)

    out_a = generate(dec, params, input_ids=jnp.asarray(a), config=cfg)
    out_b = generate(dec, params, input_ids=jnp.asarray(b), config=cfg)

    # right-padded batch of both rows
    ids = np.zeros((2, 9), dtype=np.int64)
    mask = np.zeros((2, 9), dtype=np.int64)
    ids[0] = a[0]; mask[0] = 1
    ids[1, :5] = b[0]; mask[1, :5] = 1
    out_batch = generate(dec, params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask), config=cfg)

    np.testing.assert_array_equal(np.asarray(out_batch[0]), np.asarray(out_a[0]))
    np.testing.assert_array_equal(np.asarray(out_batch[1]), np.asarray(out_b[0]))


def test_generate_with_prefix_matches_full(hf_and_ours):
    """Shared-prefix KV caching is exact: continuations of a cached prefix
    are token-identical to full-prefill generation on [prefix | suffix],
    across mixed suffix lengths and KV dtypes."""
    _, dec, params, _ = hf_and_ours
    from merv_tpu.models.generation import (
        GenerationConfig,
        generate,
        generate_with_prefix,
        prefill_prefix,
    )

    rng = np.random.RandomState(7)
    P = 6
    prefix = rng.randint(3, TINY.vocab_size, size=(1, P))
    sufs = [rng.randint(3, TINY.vocab_size, size=(n,)) for n in (7, 4, 7)]
    Tmax = max(len(s) for s in sufs)

    suffix_ids = np.zeros((3, Tmax), np.int32)
    sm = np.zeros((3, Tmax), np.int32)
    ids = np.zeros((3, P + Tmax), np.int64)
    mask = np.zeros_like(ids)
    for b, s in enumerate(sufs):
        suffix_ids[b, : len(s)] = s
        sm[b, : len(s)] = 1
        ids[b, :P] = prefix[0]
        ids[b, P : P + len(s)] = s
        mask[b, : P + len(s)] = 1

    pe = dec.embed_input_ids(params, jnp.asarray(prefix))
    for kv_dtype in (None, "int8"):
        cfg = GenerationConfig(max_new_tokens=8, eos_token_id=-1, pad_token_id=0,
                               kv_cache_dtype=kv_dtype)
        full = generate(dec, params, input_ids=jnp.asarray(ids),
                        attention_mask=jnp.asarray(mask), config=cfg)
        cache = prefill_prefix(dec, params, inputs_embeds=pe, kv_cache_dtype=kv_dtype)
        assert cache.k.shape[3] == P  # buffer is exactly the prefix
        out = generate_with_prefix(
            dec, params, cache, suffix_ids=jnp.asarray(suffix_ids),
            suffix_mask=jnp.asarray(sm), config=cfg,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(full), err_msg=str(kv_dtype))
        # the prefix cache survives (not donated): a second batch reuses it
        out2 = generate_with_prefix(
            dec, params, cache, suffix_ids=jnp.asarray(suffix_ids[:1]),
            suffix_mask=jnp.asarray(sm[:1]), config=cfg,
        )
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(full[:1]))


def test_min_length_suppresses_eos():
    """HF MinLengthLogitsProcessor semantics: EOS banned while total length < min_length."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from merv_tpu.models.backbones.llm.transformer import LlamaDecoder, tiny_decoder_config
    from merv_tpu.models.generation import GenerationConfig, generate

    from merv_tpu.models.generation import _ban_eos_below_min_length

    # unit: ban applies per-row while total length < min_length
    logits = jnp.zeros((2, 8))
    banned = _ban_eos_below_min_length(logits, jnp.asarray([3, 9]), GenerationConfig(eos_token_id=5, min_length=6))
    assert np.isneginf(np.asarray(banned)[0, 5]) and np.isfinite(np.asarray(banned)[1, 5])

    cfg = tiny_decoder_config(compute_dtype=jnp.float32)
    dec = LlamaDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(3, 250, (1, 4)), jnp.int32)

    # whatever greedy decode naturally emits first, declare it the EOS token
    free = np.asarray(generate(dec, params, input_ids=ids, config=GenerationConfig(max_new_tokens=4, eos_token_id=-1))[0])
    eos = int(free[0])

    # with min_length = prompt(4) + 3, the first 3 generated tokens cannot be EOS
    toks = generate(
        dec, params, input_ids=ids,
        config=GenerationConfig(max_new_tokens=6, eos_token_id=eos, min_length=7),
    )
    out = np.asarray(toks[0])
    assert all(t != eos for t in out[:3]), (out, eos)


def test_inference_mode_serves_half_precision():
    """inference_mode backbones must init/store params in half precision —
    a 7B fp32 tree is 27 GB and cannot exist on a 16 GB serving chip."""
    from merv_tpu.models.backbones.llm.base_llm import tiny_llm_backbone

    serving = tiny_llm_backbone(inference_mode=True)
    training = tiny_llm_backbone()
    assert serving.decoder_config.param_dtype == serving.half_precision_dtype
    p = serving.init(jax.random.PRNGKey(0))
    leaf = jax.tree_util.tree_leaves(p)[0]
    assert leaf.dtype == serving.half_precision_dtype
    # training keeps full precision for optimizer masters
    assert training.decoder_config.param_dtype == jnp.float32
