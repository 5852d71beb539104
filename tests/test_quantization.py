"""Weight-only int8 serving mode: quantization error, Linear/decoder integration."""

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.models.backbones.llm.transformer import LlamaDecoder, tiny_decoder_config
from merv_tpu.nn.core import Linear
from merv_tpu.nn.quantization import apply_quantized, dequantize_kernel, quantize_kernel, quantize_tree

KEY = jax.random.PRNGKey(0)


def test_quantize_roundtrip_error():
    w = jax.random.normal(KEY, (64, 128)) * 0.05
    q = quantize_kernel(w)
    assert q["kernel_q"].dtype == jnp.int8 and q["scale"].shape == (1, 128)
    deq = dequantize_kernel(q)
    # symmetric 8-bit: max error bounded by scale/2 per element
    err = np.max(np.abs(np.asarray(deq - w)))
    assert err <= float(q["scale"].max()) / 2 + 1e-7


def test_linear_consumes_quantized_params():
    lin = Linear(32, 48)
    params = lin.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    full = lin(params, x)
    qparams = {**quantize_kernel(params["kernel"]), "bias": params["bias"]}
    quant = lin(qparams, x)
    np.testing.assert_allclose(np.asarray(quant), np.asarray(full), atol=5e-2, rtol=0)
    # matches the explicit helper
    np.testing.assert_allclose(
        np.asarray(apply_quantized(x, qparams) + params["bias"]), np.asarray(quant), atol=1e-5
    )


def test_quantize_tree_skips_embeddings_and_norms():
    cfg = tiny_decoder_config(compute_dtype=jnp.float32)
    dec = LlamaDecoder(cfg)
    params = dec.init(KEY)
    qparams = quantize_tree(params)
    assert "embedding" in qparams["embed_tokens"]  # untouched
    assert "kernel_q" in qparams["layers"]["attn"]["q_proj"]
    assert "scale" in qparams["layers"]["mlp"]["down_proj"]
    assert "scale" in qparams["final_norm"]  # RMSNorm scale vector untouched (1-D)
    assert qparams["layers"]["attn"]["q_proj"]["kernel_q"].shape[0] == cfg.num_layers


def test_quantized_decoder_logits_close():
    cfg = tiny_decoder_config(compute_dtype=jnp.float32)
    dec = LlamaDecoder(cfg)
    params = dec.init(KEY)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 16)), jnp.int32)
    full, _ = dec(params, input_ids=ids)
    quant, _ = dec(quantize_tree(params), input_ids=ids)
    pf = jax.nn.softmax(full.astype(jnp.float32), -1)
    pq = jax.nn.softmax(quant.astype(jnp.float32), -1)
    # next-token distributions stay close under weight-only int8
    tvd = float(0.5 * jnp.abs(pf - pq).sum(-1).max())
    assert tvd < 0.05, tvd
    # random-init logits are near-uniform, so a few argmax flips are expected;
    # require strong agreement rather than bitwise greedy match
    agree = np.mean(np.asarray(full.argmax(-1)) == np.asarray(quant.argmax(-1)))
    assert agree >= 0.9, agree
