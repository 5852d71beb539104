"""Core nn op numerics (merv_tpu/nn/core.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from merv_tpu.nn.core import _fast_erf, gelu


def test_fast_erf_matches_lax_erf():
    """tanh-composed polynomial erf: <=5e-7 everywhere (incl. the clamp
    region |z|>4) — orders below the 2e-4 tower-golden tolerances."""
    z = jnp.asarray(np.linspace(-10, 10, 400001), jnp.float32)
    err = np.abs(np.asarray(_fast_erf(z)) - np.asarray(jax.lax.erf(z)))
    assert err.max() < 5e-7, err.max()


def test_fast_gelu_matches_exact():
    x = jnp.asarray(np.linspace(-10, 10, 400001), jnp.float32)
    want = jax.nn.gelu(x, approximate=False)
    got = gelu(x)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-6
    # bf16 outputs may differ by at most one ulp from the exact path
    xb = x.astype(jnp.bfloat16)
    a = np.asarray(gelu(xb).astype(jnp.float32))
    b = np.asarray(jax.nn.gelu(xb.astype(jnp.float32), approximate=False))
    assert np.abs(a - b).max() < 0.04  # one bf16 ulp at |x|~8
