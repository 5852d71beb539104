"""Mesh + sharding-rule tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from merv_tpu.parallel import (
    MeshConfig,
    PartitionRules,
    build_mesh,
    fsdp_specs,
    infer_fsdp_spec,
    llm_tensor_parallel_rules,
    shard_params,
)


def test_mesh_resolve():
    assert MeshConfig(data=2, fsdp=-1, tensor=1).resolve(8) == (2, 4, 1, 1, 1)
    assert MeshConfig(data=1, fsdp=8, tensor=1).resolve(8) == (1, 8, 1, 1, 1)
    assert MeshConfig(data=1, fsdp=-1, tensor=1, seq=4).resolve(8) == (1, 2, 1, 4, 1)
    assert MeshConfig(data=1, fsdp=-1, tensor=1, pipe=4).resolve(8) == (1, 2, 1, 1, 4)
    with pytest.raises(ValueError):
        MeshConfig(data=3, fsdp=-1).resolve(8)


def test_build_mesh_axes(mesh8):
    assert mesh8.shape == {"data": 2, "fsdp": 4, "tensor": 1, "sp": 1, "pp": 1}


def test_infer_fsdp_spec():
    assert infer_fsdp_spec((4096, 11008), 4) == P(None, "fsdp")
    assert infer_fsdp_spec((11008, 4096), 4) == P("fsdp", None)
    # small params replicate
    assert infer_fsdp_spec((4096,), 4) == P()
    # indivisible largest axis falls through to next divisible axis
    assert infer_fsdp_spec((4097, 4096), 4) == P(None, "fsdp")


def test_shard_params_places_on_mesh(mesh8):
    params = {
        "layer": {"kernel": jnp.zeros((256, 512)), "bias": jnp.zeros((512,))},
    }
    specs = fsdp_specs(params, mesh8)
    assert specs["layer"]["kernel"] == P(None, "fsdp")
    assert specs["layer"]["bias"] == P()
    sharded = shard_params(params, specs, mesh8)
    shard_shape = sharded["layer"]["kernel"].sharding.shard_shape((256, 512))
    assert shard_shape == (256, 128)


def test_tp_rules_match_paths():
    rules = llm_tensor_parallel_rules()
    # layer kernels are stacked [L, in, out] -> leading axis unsharded
    assert rules.spec_for("llm_backbone/layers/attn/q_proj/kernel") == P(None, None, "tensor")
    assert rules.spec_for("llm_backbone/layers/mlp/down_proj/kernel") == P(None, "tensor", None)
    assert rules.spec_for("llm_backbone/layers/input_norm/scale") is None
    assert rules.spec_for("llm_backbone/embed_tokens/embedding") == P("tensor", None)


def test_pjit_matmul_runs_sharded(mesh8):
    """End-to-end: sharded matmul over the mesh produces the same result as local."""
    x = np.random.RandomState(0).randn(16, 256).astype(np.float32)
    w = np.random.RandomState(1).randn(256, 512).astype(np.float32)
    from jax.sharding import NamedSharding

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh8, P(("data", "fsdp"), None)))
    ws = jax.device_put(jnp.asarray(w), NamedSharding(mesh8, P(None, "fsdp")))

    @jax.jit
    def f(x, w):
        return x @ w

    out = f(xs, ws)
    np.testing.assert_allclose(np.asarray(out), x @ w, rtol=1e-5, atol=1e-5)


def test_tensor_parallel_decoder_forward_matches_single_device():
    """TP over the `tensor` axis: sharded decoder logits == unsharded logits."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from merv_tpu.models.backbones.llm.transformer import LlamaDecoder, tiny_decoder_config
    from merv_tpu.parallel import MeshConfig, build_mesh, fsdp_specs, llm_tensor_parallel_rules, shard_params

    mesh = build_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
    cfg = tiny_decoder_config(num_heads=4, num_kv_heads=4, head_dim=16, hidden_size=64,
                              intermediate_size=128, compute_dtype=jnp.float32)
    dec = LlamaDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 16)), jnp.int32)

    ref_logits, _ = jax.jit(lambda p, i: dec(p, input_ids=i))(params, ids)

    specs = fsdp_specs(params, mesh, overrides=llm_tensor_parallel_rules(), min_weight_size=1)
    sharded = shard_params(params, specs, mesh)
    tp_logits, _ = jax.jit(lambda p, i: dec(p, input_ids=i))(sharded, ids)

    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits), atol=2e-4)


def test_activation_mesh_scoping(mesh8):
    """The context manager scopes the constraint mesh and restores on exit."""
    from merv_tpu.parallel import sharding as sh

    assert sh._ACTIVATION_MESH is None
    with sh.activation_mesh(mesh8):
        assert sh._ACTIVATION_MESH is mesh8
        with sh.activation_mesh(None):  # nested override restores the outer mesh
            assert sh._ACTIVATION_MESH is None
        assert sh._ACTIVATION_MESH is mesh8
    assert sh._ACTIVATION_MESH is None


def test_jit_train_step_does_not_leak_activation_mesh(mesh8):
    """Tracing a training step must not leave the mesh registered globally
    (a leaked training mesh would infect later serving jits in-process)."""
    import optax

    from merv_tpu.parallel import sharding as sh
    from merv_tpu.training.train_step import (
        TrainState, jit_train_step, make_train_step, shard_train_state,
    )

    params = {"w": jnp.ones((8, 8), jnp.float32)}
    tx = optax.sgd(1e-2)

    def loss_fn(p, batch):
        return jnp.mean((batch["x"] @ p["w"] - batch["y"]) ** 2) + sh.constrain_batch_dim(batch["x"]).sum() * 0.0

    step = make_train_step(loss_fn, tx)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state, specs = shard_train_state(state, mesh8)
    fn = jit_train_step(step, specs, mesh8)
    batch = {"x": jnp.ones((8, 8), jnp.float32), "y": jnp.zeros((8, 8), jnp.float32)}
    state, metrics = fn(state, batch)  # traces (and runs) under the scoped mesh
    assert float(metrics["loss"]) >= 0.0
    assert sh._ACTIVATION_MESH is None  # nothing leaked past the trace


def test_tensor_axis_active_uses_explicit_mesh():
    """load_vid's TP pack guard keys on the mesh the caller passes in —
    the serving flow never registers a global mesh."""
    from merv_tpu.models.load_vid import _tensor_axis_active

    tp_mesh = build_mesh(MeshConfig(data=1, fsdp=1, tensor=8))
    flat_mesh = build_mesh(MeshConfig(data=1, fsdp=8, tensor=1))
    assert _tensor_axis_active(tp_mesh)
    assert not _tensor_axis_active(flat_mesh)
    assert not _tensor_axis_active(None)
