"""Flagship transformer tests (single-device and sharded train step)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tf_flash_attention_tpu.mask_rules import LocalRule
from tf_flash_attention_tpu.models.transformer import (
    ModelConfig,
    forward,
    init_params,
    loss_fn,
    make_sharded_train_step,
    param_shardings,
    train_step,
)
from tf_flash_attention_tpu.parallel.mesh import make_mesh

CFG = ModelConfig(vocab=128, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
                  d_head=16, d_ff=128, max_seq=64)


def test_forward_shapes_and_finite():
    params = init_params(CFG, jax.random.PRNGKey(0))
    tokens = jnp.zeros((2, 64), jnp.int32)
    logits = forward(CFG, params, tokens)
    assert logits.shape == (2, 64, 128)
    assert np.isfinite(np.asarray(logits)).all()


def test_local_attention_model():
    cfg = ModelConfig(vocab=128, d_model=64, n_layers=1, n_heads=4, n_kv_heads=4,
                      d_head=16, d_ff=128, max_seq=64,
                      rule=LocalRule(window_size=8, is_causal=True))
    params = init_params(cfg, jax.random.PRNGKey(0))
    logits = forward(cfg, params, jnp.zeros((1, 64), jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_train_step_decreases_loss():
    params = init_params(CFG, jax.random.PRNGKey(0))
    optimizer = optax.adamw(1e-2)
    opt_state = optimizer.init(params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 65), 0, CFG.vocab)
    losses = []
    for _ in range(3):
        loss, params, opt_state = train_step(
            CFG, params, opt_state, tokens, optimizer=optimizer)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sharded_train_step():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh((2, 4), ("data", "model"), jax.devices()[:8])
    cfg = ModelConfig(vocab=128, d_model=64, n_layers=2, n_heads=8, n_kv_heads=8,
                      d_head=16, d_ff=128, max_seq=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    optimizer = optax.adamw(1e-2)
    opt_state = optimizer.init(params)
    params = jax.device_put(params, param_shardings(cfg, mesh))
    step = make_sharded_train_step(cfg, mesh, optimizer)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 65), 0, cfg.vocab)
    loss, params, opt_state = step(params, opt_state, tokens)
    assert np.isfinite(float(loss))
    # second step runs from donated/sharded state
    loss2, params, opt_state = step(params, opt_state, tokens)
    assert float(loss2) < float(loss) + 1.0


def test_checkpoint_roundtrip(tmp_path):
    from tf_flash_attention_tpu.utils.checkpoint import (
        latest_step, restore_checkpoint, save_checkpoint)

    params = init_params(CFG, jax.random.PRNGKey(0))
    state = {"params": params, "step": jnp.asarray(7)}
    save_checkpoint(str(tmp_path), 7, state)
    assert latest_step(str(tmp_path)) == 7
    restored = restore_checkpoint(str(tmp_path), target=state)
    got = jax.tree.leaves(restored)
    want = jax.tree.leaves(state)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored params drive the model
    logits = forward(CFG, restored["params"], jnp.zeros((1, 8), jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_model_trains():
    import optax
    cfg = ModelConfig(vocab=128, d_model=64, n_layers=2, n_heads=4, n_kv_heads=4,
                      d_head=16, d_ff=128, max_seq=64, n_experts=4,
                      dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    optimizer = optax.adamw(1e-2)
    opt_state = optimizer.init(params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 65), 0, cfg.vocab)
    losses = []
    for _ in range(3):
        loss, params, opt_state = train_step(
            cfg, params, opt_state, tokens, optimizer=optimizer)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_moe_sharded_step_expert_parallel():
    import optax
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh((2, 4), ("data", "model"), jax.devices()[:8])
    cfg = ModelConfig(vocab=128, d_model=64, n_layers=1, n_heads=8, n_kv_heads=8,
                      d_head=16, d_ff=128, max_seq=64, n_experts=4)
    params = init_params(cfg, jax.random.PRNGKey(0))
    optimizer = optax.adamw(1e-2)
    opt_state = optimizer.init(params)
    params = jax.device_put(params, param_shardings(cfg, mesh))
    step = make_sharded_train_step(cfg, mesh, optimizer)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 65), 0, cfg.vocab)
    loss, params, opt_state = step(params, opt_state, tokens)
    assert np.isfinite(float(loss))


def test_pipeline_matches_dense_and_trains():
    import optax
    from tf_flash_attention_tpu.models.pipeline import (
        make_pipeline_train_step, pipeline_loss_fn, stack_stage_params)
    from tf_flash_attention_tpu.models.transformer import loss_fn as dense_loss

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    cfg = ModelConfig(vocab=64, d_model=64, n_layers=4, n_heads=4, n_kv_heads=4,
                      d_head=16, d_ff=128, max_seq=64, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh((2, 4), ("data", "pipe"), jax.devices()[:8])
    stacked = stack_stage_params(cfg, params, 4)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 33), 0, 64)

    lf = pipeline_loss_fn(cfg, mesh, n_microbatches=2)
    np.testing.assert_allclose(float(lf(stacked, tokens)),
                               float(dense_loss(cfg, params, tokens)),
                               rtol=1e-5)

    opt = optax.adamw(1e-2)
    step, shardfn = make_pipeline_train_step(cfg, mesh, opt, n_microbatches=2)
    opt_state = opt.init(stacked)
    stacked = jax.device_put(stacked, shardfn(stacked))
    losses = []
    for _ in range(3):
        loss, stacked, opt_state = step(stacked, opt_state, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_weight_only_int8_inference():
    from tf_flash_attention_tpu.models.transformer import quantize_model_weights

    cfg = ModelConfig(vocab=64, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
                      d_head=16, d_ff=128, max_seq=64, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 64)
    dense_logits = forward(cfg, params, tokens)
    q_logits = forward(cfg, quantize_model_weights(params), tokens)
    rel = float(jnp.max(jnp.abs(dense_logits - q_logits))) / float(
        jnp.max(jnp.abs(dense_logits)))
    assert rel < 0.05, rel


def test_context_parallel_model_matches_dense():
    import dataclasses as dc
    import optax
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from tf_flash_attention_tpu.models.transformer import loss_fn

    cfg = ModelConfig(vocab=128, d_model=64, n_layers=2, n_heads=4, n_kv_heads=4,
                      d_head=16, d_ff=128, max_seq=256, context_parallel=True,
                      dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh((2, 2, 2), ("data", "model", "context"), jax.devices()[:8])
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 257), 0, 128)
    l_cp = float(loss_fn(cfg, params, tokens, mesh=mesh))
    l_dense = float(loss_fn(dc.replace(cfg, context_parallel=False), params, tokens))
    np.testing.assert_allclose(l_cp, l_dense, rtol=1e-5)

    optimizer = optax.adamw(1e-2)
    params = jax.device_put(params, param_shardings(cfg, mesh))
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(cfg, mesh, optimizer)
    losses = []
    for _ in range(3):
        loss, params, opt_state = step(params, opt_state, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
