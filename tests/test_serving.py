"""Serving-slice tests: paged KV cache, decode kernel, batching engine.

Golden check: greedy tokens from the continuous-batching engine (paged
cache + decode kernel) must equal greedy tokens from naively re-running
the dense model forward on the growing sequence.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_flash_attention_tpu.models.transformer import ModelConfig, forward, init_params
from tf_flash_attention_tpu.serving.decode import paged_decode_attention
from tf_flash_attention_tpu.serving.engine import DecodeEngine, EngineConfig
from tf_flash_attention_tpu.serving.kv_cache import (
    KVCacheConfig,
    PageAllocator,
    PagedKVCache,
    write_prompt,
)

MCFG = ModelConfig(vocab=64, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
                   d_head=16, d_ff=128, max_seq=256, dtype=jnp.float32)


def test_paged_decode_matches_dense():
    rng = np.random.default_rng(0)
    cfg = KVCacheConfig(n_kv_heads=2, head_dim=32, page_size=64, n_pages=16,
                        max_seqs=2, max_pages_per_seq=4, quantized=False,
                        dtype=jnp.float32)
    cache = PagedKVCache.create(cfg)
    alloc = PageAllocator(cfg.n_pages - 1)
    t = 150
    k = jnp.asarray(rng.uniform(-1, 1, (2, t, 32)), jnp.float32)
    v = jnp.asarray(rng.uniform(-1, 1, (2, t, 32)), jnp.float32)
    pages = alloc.alloc(0, -(-t // cfg.page_size))
    cache = write_prompt(cache, cfg, 0, np.array(pages), k, v)
    q = jnp.asarray(rng.uniform(-1, 1, (2, 4, 32)), jnp.float32)
    o = paged_decode_attention(q, cache, cfg)

    qg = np.asarray(q[0]).reshape(2, 2, 32)
    s = np.einsum("hgd,htd->hgt", qg, np.asarray(k)) / np.sqrt(32)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("hgt,htd->hgd", p, np.asarray(v)).reshape(4, 32)
    np.testing.assert_allclose(np.asarray(o[0]), ref, rtol=2e-5, atol=2e-5)
    # empty slot yields zeros
    np.testing.assert_array_equal(np.asarray(o[1]), 0.0)


def test_int8_cache_roundtrip_accuracy():
    rng = np.random.default_rng(1)
    cfg = KVCacheConfig(n_kv_heads=2, head_dim=32, page_size=64, n_pages=8,
                        max_seqs=1, max_pages_per_seq=2, quantized=True)
    cache = PagedKVCache.create(cfg)
    alloc = PageAllocator(cfg.n_pages - 1)
    t = 100
    k = jnp.asarray(rng.uniform(-1, 1, (2, t, 32)), jnp.float32)
    v = jnp.asarray(rng.uniform(-1, 1, (2, t, 32)), jnp.float32)
    cache = write_prompt(cache, cfg, 0, np.array(alloc.alloc(0, 2)), k, v)
    q = jnp.asarray(rng.uniform(-1, 1, (1, 4, 32)), jnp.float32)
    o = paged_decode_attention(q, cache, cfg)
    qg = np.asarray(q[0]).reshape(2, 2, 32)
    s = np.einsum("hgd,htd->hgt", qg, np.asarray(k)) / np.sqrt(32)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("hgt,htd->hgd", p, np.asarray(v)).reshape(4, 32)
    err = np.abs(np.asarray(o[0]) - ref).max()
    assert err < 2e-2, err  # int8 quantization tolerance


def greedy_dense(params, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits = forward(MCFG, params, jnp.asarray([toks], jnp.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks


@pytest.mark.parametrize("quantized", [False])
def test_engine_matches_dense_greedy(quantized):
    params = init_params(MCFG, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_seqs=3, page_size=64, n_pages=32,
                        max_pages_per_seq=4, quantized_kv=quantized,
                        prefill_buckets=(64,))
    eng = DecodeEngine(MCFG, params, ecfg)
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9], [10, 11, 12, 13]]
    rids = [eng.submit(p, max_new_tokens=6) for p in prompts]
    results = eng.run(max_steps=50)
    for rid, prompt in zip(rids, prompts):
        want = greedy_dense(params, prompt, 6)
        assert results[rid] == want, (results[rid], want)


def test_engine_continuous_admission():
    """More requests than slots: later requests admitted as slots free."""
    params = init_params(MCFG, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_seqs=2, page_size=64, n_pages=16,
                        max_pages_per_seq=4, quantized_kv=False,
                        prefill_buckets=(64,))
    eng = DecodeEngine(MCFG, params, ecfg)
    rids = [eng.submit([i + 1, i + 2], max_new_tokens=4) for i in range(5)]
    results = eng.run(max_steps=100)
    assert len(results) == 5
    for rid in rids:
        assert len(results[rid]) == 2 + 4


def test_sharded_decode_matches_local():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from tf_flash_attention_tpu.parallel.mesh import make_mesh
    from tf_flash_attention_tpu.serving.sharded_decode import sharded_paged_decode

    rng = np.random.default_rng(5)
    cfg = KVCacheConfig(n_kv_heads=8, head_dim=32, page_size=64, n_pages=16,
                        max_seqs=2, max_pages_per_seq=4, quantized=True)
    cache = PagedKVCache.create(cfg)
    alloc = PageAllocator(cfg.n_pages - 1)
    t = 130
    k = jnp.asarray(rng.uniform(-1, 1, (8, t, 32)), jnp.float32)
    v = jnp.asarray(rng.uniform(-1, 1, (8, t, 32)), jnp.float32)
    cache = write_prompt(cache, cfg, 0, np.array(alloc.alloc(0, 3)), k, v)
    q = jnp.asarray(rng.uniform(-1, 1, (2, 16, 32)), jnp.float32)

    o_local = paged_decode_attention(q, cache, cfg)
    mesh = make_mesh((1, 4), ("data", "model"), jax.devices()[:4])
    fn = sharded_paged_decode(mesh, cfg)
    o_sharded = fn(q, cache)
    np.testing.assert_allclose(np.asarray(o_sharded), np.asarray(o_local),
                               rtol=1e-5, atol=1e-5)


def test_fp8_cache_roundtrip_accuracy():
    rng = np.random.default_rng(2)
    cfg = KVCacheConfig(n_kv_heads=2, head_dim=32, page_size=64, n_pages=8,
                        max_seqs=1, max_pages_per_seq=2, quantized=True,
                        quant_dtype=jnp.float8_e4m3fn)
    cache = PagedKVCache.create(cfg)
    assert cache.k_pages.dtype == jnp.float8_e4m3fn
    alloc = PageAllocator(cfg.n_pages - 1)
    t = 100
    k = jnp.asarray(rng.uniform(-1, 1, (2, t, 32)), jnp.float32)
    v = jnp.asarray(rng.uniform(-1, 1, (2, t, 32)), jnp.float32)
    cache = write_prompt(cache, cfg, 0, np.array(alloc.alloc(0, 2)), k, v)
    q = jnp.asarray(rng.uniform(-1, 1, (1, 4, 32)), jnp.float32)
    o = paged_decode_attention(q, cache, cfg)
    qg = np.asarray(q[0]).reshape(2, 2, 32)
    s = np.einsum("hgd,htd->hgt", qg, np.asarray(k)) / np.sqrt(32)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("hgt,htd->hgd", p, np.asarray(v)).reshape(4, 32)
    err = np.abs(np.asarray(o[0]) - ref).max()
    assert err < 4e-2, err  # fp8-e4m3 quantization tolerance


# ---------------------------------------------------------------------------
# Sampling (temperature / top-k / top-p) and EOS stop
# ---------------------------------------------------------------------------

def test_sample_tokens_rules():
    from tf_flash_attention_tpu.serving.sampling import sample_tokens

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros(4)
    o = jnp.ones(4)

    # temperature 0 -> greedy
    got = sample_tokens(logits, key, z, jnp.zeros(4, jnp.int32), o)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.argmax(logits, -1)))
    # top_k = 1 -> greedy at any temperature
    got = sample_tokens(logits, key, o * 5.0, jnp.ones(4, jnp.int32), o)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.argmax(logits, -1)))
    # tiny top_p -> greedy (only the best token survives the nucleus)
    got = sample_tokens(logits, key, o * 5.0, jnp.zeros(4, jnp.int32),
                        o * 1e-6)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.argmax(logits, -1)))
    # top_k = 8: every sample lands inside the per-slot top-8 set
    k8 = jnp.full((4,), 8, jnp.int32)
    top8 = np.argsort(-np.asarray(logits), axis=-1)[:, :8]
    for i in range(20):
        got = np.asarray(sample_tokens(
            logits, jax.random.fold_in(key, i), o * 1.3, k8, o))
        for s in range(4):
            assert got[s] in top8[s]
    # determinism: same key -> same tokens
    a = sample_tokens(logits, key, o, k8, o * 0.9)
    b = sample_tokens(logits, key, o, k8, o * 0.9)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # per-slot mixing: slot 0 greedy, others sampled
    temps = jnp.asarray([0.0, 1.0, 1.0, 1.0])
    got = np.asarray(sample_tokens(logits, key, temps,
                                   jnp.zeros(4, jnp.int32), o))
    assert got[0] == int(jnp.argmax(logits[0]))


def test_engine_sampling_and_eos():
    from tf_flash_attention_tpu.serving.sampling import SamplingParams

    params = init_params(MCFG, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_seqs=2, page_size=64, n_pages=16,
                        max_pages_per_seq=4, quantized_kv=False,
                        prefill_buckets=(64,), seed=7)
    eng = DecodeEngine(MCFG, params, ecfg)
    r_greedy = eng.submit([1, 2, 3], max_new_tokens=5)
    r_sampled = eng.submit([1, 2, 3], max_new_tokens=5,
                           sampling=SamplingParams(temperature=1.0, top_k=10))
    results = eng.run(max_steps=50)
    # greedy slot matches the dense greedy oracle even while co-batched
    # with a sampled request
    assert results[r_greedy] == greedy_dense(params, [1, 2, 3], 5)
    assert len(results[r_sampled]) == 3 + 5
    assert all(0 <= t < MCFG.vocab for t in results[r_sampled])

    # EOS stop: force eos_id to the greedy continuation's first token so
    # the request retires after one generated token
    first = greedy_dense(params, [1, 2, 3], 1)[-1]
    eng2 = DecodeEngine(MCFG, params, ecfg)
    rid = eng2.submit([1, 2, 3], max_new_tokens=8, eos_id=first)
    results2 = eng2.run(max_steps=50)
    assert results2[rid] == [1, 2, 3, first]
