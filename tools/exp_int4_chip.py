"""On-chip smoke test for the int4 KV cache Mosaic paths."""
import dataclasses
import sys
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp

from tf_flash_attention_tpu.serving.kv_cache import (
    KVCacheConfig, PagedKVCache, PageAllocator, write_prompt,
    write_tokens_at, append_tokens_batched, gather_sequence_kv)
from tf_flash_attention_tpu.serving.decode import (
    paged_decode_attention, paged_multitoken_decode)
from tf_flash_attention_tpu.serving.prefill import paged_prefill_attention

assert jax.default_backend() == "tpu", jax.default_backend()

rng = np.random.default_rng(7)
cfg = KVCacheConfig(n_kv_heads=2, head_dim=128, page_size=256, n_pages=16,
                    max_seqs=4, max_pages_per_seq=4, quantized=True,
                    quant_dtype="int4")
d = cfg.head_dim


def oracle(k, v, q):
    n_kv, t, dd = k.shape
    g = q.shape[0] // n_kv
    qg = q.reshape(n_kv, g, dd)
    s = np.einsum("hgd,htd->hgt", qg, k) / np.sqrt(dd)
    p = np.exp(s - s.max(-1, keepdims=True)); p /= p.sum(-1, keepdims=True)
    return np.einsum("hgt,htd->hgd", p, v).reshape(-1, dd)


# 1. write_prompt + decode kernel
cache = PagedKVCache.create(cfg)
alloc = PageAllocator(cfg.n_pages - 1)
t = 700
k = jnp.asarray(rng.uniform(-1, 1, (2, t, d)), jnp.float32)
v = jnp.asarray(rng.uniform(-1, 1, (2, t, d)), jnp.float32)
cache = write_prompt(cache, cfg, 0, np.array(alloc.alloc(0, 3)), k, v)
q = jnp.asarray(rng.uniform(-1, 1, (4, 8, d)), jnp.float32)
o = paged_decode_attention(q, cache, cfg)
kd, vd = gather_sequence_kv(cache, cfg, 0)
ref = oracle(kd, vd, np.asarray(q[0]))
err = np.abs(np.asarray(o[0]) - ref).max()
print("decode vs dequant oracle err:", err)
assert err < 2e-2, err
ref_true = oracle(np.asarray(k), np.asarray(v), np.asarray(q[0]))
err_t = np.abs(np.asarray(o[0]) - ref_true).max()
print("decode vs true oracle err:", err_t)
assert err_t < 1.5e-1, err_t
np.testing.assert_array_equal(np.asarray(o[1]), 0.0)

# 2. chunk-write Pallas kernel (aligned path) + prefill kernel
cache2 = PagedKVCache.create(cfg)
pages2 = alloc.alloc(1, 4)
cache2 = dataclasses.replace(
    cache2, page_tables=cache2.page_tables.at[0, :4].set(
        jnp.asarray(pages2, jnp.int32)))
chunk = 256
kk = jnp.asarray(rng.uniform(-1, 1, (2, 1024, d)), jnp.float32)
vv = jnp.asarray(rng.uniform(-1, 1, (2, 1024, d)), jnp.float32)
total = 900
start = 0
while start < total:
    n = min(chunk, total - start)
    kc = jnp.pad(kk[:, start:start+n], ((0,0),(0,chunk-n),(0,0)))
    vc = jnp.pad(vv[:, start:start+n], ((0,0),(0,chunk-n),(0,0)))
    cache2 = write_tokens_at(cache2, cfg, 0, start, kc, vc, n,
                             trash_page=cfg.n_pages - 1)
    start += chunk
kd2, vd2 = gather_sequence_kv(cache2, cfg, 0)
qerr = np.abs(kd2 - np.asarray(kk[:, :total])).max()
print("chunk-write dequant err vs true:", qerr)
assert qerr < 0.16, qerr

# prefill attention on the last chunk
q_chunk = jnp.asarray(rng.uniform(-1, 1, (chunk, 8, d)), jnp.float32)
pf_start, pf_true = 768, total - 768
o_pf = paged_prefill_attention(q_chunk, cache2, cfg, 0, pf_start, pf_true)
# oracle for row i: keys 0..pf_start+i
for i in (0, 57, pf_true - 1):
    kv_len = pf_start + i + 1
    ref = oracle(kd2[:, :kv_len], vd2[:, :kv_len], np.asarray(q_chunk[i]))
    e = np.abs(np.asarray(o_pf[i]) - ref).max()
    assert e < 2e-2, (i, e)
print("prefill kernel OK")

# 3. batched append RMW kernel: append 5 tokens to slot 0 (odd/even mix)
cache3 = cache2
base_len = int(cache3.lengths[0])
newk = rng.uniform(-1, 1, (5, 2, d)).astype(np.float32)
newv = rng.uniform(-1, 1, (5, 2, d)).astype(np.float32)
for i in range(5):
    kn = jnp.zeros((cfg.max_seqs, 2, d), jnp.float32).at[0].set(jnp.asarray(newk[i]))
    vn = jnp.zeros((cfg.max_seqs, 2, d), jnp.float32).at[0].set(jnp.asarray(newv[i]))
    active = jnp.asarray([True, False, False, False])
    cache3 = append_tokens_batched(cache3, cfg, kn, vn, active,
                                   trash_page=cfg.n_pages - 1)
assert int(cache3.lengths[0]) == base_len + 5
kd3, vd3 = gather_sequence_kv(cache3, cfg, 0)
aerr = np.abs(kd3[:, base_len:] - newk.transpose(1, 0, 2)).max()
print("append RMW dequant err:", aerr)
assert aerr < 0.16, aerr
# earlier tokens untouched
np.testing.assert_array_equal(kd3[:, :base_len], kd2[:, :base_len])

# 4. multitoken (speculative) decode on the appended cache
gamma = 3
qm = jnp.asarray(rng.uniform(-1, 1, (cfg.max_seqs, gamma, 8, d)), jnp.float32)
om = paged_multitoken_decode(qm, cache3, cfg)
L = int(cache3.lengths[0])
for i in range(gamma):
    kv_len = L - gamma + i + 1
    ref = oracle(kd3[:, :kv_len], vd3[:, :kv_len], np.asarray(qm[0, i]))
    e = np.abs(np.asarray(om[0, i]) - ref).max()
    assert e < 2e-2, (i, e)
print("multitoken decode OK")
print("ALL INT4 CHIP CHECKS PASSED")
