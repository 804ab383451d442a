"""Engine decode-step cost breakdown on the chip (B=16, ctx=8k, 8L model).

Times the full compiled step and its pieces (attention-only chain,
append-only chain, projections+MLP-only) to find non-attention overhead.
"""
import sys
sys.path.insert(0, ".")
import os

import jax
import jax.numpy as jnp
import numpy as np

from tf_flash_attention_tpu.models.transformer import ModelConfig, init_params
from tf_flash_attention_tpu.serving.engine import DecodeEngine, EngineConfig
from tf_flash_attention_tpu.serving.decode import paged_decode_attention
from tf_flash_attention_tpu.serving.kv_cache import append_tokens_batched
from tf_flash_attention_tpu.utils.profiling import device_time

B, CTX, PAGE = 16, 8192, 1024
KVQ = os.environ.get("XKVQ", "int4")
mcfg = ModelConfig(vocab=32768, d_model=1024, n_layers=8, n_heads=8,
                   n_kv_heads=8, d_head=128, d_ff=4096, max_seq=2 * CTX,
                   dtype=jnp.bfloat16)
ecfg = EngineConfig(max_seqs=B, page_size=PAGE,
                    n_pages=B * (CTX // PAGE) + B + 1,
                    max_pages_per_seq=2 * CTX // PAGE, quantized_kv=True,
                    kv_quant_dtype={"int8": jnp.int8, "int4": "int4"}[KVQ],
                    prefill_mode="chunked", prefill_chunk=512)
params = init_params(mcfg, jax.random.PRNGKey(0))
eng = DecodeEngine(mcfg, params, ecfg, interpret=False)
rng = np.random.default_rng(0)
for p in [list(rng.integers(1, 1000, CTX - 8)) for _ in range(B)]:
    eng.submit(p, max_new_tokens=8)
eng._admit()
eng._ensure_capacity()
caches = eng.caches
ccfg = eng.ccfg
q = jnp.asarray(rng.uniform(-1, 1, (B, 8, 128)), jnp.bfloat16)
kv = jnp.asarray(rng.uniform(-1, 1, (B, 8, 128)), jnp.bfloat16)
active = jnp.ones((B,), bool)

# attention-only: 8 chained decode calls (serial dependency via q)
def attn_chain(q, caches):
    o = q
    for c in caches:
        o = paged_decode_attention(o, c, ccfg).astype(q.dtype)
    return o

t = device_time(attn_chain, (q, caches), n=8, reps=4)
print(f"attention x8: {t*1e3:.3f} ms")

# append-only: 8 chained appends
def app_chain(kv, caches):
    new = []
    for c in caches:
        new.append(append_tokens_batched(c, ccfg, kv, kv, active,
                                         eng.trash_page, interpret=False))
    return new

def app_run(kv, caches):
    # chain via fresh copies outside timing is hard; just run once per rep
    return app_chain(kv, caches)

import time
f = jax.jit(app_run, donate_argnums=(1,))
best = float("inf")
for _ in range(4):
    cs = [jax.tree.map(lambda x: x.copy(), c) for c in caches]
    jax.block_until_ready(f(kv, cs))
    cs = [jax.tree.map(lambda x: x.copy(), c) for c in caches]
    t0 = time.perf_counter()
    jax.block_until_ready(f(kv, cs))
    best = min(best, time.perf_counter() - t0)
print(f"appends x8 (one shot, incl dispatch): {best*1e3:.3f} ms")

# projections + MLP only (no attention/appends)
from tf_flash_attention_tpu.models.transformer import _mlp_block, _rms_norm

def proj_chain(x):
    for layer in eng.params["layers"]:
        h = _rms_norm(x, layer["ln1"])
        qp = h @ layer["wq"].astype(h.dtype)
        kp = h @ layer["wk"].astype(h.dtype)
        vp = h @ layer["wv"].astype(h.dtype)
        o = (qp + kp + vp)[:, :1024] @ layer["wo"].astype(h.dtype)
        x = x + o
        x = _mlp_block(mcfg, layer, x[None])[0][0]
    logits = _rms_norm(x, eng.params["final_norm"]) @ eng.params["embed"].astype(x.dtype).T
    return logits

x0 = jnp.asarray(rng.uniform(-1, 1, (B, 1024)), jnp.bfloat16)
t = device_time(proj_chain, (x0,), n=10, reps=4)
print(f"projections+mlp+logits: {t*1e3:.3f} ms")

# full step
tokens = jnp.zeros((B,), jnp.int32)
temps = jnp.zeros((B,), jnp.float32)
top_ks = jnp.zeros((B,), jnp.int32)
top_ps = jnp.ones((B,), jnp.float32)
key = jax.random.PRNGKey(1)

def full_step(params, caches):
    toks, new = eng._decode_step_impl(params, caches, tokens, active,
                                      temps, top_ks, top_ps, key)
    return toks

f2 = jax.jit(full_step, donate_argnums=(1,))
best = float("inf")
for _ in range(4):
    cs = [jax.tree.map(lambda x: x.copy(), c) for c in caches]
    jax.block_until_ready(f2(eng.params, cs))
    cs = [jax.tree.map(lambda x: x.copy(), c) for c in caches]
    t0 = time.perf_counter()
    jax.block_until_ready(f2(eng.params, cs))
    best = min(best, time.perf_counter() - t0)
print(f"full step (one shot, incl dispatch): {best*1e3:.3f} ms")
