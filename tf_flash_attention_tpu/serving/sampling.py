"""Token sampling for the decode engine (greedy / temperature / top-k / top-p).

Vectorized over the slot axis with *per-slot* parameters so one compiled
decode step serves heterogeneous requests (continuous batching mixes
greedy and sampled requests in the same batch).  All selection happens in
jit-friendly sorted space:

* ``temperature == 0`` → greedy (argmax);
* ``top_k > 0`` keeps the k highest logits (per slot, data-dependent k via
  a sorted-threshold compare, not a dynamic slice);
* ``top_p < 1`` keeps the smallest prefix of the sorted softmax whose
  cumulative probability reaches p (the first token is always kept);
* filtered logits are renormalised implicitly by ``jax.random.categorical``.

No reference counterpart (the reference is a fused-attention op library);
this is part of the BASELINE north-star serving layer.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["SamplingParams", "sample_tokens"]

_NEG = jnp.float32(-1e30)


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration (host-side)."""

    temperature: float = 0.0   # 0 = greedy
    top_k: int = 0             # 0 = disabled
    top_p: float = 1.0         # 1 = disabled

    def __post_init__(self):
        if self.temperature < 0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if self.top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {self.top_k}")
        if not 0 < self.top_p <= 1:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")


def sample_tokens(logits, key, temperature, top_k, top_p):
    """Sample one token per slot.

    Args:
      logits: ``(S, vocab)`` float array.
      key: PRNG key; folded per slot.
      temperature: ``(S,)`` float; 0 selects greedy for that slot.
      top_k: ``(S,)`` int32; 0 disables the top-k filter for that slot.
      top_p: ``(S,)`` float; 1 disables the nucleus filter for that slot.

    Returns ``(S,)`` int32 tokens.
    """
    S, vocab = logits.shape
    logits = logits.astype(jnp.float32)
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temperature = temperature.astype(jnp.float32)

    def _sampled(_):
        safe_t = jnp.where(temperature > 0, temperature, 1.0)
        scaled = logits / safe_t[:, None]

        # sorted descending once; both filters are thresholds in sorted space
        sorted_logits = -jnp.sort(-scaled, axis=-1)
        ranks = jnp.arange(vocab, dtype=jnp.int32)[None, :]

        # top-k: keep logits >= the k-th largest value
        k = jnp.clip(top_k.astype(jnp.int32), 0, vocab)
        kth = jnp.take_along_axis(
            sorted_logits, jnp.maximum(k - 1, 0)[:, None], axis=-1)
        keep_k = jnp.where((k > 0)[:, None], scaled >= kth, True)

        # top-p: keep the smallest sorted prefix with cumulative prob >= p,
        # i.e. drop tokens whose *preceding* cumulative mass already reached p
        probs_sorted = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs_sorted, axis=-1)
        cum_before = cum - probs_sorted
        keep_sorted = cum_before < top_p.astype(jnp.float32)[:, None]
        keep_sorted = keep_sorted | (ranks == 0)  # always keep the best token
        # translate the sorted-prefix decision back to a value threshold: the
        # smallest kept sorted logit
        min_kept = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                           axis=-1, keepdims=True)
        keep_p = scaled >= min_kept

        filtered = jnp.where(keep_k & keep_p, scaled, _NEG)
        keys = jax.random.split(key, S)
        sampled = jax.vmap(jax.random.categorical)(keys, filtered).astype(jnp.int32)
        return jnp.where(temperature > 0, sampled, greedy_tok)

    # an all-greedy batch (the common serving case) skips the full-vocab
    # sort/cumsum chain entirely — on a 32k vocab that chain costs more
    # than a whole layer of decode attention
    return jax.lax.cond(
        jnp.any(temperature > 0), _sampled, lambda _: greedy_tok, None)
