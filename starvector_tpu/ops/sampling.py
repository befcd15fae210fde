"""On-device token sampling: greedy, temperature, top-k, top-p, min-p,
repetition/frequency/presence penalties, logit bias — the HF sampling
semantics the reference relies on (reference: starvector_base.py:223-241
passes do_sample/top_p/temperature/repetition_penalty to HF `generate`)
plus the vLLM SamplingParams surface its vLLM validators use (reference:
starvector_vllm_svg_validator.py:35-44 min_p/frequency/presence penalties,
starvector_vllm_api_svg_validator.py:60 logit_bias toward `</svg>`).

All ops are jit-safe with static shapes; masking uses -inf logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def _rowwise(knob: jax.Array, logits: jax.Array) -> jax.Array:
    """Broadcast a sampling knob against (B, V) logits: scalars pass through,
    per-row (B,) knobs (the continuous-batching engine's per-request params)
    gain a trailing axis."""
    knob = jnp.asarray(knob)
    if knob.ndim == logits.ndim - 1 and knob.ndim > 0:
        return knob[..., None]
    return knob


def apply_temperature(logits: jax.Array, temperature: jax.Array) -> jax.Array:
    """Divide by temperature; temperature 0 is handled by the greedy branch
    upstream (HF maps temp==0 → greedy, validate temp sweep does too)."""
    t = jnp.maximum(_rowwise(temperature, logits), 1e-6)
    return logits / t


def apply_top_k(logits: jax.Array, k: jax.Array, max_k: int) -> jax.Array:
    """Keep the top-k logits per row (k traced, bounded by static max_k)."""
    max_k = min(max_k, logits.shape[-1])
    k = _rowwise(k, logits)
    vals, _ = jax.lax.top_k(logits, max_k)  # (..., max_k) sorted desc
    idx = jnp.clip(k - 1, 0, max_k - 1)
    threshold = jnp.take_along_axis(
        vals, jnp.broadcast_to(idx, (*vals.shape[:-1], 1)), axis=-1
    )
    keep = logits >= threshold
    # k <= 0 means disabled (HF convention top_k=0)
    keep = jnp.where(k <= 0, jnp.ones_like(keep), keep)
    return jnp.where(keep, logits, NEG_INF)


def apply_top_p(logits: jax.Array, p: jax.Array) -> jax.Array:
    """Nucleus filtering (HF semantics: keep the smallest set of tokens with
    cumulative prob > p, always keeping the most probable token)."""
    p = _rowwise(p, logits)
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # token i is removed if the cumulative prob *before* it already > p
    keep_sorted = (cum - probs) < p
    keep_sorted = keep_sorted.at[..., 0].set(True)
    # threshold = smallest kept logit
    kept_logits = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    threshold = jnp.min(kept_logits, axis=-1, keepdims=True)
    mask = logits >= threshold
    mask = jnp.where(p >= 1.0, jnp.ones_like(mask), mask)
    return jnp.where(mask, logits, NEG_INF)


def apply_min_p(logits: jax.Array, min_p: jax.Array) -> jax.Array:
    """vLLM min-p: keep tokens whose probability >= min_p * max-probability.
    Applied after temperature scaling (vLLM order). min_p <= 0 disables."""
    min_p = _rowwise(min_p, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    threshold = min_p * jnp.max(probs, axis=-1, keepdims=True)
    keep = probs >= threshold
    keep = jnp.where(min_p <= 0.0, jnp.ones_like(keep), keep)
    return jnp.where(keep, logits, NEG_INF)


def apply_frequency_presence(
    logits: jax.Array,        # (B, V)
    counts: jax.Array,        # (B, V) int — OUTPUT-token occurrence counts
    frequency_penalty: jax.Array,
    presence_penalty: jax.Array,
) -> jax.Array:
    """OpenAI/vLLM additive penalties over generated-token counts:
    logits - frequency_penalty*count - presence_penalty*(count > 0)."""
    fp = _rowwise(frequency_penalty, logits)
    pp = _rowwise(presence_penalty, logits)
    counts = counts.astype(logits.dtype)
    return logits - fp * counts - pp * (counts > 0)


def apply_logit_bias(
    logits: jax.Array,        # (B, V)
    bias_ids: jax.Array,      # (B, K) int32 token ids; negative = inactive
    bias_vals: jax.Array,     # (B, K) additive bias
) -> jax.Array:
    """Sparse additive logit bias (OpenAI `logit_bias`; the reference biases
    the `</svg>` token id). K is a small static bound; unused entries carry
    a negative id and scatter onto a dead row."""
    B, V = logits.shape
    active = bias_ids >= 0
    ids = jnp.where(active, bias_ids, 0)
    vals = jnp.where(active, bias_vals.astype(logits.dtype), 0.0)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], ids.shape)
    return logits.at[rows, ids].add(vals)


def apply_repetition_penalty(
    logits: jax.Array,        # (B, V)
    presence: jax.Array,      # (B, V) 1 where token has appeared
    penalty: jax.Array,
) -> jax.Array:
    """HF CFG: seen & logit>0 → logit/penalty; seen & logit<0 → logit*penalty."""
    penalty = _rowwise(penalty, logits)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    out = jnp.where(presence > 0, penalized, logits)
    return jnp.where(penalty == 1.0, logits, out)


def sample_token(
    rng: jax.Array,
    logits: jax.Array,        # (B, V) fp32
    *,
    do_sample,                # STATIC python bool: False compiles a pure
                              # argmax step (no vocab sort in the hot loop)
    temperature: jax.Array,
    top_p: jax.Array,
    top_k: jax.Array,
    presence: jax.Array | None = None,
    repetition_penalty: jax.Array | None = None,
    counts: jax.Array | None = None,
    frequency_penalty: jax.Array | None = None,
    presence_penalty: jax.Array | None = None,
    min_p: jax.Array | None = None,
    bias_ids: jax.Array | None = None,
    bias_vals: jax.Array | None = None,
    max_top_k: int = 64,
    pruned: bool = False,
) -> jax.Array:
    """Returns (B,) int32 next tokens. Greedy when do_sample is False
    (statically) or temperature == 0 (runtime). Processor order follows
    vLLM: bias → penalties → temperature → top-k → top-p → min-p.

    ``pruned`` (STATIC) runs the temperature/top-k/top-p/min-p chain on the
    top-``max_top_k`` logit slab instead of the full vocabulary — one
    lax.top_k selection replaces the full (B, V) sorts of top-p. Exact
    whenever the nucleus fits in the slab (trained-model top_p≈0.9 nuclei
    are a handful of tokens; vLLM's sampler makes the same truncation);
    requests with top_k > 0 were already bounded by max_top_k. This is what
    lets mixed greedy/sampled traffic share a speculative verify tick
    without paying n_rounds*W vocab sorts (serve/engine.py)."""
    if bias_ids is not None and bias_vals is not None:
        logits = apply_logit_bias(logits, bias_ids, bias_vals)
    if presence is not None and repetition_penalty is not None:
        logits = apply_repetition_penalty(logits, presence, repetition_penalty)
    if counts is not None:
        logits = apply_frequency_presence(
            logits, counts,
            frequency_penalty if frequency_penalty is not None else 0.0,
            presence_penalty if presence_penalty is not None else 0.0,
        )
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if not do_sample:
        return greedy
    if pruned:
        K = min(max_top_k, logits.shape[-1])
        slab, slab_ids = jax.lax.top_k(logits, K)       # (B, K) sorted desc
        filtered = apply_temperature(slab, temperature)
        filtered = apply_top_k(filtered, top_k, K)
        filtered = apply_top_p(filtered, top_p)
        if min_p is not None:
            filtered = apply_min_p(filtered, min_p)
        pick = jax.random.categorical(rng, filtered, axis=-1)
        sampled = jnp.take_along_axis(
            slab_ids, pick[..., None], axis=-1
        )[..., 0].astype(jnp.int32)
        return jnp.where(temperature <= 0.0, greedy, sampled)
    filtered = apply_temperature(logits, temperature)
    filtered = apply_top_k(filtered, top_k, max_top_k)
    filtered = apply_top_p(filtered, top_p)
    if min_p is not None:
        filtered = apply_min_p(filtered, min_p)
    sampled = jax.random.categorical(rng, filtered, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)
