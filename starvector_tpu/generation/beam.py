"""Beam-search decoding (jit-compiled, static beam width).

The reference exposes `num_beams` (default 2) through HF `generate`
(reference: starvector_base.py:223-241, UI slider gradio_web_server.py).
This is a TPU-shaped implementation of HF's beam-search semantics
(HF BeamSearchScorer + the decoder's `_reorder_cache`,
reference modeling_gpt_bigcode.py:1282-1291):

  * beams live as extra batch rows over a shared preallocated KV cache
  * each step scores 2K candidate continuations; candidates that hit
    eos/a stop sequence move into a per-slot FINISHED-HYPOTHESIS POOL
    (top-K by length-penalized score), and the live beams are refilled
    with the best K unfinished candidates — matching HF's pool behavior
    instead of freezing finished beams in place
  * the cache is reordered by beam parentage with a gather
  * termination follows HF early_stopping=False: a slot is done when its
    pool is full and the best attainable live score cannot beat the worst
    pooled hypothesis
  * the final hypothesis is the pool's best, with still-live beams
    considered at their current normalized score when the pool is short
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from starvector_tpu.ops.layers import DTypePolicy

NEG_INF = -1e9


@functools.partial(
    jax.jit,
    static_argnames=(
        "dec_name", "llm_cfg", "num_beams", "max_new_tokens",
        "stop_sequences", "eos_token_id", "pad_token_id", "length_penalty",
        "policy",
    ),
)
def beam_search(
    params: dict,
    inputs_embeds: jax.Array,     # (B, P, E)
    attention_mask: jax.Array,    # (B, P)
    *,
    dec_name: str,
    llm_cfg: Any,
    num_beams: int = 2,
    max_new_tokens: int = 256,
    stop_sequences: tuple[tuple[int, ...], ...] = (),
    eos_token_id: int | None = None,
    pad_token_id: int = 0,
    length_penalty: float = 1.0,
    policy: DTypePolicy = DTypePolicy(),
):
    """Returns (tokens (B, max_new_tokens), lengths (B,)) — the best
    hypothesis per batch row."""
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    B, P, E = inputs_embeds.shape
    K = num_beams
    K2 = 2 * K
    V = llm_cfg.vocab_size
    total = P + max_new_tokens

    # expand to beams
    embeds = jnp.repeat(inputs_embeds, K, axis=0)        # (B*K, P, E)
    am = jnp.repeat(attention_mask, K, axis=0)
    cache = dec.init_cache(llm_cfg, B * K, total, dtype=policy.compute_dtype)
    logits, cache = dec.forward(
        params, llm_cfg, embeds, attention_mask=am, cache=cache, policy=policy
    )
    last_logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)
    last_logp = last_logp.reshape(B, K, V)

    # only beam 0 is live initially (identical prefixes)
    scores = jnp.where(
        jnp.arange(K)[None, :] == 0, 0.0, NEG_INF
    ).astype(jnp.float32).repeat(B, axis=0).reshape(B, K)
    tokens = jnp.full((B, K, max_new_tokens), pad_token_id, jnp.int32)

    pool_scores = jnp.full((B, K), NEG_INF, jnp.float32)
    pool_tokens = jnp.full((B, K, max_new_tokens), pad_token_id, jnp.int32)
    pool_lengths = jnp.full((B, K), max_new_tokens, jnp.int32)

    def check_stop(parent_tokens, t, new_tok):
        """(B, K2) — does [parent history ‖ new_tok] end in a stop / eos?"""
        hit = jnp.zeros(new_tok.shape, bool)
        for stop in stop_sequences:
            L = len(stop)
            if L == 0 or L > max_new_tokens:
                continue
            s = jnp.asarray(stop, jnp.int32)
            if L == 1:
                hit |= new_tok == s[0]
            else:
                start = jnp.maximum(t - (L - 1), 0)
                window = jax.lax.dynamic_slice(
                    parent_tokens, (0, 0, start), (B, K2, L - 1)
                )
                m = jnp.all(window == s[None, None, : L - 1], axis=-1)
                m &= new_tok == s[L - 1]
                m &= t >= (L - 1)
                hit |= m
        if eos_token_id is not None:
            hit |= new_tok == eos_token_id
        return hit

    def slot_done(pool_scores, scores, t):
        """HF early_stopping=False: done when the pool is full and the best
        attainable live continuation can't beat the worst pooled score."""
        pool_full = jnp.all(pool_scores > NEG_INF / 2, axis=1)       # (B,)
        attainable = jnp.max(scores, axis=1) / jnp.maximum(
            t.astype(jnp.float32) + 1.0, 1.0
        ) ** length_penalty
        worst_pool = jnp.min(pool_scores, axis=1)
        return pool_full & (attainable <= worst_pool)

    def cond(state):
        t, scores, pool_scores = state[0], state[3], state[5]
        return jnp.logical_and(
            t < max_new_tokens, ~jnp.all(slot_done(pool_scores, scores, t))
        )

    def body(state):
        (t, cache, last_logp, scores, tokens,
         pool_scores, pool_tokens, pool_lengths) = state

        total_scores = scores[..., None] + last_logp          # (B, K, V)
        flat = total_scores.reshape(B, K * V)
        cand_scores, cand_idx = jax.lax.top_k(flat, K2)       # (B, 2K)
        parent = (cand_idx // V).astype(jnp.int32)
        new_tok = (cand_idx % V).astype(jnp.int32)

        batch_idx = jnp.arange(B)[:, None]
        parent_tokens = tokens[batch_idx, parent]             # (B, 2K, max_new)
        finished = check_stop(parent_tokens, t, new_tok)      # (B, 2K)

        # candidate token buffers with the new token written at position t
        cand_tokens = jax.lax.dynamic_update_slice(
            parent_tokens, new_tok[..., None], (0, 0, t)
        )

        # ---- pool update: finished candidates compete on normalized score
        norm = cand_scores / jnp.maximum(
            t.astype(jnp.float32) + 1.0, 1.0
        ) ** length_penalty
        cand_pool_scores = jnp.where(finished, norm, NEG_INF)
        all_scores = jnp.concatenate([pool_scores, cand_pool_scores], 1)
        all_tokens = jnp.concatenate([pool_tokens, cand_tokens], 1)
        all_lengths = jnp.concatenate(
            [pool_lengths, jnp.full((B, K2), t + 1, jnp.int32)], 1
        )
        top_pool, pool_sel = jax.lax.top_k(all_scores, K)     # (B, K)
        pool_scores = top_pool
        pool_tokens = all_tokens[batch_idx, pool_sel]
        pool_lengths = all_lengths[batch_idx, pool_sel]

        # ---- live refill: best K UNFINISHED candidates keep searching
        live_scores_cand = jnp.where(finished, NEG_INF, cand_scores)
        live_top, live_sel = jax.lax.top_k(live_scores_cand, K)  # (B, K)
        live_parent = parent[batch_idx, live_sel]
        live_tok = new_tok[batch_idx, live_sel]
        tokens = cand_tokens[batch_idx, live_sel]
        scores = live_top

        # reorder cache rows to the live parents: flat index b*K + parent.
        # Enumerate keys dynamically so extra per-slot arrays (e.g. the
        # int8-KV k_scale/v_scale) reorder with their payload.
        flat_parent = (batch_idx * K + live_parent).reshape(-1)   # (B*K,)
        cache = {
            key: (arr[:, flat_parent]
                  if key in ("k", "v", "k_scale", "v_scale")
                  else arr[flat_parent] if key == "kv_mask"
                  else arr)
            for key, arr in cache.items()
        }

        embeds = dec.embed_tokens(params, live_tok.reshape(-1)[:, None]).astype(
            policy.compute_dtype
        )
        logits, cache = dec.forward(
            params, llm_cfg, embeds,
            attention_mask=jnp.ones((B * K, 1), jnp.int32),
            cache=cache, policy=policy,
        )
        lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)
        return (
            t + 1, cache, lp.reshape(B, K, V), scores, tokens,
            pool_scores, pool_tokens, pool_lengths,
        )

    state = (jnp.zeros((), jnp.int32), cache, last_logp, scores, tokens,
             pool_scores, pool_tokens, pool_lengths)
    (t, _, _, scores, tokens,
     pool_scores, pool_tokens, pool_lengths) = jax.lax.while_loop(
        cond, body, state
    )

    # short pools: still-live beams compete at their final normalized score
    live_norm = scores / jnp.maximum(
        t.astype(jnp.float32), 1.0
    ) ** length_penalty
    final_scores = jnp.concatenate([pool_scores, live_norm], 1)   # (B, 2K)
    final_tokens = jnp.concatenate([pool_tokens, tokens], 1)
    final_lengths = jnp.concatenate(
        [pool_lengths, jnp.broadcast_to(t.astype(jnp.int32), (B, K))], 1
    )
    best = jnp.argmax(final_scores, axis=1)                       # (B,)
    bi = jnp.arange(B)
    return final_tokens[bi, best], final_lengths[bi, best]