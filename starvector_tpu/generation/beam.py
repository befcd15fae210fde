"""Beam-search decoding (jit-compiled, static beam width).

The reference exposes `num_beams` (default 2) through HF `generate`
(reference: starvector_base.py:223-241, UI slider gradio_web_server.py).
This is a TPU-shaped implementation: beams live as extra batch rows with a
shared preallocated KV cache; each step scores K*V continuations, keeps the
top K, and reorders the cache by beam parentage with a gather.

Semantics (documented deltas from HF):
  * finished beams (eos or stop sequence) freeze — they propose only a
    pad continuation at unchanged score
  * final hypothesis = best score / len**length_penalty over beams at the
    end (HF additionally keeps a per-slot pool of finished hypotheses;
    with early stopping on greedy beams the argmax coincides in practice)
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
    """Returns (tokens (B, max_new_tokens), lengths (B,)) — the best beam."""
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    B, P, E = inputs_embeds.shape
    K = num_beams
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
    done = jnp.zeros((B, K), bool)
    lengths = jnp.full((B, K), max_new_tokens, jnp.int32)

    def check_stop(tokens_bk, t, new_tok):
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
                    tokens_bk, (0, 0, start), (B, K, L - 1)
                )
                m = jnp.all(window == s[None, None, : L - 1], axis=-1)
                m &= new_tok == s[L - 1]
                m &= t >= (L - 1)
                hit |= m
        if eos_token_id is not None:
            hit |= new_tok == eos_token_id
        return hit

    def cond(state):
        t, done = state[0], state[6]
        return jnp.logical_and(t < max_new_tokens, ~jnp.all(done))

    def body(state):
        t, cache, last_logp, scores, tokens, lengths, done = state
        # finished beams may only continue with pad at zero added score
        step_scores = jnp.where(
            done[..., None],
            jnp.where(
                jnp.arange(V)[None, None, :] == pad_token_id, 0.0, NEG_INF
            ),
            last_logp,
        )
        total_scores = scores[..., None] + step_scores       # (B, K, V)
        flat = total_scores.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)         # (B, K)
        parent = (top_idx // V).astype(jnp.int32)            # (B, K)
        new_tok = (top_idx % V).astype(jnp.int32)

        # reorder beam state by parentage
        batch_idx = jnp.arange(B)[:, None]
        tokens = tokens[batch_idx, parent]                   # (B, K, max_new)
        done_p = done[batch_idx, parent]
        lengths = lengths[batch_idx, parent]

        newly = check_stop(tokens, t, new_tok) & ~done_p
        lengths = jnp.where(newly, t + 1, lengths)
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok[..., None], (0, 0, t)
        )
        done_new = done_p | newly

        # reorder the cache rows: flat index b*K + parent
        flat_parent = (batch_idx * K + parent).reshape(-1)   # (B*K,)
        cache = {
            "k": cache["k"][:, flat_parent],
            "v": cache["v"][:, flat_parent],
            "index": cache["index"],
            "kv_mask": cache["kv_mask"][flat_parent],
        }

        embeds = dec.embed_tokens(params, new_tok.reshape(-1)[:, None]).astype(
            policy.compute_dtype
        )
        logits, cache = dec.forward(
            params, llm_cfg, embeds,
            attention_mask=jnp.ones((B * K, 1), jnp.int32),
            cache=cache, policy=policy,
        )
        lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)
        return (
            t + 1, cache, lp.reshape(B, K, V), top_scores, tokens, lengths,
            done_new,
        )

    state = (jnp.zeros((), jnp.int32), cache, last_logp, scores, tokens,
             lengths, done)
    _, _, _, scores, tokens, lengths, done = jax.lax.while_loop(
        cond, body, state
    )

    # select best beam per batch by length-penalized score (HF convention)
    norm = scores / jnp.maximum(lengths.astype(jnp.float32), 1.0) ** length_penalty
    best = jnp.argmax(norm, axis=1)                          # (B,)
    bi = jnp.arange(B)
    return tokens[bi, best], lengths[bi, best]
