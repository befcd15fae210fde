"""Prompt-lookup speculative decoding (greedy).

SVG code is extremely self-repetitive (path commands, attribute boilerplate;
SVG-Stack averages ~1.8k tokens of recurring structure — BASELINE.md), which
makes n-gram "prompt lookup" drafting unusually effective: draft the K
tokens that followed the most recent earlier occurrence of the current
bigram, verify them in ONE cached forward (S=K), keep the longest
argmax-consistent prefix, and roll the cache index back over rejected slots.

Invariant: `pending` is always the model's verified greedy continuation of
everything emitted so far. Each iteration:
  1. proposal p = [pending, draft_1, ..., draft_{K-1}]
  2. one forward over p → g[i] = argmax continuation after p[0..i]
  3. accept a = 1 + longest prefix with p[i+1] == g[i]
  4. emit p[0..a-1], set pending = g[a-1], cache index += a (of K written)

Greedy outputs match one-token-at-a-time decoding exactly in exact
arithmetic (bit-exact in the fp32 test suite; bf16 argmax can flip on
near-ties — measured logit shift <=0.06 at 1B geometry); an
accepted run of a tokens costs one forward instead of a.

Single-sequence (B=1): this is the p50 image→SVG latency path; batched
throughput uses generation/engine.py.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from starvector_tpu.ops.layers import DTypePolicy


def _lookup_draft(ctx: jax.Array, n_ctx, pending, K: int) -> jax.Array:
    """K-1 tokens following an earlier occurrence of the current
    (ctx[n_ctx-1], pending) bigram — shared by the B=1 and batched paths
    (vmap the latter). Prefers the latest match with a FULL K-1-token
    continuation (the newest match sits at the end of the context with
    almost nothing after it); -1 holes and missing matches fall back to
    repeating `pending` (mismatches only cost acceptance)."""
    C = ctx.shape[0]
    last = ctx[n_ctx - 1]
    nxt = jnp.roll(ctx, -1)
    hit = (ctx == last) & (nxt == pending)
    pos = jnp.arange(C)
    hit &= pos < (n_ctx - 1)
    any_hit = jnp.any(hit)
    full = hit & (pos <= n_ctx - 1 - K)
    pick = jnp.where(jnp.any(full), full, hit)
    j = jnp.where(any_hit, C - 1 - jnp.argmax(pick[::-1]), 0)
    start = jnp.where(any_hit, j + 2, 0)  # tokens after the bigram
    prop = jax.lax.dynamic_slice(ctx, (start,), (K,))[: K - 1]
    return jnp.where(any_hit & (prop >= 0), prop, pending)


def _append_accepted(buf: jax.Array, offs: jax.Array,
                     proposal: jax.Array, n_out: jax.Array):
    """Append each row's first n_out proposal tokens into buf at its own
    offset (clipped). Returns (buf, offs + n_out) — the context/emit-buffer
    idiom shared by the batched offline loop and the engine's verify
    rounds."""
    B, W = proposal.shape
    C = buf.shape[1]
    rows = jnp.arange(B)
    colw = jnp.arange(W)[None, :]
    write = colw < n_out[:, None]
    pos = jnp.clip(offs[:, None] + colw, 0, C - 1)
    cur = buf[rows[:, None], pos]
    buf = buf.at[rows[:, None], pos].set(jnp.where(write, proposal, cur))
    return buf, offs + n_out


def _find_stop_in(tok_buf: jax.Array, upto, stop_sequences,
                  eos_token_id, max_new_tokens: int):
    """(first stop end-index within tok_buf[:upto], fired?) — shared stop
    scan over an emit buffer (vmap for the batched path)."""
    n = tok_buf.shape[0]
    fire = jnp.zeros((n,), bool)
    pos = jnp.arange(n)
    for stop in stop_sequences:
        L = len(stop)
        if L == 0 or L > max_new_tokens:
            continue
        s = jnp.asarray(stop, jnp.int32)
        windows = jnp.stack(
            [jnp.roll(tok_buf, L - 1 - i) for i in range(L)], axis=-1
        )
        fire |= jnp.all(windows == s[None, :], axis=-1) & (pos >= L - 1)
    if eos_token_id is not None:
        fire |= tok_buf == eos_token_id
    fire &= pos < upto
    any_fire = jnp.any(fire)
    return jnp.where(any_fire, jnp.argmax(fire) + 1, max_new_tokens), any_fire


@functools.partial(
    jax.jit,
    static_argnames=(
        "dec_name", "llm_cfg", "max_new_tokens", "draft_len",
        "stop_sequences", "eos_token_id", "pad_token_id", "policy",
        "accept_margin",
    ),
)
def generate_greedy_speculative(
    params: dict,
    inputs_embeds: jax.Array,     # (1, P, E)
    attention_mask: jax.Array,    # (1, P)
    prompt_ids: jax.Array,        # (1, P) ids aligned with the prefix;
                                  # positions without a token id (visual
                                  # prefix) = -1
    *,
    dec_name: str,
    llm_cfg: Any,
    max_new_tokens: int,
    draft_len: int = 8,
    stop_sequences: tuple[tuple[int, ...], ...] = (),
    eos_token_id: int | None = None,
    pad_token_id: int = 0,
    policy: DTypePolicy = DTypePolicy(),
    accept_margin: float = 0.0,
):
    """Returns (tokens (1, max_new_tokens), lengths (1,), n_forwards).

    ``accept_margin`` bounds bf16 speculative drift: a draft position is
    accepted only when the verify argmax's logit margin (top1 - top2, fp32)
    is at least this value. Near-tie positions — the only place the W-token
    verify forward and the 1-token decode forward can argmax-flip under
    bf16 accumulation-order differences — then fall back to single-token
    emission, so multi-token chains never extend through sub-noise margins.
    0.0 (default) keeps pure token-match acceptance. The complementary
    mitigation for the B=1 p50 latency path is running verify in fp32
    compute via ``policy`` (same knob the plain decoder takes)."""
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    B, P, E = inputs_embeds.shape
    K = draft_len
    total = P + max_new_tokens + K + 1
    BUF = max_new_tokens + K  # emit buffer with K slack for block writes

    cache = dec.init_cache(llm_cfg, B, total, dtype=policy.compute_dtype)
    logits, cache = dec.forward(
        params, llm_cfg, inputs_embeds, attention_mask=attention_mask,
        cache=cache, policy=policy, last_logits_only=True,
    )
    pending = jnp.argmax(logits[0, -1].astype(jnp.float32)).astype(jnp.int32)

    ctx0 = jnp.full((total,), -1, jnp.int32)
    ctx0 = jax.lax.dynamic_update_slice(
        ctx0, prompt_ids[0].astype(jnp.int32), (0,)
    )

    tokens0 = jnp.full((BUF,), pad_token_id, jnp.int32)

    def draft(ctx, n_ctx, pending):
        return _lookup_draft(ctx, n_ctx, pending, K)

    def find_stop(tok_buf, upto):
        return _find_stop_in(tok_buf, upto, stop_sequences, eos_token_id,
                             max_new_tokens)

    def cond(state):
        t, done = state[0], state[6]
        return jnp.logical_and(t < max_new_tokens, ~done)

    def body(state):
        t, cache, ctx, tokens, n_ctx, n_fwd, done, lengths, pending = state
        drafted = draft(ctx, n_ctx, pending)                 # (K-1,)
        proposal = jnp.concatenate([pending[None], drafted])  # (K,)

        saved_index = cache["index"]
        saved_mask = cache["kv_mask"]
        embeds = dec.embed_tokens(params, proposal[None, :]).astype(
            policy.compute_dtype
        )
        lg, cache = dec.forward(
            params, llm_cfg, embeds,
            attention_mask=jnp.ones((1, K), jnp.int32),
            cache=cache, policy=policy,
        )
        lg32 = lg[0].astype(jnp.float32)
        g = jnp.argmax(lg32, -1).astype(jnp.int32)  # (K,)

        agree = (proposal[1:] == g[: K - 1]).astype(jnp.int32)  # (K-1,)
        if accept_margin > 0.0:
            top2 = jax.lax.top_k(lg32, 2)[0]                    # (K, 2)
            margin = top2[:, 0] - top2[:, 1]
            agree = agree * (margin[: K - 1] >= accept_margin).astype(jnp.int32)
        a = 1 + jnp.sum(jnp.cumprod(agree))                     # 1..K accepted

        # emit the a verified proposal tokens (junk beyond `a` is overwritten
        # by later iterations; buffer has K slack)
        tokens = jax.lax.dynamic_update_slice(tokens, proposal, (t,))
        tokens = jnp.where(
            (jnp.arange(BUF) >= t + a) & (jnp.arange(BUF) < t + K),
            pad_token_id, tokens,
        )
        new_pending = g[a - 1]

        # cache rollback: of the K written slots keep `a`
        new_index = saved_index + a
        slot = jnp.arange(total)[None, :]
        kv_mask = jnp.where(
            slot < saved_index, saved_mask,
            (slot < new_index).astype(jnp.int32),
        )
        cache = dict(cache)
        cache["index"] = new_index
        cache["kv_mask"] = kv_mask

        # context gains the a verified tokens
        ctx = jax.lax.dynamic_update_slice(ctx, proposal, (n_ctx,))
        keep = jnp.arange(total) < (n_ctx + a)
        ctx = jnp.where(keep, ctx, jnp.where(jnp.arange(total) < n_ctx + K, -1, ctx))
        n_ctx = n_ctx + a
        t = t + a

        stop_at, fired = find_stop(tokens, jnp.minimum(t, max_new_tokens))
        done = fired | (t >= max_new_tokens)
        lengths = jnp.where(
            fired, stop_at, jnp.minimum(t, max_new_tokens)
        )
        return (t, cache, ctx, tokens, n_ctx, n_fwd + 1, done, lengths, new_pending)

    state = (
        jnp.asarray(0, jnp.int32), cache, ctx0, tokens0,
        jnp.asarray(P, jnp.int32), jnp.asarray(1, jnp.int32),
        jnp.asarray(False), jnp.asarray(max_new_tokens, jnp.int32), pending,
    )
    t, cache, ctx, tokens, n_ctx, n_fwd, done, lengths, pending = (
        jax.lax.while_loop(cond, body, state)
    )
    return tokens[None, :max_new_tokens], lengths[None], n_fwd


@functools.partial(
    jax.jit,
    static_argnames=(
        "dec_name", "llm_cfg", "max_new_tokens", "draft_len",
        "stop_sequences", "eos_token_id", "pad_token_id", "policy",
        "accept_margin",
    ),
)
def generate_greedy_speculative_batched(
    params: dict,
    inputs_embeds: jax.Array,     # (B, P, E) RIGHT-padded prompt rows
    attention_mask: jax.Array,    # (B, P) 1 = real token, contiguous from 0
    prompt_ids: jax.Array,        # (B, P) ids aligned with the prefix;
                                  # visual/pad positions = -1
    *,
    dec_name: str,
    llm_cfg: Any,
    max_new_tokens: int,
    draft_len: int = 8,
    stop_sequences: tuple[tuple[int, ...], ...] = (),
    eos_token_id: int | None = None,
    pad_token_id: int = 0,
    policy: DTypePolicy = DTypePolicy(),
    accept_margin: float = 0.0,
):
    """Batched prompt-lookup speculative decoding (greedy) — the whole-
    dataset analogue of the B=1 path above, built on the serving engine's
    per-slot machinery: a RAGGED cache (per-row lengths) + one
    `forward_ragged_verify` dispatch per round scores every row's K-token
    proposal; each row advances by its own accepted count, so fast-
    accepting rows never wait on slow ones. Greedy outputs are exactly
    identical to token-at-a-time decoding. Rows must be RIGHT-padded
    (unlike `generation/engine.py`'s left padding): each row's cache
    occupies [0, len) like a serving slot. Returns
    (tokens (B, max_new_tokens) pad-filled after the stop, lengths (B,),
    n_forwards)."""
    from starvector_tpu.models import decode_common as dc
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    B, P, E = inputs_embeds.shape
    K = draft_len
    total = P + max_new_tokens + K + 1
    BUF = max_new_tokens + K
    CTX = prompt_ids.shape[1] + BUF
    rows = jnp.arange(B)

    # prefill into a linear cache (shared index; right padding keeps each
    # row's valid K/V contiguous from 0), then adopt it as a ragged cache
    cache = dec.init_cache(llm_cfg, B, total, dtype=policy.compute_dtype)
    h, cache = dec.forward(
        params, llm_cfg, inputs_embeds, attention_mask=attention_mask,
        cache=cache, policy=policy, return_hidden=True,
    )
    n_prompt = jnp.sum(attention_mask, axis=1).astype(jnp.int32)  # (B,)
    h_last = jnp.take_along_axis(
        h, jnp.maximum(n_prompt - 1, 0)[:, None, None], axis=1
    )[:, 0]
    logits0 = jnp.einsum(
        "be,ve->bv", policy.cast(h_last),
        policy.cast(dec.lm_head_table(params, llm_cfg)),
        preferred_element_type=jnp.float32,
    )
    pending = jnp.argmax(logits0, -1).astype(jnp.int32)           # (B,)
    rag = {
        "k": cache["k"], "v": cache["v"],
        "lengths": n_prompt,
        # right padding ⇒ the prefill kv_mask is already contiguous-from-0
        "kv_mask": cache["kv_mask"].astype(jnp.int32),
    }

    # draft context: the FULL prompt_ids width per row (as in the B=1 path;
    # -1 holes — visual tokens, right padding — can never match a bigram and
    # the `prop >= 0` guard patches continuations that cross them). The
    # draft-context length P is deliberately distinct from the CACHE length
    # n_prompt: prompt_ids may carry extra lookup-only context.
    ctx0 = jnp.full((B, CTX), -1, jnp.int32)
    ctx0 = jax.lax.dynamic_update_slice(
        ctx0, prompt_ids.astype(jnp.int32), (0, 0)
    )
    n_ctx0 = jnp.full((B,), prompt_ids.shape[1], jnp.int32)
    tokens0 = jnp.full((B, BUF), pad_token_id, jnp.int32)

    def draft_row(ctx, n_ctx, pending):
        return _lookup_draft(ctx, n_ctx, pending, K)

    def find_stop_row(tok_buf, upto):
        return _find_stop_in(tok_buf, upto, stop_sequences, eos_token_id,
                             max_new_tokens)

    def cond(state):
        t, done = state[0], state[5]
        return jnp.any(jnp.logical_and(t < max_new_tokens, ~done))

    def body(state):
        t, rag, ctx, tokens, n_ctx, done, lengths, pending, n_fwd = state
        drafted = jax.vmap(draft_row)(ctx, n_ctx, pending)       # (B, K-1)
        proposal = jnp.concatenate([pending[:, None], drafted], 1)  # (B, K)

        lg, rag = dec.forward_ragged_verify(
            params, llm_cfg, proposal, rag, jnp.logical_not(done), policy=policy
        )
        lg32 = lg.astype(jnp.float32)
        g = jnp.argmax(lg32, -1).astype(jnp.int32)  # (B, K)

        agree = (proposal[:, 1:] == g[:, : K - 1]).astype(jnp.int32)
        if accept_margin > 0.0:
            # bf16 drift bound: see generate_greedy_speculative docstring
            top2 = jax.lax.top_k(lg32, 2)[0]                  # (B, K, 2)
            margin = top2[..., 0] - top2[..., 1]
            agree = agree * (margin[:, : K - 1] >= accept_margin
                             ).astype(jnp.int32)
        a = 1 + jnp.sum(jnp.cumprod(agree, axis=1), axis=1)      # (B,) 1..K
        a = jnp.where(done, 0, a)
        rag = dc.commit_verify(rag, a)

        tokens, t_new = _append_accepted(tokens, t, proposal, a)
        ctx, n_ctx = _append_accepted(ctx, n_ctx, proposal, a)
        pending = jnp.where(
            done, pending, g[rows, jnp.clip(a - 1, 0, K - 1)]
        )

        upto = jnp.minimum(t_new, max_new_tokens)
        stop_at, fired = jax.vmap(find_stop_row)(tokens, upto)
        newly = (fired | (t_new >= max_new_tokens)) & ~done
        lengths = jnp.where(
            newly, jnp.where(fired, stop_at, jnp.minimum(t_new, max_new_tokens)),
            lengths,
        )
        done = done | newly
        return (t_new, rag, ctx, tokens, n_ctx, done, lengths, pending,
                n_fwd + 1)

    state = (
        jnp.zeros((B,), jnp.int32), rag, ctx0, tokens0, n_ctx0,
        jnp.zeros((B,), bool), jnp.full((B,), max_new_tokens, jnp.int32),
        pending, jnp.asarray(1, jnp.int32),
    )
    t, rag, ctx, tokens, n_ctx, done, lengths, pending, n_fwd = (
        jax.lax.while_loop(cond, body, state)
    )
    tokens = tokens[:, :max_new_tokens]
    # pad-fill past each row's stop (junk from rejected proposals may linger
    # after the final round)
    tokens = jnp.where(
        jnp.arange(max_new_tokens)[None, :] < lengths[:, None],
        tokens, pad_token_id,
    )
    return tokens, lengths, n_fwd
