"""Continuous-batching generation engine (vLLM-parity semantics for the
serve path — BASELINE config 4; reference relies on an external vLLM fork,
README.md:297-319).

Iteration-level scheduling over a slot-based ragged KV cache:
  * requests queue up; a dedicated ADMISSION thread prefills them (prompt
    lengths bucketed to powers of two so each bucket compiles exactly once)
    and inserts the finished prefix into a reserved slot — running decodes
    never wait on a prefill
  * every engine tick decodes steps_per_tick tokens for all active slots
    AND samples each next token in a single fused jitted step. The full
    vLLM sampling surface rides along per request — temperature, top-p,
    top-k, min-p, repetition/frequency/presence penalties, logit_bias —
    with the (B, V) count/presence tables resident on device inside the
    tick scan; greedy slots are temperature 0. One dispatch + one small
    host transfer per tick; the KV cache (bf16 or opt-in int8) and count
    table are donated so updates are in-place
  * per-request stop sequences, eos, max tokens checked host-side
  * emitted tokens stream into per-request queues (worker SSE layer);
    scheduler errors fail only the offending request, never the loop
  * `num_beams>1` requests run as BEAM GROUPS inside the engine: k slots
    decode in lockstep with one dispatch per round (parentage cache-reorder
    fused with the ragged decode + on-device top-2k), HF finished-pool
    semantics host-side; concurrent sampling traffic keeps streaming
  * `spec_drafts>0` upgrades ALL-GREEDY sampling ticks (the eval /
    SVG-production workload) to PROMPT-LOOKUP SPECULATIVE rounds (vLLM's
    ngram speculation, engine-native): steps_per_tick verify rounds fuse
    into ONE dispatch, each drafting ON DEVICE from the slot's
    [prompt ids ‖ accepted output] context
    (generation.speculative._lookup_draft vmapped) and verifying
    spec_drafts tokens through forward_ragged_verify + per-position
    argmax + acceptance + commit. A round emits BETWEEN 1 and
    spec_drafts+1 tokens per slot, so the tick strictly generalizes the
    plain multi-step tick — worst case the same steps_per_tick tokens
    (drafting falls back to repeating the pending token, costing only
    acceptance), best case steps_per_tick*(spec_drafts+1): measured
    +27% aggregate serving tok/s on a fully-repetitive greedy workload
    (429 vs 338). Slot compositions with SAMPLED requests keep plain
    ticks — each of the n_rounds*W verify positions would pay a full
    (B, V) sampling chain for rare token-match acceptance, measured
    net-negative. Greedy streams match token-at-a-time decoding in exact
    arithmetic (bit-exact in the fp32 test suite); in bf16 the verify
    forward's different reduction order shifts logits ≤0.06 (measured, 1B
    geometry), so argmax can flip on near-ties — rare for trained models'
    decisive margins, same caveat as the int8 KV cache. Rejected draft
    positions stay uncommitted in the ragged cache.

The engine runs two Python scheduler threads; all device work is jitted.
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
import time
import uuid
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from starvector_tpu.ops.layers import DTypePolicy
from starvector_tpu.ops.sampling import sample_token


@dataclasses.dataclass
class Request:
    prefix_embeds: Any                 # (1, P, E) prompt embedding
    max_new_tokens: int = 256
    temperature: float = 0.8
    top_p: float = 0.9
    top_k: int = 0
    min_p: float = 0.0                 # vLLM min-p (0 disables)
    repetition_penalty: float = 1.0    # over prompt∪output tokens (HF/vLLM)
    frequency_penalty: float = 0.0     # OpenAI, over output-token counts
    presence_penalty: float = 0.0      # OpenAI, over output-token presence
    # sparse additive bias {token_id: bias} — the reference nudges `</svg>`
    # (starvector_vllm_api_svg_validator.py:60); bounded by engine.max_bias
    logit_bias: dict[int, float] | None = None
    # optional prompt token ids (repetition-penalty presence seeding; the
    # engine only sees embeddings otherwise)
    prompt_token_ids: Any = None
    do_sample: bool = True
    stop_sequences: tuple[tuple[int, ...], ...] = ()
    eos_token_id: int | None = None
    # >1 admits a BEAM GROUP: num_beams slots decode in lockstep with
    # HF beam semantics (generation/beam.py pool behavior); deterministic,
    # sampling knobs ignored. Streams the best hypothesis at completion.
    num_beams: int = 1
    length_penalty: float = 1.0
    request_id: str = dataclasses.field(default_factory=lambda: uuid.uuid4().hex)
    # filled by the engine
    out_queue: "queue.Queue" = dataclasses.field(default_factory=queue.Queue)


@dataclasses.dataclass
class _Slot:
    req: Request | None = None
    generated: list[int] = dataclasses.field(default_factory=list)
    last_token: int = 0
    reserved: bool = False             # held by the admission thread
    beam: Any = None                   # _BeamGroup when part of a beam group


NEG_INF = -1e9


@dataclasses.dataclass
class _BeamGroup:
    """Host-side state of one in-engine beam-search request occupying
    `slot_idxs`. Candidate selection runs on device (_beam_step top-k);
    histories / finished-hypothesis pool / termination mirror
    generation/beam.py (HF BeamSearchScorer semantics) in plain Python —
    per step that's 2n scalars of host math, not a (n, V) transfer."""

    req: Request
    slot_idxs: list[int]
    histories: list[list[int]]            # per live beam, tokens so far
    scores: list[float]                   # cumulative logp per live beam
    parent_perm: np.ndarray               # (n,) cache-reorder for next step
    next_tokens: np.ndarray               # (n,) tokens selected last round
    pool: list[tuple[float, list[int]]] = dataclasses.field(
        default_factory=list
    )                                     # (normalized score, tokens)
    t: int = 0                            # tokens generated per live beam

    def select(self, cand_scores, parents, toks) -> None:
        """One HF beam round from 2n device candidates: finished ones enter
        the pool (normalized by (t+1)^lp — beam.py body norm), best n
        unfinished stay live. self.t is the 0-based position being written."""
        n = len(self.slot_idxs)
        req = self.req
        lp = req.length_penalty
        live: list[tuple[float, int, int]] = []
        for s, p, tok in zip(
            map(float, cand_scores), map(int, parents), map(int, toks)
        ):
            hist = self.histories[p] + [tok]
            finished = (req.eos_token_id is not None
                        and tok == req.eos_token_id)
            for stop in req.stop_sequences:
                L = len(stop)
                if L and len(hist) >= L and tuple(hist[-L:]) == tuple(stop):
                    finished = True
            if finished:
                norm = s / (float(self.t) + 1.0) ** lp
                self.pool.append((norm, hist))
            elif len(live) < n:
                live.append((s, p, tok))
        self.pool = sorted(self.pool, key=lambda x: -x[0])[:n]
        while len(live) < n:            # all candidates finished: dead rows
            live.append((NEG_INF, 0, 0))
        self.histories = [self.histories[p] + [tok] for _, p, tok in live]
        self.scores = [s for s, _, _ in live]
        self.parent_perm = np.asarray([p for _, p, _ in live], np.int32)
        self.next_tokens = np.asarray([t for _, _, t in live], np.int32)
        self.t += 1

    def done(self) -> bool:
        """HF early_stopping=False: pool full and the best attainable live
        score (one optimistic token ahead: (t+1)^lp — beam.py slot_done)
        can't beat the worst pooled hypothesis."""
        if self.t >= self.req.max_new_tokens:
            return True
        n = len(self.slot_idxs)
        if len(self.pool) < n:
            return False
        attainable = max(self.scores) / (float(self.t) + 1.0) ** \
            self.req.length_penalty
        return attainable <= self.pool[-1][0]

    def best(self) -> list[int]:
        """Best hypothesis: pool ∪ still-live beams at their current
        normalized score (beam.py:204-215)."""
        lp = self.req.length_penalty
        cands = list(self.pool) + [
            (s / max(float(self.t), 1.0) ** lp, h)
            for s, h in zip(self.scores, self.histories)
        ]
        return max(cands, key=lambda x: x[0])[1]


def _bucket_len(n: int, lo: int = 64) -> int:
    """Round a prompt length up to a power-of-two bucket so prefill compiles
    once per bucket instead of once per unique length."""
    b = lo
    while b < n:
        b *= 2
    return b


@functools.partial(
    jax.jit,
    static_argnames=("dec_name", "cfg", "policy"),
    donate_argnames=("cache", "h_last"),
)
def _prefill_chunk(
    params: dict,
    embeds: jax.Array,        # (k, C, E) one prompt chunk (right-padded)
    mask: jax.Array,          # (k, C)
    cache: dict,              # bucket-sized B=k cache, filled so far
    h_last: jax.Array,        # (k, E) carry: hidden at each row's last token
    last_idx: jax.Array,      # (k,) GLOBAL index of each row's last token
    chunk_start: jax.Array,   # scalar int32: this chunk's global offset
    *,
    dec_name: str,
    cfg: Any,
    policy: DTypePolicy,
):
    """One prompt chunk into the cache. Chunking bounds how long a single
    admission dispatch can occupy the device, so running decodes stall by
    at most one chunk. Each row's last-token hidden state is captured from
    WHICHEVER chunk contains it (same-bucket rows can have their last real
    token in different chunks) and carried to the sampling step."""
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    hidden, cache = dec.forward(
        params, cfg, embeds, attention_mask=mask, cache=cache,
        policy=policy, return_hidden=True,
    )
    C = embeds.shape[1]
    local = jnp.clip(last_idx - chunk_start, 0, C - 1).astype(jnp.int32)
    h_sel = jnp.take_along_axis(hidden, local[:, None, None], axis=1)[:, 0]
    valid = (last_idx >= chunk_start) & (last_idx < chunk_start + C)
    h_last = jnp.where(valid[:, None], h_sel.astype(h_last.dtype), h_last)
    return cache, h_last


@functools.partial(
    jax.jit,
    static_argnames=("dec_name", "cfg", "policy", "max_top_k"),
)
def _sample_first(
    params: dict,
    h_last: jax.Array,        # (k, E) hidden at each row's last real token
    base_rng: jax.Array,
    step: jax.Array,
    temp: jax.Array,          # (k,) fp32; 0 = greedy
    top_p: jax.Array,         # (k,)
    top_k: jax.Array,         # (k,)
    min_p: jax.Array,         # (k,)
    rep_pen: jax.Array,       # (k,) 1.0 = off
    prompt_ids: jax.Array,    # (k, Pb) int32; -1 padding
    bias_ids: jax.Array,      # (k, KB) int32; -1 inactive
    bias_vals: jax.Array,     # (k, KB) fp32
    *,
    dec_name: str,
    cfg: Any,
    policy: DTypePolicy,
    max_top_k: int,
):
    """Project each admitted row's last hidden state through the LM head
    (no (Pb, V) materialization) and sample the first tokens."""
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    logits = jnp.einsum(
        "be,ve->bv", policy.cast(h_last),
        policy.cast(dec.lm_head_table(params, cfg)),
        preferred_element_type=jnp.float32,
    )
    # admissions draw from their own key stream (disjoint from tick keys
    # by independent base key, not by an offset that ticks can outrun)
    rng = jax.random.fold_in(base_rng, step)
    presence = _presence_from_ids(prompt_ids, cfg.vocab_size)
    first = sample_token(
        rng, logits, do_sample=True,
        temperature=temp, top_p=top_p, top_k=top_k, min_p=min_p,
        presence=presence, repetition_penalty=rep_pen,
        bias_ids=bias_ids, bias_vals=bias_vals, max_top_k=max_top_k,
    )
    return first, presence


def _presence_from_ids(ids: jax.Array, vocab: int) -> jax.Array:
    """(k, P) token ids with -1 padding → (k, V) 0/1 presence. Scattered on
    device: shipping padded ids costs KBs where a dense table costs MBs."""
    k = ids.shape[0]
    real = (ids >= 0).astype(jnp.int32)
    safe = jnp.where(ids >= 0, ids, 0)
    rows = jnp.broadcast_to(jnp.arange(k)[:, None], ids.shape)
    return jnp.zeros((k, vocab), jnp.int32).at[rows, safe].max(real)


@functools.partial(
    jax.jit,
    static_argnames=("dec_name", "cfg", "policy", "max_top_k", "n_steps",
                     "greedy_only"),
    donate_argnames=("cache", "counts"),
)
def _fused_ragged_step(
    params: dict,
    tokens: jax.Array,        # (B,) last sampled token per slot
    cache: dict,
    active: jax.Array,        # (B,)
    base_rng: jax.Array,
    step: jax.Array,          # scalar int32 tick counter (host-incremented)
    temps: jax.Array,         # (B,) fp32; 0 = greedy
    top_ps: jax.Array,        # (B,) fp32
    top_ks: jax.Array,        # (B,) int32; 0 = disabled
    min_ps: jax.Array,        # (B,) fp32; 0 = disabled
    rep_pens: jax.Array,      # (B,) fp32; 1 = off
    freq_pens: jax.Array,     # (B,) fp32; 0 = off
    pres_pens: jax.Array,     # (B,) fp32; 0 = off
    counts: jax.Array,        # (B, V) int32 output-token counts (donated)
    prompt_presence: jax.Array,  # (B, V) 0/1 prompt tokens (read-only)
    bias_ids: jax.Array,      # (B, KB) int32; -1 inactive
    bias_vals: jax.Array,     # (B, KB) fp32
    *,
    dec_name: str,
    cfg: Any,
    policy: DTypePolicy,
    max_top_k: int,
    n_steps: int = 1,
    greedy_only: bool = False,   # STATIC: every active slot is greedy ⇒
                                 # compile pure-argmax steps (no (B, V)
                                 # vocab sorts in the hot loop)
):
    """ONE dispatch per engine tick: `n_steps` ragged decode steps with
    per-slot sampling fused (lax.scan). Multi-step ticks amortize the fixed
    per-dispatch runtime overhead (~30 ms on the tunneled TPU runtime) over
    several tokens; admissions join between ticks. Folding the tick counter
    into the base key on device avoids a separate jax.random.split dispatch.
    Returns ((B, n_steps) tokens, cache, counts)."""
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    B = tokens.shape[0]

    def body(state, i):
        tokens, cache, counts = state
        logits, cache = dec.forward_ragged_decode(
            params, cfg, tokens, cache, active, policy=policy
        )
        rng = jax.random.fold_in(base_rng, step * n_steps + i)
        # pruned=True keeps the plain tick's sampled distribution identical
        # to the speculative verify tick's (both chains run on the
        # top-max_top_k slab), so the adaptive spec fallback is seamless
        nxt = sample_token(
            rng, logits, do_sample=not greedy_only, pruned=True,
            temperature=temps, top_p=top_ps, top_k=top_ks, min_p=min_ps,
            presence=jnp.maximum((counts > 0).astype(jnp.int32),
                                 prompt_presence),
            repetition_penalty=rep_pens,
            counts=counts, frequency_penalty=freq_pens,
            presence_penalty=pres_pens,
            bias_ids=bias_ids, bias_vals=bias_vals,
            max_top_k=max_top_k,
        )
        counts = counts.at[jnp.arange(B), nxt].add(active)
        return (nxt, cache, counts), nxt

    (_, cache, counts), toks = jax.lax.scan(
        body, (tokens, cache, counts), jnp.arange(n_steps)
    )
    return toks.T, cache, counts  # (B, n_steps)


@functools.partial(
    jax.jit,
    static_argnames=("dec_name", "cfg", "policy", "max_top_k", "n_rounds",
                     "draft_len", "greedy_only", "accept_margin"),
    donate_argnames=("cache", "counts", "ctx", "ctx_len"),
)
def _fused_verify_multi(
    params: dict,
    tokens: jax.Array,        # (B,) last sampled token per slot
    cache: dict,
    ctx: jax.Array,           # (B, C) device draft context ([prompt ids ‖
                              # accepted output]; -1 holes allowed)
    ctx_len: jax.Array,       # (B,)
    active: jax.Array,        # (B,)
    base_rng: jax.Array,
    step: jax.Array,
    temps: jax.Array,
    top_ps: jax.Array,
    top_ks: jax.Array,
    min_ps: jax.Array,
    rep_pens: jax.Array,
    freq_pens: jax.Array,
    pres_pens: jax.Array,
    counts: jax.Array,
    prompt_presence: jax.Array,
    bias_ids: jax.Array,
    bias_vals: jax.Array,
    *,
    dec_name: str,
    cfg: Any,
    policy: DTypePolicy,
    max_top_k: int,
    n_rounds: int,
    draft_len: int,
    greedy_only: bool = False,   # STATIC: all-greedy traffic compiles
                                 # pure-argmax positions — the verify tick
                                 # otherwise pays n_rounds*(draft_len+1)
                                 # full (B, V) sampling sorts per dispatch,
                                 # which dominated its measured cost
    accept_margin: float = 0.0,  # STATIC: reject a draft when the previous
                                 # verify position's fp32 top1-top2 logit
                                 # margin is below this — bounds bf16
                                 # speculative drift (near-tie argmax flips)
                                 # to single-token emission
):
    """`n_rounds` speculative rounds in ONE dispatch — the speculative
    generalization of the multi-step tick, with the draft lookup ON DEVICE
    (generation.speculative._lookup_draft vmapped over slots) so later
    rounds draft from tokens accepted earlier in the same dispatch.

    Each round is one W=draft_len+1-token verify forward: position i's
    logits run the FULL per-slot processor chain (greedy slots argmax,
    sampled slots a true conditional sample), draft i+1 is accepted iff the
    sampled token equals it, and the emitted tokens are the sampled chain
    itself. A round therefore emits BETWEEN 1 and W tokens per slot — the
    worst case degenerates to the plain multi-step tick (the lookup's
    repeat-pending fallback still costs only acceptance), the best case
    emits n_rounds*W tokens per dispatch. Greedy matches token-at-a-time
    decoding in exact arithmetic (bf16 near-ties can flip, see module
    docstring); sampling draws every accepted token from its true
    conditional. Rejected cache positions stay uncommitted
    (decode_common.commit_verify). Returns ((B, n_rounds, W) tokens,
    (B, n_rounds, W) cumulative accept flags, cache, counts, ctx, ctx_len).
    """
    from starvector_tpu.generation.speculative import (
        _append_accepted,
        _lookup_draft,
    )
    from starvector_tpu.models import decode_common as dc
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    B = tokens.shape[0]
    W = draft_len + 1
    rows = jnp.arange(B)

    def round_body(carry, m):
        pending, cache, counts, ctx, ctx_len = carry
        drafts = jax.vmap(
            lambda c, n, p: _lookup_draft(c, n, p, W)
        )(ctx, ctx_len, pending)                          # (B, W-1)
        proposal = jnp.concatenate([pending[:, None], drafts], axis=1)
        logits_all, cache = dec.forward_ragged_verify(
            params, cfg, proposal, cache, active, policy=policy
        )

        def pos_body_outer(pcarry, i):
            counts, chain, prev, prev_margin = pcarry
            lg = logits_all[:, i]
            # distinct fold stream from the regular tick (0x40000000 offset)
            rng = jax.random.fold_in(
                base_rng, 0x40000000 + (step * n_rounds + m) * W + i
            )
            # pruned=True: mixed greedy/sampled compositions run the
            # sampling chain on the top-max_top_k slab — one lax.top_k
            # instead of the full (B, V) sorts that made mixed-traffic
            # speculation net-negative in round 3 (the 106-224 ms/tick
            # measurement in PARITY.md was full-vocab)
            t = sample_token(
                rng, lg, do_sample=not greedy_only, pruned=True,
                temperature=temps, top_p=top_ps, top_k=top_ks, min_p=min_ps,
                presence=jnp.maximum((counts > 0).astype(jnp.int32),
                                     prompt_presence),
                repetition_penalty=rep_pens,
                counts=counts, frequency_penalty=freq_pens,
                presence_penalty=pres_pens,
                bias_ids=bias_ids, bias_vals=bias_vals,
                max_top_k=max_top_k,
            )
            ok = jnp.where(i == 0, active > 0,
                           chain & (prev == proposal[:, i]))
            if accept_margin > 0.0:
                top2 = jax.lax.top_k(lg, 2)[0]
                marg = top2[:, 0] - top2[:, 1]
                ok = jnp.where(i == 0, ok,
                               ok & (prev_margin >= accept_margin))
            else:
                marg = jnp.zeros((B,), jnp.float32)
            counts = counts.at[rows, t].add(ok.astype(jnp.int32))
            return (counts, ok, t, marg), (t, ok)

        (counts, _, _, _), (toks, chain) = jax.lax.scan(
            lambda c, i: pos_body_outer(c, i),
            (counts, jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
             jnp.zeros((B,), jnp.float32)),
            jnp.arange(W),
        )
        toks, chain = toks.T, chain.T                     # (B, W)
        n_out = jnp.sum(chain.astype(jnp.int32), axis=1)
        cache = dc.commit_verify(cache, n_out)
        # ctx gains the accepted PROPOSAL tokens (the emitted history's
        # inputs: pending + matched drafts); the new pending is the last
        # sampled token, emitted to the caller but not yet in the cache/ctx
        ctx, ctx_len = _append_accepted(ctx, ctx_len, proposal, n_out)
        pending = jnp.where(
            n_out > 0, toks[rows, jnp.clip(n_out - 1, 0, W - 1)], pending
        )
        return (pending, cache, counts, ctx, ctx_len), (toks, chain)

    (pending, cache, counts, ctx, ctx_len), (toks, chain) = jax.lax.scan(
        round_body, (tokens, cache, counts, ctx, ctx_len),
        jnp.arange(n_rounds),
    )
    # (M, B, W) -> (B, M, W)
    return (jnp.moveaxis(toks, 0, 1),
            jnp.moveaxis(chain, 0, 1).astype(jnp.int32),
            cache, counts, ctx, ctx_len)


@functools.partial(jax.jit, donate_argnames=("ctx", "ctx_len"))
def _admit_ctx_rows(
    ctx: jax.Array,       # (B, C), donated
    ctx_len: jax.Array,   # (B,), donated
    slots: jax.Array,     # (k,)
    pid_rows: jax.Array,  # (k, Pb) prompt ids, -1 padding/holes
):
    """Reset admitted slots' device draft context to their prompt ids,
    COMPACTED (-1 bucket padding and visual-prefix holes squeezed out, so
    ctx_len is the true id count — bucket padding must not leave a -1 gap
    between prompt and output, which would kill boundary bigram matches
    and could overflow the buffer for short prompts in wide buckets). The
    first sampled token is NOT written — it is the slot's pending token
    and enters ctx as round 0's proposal[0] (mirrors the offline path,
    where ctx0 = prompt only)."""
    C = ctx.shape[1]
    k, Pb = pid_rows.shape
    pid_rows = pid_rows.astype(jnp.int32)
    real = pid_rows >= 0
    dest = jnp.cumsum(real.astype(jnp.int32), axis=1) - 1      # (k, Pb)
    # park non-real writes on the last column (they write -1 over -1:
    # real counts are <= Pb <= max_len < C-1, so no real id lands there)
    dest = jnp.where(real, dest, C - 1)
    rowfill = jnp.full((k, C), -1, jnp.int32)
    rowfill = rowfill.at[jnp.arange(k)[:, None], dest].set(
        jnp.where(real, pid_rows, -1)
    )
    ctx = ctx.at[slots].set(rowfill)
    ctx_len = ctx_len.at[slots].set(jnp.sum(real, axis=1).astype(jnp.int32))
    return ctx, ctx_len


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _admit_sampling_state(
    counts: jax.Array,            # (B, V) int32, donated
    prompt_presence: jax.Array,   # (B, V) int32, donated
    slots: jax.Array,             # (k,)
    firsts: jax.Array,            # (k,) first sampled token per admitted row
    presence_rows: jax.Array,     # (k, V) prompt presence of admitted rows
):
    """Reset the admitted slots' sampling state: counts row = one-hot of the
    first output token; prompt presence row = the admitted prompt's table."""
    k, V = presence_rows.shape
    fresh = jnp.zeros((k, V), jnp.int32).at[jnp.arange(k), firsts].set(1)
    counts = counts.at[slots].set(fresh)
    prompt_presence = prompt_presence.at[slots].set(presence_rows)
    return counts, prompt_presence


@functools.partial(
    jax.jit, static_argnames=("dec_name", "cfg", "policy", "n")
)
def _beam_first(
    params: dict,
    h_last: jax.Array,        # (1, E) prompt's last-token hidden state
    *,
    dec_name: str,
    cfg: Any,
    policy: DTypePolicy,
    n: int,
):
    """First beam round from the prefill logits: top-2n continuations of the
    single prompt (HF: only beam 0 live at t=0). Returns (scores (2n,),
    tokens (2n,)); parents are all 0."""
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    logits = jnp.einsum(
        "be,ve->bv", policy.cast(h_last),
        policy.cast(dec.lm_head_table(params, cfg)),
        preferred_element_type=jnp.float32,
    )
    logp = jax.nn.log_softmax(logits[0], -1)
    scores, toks = jax.lax.top_k(logp, 2 * n)
    return scores, toks.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("dec_name", "cfg", "policy", "n"),
    donate_argnames=("cache",),
)
def _beam_step(
    params: dict,
    cache: dict,
    group_slots: jax.Array,   # (n,) slot indices of this beam group
    parent_perm: jax.Array,   # (n,) beam parentage from the last selection
    toks: jax.Array,          # (n,) tokens selected last round
    scores: jax.Array,        # (n,) cumulative live-beam logp
    last_tokens: jax.Array,   # (B,) non-group slots' last tokens (inactive)
    *,
    dec_name: str,
    cfg: Any,
    policy: DTypePolicy,
    n: int,
):
    """One beam-group round in ONE dispatch: reorder the group's cache rows
    by parentage (the previous round's selection — deferred into this step
    so selection costs no extra dispatch), ragged-decode the n beam rows
    (other slots inactive), and return the top-2n candidate continuations.
    With MQA the row gather moves ~n·L·T·D·2 bytes — sub-ms next to the
    decode step. Host transfer per round: 3·2n scalars."""
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    src = group_slots[parent_perm]
    for key in ("k", "v", "k_scale", "v_scale"):
        if key in cache:
            cache[key] = cache[key].at[:, group_slots].set(cache[key][:, src])
    B = cache["lengths"].shape[0]
    tokens_full = last_tokens.at[group_slots].set(toks)
    active = jnp.zeros((B,), jnp.int32).at[group_slots].set(1)
    logits, cache = dec.forward_ragged_decode(
        params, cfg, tokens_full, cache, active, policy=policy
    )
    logp = jax.nn.log_softmax(logits[group_slots].astype(jnp.float32), -1)
    flat = (scores[:, None] + logp).reshape(-1)           # (n * V,)
    cand_scores, cand_idx = jax.lax.top_k(flat, 2 * n)
    V = cfg.vocab_size
    return (cache, cand_scores, (cand_idx // V).astype(jnp.int32),
            (cand_idx % V).astype(jnp.int32))


class ServeEngine:
    def __init__(
        self,
        params: dict,
        llm_cfg,
        dec_name: str,
        *,
        max_batch: int = 8,
        max_len: int = 8192,
        policy: DTypePolicy = DTypePolicy(
            param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16
        ),
        seed: int = 0,
        max_top_k: int = 64,
        steps_per_tick: int = 4,
        prefill_chunk: int = 1024,
        kv_cache_dtype=None,     # e.g. jnp.int8: halves KV decode traffic
        spec_drafts: int = 0,    # >0: speculative ticks — steps_per_tick
                                 # on-device-drafted verify rounds per
                                 # dispatch, each emitting 1..N+1 tokens
        spec_accept_margin: float = 0.0,  # reject drafts whose verify
                                 # argmax margin (fp32 top1-top2) is below
                                 # this: bounds bf16 speculative drift
    ):
        from starvector_tpu.models import gpt_bigcode, starcoder2

        self.dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
        self.dec_name = dec_name
        self.params = params
        if llm_cfg.attn_impl == "xla":
            # serving default: flash prefill + xla decode (fastest measured)
            import dataclasses as _dc

            llm_cfg = _dc.replace(llm_cfg, attn_impl="mixed")
        self.llm_cfg = llm_cfg
        self.policy = policy
        self.max_batch = max_batch
        self.max_len = max_len
        self.max_top_k = max_top_k
        # tokens decoded per dispatch: >1 amortizes the fixed per-dispatch
        # overhead; admissions join between ticks (latency granularity =
        # steps_per_tick tokens). Tokens past a stop/eos are discarded.
        self.steps_per_tick = max(1, steps_per_tick)
        # speculative ticks (module docstring): every sampling tick becomes
        # steps_per_tick verify rounds in ONE dispatch, drafting on device
        # from [prompt ids ‖ accepted output]; a round emits between 1 and
        # spec_drafts+1 tokens per slot, so the worst case equals the plain
        # multi-step tick and the best case is steps_per_tick*(W) tokens.
        self.spec_drafts = max(0, int(spec_drafts))
        self.spec_accept_margin = float(spec_accept_margin)
        win = getattr(llm_cfg, "sliding_window", None)
        if self.spec_drafts and win is not None and self.spec_drafts + 1 > win:
            # fail at construction, not mid-serving inside the decode loop
            raise ValueError(
                f"spec_drafts+1 ({self.spec_drafts + 1}) exceeds the "
                f"model's sliding window ({win}): the verify chunk must fit "
                f"the window"
            )
        # admission prefill chunk: bounds device occupancy per dispatch so
        # a long prompt never stalls running decodes for its full length.
        # Default 1024 keeps typical prompts single-dispatch (each extra
        # chunk costs one fixed dispatch overhead) while 2k-8k prompts
        # still interleave with decode ticks. Rounded DOWN to a power of
        # two: buckets are powers of two, so the chunk must divide every
        # bucket or n_chunks*C would undercover the prompt tail.
        c = 64
        while c * 2 <= max(64, prefill_chunk):
            c *= 2
        self.prefill_chunk = c
        self.kv_dtype = kv_cache_dtype or policy.compute_dtype
        self.cache = self.dec.init_ragged_cache(
            llm_cfg, max_batch, max_len, dtype=self.kv_dtype
        )
        # sampling-state tables: output-token counts (frequency/presence
        # penalties; mutated in the tick scan) and prompt-token presence
        # (repetition penalty; written at admission). (B, V) int32 ≈ 1.5 MB
        # at B=8/V=49k — negligible next to the KV cache.
        V = llm_cfg.vocab_size
        self._counts = jnp.zeros((max_batch, V), jnp.int32)
        self._prompt_presence = jnp.zeros((max_batch, V), jnp.int32)
        # device draft context for speculative ticks: [prompt ids ‖ accepted
        # output] per slot, -1 holes allowed ((B, C) int32 — a few hundred
        # KB). Drafting happens ON DEVICE inside the fused tick.
        self._ctx = None
        self._ctx_len = None
        if self.spec_drafts:
            C = max_len + self.steps_per_tick * (self.spec_drafts + 1)
            self._ctx = jnp.full((max_batch, C), -1, jnp.int32)
            self._ctx_len = jnp.zeros((max_batch,), jnp.int32)
        # adaptive tick-kind selection, MEASURED not modeled: the engine
        # times each tick and keeps an emitted-tokens/s EMA per kind
        # ("verify" speculative vs "plain" multi-step). Verify ticks run
        # while they are not measurably slower; otherwise the engine falls
        # back to plain ticks for `_spec_probe_every` ticks, then probes
        # one verify tick to re-learn. Round-4 motivation: the previous
        # any-acceptance heuristic kept mixed-composition verify ticks
        # (~4x a plain tick: n_rounds*W pruned-sampling positions + W-wide
        # verify forwards) alive on ~1.6 extra tokens/tick — measured
        # 101 vs 374 tok/s on the organic mixed serving workload. The
        # stale device ctx during fallback only degrades later drafts
        # (acceptance, never correctness) until admissions refresh rows.
        self._spec_probe_every = 16   # initial fallback window (ticks)
        self._spec_skip = 0
        # EMAs keyed by (kind, greedy_only): the verify/plain cost ratio is
        # composition-dependent (all-greedy verify positions are argmax,
        # mixed ones run the pruned sampling chain), so each composition
        # learns its own decision instead of relearning on every admission
        self._tick_rate = {}
        self._rate_alpha = 0.4
        self._spec_backoff = self._spec_probe_every  # doubles per failed probe
        self.max_bias = 4                 # static bound on logit_bias entries
        self.slots = [_Slot() for _ in range(max_batch)]
        self.beam_groups: list[_BeamGroup] = []
        self.pending: "queue.Queue[Request]" = queue.Queue()
        self._ready: "queue.Queue" = queue.Queue()   # admission → tick handoff
        self.base_rng = jax.random.PRNGKey(seed)          # tick key stream
        self.admit_rng = jax.random.PRNGKey(seed ^ 0x5EED)  # admission stream
        self._step = 0         # tick counter (mutated under _lock by _tick)
        self._admit_step = 0   # admission counter (mutated under _lock)
        self._knob_cache = None  # per-slot sampling knobs on device
        self._stats = {"tokens": 0, "ticks": 0, "admissions": 0,
                       "spec_ticks": 0, "spec_extra_tokens": 0,
                       # dispatch->host-fetch wall time of every decode-tick
                       # executable (plain + verify): on a tunneled backend
                       # each window carries the full round-trip, so
                       # (dispatch_s - dispatches*RTT) isolates on-device
                       # compute — the audit lever behind bench.py's
                       # serve_device_tok_per_s estimate
                       "dispatch_s": 0.0, "dispatches": 0,
                       "start_time": time.time()}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._decode_thread: threading.Thread | None = None
        self._admit_thread: threading.Thread | None = None
        self._idle_wait = 0.005

    # -- public API ----------------------------------------------------------
    def submit(self, req: Request) -> Request:
        P = int(req.prefix_embeds.shape[1])
        # slack: a multi-step tick may overshoot a stop by steps_per_tick-1
        # tokens; a speculative tick commits up to steps_per_tick*(W)-1.
        # Beam groups never speculate, so they keep the smaller bound.
        if req.num_beams > 1:
            slack = self.steps_per_tick - 1
        else:
            slack = self.steps_per_tick * (self.spec_drafts + 1) - 1
        if P + req.max_new_tokens + slack > self.max_len:
            req.out_queue.put((
                "error",
                f"prompt ({P}) + max_new_tokens ({req.max_new_tokens}) "
                f"exceeds engine max_len ({self.max_len}, incl. "
                f"{slack} multi-step/speculative slack)",
            ))
            return req
        if req.logit_bias and len(req.logit_bias) > self.max_bias:
            req.out_queue.put((
                "error",
                f"logit_bias has {len(req.logit_bias)} entries; the engine's "
                f"static bound is max_bias={self.max_bias}",
            ))
            return req
        if req.num_beams > self.max_batch:
            req.out_queue.put((
                "error",
                f"num_beams ({req.num_beams}) exceeds engine max_batch "
                f"({self.max_batch}); a beam group occupies one slot per beam",
            ))
            return req
        self.pending.put(req)
        return req

    def start(self):
        if self._decode_thread is None:
            self._decode_thread = threading.Thread(
                target=self._decode_loop, daemon=True
            )
            self._admit_thread = threading.Thread(
                target=self._admit_loop, daemon=True
            )
            self._decode_thread.start()
            self._admit_thread.start()

    def stop(self):
        self._stop.set()
        for t in (self._decode_thread, self._admit_thread):
            if t:
                t.join(timeout=5)
        self._decode_thread = None
        self._admit_thread = None
        # fail anything still queued — callers blocked on out_queue must
        # see an event, not hang out their full timeout
        while True:
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break
            req.out_queue.put(("error", "engine stopped"))

    def warmup(self, prompt_lens, group_sizes=None, timeout: float = 2400):
        """Pre-compile the full admission + tick dispatch chain for every
        (prompt-length bucket, admission-group-size) pair, so cold-start
        compiles never land mid-serving. Group sizes default to all powers
        of two up to max_batch — exactly the sizes `_admit_loop` forms.

        Dummy requests run through the REAL `_admit_group` (deterministic k,
        unlike racing the admission thread) and decode one multi-step tick.
        Call on an idle engine. Warmup traffic does not pollute the stats()
        gauges (counters are restored afterwards)."""
        self.start()
        counter_keys = ("tokens", "ticks", "admissions", "spec_ticks",
                        "spec_extra_tokens", "dispatch_s", "dispatches")
        stats_before = {k: self._stats[k] for k in counter_keys}
        if group_sizes is None:
            group_sizes, g = [], 1
            while g <= self.max_batch:
                group_sizes.append(g)
                g *= 2
        buckets = sorted({
            min(_bucket_len(int(p)), self.max_len) for p in prompt_lens
        })
        E = self.llm_cfg.hidden_size
        slack = self.steps_per_tick + 1
        for Pb in buckets:
            P = min(Pb, self.max_len - slack - 1)
            for k in group_sizes:
                if k > self.max_batch:
                    continue
                reqs = [
                    Request(
                        prefix_embeds=np.zeros((1, P, E), np.float32),
                        max_new_tokens=min(self.steps_per_tick + 1, 4),
                        temperature=0.0, do_sample=False,
                    )
                    for _ in range(k)
                ]
                idxs = []
                deadline = time.time() + timeout
                try:
                    while len(idxs) < k and time.time() < deadline:
                        i = self._reserve_slot()
                        if i is None:
                            time.sleep(self._idle_wait)
                        else:
                            idxs.append(i)
                    if len(idxs) < k:
                        raise TimeoutError("warmup could not reserve slots")
                    self._admit_group(reqs, idxs, Pb)
                except Exception:
                    # release any slots still held so a failed warmup never
                    # shrinks serving capacity
                    with self._lock:
                        for i in idxs:
                            if self.slots[i].req is None:
                                self.slots[i].reserved = False
                    raise
                for r in reqs:
                    while True:
                        kind, payload = r.out_queue.get(timeout=timeout)
                        if kind == "done":
                            break
                        if kind == "error":
                            raise RuntimeError(f"warmup failed: {payload}")
        # greedy_only is a STATIC dispatch selector, so the all-greedy
        # dummies above never compile the MIXED-composition variants. With
        # speculation on, FOUR tick programs exist (plain/verify x
        # greedy/mixed): verify ticks serve normal traffic, plain ticks the
        # adaptive spec-skip fallback. Compile every variant that can run
        # so no cold compile lands mid-serving (a mid-run mixed-plain
        # compile measured ~140 s through the tunnel).
        P = min(buckets[0], self.max_len - slack - 1)

        def run_dummy(do_sample: bool, force_plain: bool):
            req = Request(
                prefix_embeds=np.zeros((1, P, E), np.float32),
                max_new_tokens=min(self.steps_per_tick + 1, 4),
                temperature=0.8 if do_sample else 0.0, do_sample=do_sample,
            )
            if force_plain:
                self._spec_skip = 10_000
            try:
                deadline = time.time() + timeout
                i = None
                while i is None and time.time() < deadline:
                    i = self._reserve_slot()
                    if i is None:
                        time.sleep(self._idle_wait)
                if i is None:
                    raise TimeoutError("warmup could not reserve a slot")
                try:
                    self._admit_group([req], [i], buckets[0])
                except Exception:
                    with self._lock:
                        if self.slots[i].req is None:
                            self.slots[i].reserved = False
                    raise
                while True:
                    kind, payload = req.out_queue.get(timeout=timeout)
                    if kind == "done":
                        break
                    if kind == "error":
                        raise RuntimeError(f"warmup failed: {payload}")
            finally:
                if force_plain:
                    self._spec_skip = 0

        run_dummy(do_sample=True, force_plain=False)   # mixed verify/plain
        if self.spec_drafts > 0:
            # the k-group dummies above compiled greedy VERIFY ticks and the
            # sampled dummy mixed ones; the plain variants only run behind
            # the adaptive spec-skip — force it so they compile here
            run_dummy(do_sample=False, force_plain=True)
            run_dummy(do_sample=True, force_plain=True)
            # idle-engine composition: active = 0 everywhere
            with self._lock:
                self._knob_cache = None
                self._verify_tick([None] * self.max_batch)
                self._knob_cache = None
        with self._lock:
            self._stats.update(stats_before)
            # warmup ticks carry compile time — their rates would poison
            # the verify-vs-plain EMAs (a stale compile-slow "plain" EMA
            # never re-measures, so verify looks faster forever)
            self._tick_rate = {}
            self._spec_skip = 0
            self._spec_backoff = self._spec_probe_every

    def stats(self) -> dict:
        """Serving observability counters (vLLM-style gauges): emitted
        tokens, ticks, admissions, uptime, average tokens/s."""
        up = max(time.time() - self._stats["start_time"], 1e-6)
        return {
            "tokens_emitted": self._stats["tokens"],
            "ticks": self._stats["ticks"],
            "admissions": self._stats["admissions"],
            "spec_ticks": self._stats["spec_ticks"],
            "spec_extra_tokens": self._stats["spec_extra_tokens"],
            "dispatch_s_total": round(self._stats["dispatch_s"], 4),
            "dispatches": self._stats["dispatches"],
            "uptime_s": round(up, 1),
            "avg_tokens_per_s": round(self._stats["tokens"] / up, 2),
            "active_slots": self.num_active,
            "pending_requests": self.pending.qsize(),
        }

    @property
    def num_active(self) -> int:
        return sum(1 for s in self.slots if s.req is not None)

    @property
    def queue_length(self) -> int:
        return self.pending.qsize() + self.num_active

    # -- admission (its own thread; prefill happens OFF the tick lock) -------
    def _reserve_slot(self) -> int | None:
        with self._lock:
            for i, s in enumerate(self.slots):
                if s.req is None and not s.reserved:
                    s.reserved = True
                    return i
        return None

    def _admit_loop(self):
        while not self._stop.is_set():
            try:
                first = self.pending.get(timeout=0.05)
            except queue.Empty:
                continue
            # opportunistically drain the queue and group SAME-BUCKET
            # requests: k prompts prefill as one (k, Pb) batch — better MXU
            # occupancy than k B=1 prefills and 1/k the dispatches. Group
            # sizes are capped at powers of two (bounded compile cache).
            batch = [first]
            while len(batch) < 2 * self.max_batch:
                try:
                    batch.append(self.pending.get_nowait())
                except queue.Empty:
                    break
            # beam requests admit individually (one request = num_beams
            # slots); sampling requests batch by prompt bucket as before
            beam_reqs = [r for r in batch if r.num_beams > 1]
            for r in beam_reqs:
                try:
                    self._admit_beam(r)
                except Exception as e:  # noqa: BLE001 — fail the req, not the loop
                    r.out_queue.put(("error", f"{type(e).__name__}: {e}"))
            groups: dict[int, list[Request]] = {}
            for r in batch:
                if r.num_beams > 1:
                    continue
                Pb = min(_bucket_len(int(r.prefix_embeds.shape[1])),
                         self.max_len)
                groups.setdefault(Pb, []).append(r)
            for Pb, reqs in groups.items():
                while reqs and not self._stop.is_set():
                    # size the group by slots that are free RIGHT NOW (never
                    # hold reserved slots idle waiting for more to drain —
                    # that would starve running decodes of admission slots)
                    idxs = [i for i in (self._reserve_slot(),) if i is not None]
                    if not idxs:
                        time.sleep(self._idle_wait)
                        continue
                    k = 1
                    while k < min(len(reqs), self.max_batch):
                        nxt = self._reserve_slot()
                        if nxt is None:
                            break
                        idxs.append(nxt)
                        k += 1
                    # round DOWN to a power of two (bounded compile cache)
                    k2 = 1
                    while k2 * 2 <= k:
                        k2 *= 2
                    with self._lock:
                        for i in idxs[k2:]:
                            self.slots[i].reserved = False
                    idxs = idxs[:k2]
                    chunk_reqs = reqs[:k2]
                    reqs = reqs[k2:]
                    try:
                        self._admit_group(chunk_reqs, idxs, Pb)
                    except Exception as e:  # noqa: BLE001 — fail the reqs, not the loop
                        with self._lock:
                            for i in idxs:
                                self.slots[i] = _Slot()
                        for r in chunk_reqs:
                            r.out_queue.put(
                                ("error", f"{type(e).__name__}: {e}")
                            )
                # engine stopped with requests still queued: fail them
                for r in reqs:
                    r.out_queue.put(("error", "engine stopped"))

    def _admit_beam(self, req: Request):
        """Admit one beam request into num_beams slots: chunked prefill of
        the single prompt, first-round candidate selection from the prefill
        logits (HF t=0 semantics), then the prefix replicated into every
        beam row. Decoding happens in _tick via _beam_step rounds."""
        n = req.num_beams
        idxs: list[int] = []
        try:
            while len(idxs) < n and not self._stop.is_set():
                i = self._reserve_slot()
                if i is None:
                    time.sleep(self._idle_wait)
                else:
                    idxs.append(i)
            if len(idxs) < n:
                raise RuntimeError("engine stopped")
            P = int(req.prefix_embeds.shape[1])
            Pb = min(_bucket_len(P), self.max_len)
            embeds = jnp.asarray(req.prefix_embeds, self.policy.compute_dtype)
            if Pb > P:
                embeds = jnp.pad(embeds, ((0, 0), (0, Pb - P), (0, 0)))
            mask = (jnp.arange(Pb)[None, :] < P).astype(jnp.int32)
            small = self.dec.init_cache(self.llm_cfg, 1, Pb, dtype=self.kv_dtype)
            C = self.prefill_chunk
            n_chunks = max(Pb // C, 1)
            C = Pb // n_chunks
            h_last = jnp.zeros((1, self.llm_cfg.hidden_size),
                               self.policy.compute_dtype)
            last_idx = jnp.asarray([P - 1], jnp.int32)
            for ci in range(n_chunks):
                small, h_last = _prefill_chunk(
                    self.params, embeds[:, ci * C:(ci + 1) * C],
                    mask[:, ci * C:(ci + 1) * C], small, h_last,
                    last_idx, jnp.asarray(ci * C, jnp.int32),
                    dec_name=self.dec_name, cfg=self.llm_cfg,
                    policy=self.policy,
                )
            scores, toks = _beam_first(
                self.params, h_last, dec_name=self.dec_name,
                cfg=self.llm_cfg, policy=self.policy, n=n,
            )
            # HF t=0: only beam 0 exists; all 2n candidates parent to it
            group = _BeamGroup(
                req=req, slot_idxs=list(idxs),
                histories=[[]], scores=[0.0],
                parent_perm=np.zeros((n,), np.int32),
                next_tokens=np.zeros((n,), np.int32),
            )
            group.select(np.asarray(scores), np.zeros((2 * n,), np.int32),
                         np.asarray(toks))
            # replicate the prefilled row into every beam slot
            rep: dict = {}
            for key in small:
                if key == "kv_mask":
                    rep[key] = jnp.repeat(small[key], n, axis=0)
                elif key == "index":
                    rep[key] = small[key]
                else:
                    rep[key] = jnp.repeat(small[key], n, axis=1)
            with self._lock:
                try:
                    self.cache = self.dec.insert_prefill_rows(
                        self.llm_cfg, self.cache, rep,
                        jnp.asarray(idxs), jnp.full((n,), P, jnp.int32),
                    )
                except Exception as ie:  # noqa: BLE001
                    # insert donates the cache: rebuilding zeroes every
                    # slot's context, so all active requests fail with it
                    self._fail_active_locked(ie)
                    raise
                self._knob_cache = None
                self._stats["admissions"] += 1
                for i in idxs:
                    slot = self.slots[i]
                    slot.req = req
                    slot.beam = group
                    slot.reserved = False
                self.beam_groups.append(group)
        except Exception:
            with self._lock:
                for i in idxs:
                    if self.slots[i].req is None:
                        self.slots[i] = _Slot()
            raise

    def _admit_group(self, reqs: list[Request], slot_idxs: list[int], Pb: int):
        """Bucketed batch prefill (no lock held) + one locked scatter."""
        k = len(reqs)
        lens = [int(r.prefix_embeds.shape[1]) for r in reqs]
        rows = []
        for r, P in zip(reqs, lens):
            e = jnp.asarray(r.prefix_embeds, self.policy.compute_dtype)
            if Pb > P:
                e = jnp.pad(e, ((0, 0), (0, Pb - P), (0, 0)))
            rows.append(e[:, :Pb])
        embeds = jnp.concatenate(rows, axis=0)          # (k, Pb, E)
        mask = (jnp.arange(Pb)[None, :]
                < jnp.asarray(lens)[:, None]).astype(jnp.int32)
        small = self.dec.init_cache(
            self.llm_cfg, k, Pb, dtype=self.kv_dtype
        )
        C = self.prefill_chunk
        n_chunks = max(Pb // C, 1)
        C = Pb // n_chunks
        # each row's last-token hidden is captured from whichever chunk
        # contains it (rows in the same bucket can differ by up to Pb/2
        # tokens, spanning several chunks) and carried to the sampler
        last_idx = jnp.asarray([P - 1 for P in lens], jnp.int32)
        h_last = jnp.zeros((k, self.llm_cfg.hidden_size),
                           self.policy.compute_dtype)
        for ci in range(n_chunks):
            small, h_last = _prefill_chunk(
                self.params, embeds[:, ci * C:(ci + 1) * C],
                mask[:, ci * C:(ci + 1) * C], small, h_last,
                last_idx, jnp.asarray(ci * C, jnp.int32),
                dec_name=self.dec_name, cfg=self.llm_cfg, policy=self.policy,
            )
        with self._lock:
            self._admit_step += 1
            astep = self._admit_step
        temps = jnp.asarray(
            [r.temperature if r.do_sample else 0.0 for r in reqs], jnp.float32
        )
        # prompt ids bucketed like the embeds (-1 padding); empty when no
        # request supplies them (repetition penalty then sees output only)
        pid_rows = np.full((k, Pb), -1, np.int32)
        for row, r in enumerate(reqs):
            if r.prompt_token_ids is not None:
                ids = np.asarray(r.prompt_token_ids, np.int32).reshape(-1)
                pid_rows[row, : min(len(ids), Pb)] = ids[:Pb]
        bias_ids, bias_vals = self._bias_arrays(reqs)
        firsts_arr, presence_rows = _sample_first(
            self.params, h_last,
            self.admit_rng, jnp.asarray(astep, jnp.int32),
            temps,
            jnp.asarray([r.top_p for r in reqs], jnp.float32),
            jnp.asarray([r.top_k for r in reqs], jnp.int32),
            jnp.asarray([r.min_p for r in reqs], jnp.float32),
            jnp.asarray([r.repetition_penalty for r in reqs], jnp.float32),
            jnp.asarray(pid_rows),
            bias_ids, bias_vals,
            dec_name=self.dec_name, cfg=self.llm_cfg, policy=self.policy,
            max_top_k=self.max_top_k,
        )
        firsts = [int(t) for t in np.asarray(firsts_arr)]
        with self._lock:
            try:
                self.cache = self.dec.insert_prefill_rows(
                    self.llm_cfg, self.cache, small, jnp.asarray(slot_idxs),
                    jnp.asarray(lens),
                )
                self._counts, self._prompt_presence = _admit_sampling_state(
                    self._counts, self._prompt_presence,
                    jnp.asarray(slot_idxs, jnp.int32), firsts_arr,
                    presence_rows,
                )
                if self.spec_drafts:
                    self._ctx, self._ctx_len = _admit_ctx_rows(
                        self._ctx, self._ctx_len,
                        jnp.asarray(slot_idxs, jnp.int32),
                        jnp.asarray(pid_rows),
                    )
                    # fresh requests probe speculation immediately; the
                    # per-composition EMAs persist (no relearning storm
                    # under staggered admissions)
                    self._spec_skip = 0
                    self._spec_backoff = self._spec_probe_every
            except Exception:
                # these calls donate the engine's cache/count buffers; a
                # failure mid-way may have consumed them — rebuild so the
                # decode loop stays serviceable (same contract as _tick)
                self._rebuild_state_locked()
                raise
            self._knob_cache = None       # slot composition changes below
            self._stats["admissions"] += len(reqs)
            for r, i, tok in zip(reqs, slot_idxs, firsts):
                slot = self.slots[i]
                slot.req = r
                slot.generated = [tok]
                slot.last_token = tok
                slot.reserved = False
                self._emit(i)

    def _rebuild_state_locked(self):
        """Re-allocate the donated device buffers (cache + sampling tables)
        after a failed dispatch may have consumed them. Caller holds _lock."""
        self.cache = self.dec.init_ragged_cache(
            self.llm_cfg, self.max_batch, self.max_len, dtype=self.kv_dtype
        )
        V = self.llm_cfg.vocab_size
        self._counts = jnp.zeros((self.max_batch, V), jnp.int32)
        self._prompt_presence = jnp.zeros((self.max_batch, V), jnp.int32)
        if self.spec_drafts:
            C = self.max_len + self.steps_per_tick * (self.spec_drafts + 1)
            self._ctx = jnp.full((self.max_batch, C), -1, jnp.int32)
            self._ctx_len = jnp.zeros((self.max_batch,), jnp.int32)
        self._knob_cache = None

    def _bias_arrays(self, reqs):
        """Per-row logit_bias as (B, max_bias) id/value arrays (-1 = off)."""
        n = len(reqs)
        ids = np.full((n, self.max_bias), -1, np.int32)
        vals = np.zeros((n, self.max_bias), np.float32)
        for row, r in enumerate(reqs):
            if r is not None and r.logit_bias:
                for j, (tid, b) in enumerate(
                    list(r.logit_bias.items())[: self.max_bias]
                ):
                    ids[row, j] = int(tid)
                    vals[row, j] = float(b)
        return jnp.asarray(ids), jnp.asarray(vals)

    # -- decode tick -----------------------------------------------------------
    def _emit(self, slot_idx: int) -> bool:
        """Push the latest token; finish the request if stopped. Returns
        True when the slot was released."""
        slot = self.slots[slot_idx]
        req = slot.req
        tok = slot.generated[-1]
        done = False
        if req.eos_token_id is not None and tok == req.eos_token_id:
            done = True
        for stop in req.stop_sequences:
            L = len(stop)
            if L and len(slot.generated) >= L and tuple(slot.generated[-L:]) == stop:
                done = True
        if len(slot.generated) >= req.max_new_tokens:
            done = True
        req.out_queue.put(("token", tok))
        self._stats["tokens"] += 1
        if done:
            req.out_queue.put(("done", list(slot.generated)))
            self.slots[slot_idx] = _Slot()
            self._knob_cache = None       # slot composition changed
        return done

    def _tick(self) -> bool:
        # beam slots decode in their own _beam_step dispatches below; they
        # are inactive rows in the sampling dispatch (no cache advance)
        reqs = [s.req if s.beam is None else None for s in self.slots]
        worked = False
        if any(r is not None for r in reqs):
            worked = True
            self._sampling_tick(reqs)
        for group in list(self.beam_groups):
            worked = True
            self._beam_tick(group)
        return worked

    def _knobs(self, reqs):
        if self._knob_cache is None:
            # per-slot sampling knobs are request constants: ship them to
            # the device only when the slot composition changes, not every
            # tick (10 fewer host->device transfers per tick)
            bias_ids, bias_vals = self._bias_arrays(reqs)
            self._knob_cache = (
                jnp.asarray(np.array(
                    [1 if r is not None else 0 for r in reqs], np.int32)),
                jnp.asarray(np.array(
                    [(r.temperature if (r and r.do_sample) else 0.0)
                     for r in reqs], np.float32)),
                jnp.asarray(np.array(
                    [(r.top_p if r else 1.0) for r in reqs], np.float32)),
                jnp.asarray(np.array(
                    [(r.top_k if r else 0) for r in reqs], np.int32)),
                jnp.asarray(np.array(
                    [(r.min_p if r else 0.0) for r in reqs], np.float32)),
                jnp.asarray(np.array(
                    [(r.repetition_penalty if r else 1.0) for r in reqs],
                    np.float32)),
                jnp.asarray(np.array(
                    [(r.frequency_penalty if r else 0.0) for r in reqs],
                    np.float32)),
                jnp.asarray(np.array(
                    [(r.presence_penalty if r else 0.0) for r in reqs],
                    np.float32)),
                bias_ids, bias_vals,
                # STATIC dispatch selector: all-greedy slot compositions
                # compile pure-argmax steps (no (B, V) vocab sorts) — the
                # sorts dominated the measured verify-tick cost
                all((not r.do_sample) or r.temperature == 0.0
                    for r in reqs if r is not None),
            )
        return self._knob_cache

    def _sampling_tick(self, reqs) -> None:
        if self.spec_drafts > 0:
            # Speculative ticks run for ANY slot composition. All-greedy
            # compositions compile pure-argmax verify positions (the
            # cheapest tick); mixed/sampled compositions use top-k-PRUNED
            # sampling inside the verify rounds — the chain runs on the
            # (B, max_top_k) slab, so the n_rounds*W positions cost one
            # lax.top_k each instead of the full (B, V) sorts that made
            # mixed speculation net-negative in round 3. Greedy slots keep
            # their exact argmax inside the pruned chain; sampled slots
            # accept drafts only when the true conditional sample matches.
            # Persistently zero-acceptance traffic falls back for a while
            # (adaptive probe, __init__).
            greedy_only = self._knobs(reqs)[-1]
            # bootstrap: after the first verify measurement for this
            # composition, run ONE plain tick so both EMAs exist
            need_plain_sample = (
                self._tick_rate.get(("plain", greedy_only)) is None
                and self._tick_rate.get(("verify", greedy_only)) is not None
            )
            if self._spec_skip == 0 and not need_plain_sample:
                t0 = time.time()
                tok0 = self._stats["tokens"]
                self._verify_tick(reqs)
                self._update_tick_rate("verify", greedy_only, tok0, t0)
                return
            if self._spec_skip > 0:
                self._spec_skip -= 1
        t0 = time.time()
        tok0 = self._stats["tokens"]
        K = self.steps_per_tick
        tokens = np.array([s.last_token for s in self.slots], np.int32)
        (active, temps, top_ps, top_ks, min_ps, rep_ps, frq_ps, prs_ps,
         bias_ids, bias_vals, greedy_only) = self._knobs(reqs)
        self._step += 1
        self._stats["ticks"] += 1
        t_disp = time.time()
        nxt, self.cache, self._counts = _fused_ragged_step(
            self.params, jnp.asarray(tokens), self.cache, active,
            self.base_rng, jnp.asarray(self._step, jnp.int32),
            temps, top_ps, top_ks,
            min_ps, rep_ps, frq_ps,
            prs_ps, self._counts, self._prompt_presence,
            bias_ids, bias_vals,
            dec_name=self.dec_name, cfg=self.llm_cfg, policy=self.policy,
            max_top_k=self.max_top_k, n_steps=K, greedy_only=greedy_only,
        )
        nxt = np.asarray(nxt)  # (B, K) — the fetch is the tick's sync point
        self._stats["dispatch_s"] += time.time() - t_disp
        self._stats["dispatches"] += 1
        for i in range(len(self.slots)):
            if self.slots[i].req is None or self.slots[i].beam is not None:
                continue
            for j in range(K):
                tok = int(nxt[i, j])
                slot = self.slots[i]
                slot.generated.append(tok)
                slot.last_token = tok
                if self._emit(i):
                    break  # tokens past the stop are discarded
        if self.spec_drafts > 0:
            self._update_tick_rate("plain", greedy_only, tok0, t0)

    def _update_tick_rate(self, kind: str, greedy_only: bool,
                          tok0: int, t0: float) -> None:
        """Per-composition EMA of emitted tokens/s for this tick kind. After
        a verify measurement, fall back to plain ticks when verify is
        measurably slower; each consecutive failed probe doubles the
        fallback window (capped), so steady losing traffic pays a vanishing
        probe tax while a success resets the cadence."""
        dt = max(time.time() - t0, 1e-6)
        rate = (self._stats["tokens"] - tok0) / dt
        key = (kind, greedy_only)
        prev = self._tick_rate.get(key)
        a = self._rate_alpha
        self._tick_rate[key] = rate if prev is None else a * rate + (1 - a) * prev
        if kind == "verify":
            pv = self._tick_rate.get(("verify", greedy_only))
            pp = self._tick_rate.get(("plain", greedy_only))
            if pp is not None and pv is not None and pv < 0.95 * pp:
                if pv < 0.5 * pp:
                    # hopeless for this composition: stop paying the probe
                    # tax until the backoff cap (admissions re-probe sooner)
                    self._spec_backoff = 256
                self._spec_skip = self._spec_backoff
                self._spec_backoff = min(self._spec_backoff * 2, 256)
            else:
                self._spec_backoff = self._spec_probe_every

    def _verify_tick(self, reqs) -> None:
        """One speculative tick: steps_per_tick verify ROUNDS fused into a
        single dispatch, drafting on device from each slot's
        [prompt ids ‖ accepted output] context. Emits 1..spec_drafts+1
        tokens per slot per round."""
        M = self.steps_per_tick
        tokens = np.array([s.last_token for s in self.slots], np.int32)
        (active, temps, top_ps, top_ks, min_ps, rep_ps, frq_ps, prs_ps,
         bias_ids, bias_vals, greedy_only) = self._knobs(reqs)
        self._step += 1
        self._stats["ticks"] += 1
        self._stats["spec_ticks"] += 1
        t_disp = time.time()
        (toks, chain, self.cache, self._counts,
         self._ctx, self._ctx_len) = _fused_verify_multi(
            self.params, jnp.asarray(tokens), self.cache,
            self._ctx, self._ctx_len, active,
            self.base_rng, jnp.asarray(self._step, jnp.int32),
            temps, top_ps, top_ks, min_ps, rep_ps, frq_ps, prs_ps,
            self._counts, self._prompt_presence, bias_ids, bias_vals,
            dec_name=self.dec_name, cfg=self.llm_cfg, policy=self.policy,
            max_top_k=self.max_top_k, n_rounds=M,
            draft_len=self.spec_drafts, greedy_only=greedy_only,
            accept_margin=self.spec_accept_margin,
        )
        toks = np.asarray(toks)    # (B, M, W)
        chain = np.asarray(chain)
        self._stats["dispatch_s"] += time.time() - t_disp
        self._stats["dispatches"] += 1
        tick_extra = 0
        for i in range(len(self.slots)):
            slot = self.slots[i]
            if slot.req is None or slot.beam is not None:
                continue
            released = False
            for m in range(M):
                accepted = int(chain[i, m].sum())  # cumulative: sum = count
                extra = max(accepted - 1, 0)
                tick_extra += extra
                self._stats["spec_extra_tokens"] += extra
                for j in range(accepted):
                    tok = int(toks[i, m, j])
                    slot.generated.append(tok)
                    slot.last_token = tok
                    if self._emit(i):
                        released = True
                        break  # tokens past the stop are discarded
                if released:
                    break
        # rate comparison happens in _sampling_tick (_update_tick_rate);
        # tick_extra only feeds the spec_extra_tokens gauge now
        del tick_extra

    def _beam_tick(self, group: _BeamGroup) -> None:
        """steps_per_tick beam rounds for one group. Each round is one
        _beam_step dispatch (cache-reorder + decode + top-2n) plus trivial
        host selection; rounds can't fuse into a scan because recombination
        feeds the next round's cache reorder. On failure only this group's
        request errors (same contract as sampling admission)."""
        try:
            for _ in range(self.steps_per_tick):
                last_tokens = jnp.asarray(
                    np.array([s.last_token for s in self.slots], np.int32)
                )
                self.cache, cand_scores, parents, toks = _beam_step(
                    self.params, self.cache,
                    jnp.asarray(group.slot_idxs, jnp.int32),
                    jnp.asarray(group.parent_perm),
                    jnp.asarray(group.next_tokens),
                    jnp.asarray(group.scores, jnp.float32),
                    last_tokens,
                    dec_name=self.dec_name, cfg=self.llm_cfg,
                    policy=self.policy, n=len(group.slot_idxs),
                )
                group.select(np.asarray(cand_scores), np.asarray(parents),
                             np.asarray(toks))
                self._stats["ticks"] += 1
                if group.done():
                    best = group.best()
                    req = group.req
                    for tok in best:
                        req.out_queue.put(("token", tok))
                    self._stats["tokens"] += len(best)
                    req.out_queue.put(("done", best))
                    self._release_group(group)
                    return
        except Exception as e:  # noqa: BLE001 — keep the engine alive
            # _beam_step donates the cache; a mid-dispatch failure may have
            # consumed it. Rebuilding zeroes EVERY slot's KV context, so all
            # active requests must fail with it — continuing the others
            # against a blank cache would stream well-formed garbage.
            self._fail_active_locked(e)

    def _fail_active_locked(self, e: Exception) -> None:
        """Error out every active request and rebuild the donated device
        state (caller holds the lock). Used whenever a failed dispatch may
        have consumed the cache: the rebuilt cache is empty, so no surviving
        request could decode correctly afterwards."""
        failed: set[str] = set()
        for i, s in enumerate(self.slots):
            if s.req is not None:
                if s.req.request_id not in failed:  # one error per request
                    failed.add(s.req.request_id)
                    s.req.out_queue.put(("error", f"{type(e).__name__}: {e}"))
                self.slots[i] = _Slot()
        self.beam_groups.clear()
        self._rebuild_state_locked()

    def _release_group(self, group: _BeamGroup) -> None:
        if group in self.beam_groups:
            self.beam_groups.remove(group)
        for i in group.slot_idxs:
            self.slots[i] = _Slot()
        self._knob_cache = None

    def _decode_loop(self):
        while not self._stop.is_set():
            try:
                with self._lock:
                    worked = self._tick()
            except Exception as e:  # noqa: BLE001 — fail active requests, keep looping
                with self._lock:
                    # the failed step may have consumed the donated cache /
                    # counts buffers; rebuild (everyone fails with it)
                    self._fail_active_locked(e)
                worked = False
            if not worked:
                time.sleep(self._idle_wait)

    # -- synchronous convenience ----------------------------------------------
    def generate_sync(self, req: Request, timeout: float = 600) -> list[int]:
        self.submit(req)
        self.start()
        tokens: list[int] = []
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                kind, payload = req.out_queue.get(timeout=1.0)
            except queue.Empty:
                continue
            if kind == "token":
                tokens.append(payload)
            elif kind == "done":
                return payload
            elif kind == "error":
                raise RuntimeError(f"request {req.request_id} failed: {payload}")
        raise TimeoutError(f"request {req.request_id} timed out")
