"""Autoregressive generation engine — jitted prefill + lax.while_loop decode.

TPU-native replacement for HF `generate` as the reference uses it
(reference: starvector_base.py:203-339): preallocated KV cache, one compiled
step function, per-sequence early stopping on `</svg>` token sequences
(reference StoppingCriteriaSub, starvector_base.py:9-20 — upgraded from the
reference's batch-global check to per-sequence), eos handling, min-length eos
suppression, repetition penalty, temperature/top-p/top-k nucleus sampling
(reference defaults top_p .9, temperature 1, starvector_base.py:228-241).

Scalar sampling knobs are traced (a temperature sweep does not recompile);
structure (max_new_tokens, stop sequences, batch) is static.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from starvector_tpu.models import starvector as sv
from starvector_tpu.ops.layers import DTypePolicy
from starvector_tpu.ops.sampling import NEG_INF, sample_token


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 256
    min_new_tokens: int = 1
    do_sample: bool = True
    temperature: float = 1.0
    top_p: float = 0.9
    top_k: int = 0
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    # sparse additive bias ((token_id, bias), ...) — reference biases the
    # `</svg>` id (starvector_vllm_api_svg_validator.py:60)
    logit_bias: tuple[tuple[int, float], ...] = ()
    num_return_sequences: int = 1
    stop_sequences: tuple[tuple[int, ...], ...] = ()
    eos_token_id: int | None = None
    pad_token_id: int = 0
    max_top_k: int = 64

    @property
    def static_key(self):
        return (
            self.max_new_tokens,
            self.min_new_tokens,
            self.stop_sequences,
            self.eos_token_id,
            self.pad_token_id,
            self.max_top_k,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "dec_name", "llm_cfg", "max_new_tokens", "min_new_tokens",
        "stop_sequences", "eos_token_id", "pad_token_id", "max_top_k",
        "policy", "do_sample", "use_rep_penalty", "use_freq_penalty", "n_rep",
        "kv_dtype",
    ),
)
def _generate_jit(
    params: dict,
    inputs_embeds: jax.Array,      # (B, P, E)
    attention_mask: jax.Array,     # (B, P)
    prompt_presence: jax.Array,    # (B, V) tokens present in the prompt
    knobs: dict,                   # traced scalars
    rng: jax.Array,
    *,
    dec_name: str,
    llm_cfg: Any,
    max_new_tokens: int,
    min_new_tokens: int,
    stop_sequences: tuple[tuple[int, ...], ...],
    eos_token_id: int | None,
    pad_token_id: int,
    max_top_k: int,
    policy: DTypePolicy,
    do_sample: bool,
    use_rep_penalty: bool = True,
    use_freq_penalty: bool = False,
    n_rep: int = 1,
    kv_dtype=None,
):
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    B, P, E = inputs_embeds.shape
    V = llm_cfg.vocab_size  # (presence may be a (B,1) dummy when unused)
    total = P + max_new_tokens

    cache = dec.init_cache(llm_cfg, B, total,
                           dtype=kv_dtype or policy.compute_dtype)
    logits, cache = dec.forward(
        params, llm_cfg, inputs_embeds,
        attention_mask=attention_mask, cache=cache, policy=policy,
        last_logits_only=True,
    )
    last_logits = logits[:, -1]  # (B, V) — prompts are left-padded

    if n_rep > 1:
        # num_return_sequences: the prompt prefills ONCE per distinct row
        # and the filled cache tiles across the n return sequences — the
        # reference's HF generate repeats the prompt BEFORE prefill and
        # pays n× the prefill FLOPs (starvector_base.py:261-286 expands
        # inputs; HF _expand_inputs_for_generation)
        last_logits = jnp.repeat(last_logits, n_rep, axis=0)
        prompt_presence = jnp.repeat(prompt_presence, n_rep, axis=0)
        tiled = {}
        for key, arr in cache.items():
            if key in ("k", "v", "k_scale", "v_scale"):
                tiled[key] = jnp.repeat(arr, n_rep, axis=1)   # (L, B, ...)
            elif key == "kv_mask":
                tiled[key] = jnp.repeat(arr, n_rep, axis=0)
            else:
                tiled[key] = arr                              # shared index
        cache = tiled
        B = B * n_rep

    tokens = jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)
    done = jnp.zeros((B,), bool)
    lengths = jnp.full((B,), max_new_tokens, jnp.int32)

    def check_stops(tokens, t, new_tok):
        """done if any stop sequence is a suffix of [tokens[:t], new_tok]."""
        hit = jnp.zeros((B,), bool)
        for stop in stop_sequences:
            L = len(stop)
            if L == 0 or L > max_new_tokens:
                continue  # cannot match within the generation window
            s = jnp.asarray(stop, jnp.int32)
            if L == 1:
                hit |= new_tok == s[0]
            else:
                # last L-1 already-emitted tokens + the new one
                start = jnp.maximum(t - (L - 1), 0)
                window = jax.lax.dynamic_slice(
                    tokens, (0, start), (B, L - 1)
                )  # (B, L-1)
                match = jnp.all(window == s[None, : L - 1], axis=-1)
                match &= new_tok == s[L - 1]
                match &= t >= (L - 1)
                hit |= match
        if eos_token_id is not None:
            hit |= new_tok == eos_token_id
        return hit

    def cond(state):
        t, _, _, done, _, _, _, _, _ = state
        return jnp.logical_and(t < max_new_tokens, ~jnp.all(done))

    def body(state):
        t, cache, last_logits, done, tokens, lengths, presence, counts, rng = state
        rng, step_rng = jax.random.split(rng)
        lg = last_logits
        if eos_token_id is not None and min_new_tokens > 0:
            suppress = t < min_new_tokens
            lg = jnp.where(
                jnp.logical_and(
                    suppress, jnp.arange(V)[None, :] == eos_token_id
                ),
                NEG_INF,
                lg,
            )
        has_bias = knobs["bias_ids"].shape[-1] > 0
        nxt = sample_token(
            step_rng, lg,
            do_sample=do_sample,
            temperature=knobs["temperature"],
            top_p=knobs["top_p"],
            top_k=knobs["top_k"],
            min_p=knobs["min_p"],
            presence=presence if use_rep_penalty else None,
            repetition_penalty=knobs["repetition_penalty"]
            if use_rep_penalty else None,
            counts=counts if use_freq_penalty else None,
            frequency_penalty=knobs["frequency_penalty"],
            presence_penalty=knobs["presence_penalty"],
            bias_ids=jnp.broadcast_to(
                knobs["bias_ids"][None], (B, knobs["bias_ids"].shape[0])
            ) if has_bias else None,
            bias_vals=jnp.broadcast_to(
                knobs["bias_vals"][None], (B, knobs["bias_vals"].shape[0])
            ) if has_bias else None,
            max_top_k=max_top_k,
        )
        nxt = jnp.where(done, pad_token_id, nxt)
        newly_done = check_stops(tokens, t, nxt) & ~done
        lengths = jnp.where(newly_done, t + 1, lengths)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t))
        if use_rep_penalty:
            presence = presence.at[jnp.arange(B), nxt].set(1)
        if use_freq_penalty:
            # vLLM counts OUTPUT tokens only; done rows emit pads — skip them
            counts = counts.at[jnp.arange(B), nxt].add(
                jnp.where(done, 0, 1).astype(counts.dtype)
            )
        done = done | newly_done

        embeds = dec.embed_tokens(params, nxt[:, None]).astype(
            policy.compute_dtype
        )
        step_logits, cache = dec.forward(
            params, llm_cfg, embeds,
            attention_mask=jnp.ones((B, 1), jnp.int32),
            cache=cache, policy=policy,
        )
        return (t + 1, cache, step_logits[:, -1], done, tokens, lengths,
                presence, counts, rng)

    counts0 = jnp.zeros((B, V) if use_freq_penalty else (B, 1), jnp.int32)
    state = (
        jnp.zeros((), jnp.int32), cache, last_logits, done, tokens, lengths,
        prompt_presence, counts0, rng,
    )
    _, _, _, done, tokens, lengths, _, _, _ = jax.lax.while_loop(
        cond, body, state
    )
    return tokens, lengths


def generate(
    params: dict,
    llm_cfg: Any,
    dec_name: str,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array,
    gen: GenerationConfig,
    rng: jax.Array,
    *,
    prompt_ids: jax.Array | None = None,
    policy: DTypePolicy = DTypePolicy(),
    kv_cache_dtype=None,          # e.g. jnp.int8 (serving-engine knob)
):
    """Returns (tokens (B*, max_new_tokens), lengths (B*,)). Sequences are
    pad-filled after their stop; lengths include the stop tokens."""
    if gen.top_k > gen.max_top_k:
        raise ValueError(
            f"top_k={gen.top_k} exceeds max_top_k={gen.max_top_k}; raise "
            f"GenerationConfig.max_top_k (static bound on the traced top-k) "
            f"or the sampling distribution would be silently truncated"
        )
    B = inputs_embeds.shape[0]
    V = llm_cfg.vocab_size
    # num_return_sequences expands AFTER prefill inside the jit (the cache
    # tiles; the prompt prefills once per distinct row)
    presence = jnp.zeros(
        (B, V) if gen.repetition_penalty != 1.0 else (B, 1), jnp.int32
    )
    if prompt_ids is not None and gen.repetition_penalty != 1.0:
        presence = presence.at[
            jnp.arange(B)[:, None], jnp.asarray(prompt_ids)
        ].set(1)
    bias = tuple(gen.logit_bias)
    knobs = {
        "temperature": jnp.asarray(gen.temperature, jnp.float32),
        "top_p": jnp.asarray(gen.top_p, jnp.float32),
        "top_k": jnp.asarray(gen.top_k, jnp.int32),
        "min_p": jnp.asarray(gen.min_p, jnp.float32),
        "repetition_penalty": jnp.asarray(gen.repetition_penalty, jnp.float32),
        "frequency_penalty": jnp.asarray(gen.frequency_penalty, jnp.float32),
        "presence_penalty": jnp.asarray(gen.presence_penalty, jnp.float32),
        "bias_ids": jnp.asarray([t for t, _ in bias], jnp.int32),
        "bias_vals": jnp.asarray([v for _, v in bias], jnp.float32),
    }
    return _generate_jit(
        params, inputs_embeds, attention_mask, presence, knobs, rng,
        dec_name=dec_name, llm_cfg=llm_cfg,
        max_new_tokens=gen.max_new_tokens,
        min_new_tokens=gen.min_new_tokens,
        stop_sequences=gen.stop_sequences,
        eos_token_id=gen.eos_token_id,
        pad_token_id=gen.pad_token_id,
        max_top_k=gen.max_top_k,
        policy=policy,
        do_sample=gen.do_sample,
        use_rep_penalty=gen.repetition_penalty != 1.0,
        use_freq_penalty=(gen.frequency_penalty != 0.0
                          or gen.presence_penalty != 0.0),
        n_rep=gen.num_return_sequences,
        kv_dtype=kv_cache_dtype,
    )


# ---------------------------------------------------------------------------
# pipelined offline generation: prefill of batch k+1 rides inside the decode
# steps of batch k
# ---------------------------------------------------------------------------
#
# The offline validation path used to prefill a whole batch (compute-bound,
# MXU busy / HBM idle) and then decode it (bandwidth-bound, HBM busy / MXU
# idle) strictly in sequence. Here each decode step's GEMMs carry a few extra
# sequence-chunk rows of the NEXT batch's prompt: the step's weight read is
# paid once for both, so the next prefill's FLOPs fill the MXU slack of the
# bandwidth-bound decode and the next batch starts decoding the moment this
# one finishes (the serving engine's chunked-prefill admission,
# serve/engine.py::_prefill_chunk, ported to the offline engine — VERDICT r3
# item 8; reference counterpart: the vLLM batched path of
# scripts/quickstart-vllm.py).


@functools.partial(
    jax.jit,
    static_argnames=(
        "dec_name", "llm_cfg", "max_new_tokens", "min_new_tokens",
        "stop_sequences", "eos_token_id", "pad_token_id", "max_top_k",
        "policy", "do_sample", "use_rep_penalty", "use_freq_penalty",
        "has_next", "chunk", "n_chunks", "kv_dtype",
    ),
)
def _decode_overlap_jit(
    params: dict,
    cache: dict,                   # current batch, fully prefilled
    last_logits: jax.Array,        # (B, V) from the current batch's prefill
    prompt_presence: jax.Array,    # (B, V) or (B, 1)
    next_embeds: jax.Array,        # (B, Pn, E) next prompt (left-padded)
    next_mask: jax.Array,          # (B, Pn)
    knobs: dict,
    rng: jax.Array,
    *,
    dec_name: str,
    llm_cfg: Any,
    max_new_tokens: int,
    min_new_tokens: int,
    stop_sequences: tuple[tuple[int, ...], ...],
    eos_token_id: int | None,
    pad_token_id: int,
    max_top_k: int,
    policy: DTypePolicy,
    do_sample: bool,
    use_rep_penalty: bool,
    use_freq_penalty: bool,
    has_next: bool,
    chunk: int,
    n_chunks: int,
    kv_dtype=None,
):
    """Decode the current batch while chunk-prefilling the next one.

    Returns (tokens, lengths, next_cache, next_last_logits). When
    ``has_next`` is False the next_* outputs are dummies and the loop exits
    as soon as every row stops."""
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    B, V = last_logits.shape
    Pn = next_embeds.shape[1]

    # the next prompt's chunks run through the XLA attention path (tiny
    # q-lengths would waste the Pallas flash kernel's q-block granularity)
    chunk_cfg = dataclasses.replace(llm_cfg, attn_impl="xla")

    next_cache = dec.init_cache(
        llm_cfg, B, Pn + max_new_tokens,
        dtype=kv_dtype or policy.compute_dtype,
    )
    next_last = jnp.zeros((B, V), jnp.float32)

    tokens = jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)
    done = jnp.zeros((B,), bool)
    lengths = jnp.full((B,), max_new_tokens, jnp.int32)

    def check_stops(tokens, t, new_tok):
        hit = jnp.zeros((B,), bool)
        for stop in stop_sequences:
            L = len(stop)
            if L == 0 or L > max_new_tokens:
                continue
            s = jnp.asarray(stop, jnp.int32)
            if L == 1:
                hit |= new_tok == s[0]
            else:
                start = jnp.maximum(t - (L - 1), 0)
                window = jax.lax.dynamic_slice(tokens, (0, start), (B, L - 1))
                match = jnp.all(window == s[None, : L - 1], axis=-1)
                match &= new_tok == s[L - 1]
                match &= t >= (L - 1)
                hit |= match
        if eos_token_id is not None:
            hit |= new_tok == eos_token_id
        return hit

    def cond(state):
        t = state[0]
        live = ~jnp.all(state[3])
        if has_next:
            # keep stepping until the next batch's prompt is fully written,
            # even if every current row has already stopped
            return jnp.logical_and(
                t < max_new_tokens, jnp.logical_or(live, t < n_chunks)
            )
        return jnp.logical_and(t < max_new_tokens, live)

    def body(state):
        (t, cache, last_logits, done, tokens, lengths, presence, counts,
         next_cache, next_last, rng) = state
        rng, step_rng = jax.random.split(rng)
        lg = last_logits
        if eos_token_id is not None and min_new_tokens > 0:
            lg = jnp.where(
                jnp.logical_and(
                    t < min_new_tokens,
                    jnp.arange(V)[None, :] == eos_token_id,
                ),
                NEG_INF, lg,
            )
        has_bias = knobs["bias_ids"].shape[-1] > 0
        nxt = sample_token(
            step_rng, lg,
            do_sample=do_sample,
            temperature=knobs["temperature"],
            top_p=knobs["top_p"],
            top_k=knobs["top_k"],
            min_p=knobs["min_p"],
            presence=presence if use_rep_penalty else None,
            repetition_penalty=knobs["repetition_penalty"]
            if use_rep_penalty else None,
            counts=counts if use_freq_penalty else None,
            frequency_penalty=knobs["frequency_penalty"],
            presence_penalty=knobs["presence_penalty"],
            bias_ids=jnp.broadcast_to(
                knobs["bias_ids"][None], (B, knobs["bias_ids"].shape[0])
            ) if has_bias else None,
            bias_vals=jnp.broadcast_to(
                knobs["bias_vals"][None], (B, knobs["bias_vals"].shape[0])
            ) if has_bias else None,
            max_top_k=max_top_k,
        )
        nxt = jnp.where(done, pad_token_id, nxt)
        newly_done = check_stops(tokens, t, nxt) & ~done
        lengths = jnp.where(newly_done, t + 1, lengths)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t))
        if use_rep_penalty:
            presence = presence.at[jnp.arange(B), nxt].set(1)
        if use_freq_penalty:
            counts = counts.at[jnp.arange(B), nxt].add(
                jnp.where(done, 0, 1).astype(counts.dtype)
            )
        done = done | newly_done

        embeds = dec.embed_tokens(params, nxt[:, None]).astype(
            policy.compute_dtype
        )

        def slice_chunk():
            start = t * chunk
            ce = jax.lax.dynamic_slice(
                next_embeds, (0, start, 0), (B, chunk, next_embeds.shape[2])
            )
            cm = jax.lax.dynamic_slice(next_mask, (0, start), (B, chunk))
            return policy.cast(ce), cm

        if has_next and hasattr(dec, "forward_decode_with_chunk"):
            # FUSED decode+chunk: one layer scan reads each layer's weights
            # once for both the decode row and the next batch's prompt
            # chunk — two separate forwards stream every weight twice per
            # step, which measured slower than serial prefill
            def fused(args):
                cache, nc, nl = args
                ce, cm = slice_chunk()
                dlg, cache, clg, nc = dec.forward_decode_with_chunk(
                    params, llm_cfg, embeds, cache, ce, cm, nc,
                    policy=policy,
                )
                nl = jnp.where(t == n_chunks - 1, clg[:, -1], nl)
                return cache, nc, nl, dlg

            def decode_only(args):
                cache, nc, nl = args
                lg, cache = dec.forward(
                    params, llm_cfg, embeds,
                    attention_mask=jnp.ones((B, 1), jnp.int32),
                    cache=cache, policy=policy,
                )
                return cache, nc, nl, lg[:, -1]

            cache, next_cache, next_last, step_last = jax.lax.cond(
                t < n_chunks, fused, decode_only,
                (cache, next_cache, next_last),
            )
        else:
            step_logits, cache = dec.forward(
                params, llm_cfg, embeds,
                attention_mask=jnp.ones((B, 1), jnp.int32),
                cache=cache, policy=policy,
            )
            step_last = step_logits[:, -1]
            if has_next:
                def do_chunk(nc_nl):
                    nc, nl = nc_nl
                    ce, cm = slice_chunk()
                    clg, nc = dec.forward(
                        params, chunk_cfg, ce,
                        attention_mask=cm, cache=nc, policy=policy,
                        last_logits_only=True,
                    )
                    # prompts are left-padded to a chunk multiple, so the
                    # final chunk's last position is every row's last real
                    # token
                    nl = jnp.where(t == n_chunks - 1, clg[:, -1], nl)
                    return nc, nl

                next_cache, next_last = jax.lax.cond(
                    t < n_chunks, do_chunk, lambda x: x,
                    (next_cache, next_last),
                )

        return (t + 1, cache, step_last, done, tokens, lengths,
                presence, counts, next_cache, next_last, rng)

    counts0 = jnp.zeros((B, V) if use_freq_penalty else (B, 1), jnp.int32)
    state = (
        jnp.zeros((), jnp.int32), cache, last_logits, done, tokens, lengths,
        prompt_presence, counts0, next_cache, next_last, rng,
    )
    state = jax.lax.while_loop(cond, body, state)
    (_, _, _, done, tokens, lengths, _, _, next_cache, next_last, _) = state
    return tokens, lengths, next_cache, next_last


@functools.partial(
    jax.jit, static_argnames=("dec_name", "llm_cfg", "max_new_tokens",
                              "policy", "kv_dtype")
)
def _prefill_full_jit(params, inputs_embeds, attention_mask, *, dec_name,
                      llm_cfg, max_new_tokens, policy, kv_dtype=None):
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    B, Pr, _ = inputs_embeds.shape
    cache = dec.init_cache(
        llm_cfg, B, Pr + max_new_tokens,
        dtype=kv_dtype or policy.compute_dtype,
    )
    logits, cache = dec.forward(
        params, llm_cfg, inputs_embeds, attention_mask=attention_mask,
        cache=cache, policy=policy, last_logits_only=True,
    )
    return logits[:, -1], cache


def generate_pipelined(
    params: dict,
    llm_cfg: Any,
    dec_name: str,
    batches: list,               # [(inputs_embeds (B,P,E), attention_mask)]
    gen: GenerationConfig,
    rng: jax.Array,
    *,
    prompt_ids: list | None = None,   # per-batch, for repetition penalty
    policy: DTypePolicy = DTypePolicy(),
    chunk_positions: int | None = None,
    kv_cache_dtype=None,              # e.g. jnp.int8: halve cache streaming
):
    """Generate over a stream of same-shaped batches with cross-batch
    prefill/decode overlap. Batch k+1's prompt is written into its KV cache a
    few sequence positions per decode step of batch k, so its decode starts
    immediately when batch k finishes. Returns [(tokens, lengths), ...]
    matching `generate`'s per-batch contract.

    kv_cache_dtype=jnp.int8 stores both caches quantized (the serving
    engine's opt-in knob, same quality caveats): the fused step's two cache
    streams — the decode batch's window AND the next batch's growing
    prefill window, the pipelined roofline's irreducible term — move half
    the bytes."""
    if gen.num_return_sequences != 1:
        raise ValueError("generate_pipelined supports num_return_sequences=1")
    if not batches:
        return []
    B, P, E = batches[0][0].shape
    V = llm_cfg.vocab_size

    # chunk size: spread the next prompt over the decode steps, ≥4 positions
    # per step so the chunk GEMM rows stay MXU-tileable
    C = chunk_positions or max(4, -(-P // gen.max_new_tokens))
    n_chunks = -(-P // C)
    if n_chunks > gen.max_new_tokens:
        C = max(4, -(-P // gen.max_new_tokens))
        n_chunks = -(-P // C)
    Pn = n_chunks * C

    def pad_left(embeds, mask):
        if embeds.shape[1] == Pn:
            return embeds, mask
        d = Pn - embeds.shape[1]
        return (
            jnp.pad(embeds, ((0, 0), (d, 0), (0, 0))),
            jnp.pad(mask, ((0, 0), (d, 0))),
        )

    def presence_for(i):
        pres = jnp.zeros(
            (B, V) if gen.repetition_penalty != 1.0 else (B, 1), jnp.int32
        )
        if prompt_ids is not None and gen.repetition_penalty != 1.0:
            pres = pres.at[
                jnp.arange(B)[:, None], jnp.asarray(prompt_ids[i])
            ].set(1)
        return pres

    bias = tuple(gen.logit_bias)
    knobs = {
        "temperature": jnp.asarray(gen.temperature, jnp.float32),
        "top_p": jnp.asarray(gen.top_p, jnp.float32),
        "top_k": jnp.asarray(gen.top_k, jnp.int32),
        "min_p": jnp.asarray(gen.min_p, jnp.float32),
        "repetition_penalty": jnp.asarray(gen.repetition_penalty, jnp.float32),
        "frequency_penalty": jnp.asarray(gen.frequency_penalty, jnp.float32),
        "presence_penalty": jnp.asarray(gen.presence_penalty, jnp.float32),
        "bias_ids": jnp.asarray([t for t, _ in bias], jnp.int32),
        "bias_vals": jnp.asarray([v for _, v in bias], jnp.float32),
    }
    statics = dict(
        dec_name=dec_name, llm_cfg=llm_cfg,
        max_new_tokens=gen.max_new_tokens,
        min_new_tokens=gen.min_new_tokens,
        stop_sequences=gen.stop_sequences,
        eos_token_id=gen.eos_token_id,
        pad_token_id=gen.pad_token_id,
        max_top_k=gen.max_top_k,
        policy=policy,
        do_sample=gen.do_sample,
        use_rep_penalty=gen.repetition_penalty != 1.0,
        use_freq_penalty=(gen.frequency_penalty != 0.0
                          or gen.presence_penalty != 0.0),
        chunk=C, n_chunks=n_chunks,
        kv_dtype=kv_cache_dtype,
    )

    # batch 0 prefills the classic way (nothing to overlap it with); its
    # cache is padded to the same Pn geometry so every phase shares one
    # compiled program
    e0, m0 = pad_left(*batches[0])
    last_logits, cache = _prefill_full_jit(
        params, e0, m0, dec_name=dec_name, llm_cfg=llm_cfg,
        max_new_tokens=gen.max_new_tokens, policy=policy,
        kv_dtype=kv_cache_dtype,
    )

    out = []
    dummy_e = jnp.zeros((B, Pn, E), batches[0][0].dtype)
    dummy_m = jnp.zeros((B, Pn), jnp.int32)
    for i in range(len(batches)):
        has_next = i + 1 < len(batches)
        ne, nm = (pad_left(*batches[i + 1]) if has_next
                  else (dummy_e, dummy_m))
        rng, phase_rng = jax.random.split(rng)
        tokens, lengths, next_cache, next_last = _decode_overlap_jit(
            params, cache, last_logits, presence_for(i), ne, nm, knobs,
            phase_rng, has_next=has_next, **statics,
        )
        out.append((tokens, lengths))
        cache, last_logits = next_cache, next_last
    return out


# ---------------------------------------------------------------------------
# pipelined + speculative offline generation: batched prompt-lookup verify
# rounds with the NEXT batch's chunked prefill fused into every round
# ---------------------------------------------------------------------------
#
# Composition of the repo's two strongest measured levers (VERDICT r4 #1):
# batched speculation (each round verifies W drafted tokens per row in one
# dispatch — the weight read amortizes over B*W positions) and cross-batch
# prefill/decode overlap (the next batch's prompt chunks ride the same layer
# scan). Per round, one fused forward advances every live row by 1..W
# verified tokens AND writes C prompt positions of batch k+1 — the chunk's
# MXU work shares the weight stream the verify GEMMs already pay for.
# Greedy only (speculative acceptance is exact for greedy; the offline
# SVG-Bench validation workload at temperature 0).


@functools.partial(
    jax.jit,
    static_argnames=(
        "dec_name", "llm_cfg", "max_new_tokens", "draft_len",
        "stop_sequences", "eos_token_id", "pad_token_id", "policy",
        "total_next", "accept_margin", "kv_dtype",
    ),
)
def _spec_prefill_adopt_jit(
    params, inputs_embeds, attention_mask, *,
    dec_name, llm_cfg, max_new_tokens, draft_len, policy, total_next,
    stop_sequences=(), eos_token_id=None, pad_token_id=0, accept_margin=0.0,
    kv_dtype=None,
):
    """Prefill a RIGHT-padded batch into a linear cache of length
    `total_next` and adopt it as a ragged cache (per-row lengths), returning
    (rag, pending) — the same adoption generate_greedy_speculative_batched
    performs, shared here so batch 0 of the pipelined-spec stream matches
    later batches' chunked-prefill geometry."""
    from starvector_tpu.models import gpt_bigcode, starcoder2

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    B = inputs_embeds.shape[0]
    cache = dec.init_cache(llm_cfg, B, total_next,
                           dtype=kv_dtype or policy.compute_dtype)
    h, cache = dec.forward(
        params, llm_cfg, inputs_embeds, attention_mask=attention_mask,
        cache=cache, policy=policy, return_hidden=True,
    )
    n_prompt = jnp.sum(attention_mask, axis=1).astype(jnp.int32)
    h_last = jnp.take_along_axis(
        h, jnp.maximum(n_prompt - 1, 0)[:, None, None], axis=1
    )[:, 0]
    logits0 = jnp.einsum(
        "be,ve->bv", policy.cast(h_last),
        policy.cast(dec.lm_head_table(params, llm_cfg)),
        preferred_element_type=jnp.float32,
    )
    pending = jnp.argmax(logits0, -1).astype(jnp.int32)
    rag = {"k": cache["k"], "v": cache["v"],
           "lengths": n_prompt, "kv_mask": cache["kv_mask"].astype(jnp.int32)}
    if "k_scale" in cache:
        rag.update(k_scale=cache["k_scale"], v_scale=cache["v_scale"])
    return rag, pending


@functools.partial(
    jax.jit,
    static_argnames=(
        "dec_name", "llm_cfg", "max_new_tokens", "draft_len",
        "stop_sequences", "eos_token_id", "pad_token_id", "policy",
        "has_next", "chunk", "n_chunks", "total_next", "kv_dtype",
        "accept_margin",
    ),
)
def _spec_overlap_jit(
    params: dict,
    rag: dict,                    # current batch's ragged cache (prefilled)
    pending: jax.Array,           # (B,) verified greedy continuation
    ctx: jax.Array,               # (B, CTX) draft-lookup context
    n_ctx: jax.Array,             # (B,)
    next_embeds: jax.Array,       # (B, Pn, E) next prompt (RIGHT-padded)
    next_mask: jax.Array,         # (B, Pn)
    *,
    dec_name: str,
    llm_cfg: Any,
    max_new_tokens: int,
    draft_len: int,
    stop_sequences: tuple[tuple[int, ...], ...],
    eos_token_id: int | None,
    pad_token_id: int,
    policy: DTypePolicy,
    has_next: bool,
    chunk: int,
    n_chunks: int,
    total_next: int,
    kv_dtype=None,
    accept_margin: float = 0.0,
):
    """Speculative verify rounds over the current batch with the next
    batch's chunked prefill fused in. Returns (tokens, lengths, next_rag,
    next_pending); the next_* outputs are dummies when has_next=False."""
    from starvector_tpu.models import decode_common as dc
    from starvector_tpu.models import gpt_bigcode, starcoder2
    from starvector_tpu.generation.speculative import (
        _append_accepted, _find_stop_in, _lookup_draft,
    )

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    B = pending.shape[0]
    K = draft_len
    BUF = max_new_tokens + K
    E = next_embeds.shape[2]
    rows = jnp.arange(B)

    cache_next = dec.init_cache(
        llm_cfg, B, total_next, dtype=kv_dtype or policy.compute_dtype)
    h_last_next = jnp.zeros((B, E), policy.compute_dtype)
    n_prompt_next = jnp.sum(next_mask, axis=1).astype(jnp.int32)

    tokens0 = jnp.full((B, BUF), pad_token_id, jnp.int32)

    def cond(state):
        t, done = state[0], state[5]
        # decode liveness only: leftover prompt chunks (decode finished
        # before the next prompt was fully written) run through the cheap
        # chunk-only tail loop below instead of wasting full verify rounds
        return jnp.any(jnp.logical_and(t < max_new_tokens, ~done))

    def body(state):
        (t, rag, ctx, tokens, n_ctx, done, lengths, pending,
         cache_next, h_last_next, r) = state
        drafted = jax.vmap(
            lambda c, n, p: _lookup_draft(c, n, p, K))(ctx, n_ctx, pending)
        proposal = jnp.concatenate([pending[:, None], drafted], 1)  # (B, K)

        if has_next:
            def fused(args):
                rag, cache_next, h_last = args
                start = r * chunk
                ce = jax.lax.dynamic_slice(
                    next_embeds, (0, start, 0), (B, chunk, E))
                cm = jax.lax.dynamic_slice(next_mask, (0, start), (B, chunk))
                lg, rag, ch, cache_next = dec.forward_ragged_verify_with_chunk(
                    params, llm_cfg, proposal, rag, policy.cast(ce), cm,
                    cache_next, policy=policy,
                )
                # capture each row's last-real-prompt hidden when it lands
                # in this chunk (rows differ; ONE lm-head projection happens
                # after the loop)
                off = n_prompt_next - 1 - start
                hit = (off >= 0) & (off < chunk)
                h_sel = ch[rows, jnp.clip(off, 0, chunk - 1)]
                h_last = jnp.where(hit[:, None], h_sel.astype(h_last.dtype),
                                   h_last)
                return lg, rag, cache_next, h_last

            def verify_only(args):
                rag, cache_next, h_last = args
                lg, rag = dec.forward_ragged_verify(
                    params, llm_cfg, proposal, rag, jnp.logical_not(done),
                    policy=policy,
                )
                return lg, rag, cache_next, h_last

            lg, rag, cache_next, h_last_next = jax.lax.cond(
                r < n_chunks, fused, verify_only,
                (rag, cache_next, h_last_next),
            )
        else:
            lg, rag = dec.forward_ragged_verify(
                params, llm_cfg, proposal, rag, jnp.logical_not(done),
                policy=policy,
            )

        lg32 = lg.astype(jnp.float32)
        g = jnp.argmax(lg32, -1).astype(jnp.int32)            # (B, K)
        agree = (proposal[:, 1:] == g[:, : K - 1]).astype(jnp.int32)
        if accept_margin > 0.0:
            top2 = jax.lax.top_k(lg32, 2)[0]
            margin = top2[..., 0] - top2[..., 1]
            agree = agree * (margin[:, : K - 1] >= accept_margin
                             ).astype(jnp.int32)
        a = 1 + jnp.sum(jnp.cumprod(agree, axis=1), axis=1)   # (B,) 1..K
        a = jnp.where(done, 0, a)
        rag = dc.commit_verify(rag, a)

        tokens, t_new = _append_accepted(tokens, t, proposal, a)
        ctx, n_ctx = _append_accepted(ctx, n_ctx, proposal, a)
        pending = jnp.where(done, pending, g[rows, jnp.clip(a - 1, 0, K - 1)])

        upto = jnp.minimum(t_new, max_new_tokens)
        stop_at, fired = jax.vmap(
            lambda tb, u: _find_stop_in(tb, u, stop_sequences, eos_token_id,
                                        max_new_tokens))(tokens, upto)
        newly = (fired | (t_new >= max_new_tokens)) & ~done
        lengths = jnp.where(
            newly,
            jnp.where(fired, stop_at, jnp.minimum(t_new, max_new_tokens)),
            lengths,
        )
        done = done | newly
        return (t_new, rag, ctx, tokens, n_ctx, done, lengths, pending,
                cache_next, h_last_next, r + 1)

    state = (
        jnp.zeros((B,), jnp.int32), rag, ctx, tokens0, n_ctx,
        jnp.zeros((B,), bool), jnp.full((B,), max_new_tokens, jnp.int32),
        pending, cache_next, h_last_next, jnp.zeros((), jnp.int32),
    )
    state = jax.lax.while_loop(cond, body, state)
    (_, _, _, tokens, _, _, lengths, _, cache_next, h_last_next, r) = state

    if has_next:
        # tail: finish any leftover prompt chunks WITHOUT the verify side
        # (pure chunked cached prefill, the _decode_overlap_jit chunk path)
        import dataclasses as _dc

        chunk_cfg = _dc.replace(llm_cfg, attn_impl="xla")

        def tail_cond(st):
            return st[0] < n_chunks

        def tail_body(st):
            r, cache_next, h_last = st
            start = r * chunk
            ce = jax.lax.dynamic_slice(
                next_embeds, (0, start, 0), (B, chunk, E))
            cm = jax.lax.dynamic_slice(next_mask, (0, start), (B, chunk))
            hh, cache_next = dec.forward(
                params, chunk_cfg, policy.cast(ce), attention_mask=cm,
                cache=cache_next, policy=policy, return_hidden=True,
            )
            off = n_prompt_next - 1 - start
            hit = (off >= 0) & (off < chunk)
            h_sel = hh[rows, jnp.clip(off, 0, chunk - 1)]
            h_last = jnp.where(hit[:, None], h_sel.astype(h_last.dtype),
                               h_last)
            return r + 1, cache_next, h_last

        r, cache_next, h_last_next = jax.lax.while_loop(
            tail_cond, tail_body, (r, cache_next, h_last_next))

    tokens = tokens[:, :max_new_tokens]
    tokens = jnp.where(
        jnp.arange(max_new_tokens)[None, :] < lengths[:, None],
        tokens, pad_token_id,
    )

    # adopt the chunk-prefilled linear cache as the next batch's ragged
    # cache + its verified pending token (dummies when has_next=False)
    next_rag = {"k": cache_next["k"], "v": cache_next["v"],
                "lengths": n_prompt_next,
                "kv_mask": cache_next["kv_mask"].astype(jnp.int32)}
    if "k_scale" in cache_next:
        next_rag.update(k_scale=cache_next["k_scale"],
                        v_scale=cache_next["v_scale"])
    logits_n = jnp.einsum(
        "be,ve->bv", policy.cast(h_last_next),
        policy.cast(dec.lm_head_table(params, llm_cfg)),
        preferred_element_type=jnp.float32,
    )
    next_pending = jnp.argmax(logits_n, -1).astype(jnp.int32)
    return tokens, lengths, next_rag, next_pending, r


def generate_pipelined_spec(
    params: dict,
    llm_cfg: Any,
    dec_name: str,
    batches: list,        # [(embeds (B,P,E), mask (B,P), prompt_ids (B,P))]
                          # — RIGHT-padded rows; prompt_ids -1 at holes
    gen: GenerationConfig,
    *,
    policy: DTypePolicy = DTypePolicy(),
    draft_len: int = 8,
    chunk_positions: int | None = None,
    kv_cache_dtype=None,
    accept_margin: float = 0.0,
    stats: list | None = None,       # appended per batch: total rounds
                                     # (verify + chunk-tail) — audit lever
                                     # for tuning chunk_positions
):
    """Greedy generation over a stream of same-shaped batches combining
    batched prompt-lookup speculation with cross-batch chunked prefill: each
    verify round also writes `chunk_positions` prompt positions of the next
    batch through the SAME layer scan. Returns [(tokens, lengths), ...]
    like `generate`. Rows must be RIGHT-padded (ragged-slot convention of
    generate_greedy_speculative_batched, unlike generate_pipelined's left
    padding). Greedy only: speculative acceptance is exact for argmax
    decoding (reference counterpart: the vLLM batched offline path of
    /root/reference/scripts/quickstart-vllm.py).

    When to use: only where prompt-lookup acceptance is HIGH relative to
    the chunk width — the fused chunk already amortizes each weight read
    over 1+C positions, so verify rounds (W=draft+1 q-positions over the
    full KV window) must retire >C tokens to pay for themselves. At the
    1k-prefill/256-decode validation shape (acceptance ≈1.5) this is a
    measured NET LOSS vs generate_pipelined + int8 KV — 5,025 best vs
    8,985 tok/s; see PARITY.md's dead-end table. Prefer
    generate_greedy_speculative_batched at decode-dominated shapes and
    generate_pipelined at prefill-heavy ones."""
    if gen.do_sample:
        raise ValueError("generate_pipelined_spec is greedy-only "
                         "(do_sample=False); use generate_pipelined for "
                         "sampled decoding")
    if not batches:
        return []
    B, P, E = batches[0][0].shape
    K = draft_len

    # chunk size: spread the next prompt over the EXPECTED number of verify
    # rounds. With mean acceptance a, rounds ≈ max_new_tokens/a; default
    # assumes a≈2 (conservative: leftover chunks at the end run as cheap
    # fused rounds with all rows done, while too-large chunks waste MXU
    # time every round)
    C = chunk_positions or max(8, -(-2 * P * 1 // gen.max_new_tokens))
    n_chunks = -(-P // C)
    Pn = n_chunks * C
    BUF = gen.max_new_tokens + K
    total = Pn + gen.max_new_tokens + K + 1
    CTX = Pn + BUF

    def pad_right(embeds, mask, ids):
        d = Pn - embeds.shape[1]
        if d == 0:
            return embeds, mask, ids
        return (
            jnp.pad(embeds, ((0, 0), (0, d), (0, 0))),
            jnp.pad(mask, ((0, 0), (0, d))),
            jnp.pad(ids, ((0, 0), (0, d)), constant_values=-1),
        )

    padded = [pad_right(*b) for b in batches]
    statics = dict(
        dec_name=dec_name, llm_cfg=llm_cfg,
        max_new_tokens=gen.max_new_tokens, draft_len=K,
        stop_sequences=gen.stop_sequences, eos_token_id=gen.eos_token_id,
        pad_token_id=gen.pad_token_id, policy=policy,
        total_next=total, kv_dtype=kv_cache_dtype,
        accept_margin=accept_margin,
    )

    e0, m0, _ = padded[0]
    rag, pending = _spec_prefill_adopt_jit(
        params, policy.cast(e0), m0,
        **{k: v for k, v in statics.items()
           if k not in ("has_next", "chunk", "n_chunks")},
    )

    dummy_e = jnp.zeros((B, Pn, E), batches[0][0].dtype)
    dummy_m = jnp.zeros((B, Pn), jnp.int32)
    out = []
    for i in range(len(batches)):
        has_next = i + 1 < len(batches)
        ne, nm, _ = padded[i + 1] if has_next else (dummy_e, dummy_m, None)
        ids = padded[i][2]
        ctx0 = jnp.pad(
            jnp.asarray(ids, jnp.int32), ((0, 0), (0, CTX - Pn)),
            constant_values=-1,
        )
        n_ctx0 = jnp.full((B,), Pn, jnp.int32)
        tokens, lengths, rag, pending, rounds = _spec_overlap_jit(
            params, rag, pending, ctx0, n_ctx0, ne, nm,
            has_next=has_next, chunk=C, n_chunks=n_chunks, **statics,
        )
        if stats is not None:
            stats.append(rounds)
        out.append((tokens, lengths))
    return out


def generate_im2svg(
    params: dict,
    cfg: "sv.StarVectorConfig",
    images: jax.Array,            # (B, H, W, 3) processed
    prompt_ids: jax.Array,        # (B, Sp) tokenized generation prompt '<svg'
    gen: GenerationConfig,
    rng: jax.Array,
    *,
    policy: DTypePolicy = DTypePolicy(),
):
    """reference generate_im2svg (starvector_base.py:243-259): prefix =
    [visual tokens ‖ prompt embeds]; returns (tokens, lengths) of the NEW
    tokens — callers prepend prompt_ids before decoding, mirroring
    `torch.cat([prompt_tokens.input_ids, outputs])`."""
    dec = cfg.decoder_module
    cond = sv.encode_image(params, cfg, images, policy=policy)
    B, Q, _ = cond.shape
    prompt_embeds = dec.embed_tokens(params["svg_transformer"], prompt_ids)
    inputs_embeds = jnp.concatenate([cond, policy.cast(prompt_embeds)], axis=1)
    attention_mask = jnp.ones((B, Q + prompt_ids.shape[1]), jnp.int32)
    return generate(
        params["svg_transformer"], cfg.llm, cfg.decoder, inputs_embeds,
        attention_mask, gen, rng, prompt_ids=prompt_ids, policy=policy,
    )


def generate_text2svg(
    params: dict,
    cfg: "sv.StarVectorConfig",
    input_ids: jax.Array,        # (B, S) caption + svg_start trigger
    attention_mask: jax.Array,
    gen: GenerationConfig,
    rng: jax.Array,
    *,
    policy: DTypePolicy = DTypePolicy(),
):
    """reference generate_text2svg (starvector_base.py:297-330)."""
    dec = cfg.decoder_module
    embeds = dec.embed_tokens(params["svg_transformer"], input_ids)
    return generate(
        params["svg_transformer"], cfg.llm, cfg.decoder,
        policy.cast(embeds), attention_mask, gen, rng,
        prompt_ids=input_ids, policy=policy,
    )
