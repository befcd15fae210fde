"""Phase-separated decode profiling on the real chip.

Times (a) prefill alone, (b) decode-only loop (prefilled cache reused), for
the 1B geometry at the bench point (B=64, ctx 1024, 256 new tokens), and
computes implied HBM bandwidth utilization from bytes-moved. Run with nohup;
first compile is slow.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.ops.layers import DTypePolicy


def param_bytes(params):
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))


@functools.partial(
    jax.jit, static_argnames=("llm", "n_steps", "policy")
)
def decode_loop(params, llm, cache, first_tok, n_steps, policy):
    """Pure decode: n_steps cached single-token forwards with greedy argmax,
    sampling fused (same shape of work as the generation engine's loop)."""
    B = first_tok.shape[0]

    def body(state, _):
        tok, cache = state
        embeds = gbc.embed_tokens(params, tok[:, None]).astype(policy.compute_dtype)
        logits, cache = gbc.forward(
            params, llm, embeds,
            attention_mask=jnp.ones((B, 1), jnp.int32),
            cache=cache, policy=policy,
        )
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (tok, cache), toks = jax.lax.scan(
        body, (first_tok, cache), None, length=n_steps
    )
    return toks


def main():
    on_tpu = jax.default_backend() != "cpu"
    policy = DTypePolicy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    if on_tpu:
        llm = gbc.GPTBigCodeConfig(attn_impl="mixed")
        B, PREFIX, NEW = 64, 1024, 256
        reps = 3
    else:
        llm = gbc.tiny_config(attn_impl="mixed")
        B, PREFIX, NEW = 2, 20, 8
        reps = 1

    params = gbc.init_params(llm, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    pbytes = param_bytes(params)
    prefix = jax.random.normal(
        jax.random.PRNGKey(1), (B, PREFIX, llm.hidden_size), jnp.bfloat16
    )
    mask = jnp.ones((B, PREFIX), jnp.int32)
    total = PREFIX + NEW

    @functools.partial(jax.jit, static_argnames=())
    def prefill(params, prefix, mask):
        cache = gbc.init_cache(llm, B, total, dtype=policy.compute_dtype)
        logits, cache = gbc.forward(
            params, llm, prefix, attention_mask=mask, cache=cache,
            policy=policy, last_logits_only=True,
        )
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    # -- prefill timing -------------------------------------------------
    tok, cache = prefill(params, prefix, mask)
    np.asarray(tok)  # sync
    ts = []
    for _ in range(reps):
        t0 = time.time()
        tok, cache = prefill(params, prefix, mask)
        np.asarray(tok)
        ts.append(time.time() - t0)
    prefill_s = statistics.median(ts)

    # -- decode-only timing ----------------------------------------------
    toks = decode_loop(params, llm, cache, tok, NEW, policy)
    np.asarray(toks)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        toks = decode_loop(params, llm, cache, tok, NEW, policy)
        np.asarray(toks)
        ts.append(time.time() - t0)
    decode_s = statistics.median(ts)

    # bytes per decode step: all params + KV read (k+v over mean depth)
    L, Hkv, D = llm.n_layer, llm.kv_heads, llm.head_dim
    kv_read = 2 * L * B * (PREFIX + NEW / 2) * Hkv * D * 2
    step_bytes = pbytes + kv_read
    step_s = decode_s / NEW
    bw = step_bytes / step_s / 1e9
    out = {
        "backend": jax.default_backend(),
        "B": B, "prefix": PREFIX, "new": NEW,
        "prefill_s": round(prefill_s, 4),
        "decode_s": round(decode_s, 4),
        "decode_tok_per_s": round(B * NEW / decode_s, 1),
        "e2e_tok_per_s": round(B * NEW / (decode_s + prefill_s), 1),
        "ms_per_step": round(step_s * 1e3, 3),
        "param_GB": round(pbytes / 1e9, 3),
        "kv_read_GB_per_step": round(kv_read / 1e9, 3),
        "implied_bw_GBps": round(bw, 1),
        "bw_util_vs_819": round(bw / 819.0, 3),
        "prefill_TFLOPs": round(2 * (pbytes / 2) * B * PREFIX / prefill_s / 1e12, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
