"""Pipelined + speculative offline generation (generate_pipelined_spec):
batched prompt-lookup verify rounds with the next batch's chunked prefill
fused into the same layer scan — exact greedy parity with per-row
token-at-a-time decoding across the whole batch stream (VERDICT r4 #1
composition; reference counterpart: the vLLM batched offline path of
scripts/quickstart-vllm.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.generation.engine import (
    GenerationConfig, generate, generate_pipelined_spec,
)
from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.ops.layers import DTypePolicy

F32 = DTypePolicy(compute_dtype=jnp.float32)

ROWS_BATCHES = [
    [[3, 1, 4], [9, 2, 6, 5, 3], [7, 8, 1, 2]],
    [[5, 5, 2], [1, 2, 3, 4], [8, 3]],
    [[2, 7], [6, 6, 6, 1, 2], [4, 4, 9]],
]
N = 14


def _setup():
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _make_batch(params, rows):
    P = max(len(r) for r in rows)
    ids = np.zeros((len(rows), P), np.int32)
    pid = np.full((len(rows), P), -1, np.int32)
    mask = np.zeros((len(rows), P), np.int32)
    for b, r in enumerate(rows):
        ids[b, : len(r)] = r
        pid[b, : len(r)] = r
        mask[b, : len(r)] = 1
    emb = gbc.embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    emb = emb * jnp.asarray(mask)[:, :, None]
    return emb, jnp.asarray(mask), jnp.asarray(pid)


def _ref_row(params, cfg, ids, stops):
    prefix = gbc.embed_tokens(params, jnp.asarray([ids])).astype(jnp.float32)
    g = GenerationConfig(
        max_new_tokens=N, do_sample=False, pad_token_id=0, min_new_tokens=1,
        eos_token_id=None, stop_sequences=stops,
    )
    t, l = generate(
        params, cfg, "gpt_bigcode", prefix,
        jnp.ones((1, len(ids)), jnp.int32), g, jax.random.PRNGKey(0),
        policy=F32,
    )
    return list(np.asarray(t[0])), int(l[0])


@pytest.mark.slow  # 3 chained jits (prefill-adopt + 2 overlap variants)
def test_pipelined_spec_matches_per_row_greedy():
    """Every row of every batch in the stream emits exactly the per-row
    greedy tokens; the cross-batch chunked prefill must not perturb the
    next batch's cache or its pending continuation."""
    cfg, params = _setup()
    stops = ((11,),)
    batches = [_make_batch(params, r) for r in ROWS_BATCHES]
    gen = GenerationConfig(max_new_tokens=N, do_sample=False, pad_token_id=0,
                           eos_token_id=None, stop_sequences=stops)
    outs = generate_pipelined_spec(
        params, cfg, "gpt_bigcode", batches, gen, policy=F32,
        draft_len=5, chunk_positions=2,
    )
    assert len(outs) == len(ROWS_BATCHES)
    for i, rows in enumerate(ROWS_BATCHES):
        toks, lens = outs[i]
        for b, r in enumerate(rows):
            rt, rl = _ref_row(params, cfg, r, stops)
            assert list(np.asarray(toks[b])) == rt, (i, b)
            assert int(lens[b]) == rl, (i, b)


@pytest.mark.slow  # one extra compile over the test above
def test_pipelined_spec_int8_kv_matches_bf16_cache():
    """int8 codes + scales through BOTH the ragged verify cache and the
    chunk-prefilled next cache: same greedy tokens as the fp32 cache on the
    tiny model (argmax-margin fallback as in the pipelined int8 test)."""
    cfg, params = _setup()
    batches = [_make_batch(params, r) for r in ROWS_BATCHES]
    gen = GenerationConfig(max_new_tokens=N, do_sample=False, pad_token_id=0,
                           eos_token_id=None)
    ref = generate_pipelined_spec(
        params, cfg, "gpt_bigcode", batches, gen, policy=F32,
        draft_len=5, chunk_positions=2,
    )
    q = generate_pipelined_spec(
        params, cfg, "gpt_bigcode", batches, gen, policy=F32,
        draft_len=5, chunk_positions=2, kv_cache_dtype=jnp.int8,
    )
    for i, ((rt, rl), (qt, ql)) in enumerate(zip(ref, q)):
        rt, qt = np.asarray(rt), np.asarray(qt)
        if np.array_equal(rt, qt):
            continue
        # near-tie tolerance: see test_generation.py's int8 pipelined test
        (emb, mask, _) = batches[i]
        P_len = emb.shape[1]
        full_emb = jnp.concatenate(
            [emb, gbc.embed_tokens(params, jnp.asarray(rt)).astype(emb.dtype)],
            axis=1)
        full_mask = jnp.concatenate(
            [mask, jnp.ones(rt.shape, jnp.int32)], axis=1)
        logits, _ = gbc.forward(params, cfg, full_emb,
                                attention_mask=full_mask, policy=F32)
        pred = np.asarray(logits[:, P_len - 1:-1, :])
        top2 = np.sort(pred, axis=-1)[..., -2:]
        gap = top2[..., 1] - top2[..., 0]
        bad = (rt != qt) & (gap > 1e-2)
        assert not bad.any(), f"batch {i}"


def test_pipelined_spec_rejects_sampling():
    cfg, params = _setup()
    gen = GenerationConfig(max_new_tokens=4, do_sample=True)
    with pytest.raises(ValueError, match="greedy-only"):
        generate_pipelined_spec(params, cfg, "gpt_bigcode",
                                [_make_batch(params, ROWS_BATCHES[0])],
                                gen, policy=F32)
