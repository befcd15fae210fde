"""Speculative verification forward: the W-token chunked
`forward_ragged_verify` must reproduce W sequential `forward_ragged_decode`
steps exactly (logits at every chunk position), and a PARTIAL commit
(rejected drafts) must leave the cache indistinguishable from having decoded
only the accepted tokens."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.models import decode_common as dc
from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.models import starcoder2 as sc2
from starvector_tpu.ops.layers import DTypePolicy

F32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def _warm_ragged_cache(mod, params, cfg, B, T, dtype, steps=5):
    """Build a ragged cache with per-slot different lengths by decoding a
    few steps under varying active masks."""
    cache = mod.init_ragged_cache(cfg, B, T, dtype=dtype)
    rng = np.random.RandomState(0)
    for i in range(steps):
        toks = jnp.asarray(rng.randint(0, cfg.vocab_size, (B,)), jnp.int32)
        active = jnp.asarray(
            [(i + b) % 3 != 0 for b in range(B)], jnp.int32
        )
        _, cache = mod.forward_ragged_decode(
            params, cfg, toks, cache, active, policy=F32
        )
    return cache


def _chunk(cfg, B, W, seed=7):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, cfg.vocab_size, (B, W)), jnp.int32)


CASES = [
    ("gpt_bigcode", {}, jnp.float32),
    ("gpt_bigcode", {}, jnp.int8),
    ("starcoder2", {"sliding_window": 6}, jnp.float32),
    ("starcoder2", {}, jnp.float32),
]


@pytest.mark.parametrize("name,cfg_kw,kv_dtype", CASES)
def test_verify_logits_match_sequential(name, cfg_kw, kv_dtype):
    mod = gbc if name == "gpt_bigcode" else sc2
    cfg = mod.tiny_config(**cfg_kw)
    params = mod.init_params(cfg, jax.random.PRNGKey(0))
    B, W, T = 3, 4, 32
    cache = _warm_ragged_cache(mod, params, cfg, B, T, kv_dtype)
    chunk = _chunk(cfg, B, W)
    active = jnp.ones((B,), jnp.int32)

    seq_logits = []
    c = cache
    for i in range(W):
        lg, c = mod.forward_ragged_decode(
            params, cfg, chunk[:, i], c, active, policy=F32
        )
        seq_logits.append(np.asarray(lg))

    ver_logits, _ = mod.forward_ragged_verify(
        params, cfg, chunk, cache, active, policy=F32
    )
    ver_logits = np.asarray(ver_logits)
    # int8 caches quantize the chunk's K/V on the sequential path one token
    # at a time and on the verify path as a block — identical math, but the
    # fp32 softmax merge orders differ; fp32 caches must match tightly.
    tol = 1e-4 if kv_dtype != jnp.int8 else 5e-3
    for i in range(W):
        np.testing.assert_allclose(
            ver_logits[:, i], seq_logits[i], atol=tol, rtol=tol
        )


@pytest.mark.parametrize("name,cfg_kw,kv_dtype", CASES)
def test_partial_commit_matches_prefix_decode(name, cfg_kw, kv_dtype):
    """Commit n of the W verified tokens per slot; the next decode step's
    logits must equal decoding only those n tokens sequentially."""
    mod = gbc if name == "gpt_bigcode" else sc2
    cfg = mod.tiny_config(**cfg_kw)
    params = mod.init_params(cfg, jax.random.PRNGKey(0))
    B, W, T = 3, 4, 32
    cache = _warm_ragged_cache(mod, params, cfg, B, T, kv_dtype)
    chunk = _chunk(cfg, B, W)
    active = jnp.ones((B,), jnp.int32)
    n_commit = jnp.asarray([2, 1, 4], jnp.int32)

    _, ver_cache = mod.forward_ragged_verify(
        params, cfg, chunk, cache, active, policy=F32
    )
    ver_cache = dc.commit_verify(ver_cache, n_commit)

    # sequential reference: step i advances only slots with n_commit > i
    c = cache
    for i in range(W):
        step_active = (n_commit > i).astype(jnp.int32)
        _, c = mod.forward_ragged_decode(
            params, cfg, chunk[:, i], c, step_active, policy=F32
        )

    np.testing.assert_array_equal(
        np.asarray(ver_cache["lengths"]), np.asarray(c["lengths"])
    )
    np.testing.assert_array_equal(
        np.asarray(ver_cache["kv_mask"]), np.asarray(c["kv_mask"])
    )

    nxt = jnp.asarray([5, 9, 11], jnp.int32)
    lg_v, _ = mod.forward_ragged_decode(
        params, cfg, nxt, ver_cache, active, policy=F32
    )
    lg_s, _ = mod.forward_ragged_decode(
        params, cfg, nxt, c, active, policy=F32
    )
    tol = 1e-4 if kv_dtype != jnp.int8 else 5e-3
    np.testing.assert_allclose(
        np.asarray(lg_v), np.asarray(lg_s), atol=tol, rtol=tol
    )
