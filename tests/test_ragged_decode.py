"""Ragged (per-slot) decode parity: the continuous-batching path must produce
the same logits as the standard cached path, with slots at different
positions."""

import jax
import jax.numpy as jnp
import numpy as np

from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.ops.layers import DTypePolicy

F32 = DTypePolicy(compute_dtype=jnp.float32)


def test_ragged_matches_standard():
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    T = 32

    # two sequences of different lengths
    seq_a = jax.random.randint(jax.random.PRNGKey(1), (1, 7), 0, cfg.vocab_size)
    seq_b = jax.random.randint(jax.random.PRNGKey(2), (1, 4), 0, cfg.vocab_size)

    # standard path: per-sequence caches
    def std_next_logits(seq, nxt):
        cache = gbc.init_cache(cfg, 1, T, dtype=jnp.float32)
        _, cache = gbc.forward(
            params, cfg, gbc.embed_tokens(params, seq), cache=cache, policy=F32
        )
        lg, _ = gbc.forward(
            params, cfg, gbc.embed_tokens(params, jnp.array([[nxt]])),
            cache=cache, policy=F32,
        )
        return np.asarray(lg[0, 0])

    ref_a = std_next_logits(seq_a, 5)
    ref_b = std_next_logits(seq_b, 9)

    # ragged path: both sequences share a slot-based cache
    ragged = gbc.init_ragged_cache(cfg, 4, T, dtype=jnp.float32)
    for slot, seq in ((0, seq_a), (2, seq_b)):
        small = gbc.init_cache(cfg, 1, T, dtype=jnp.float32)
        _, small = gbc.forward(
            params, cfg, gbc.embed_tokens(params, seq), cache=small, policy=F32
        )
        ragged = gbc.insert_prefill(
            cfg, ragged, small, jnp.asarray(slot), jnp.asarray(seq.shape[1])
        )
    tokens = jnp.asarray([5, 0, 9, 0], jnp.int32)
    active = jnp.asarray([1, 0, 1, 0], jnp.int32)
    logits, ragged2 = gbc.forward_ragged_decode(
        params, cfg, tokens, ragged, active, policy=F32
    )
    np.testing.assert_allclose(np.asarray(logits[0]), ref_a, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits[2]), ref_b, rtol=2e-4, atol=2e-4)
    # lengths advanced only for active slots
    assert list(np.asarray(ragged2["lengths"])) == [8, 0, 5, 0]


def test_ragged_multi_step():
    """Decoding 3 ragged steps equals the standard path step-by-step."""
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    T = 24
    seq = jax.random.randint(jax.random.PRNGKey(3), (1, 5), 0, cfg.vocab_size)

    # standard greedy continuation
    cache = gbc.init_cache(cfg, 1, T, dtype=jnp.float32)
    lg, cache = gbc.forward(
        params, cfg, gbc.embed_tokens(params, seq), cache=cache, policy=F32
    )
    cur = int(jnp.argmax(lg[0, -1]))
    std_tokens = [cur]
    for _ in range(2):
        lg, cache = gbc.forward(
            params, cfg, gbc.embed_tokens(params, jnp.array([[cur]])),
            cache=cache, policy=F32,
        )
        cur = int(jnp.argmax(lg[0, -1]))
        std_tokens.append(cur)

    # ragged path in slot 1
    ragged = gbc.init_ragged_cache(cfg, 2, T, dtype=jnp.float32)
    small = gbc.init_cache(cfg, 1, T, dtype=jnp.float32)
    first_lg, small = gbc.forward(
        params, cfg, gbc.embed_tokens(params, seq), cache=small, policy=F32
    )
    ragged = gbc.insert_prefill(
        cfg, ragged, small, jnp.asarray(1), jnp.asarray(seq.shape[1])
    )
    cur = int(jnp.argmax(first_lg[0, -1]))
    rag_tokens = [cur]
    active = jnp.asarray([0, 1], jnp.int32)
    for _ in range(2):
        toks = jnp.asarray([0, cur], jnp.int32)
        logits, ragged = gbc.forward_ragged_decode(
            params, cfg, toks, ragged, active, policy=F32
        )
        cur = int(jnp.argmax(logits[1]))
        rag_tokens.append(cur)
    assert rag_tokens == std_tokens
