"""Ragged (per-slot) decode parity: the continuous-batching path must produce
the same logits as the standard cached path, with slots at different
positions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.parametrize("dec_name", ["gpt_bigcode", "starcoder2"])
def test_chunked_cached_forward_matches_monolithic(dec_name):
    """The small-chunk write-once cached path (1 < S <= 64): prefilling in
    4-token chunks — including a left-padded row and, for starcoder2, the
    sliding-window per-query mask — must match the monolithic forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from starvector_tpu.models import gpt_bigcode, starcoder2
    from starvector_tpu.ops.layers import DTypePolicy

    dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
    F32 = DTypePolicy(compute_dtype=jnp.float32)
    cfg = dec.tiny_config()
    params = dec.init_params(cfg, jax.random.PRNGKey(0))
    B, P = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 5, cfg.vocab_size)
    emb = dec.embed_tokens(params, ids).astype(jnp.float32)
    mask = jnp.ones((B, P), jnp.int32).at[1, :4].set(0)   # left-padded row
    emb = emb.at[1, :4].set(0.0)

    ref_logits, _ = dec.forward(params, cfg, emb, attention_mask=mask,
                                policy=F32)

    cache = dec.init_cache(cfg, B, P + 8, dtype=jnp.float32)
    for s in range(0, P, 4):
        lg, cache = dec.forward(
            params, cfg, emb[:, s:s + 4],
            attention_mask=mask[:, s:s + 4], cache=cache, policy=F32,
        )
    np.testing.assert_allclose(np.asarray(lg[:, -1]),
                               np.asarray(ref_logits[:, -1]),
                               rtol=3e-5, atol=3e-5)

    # and a decode step continues correctly off the chunk-filled cache
    nxt = jnp.argmax(ref_logits[:, -1], -1)[:, None]
    lg_ref, _ = dec.forward(
        params, cfg, emb, attention_mask=mask,
        cache=dec.init_cache(cfg, B, P + 8, dtype=jnp.float32), policy=F32)
    step_ref, _ = dec.forward(
        params, cfg, dec.embed_tokens(params, nxt).astype(jnp.float32),
        cache=_refill(dec, cfg, params, emb, mask, P), policy=F32)
    step_chunk, _ = dec.forward(
        params, cfg, dec.embed_tokens(params, nxt).astype(jnp.float32),
        cache=cache, policy=F32)
    np.testing.assert_allclose(np.asarray(step_chunk), np.asarray(step_ref),
                               rtol=3e-5, atol=3e-5)


def _refill(dec, cfg, params, emb, mask, P):
    cache = dec.init_cache(cfg, emb.shape[0], P + 8, dtype=jnp.float32)
    _, cache = dec.forward(params, cfg, emb, attention_mask=mask,
                           cache=cache, policy=jnp_policy())
    return cache


def jnp_policy():
    import jax.numpy as jnp

    from starvector_tpu.ops.layers import DTypePolicy

    return DTypePolicy(compute_dtype=jnp.float32)
