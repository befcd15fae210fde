"""Decoder core tests: shapes, KV-cache equivalence (prefill+decode == full
forward), position-id semantics, loss masking (SURVEY.md §4 tier 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.ops.layers import DTypePolicy

F32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_forward_shapes(setup):
    cfg, params = setup
    B, S = 2, 10
    embeds = gbc.embed_tokens(
        params, jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    )
    logits, cache = gbc.forward(params, cfg, embeds, policy=F32)
    assert logits.shape == (B, S, cfg.vocab_size)
    assert cache is None


def test_cache_equivalence(setup):
    """prefill(0..P) + per-token decode == full forward, to fp32 precision."""
    cfg, params = setup
    B, S, P = 2, 12, 7
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, cfg.vocab_size)
    embeds = gbc.embed_tokens(params, ids)

    full_logits, _ = gbc.forward(params, cfg, embeds, policy=F32)

    cache = gbc.init_cache(cfg, B, max_len=S + 4, dtype=jnp.float32)
    pre_logits, cache = gbc.forward(params, cfg, embeds[:, :P], cache=cache, policy=F32)
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(full_logits[:, :P]), rtol=2e-4, atol=2e-4
    )
    step_logits = []
    for t in range(P, S):
        lg, cache = gbc.forward(params, cfg, embeds[:, t : t + 1], cache=cache, policy=F32)
        step_logits.append(lg[:, 0])
    np.testing.assert_allclose(
        np.asarray(jnp.stack(step_logits, axis=1)),
        np.asarray(full_logits[:, P:]),
        rtol=2e-4,
        atol=2e-4,
    )


def test_left_padded_prefill_matches_unpadded(setup):
    """A left-padded prefix must produce the same last-token logits as the
    unpadded sequence (reference position-id semantics :980-988)."""
    cfg, params = setup
    S, PAD = 6, 3
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, S), 0, cfg.vocab_size)
    embeds = gbc.embed_tokens(params, ids)

    logits_ref, _ = gbc.forward(params, cfg, embeds, policy=F32)

    padded = jnp.concatenate([jnp.zeros_like(embeds[:, :PAD]), embeds], axis=1)
    mask = jnp.concatenate(
        [jnp.zeros((1, PAD), jnp.int32), jnp.ones((1, S), jnp.int32)], axis=1
    )
    cache = gbc.init_cache(cfg, 1, max_len=S + PAD + 2, dtype=jnp.float32)
    logits_pad, cache = gbc.forward(
        params, cfg, padded, attention_mask=mask, cache=cache, policy=F32
    )
    np.testing.assert_allclose(
        np.asarray(logits_pad[:, -1]), np.asarray(logits_ref[:, -1]), rtol=2e-4, atol=2e-4
    )
    # and decoding one more token matches the unpadded cache path
    nxt = gbc.embed_tokens(params, jnp.array([[5]]))
    lg_pad, _ = gbc.forward(params, cfg, nxt, cache=cache, policy=F32)

    cache2 = gbc.init_cache(cfg, 1, max_len=S + PAD + 2, dtype=jnp.float32)
    _, cache2 = gbc.forward(params, cfg, embeds, cache=cache2, policy=F32)
    lg_ref, _ = gbc.forward(params, cfg, nxt, cache=cache2, policy=F32)
    np.testing.assert_allclose(
        np.asarray(lg_pad), np.asarray(lg_ref), rtol=2e-4, atol=2e-4
    )


def test_loss_masking(setup):
    cfg, params = setup
    B, S = 2, 8
    ids = jax.random.randint(jax.random.PRNGKey(4), (B, S), 0, cfg.vocab_size)
    embeds = gbc.embed_tokens(params, ids)
    logits, _ = gbc.forward(params, cfg, embeds, policy=F32)

    labels_all_masked = jnp.full((B, S), -100, jnp.int32)
    loss0 = gbc.causal_lm_loss(logits, labels_all_masked)
    assert float(loss0) == 0.0

    labels = ids.astype(jnp.int32)
    loss = gbc.causal_lm_loss(logits, labels)
    assert float(loss) > 0.0

    # masking the visual-prefix region changes the loss only via those tokens
    labels_masked = labels.at[:, :3].set(-100)
    loss_m = gbc.causal_lm_loss(logits, labels_masked)
    assert not np.isclose(float(loss), float(loss_m))


def test_remat_matches(setup):
    cfg, params = setup
    B, S = 1, 5
    ids = jax.random.randint(jax.random.PRNGKey(5), (B, S), 0, cfg.vocab_size)
    embeds = gbc.embed_tokens(params, ids)
    l1, _ = gbc.forward(params, cfg, embeds, policy=F32)
    l2, _ = gbc.forward(params, cfg, embeds, policy=F32, remat=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fused_loss_matches_naive(setup):
    cfg, params = setup
    B, S = 2, 13
    ids = jax.random.randint(jax.random.PRNGKey(8), (B, S), 0, cfg.vocab_size)
    embeds = gbc.embed_tokens(params, ids)
    labels = ids.astype(jnp.int32).at[:, :3].set(-100)
    logits, _ = gbc.forward(params, cfg, embeds, policy=F32)
    naive = gbc.causal_lm_loss(logits, labels)
    hidden, _ = gbc.forward(params, cfg, embeds, policy=F32, return_hidden=True)
    fused = gbc.causal_lm_loss_fused(
        gbc.lm_head_table(params, cfg), hidden, labels, policy=F32, chunk=4
    )
    np.testing.assert_allclose(float(fused), float(naive), rtol=2e-5)
    # gradients agree too
    def f_naive(p):
        lg, _ = gbc.forward(p, cfg, gbc.embed_tokens(p, ids), policy=F32)
        return gbc.causal_lm_loss(lg, labels)
    def f_fused(p):
        h, _ = gbc.forward(p, cfg, gbc.embed_tokens(p, ids), policy=F32,
                           return_hidden=True)
        return gbc.causal_lm_loss_fused(
            gbc.lm_head_table(p, cfg), h, labels, policy=F32, chunk=4)
    g1 = jax.grad(f_naive)(params)
    g2 = jax.grad(f_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
