"""Pallas kernel parity vs the XLA reference attention (SURVEY.md §4 tier 2),
run in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.ops.attention import make_attention_bias, multihead_attention
from starvector_tpu.ops.flash_attention import flash_prefill, mqa_decode


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.slow  # mixed-mode decoder variants cover the flash+decoder integration at default
@pytest.mark.parametrize("H,Hkv", [(4, 1), (4, 2), (4, 4)])
def test_flash_prefill_causal_parity(H, Hkv):
    B, S, D = 2, 48, 128
    q = rand(0, (B, S, H, D))
    k = rand(1, (B, S, Hkv, D))
    v = rand(2, (B, S, Hkv, D))
    mask = jnp.ones((B, S), jnp.int32)
    bias = make_attention_bias(mask, S, S, causal=True)
    ref = multihead_attention(q, k, v, bias)
    out = flash_prefill(q, k, v, mask, block_q=16, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_prefill_padded_keys():
    B, S, H, D = 2, 32, 4, 128
    q = rand(3, (B, S, H, D))
    k = rand(4, (B, S, 1, D))
    v = rand(5, (B, S, 1, D))
    mask = jnp.asarray(
        np.concatenate([np.zeros((B, 5)), np.ones((B, S - 5))], 1), jnp.int32
    )  # left padding
    bias = make_attention_bias(mask, S, S, causal=True)
    ref = multihead_attention(q, k, v, bias)
    out = flash_prefill(q, k, v, mask, block_q=16, block_k=16, interpret=True)
    # positions with no visible keys (the pad rows) are unspecified; compare
    # only rows that can attend to something
    np.testing.assert_allclose(
        np.asarray(out)[:, 5:], np.asarray(ref)[:, 5:], rtol=2e-4, atol=2e-4
    )


def test_flash_prefill_q_offset():
    """Chunked prefill: rows at offset P attend causally within a longer
    window, matching the bias-based reference."""
    B, H, D, P, S, T = 1, 4, 128, 16, 16, 32
    q = rand(6, (B, S, H, D))
    k = rand(7, (B, T, 1, D))
    v = rand(8, (B, T, 1, D))
    mask = jnp.ones((B, T), jnp.int32)
    bias = make_attention_bias(mask, S, T, q_offset=P, causal=True)
    ref = multihead_attention(q, k, v, bias)
    out = flash_prefill(
        q, k, v, mask, q_offset=P, block_q=16, block_k=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_prefill_non_divisible_lengths():
    B, S, H, D = 1, 37, 4, 128
    q = rand(9, (B, S, H, D))
    k = rand(10, (B, S, 1, D))
    v = rand(11, (B, S, 1, D))
    mask = jnp.ones((B, S), jnp.int32)
    bias = make_attention_bias(mask, S, S, causal=True)
    ref = multihead_attention(q, k, v, bias)
    out = flash_prefill(q, k, v, mask, block_q=16, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("H,Hkv,S", [
    (4, 1, 48),
    (4, 2, 37),                                        # non-divisible length
    pytest.param(4, 4, 48, marks=pytest.mark.slow),    # pure compile cost
])
def test_flash_prefill_tri_grid_parity(H, Hkv, S):
    """The TRIANGULAR-grid forward (tri=True — live lower-triangle cells
    enumerated via prefetched index tables, `_flash_lse_tri_kernel`) matches
    the XLA reference and emits the same LSE as the rectangular sweep, over
    MQA/GQA grouping, padded keys, and non-divisible lengths (block-level
    diagonal/interior classification + the row-major state hand-off)."""
    from starvector_tpu.ops.flash_attention import flash_prefill_with_lse

    B, D = 2, 16
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32).at[1, S - 2:].set(0)

    bias = make_attention_bias(mask, S, S, causal=True)
    ref = multihead_attention(q, k, v, bias)
    out, lse = flash_prefill_with_lse(
        q, k, v, mask, block_q=16, block_k=16, tri=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    out_r, lse_r = flash_prefill_with_lse(
        q, k, v, mask, block_q=16, block_k=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_r),
                               rtol=1e-5, atol=1e-5)


def test_mqa_decode_parity():
    B, H, D, T = 2, 8, 128, 160
    filled = 100
    q1 = rand(12, (B, 1, H, D))
    k = rand(13, (B, T, 1, D))
    v = rand(14, (B, T, 1, D))
    kv_mask = jnp.asarray(
        (np.arange(T)[None, :] < filled).astype(np.int32).repeat(B, 0)
    )
    bias = make_attention_bias(kv_mask, 1, T, q_offset=filled - 1, causal=True)
    ref = multihead_attention(q1, k, v, bias)[:, 0]  # (B, H, D)
    out = mqa_decode(
        q1[:, 0], k[:, :, 0], v[:, :, 0], kv_mask,
        jnp.asarray(filled), block_k=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_mqa_decode_left_padded():
    B, H, D, T = 1, 4, 128, 64
    k = rand(15, (B, T, 1, D))
    v = rand(16, (B, T, 1, D))
    q1 = rand(17, (B, 1, H, D))
    kv_mask = np.zeros((B, T), np.int32)
    kv_mask[:, 3:40] = 1  # left-padded prefix written up to slot 40
    kv_mask = jnp.asarray(kv_mask)
    bias = make_attention_bias(kv_mask, 1, T, q_offset=39, causal=True)
    ref = multihead_attention(q1, k, v, bias)[:, 0]
    out = mqa_decode(
        q1[:, 0], k[:, :, 0], v[:, :, 0], kv_mask,
        jnp.asarray(40), block_k=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # mixed-mode decoder variants cover flash+decoder at default
@pytest.mark.parametrize("module", ["gpt_bigcode", "starcoder2"])
def test_decoder_flash_path_matches_xla(module):
    """Full decoder forward + cached decode with attn_impl='flash' must match
    the xla path (interpret-mode kernels on CPU)."""
    import dataclasses

    if module == "gpt_bigcode":
        from starvector_tpu.models import gpt_bigcode as dec
        cfg_x = dec.tiny_config(hidden_size=256, n_head=2)
    else:
        from starvector_tpu.models import starcoder2 as dec
        cfg_x = dec.tiny_config(
            hidden_size=256, num_attention_heads=2, num_key_value_heads=2,
            intermediate_size=512,
        )
    from starvector_tpu.ops.layers import DTypePolicy

    f32 = DTypePolicy(compute_dtype=jnp.float32)
    cfg_f = dataclasses.replace(cfg_x, attn_impl="flash")
    params = dec.init_params(cfg_x, jax.random.PRNGKey(0))
    B, S = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg_x.vocab_size)
    embeds = dec.embed_tokens(params, ids)

    lx, _ = dec.forward(params, cfg_x, embeds, policy=f32)
    lf, _ = dec.forward(params, cfg_f, embeds, policy=f32)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), rtol=5e-4, atol=5e-4)

    # cached prefill + single-token decode
    cache = dec.init_cache(cfg_f, B, max_len=S + 4, dtype=jnp.float32)
    pf, cache = dec.forward(params, cfg_f, embeds, cache=cache, policy=f32)
    np.testing.assert_allclose(
        np.asarray(pf[:, -1]), np.asarray(lx[:, -1]), rtol=5e-4, atol=5e-4
    )
    nxt = dec.embed_tokens(params, jnp.full((B, 1), 3))
    df, cache = dec.forward(params, cfg_f, nxt, cache=cache, policy=f32)

    cache_x = dec.init_cache(cfg_x, B, max_len=S + 4, dtype=jnp.float32)
    _, cache_x = dec.forward(params, cfg_x, embeds, cache=cache_x, policy=f32)
    dx, _ = dec.forward(params, cfg_x, nxt, cache=cache_x, policy=f32)
    np.testing.assert_allclose(np.asarray(df), np.asarray(dx), rtol=5e-4, atol=5e-4)


def test_batched_decode_parity():
    from starvector_tpu.ops.flash_attention import mqa_decode_batched

    B, H, D, T = 4, 8, 128, 96
    filled = 70
    q1 = rand(20, (B, 1, H, D))
    k = rand(21, (B, T, 1, D))
    v = rand(22, (B, T, 1, D))
    kv_mask = jnp.asarray(
        (np.arange(T)[None, :] < filled).astype(np.int32).repeat(B, 0)
    )
    bias = make_attention_bias(kv_mask, 1, T, q_offset=filled - 1, causal=True)
    ref = multihead_attention(q1, k, v, bias)[:, 0]
    out = mqa_decode_batched(
        q1[:, 0], k[:, :, 0], v[:, :, 0], kv_mask,
        jnp.asarray(filled), block_k=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_batched_decode_window():
    from starvector_tpu.ops.flash_attention import mqa_decode_batched

    B, H, D, T = 2, 4, 128, 64
    filled, win_start = 50, 20
    q1 = rand(23, (B, 1, H, D))
    k = rand(24, (B, T, 1, D))
    v = rand(25, (B, T, 1, D))
    base_mask = (np.arange(T)[None, :] < filled).astype(np.int32).repeat(B, 0)
    win_mask = base_mask * (np.arange(T)[None, :] >= win_start)
    bias = make_attention_bias(jnp.asarray(win_mask), 1, T, q_offset=filled - 1)
    ref = multihead_attention(q1, k, v, bias)[:, 0]
    out = mqa_decode_batched(
        q1[:, 0], k[:, :, 0], v[:, :, 0], jnp.asarray(base_mask),
        jnp.asarray(filled), jnp.asarray(win_start), block_k=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("module", ["gpt_bigcode", "starcoder2"])
def test_decoder_mixed_mode_matches_xla(module):
    """'mixed' (flash prefill, xla decode) must equal the xla path."""
    import dataclasses

    if module == "gpt_bigcode":
        from starvector_tpu.models import gpt_bigcode as dec
        cfg_x = dec.tiny_config(hidden_size=256, n_head=2)
    else:
        from starvector_tpu.models import starcoder2 as dec
        cfg_x = dec.tiny_config(
            hidden_size=256, num_attention_heads=2, num_key_value_heads=2,
            intermediate_size=512,
        )
    from starvector_tpu.ops.layers import DTypePolicy

    f32 = DTypePolicy(compute_dtype=jnp.float32)
    cfg_m = dataclasses.replace(cfg_x, attn_impl="mixed")
    params = dec.init_params(cfg_x, jax.random.PRNGKey(0))
    B, S = 2, 10
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg_x.vocab_size)
    embeds = dec.embed_tokens(params, ids)

    cache_x = dec.init_cache(cfg_x, B, S + 3, dtype=jnp.float32)
    px, cache_x = dec.forward(params, cfg_x, embeds, cache=cache_x, policy=f32)
    cache_m = dec.init_cache(cfg_m, B, S + 3, dtype=jnp.float32)
    pm, cache_m = dec.forward(params, cfg_m, embeds, cache=cache_m, policy=f32)
    np.testing.assert_allclose(
        np.asarray(pm[:, -1]), np.asarray(px[:, -1]), rtol=5e-4, atol=5e-4
    )
    nxt = dec.embed_tokens(params, jnp.full((B, 1), 7))
    dx, _ = dec.forward(params, cfg_x, nxt, cache=cache_x, policy=f32)
    dm, _ = dec.forward(params, cfg_m, nxt, cache=cache_m, policy=f32)
    np.testing.assert_allclose(np.asarray(dm), np.asarray(dx), rtol=5e-4, atol=5e-4)


@pytest.mark.slow  # default tier covers the same surface via flash_backward_kernel_parity + trainable_vjp
def test_flash_training_gradients_match_xla():
    """Grads through the flash training path match the xla path."""
    import dataclasses

    from starvector_tpu.models import gpt_bigcode as dec
    from starvector_tpu.ops.layers import DTypePolicy

    f32 = DTypePolicy(compute_dtype=jnp.float32)
    cfg_x = dec.tiny_config(hidden_size=256, n_head=2)
    cfg_f = dataclasses.replace(cfg_x, attn_impl="flash")
    params = dec.init_params(cfg_x, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, cfg_x.vocab_size)
    labels = ids.astype(jnp.int32)

    def loss(p, cfg):
        e = dec.embed_tokens(p, ids)
        lg, _ = dec.forward(p, cfg, e, policy=f32)
        return dec.causal_lm_loss(lg, labels)

    lx, gx = jax.value_and_grad(lambda p: loss(p, cfg_x))(params)
    lf, gf = jax.value_and_grad(lambda p: loss(p, cfg_f))(params)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )


@pytest.mark.parametrize("H,Hkv,window", [(4, 1, None), (4, 2, 7)])
def test_flash_backward_kernel_parity(H, Hkv, window):
    """Pallas dq/dk/dv match XLA autodiff (causal MQA; windowed GQA)."""
    from starvector_tpu.ops.flash_attention import (
        flash_backward, flash_prefill_with_lse,
    )

    B, S, D = 2, 18, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32).at[1, 13:].set(0)  # padded keys
    g = jax.random.normal(ks[3], (B, S, H, D), jnp.float32)

    def ref(q, k, v):
        bias = make_attention_bias(mask, S, S, causal=True, window=window)
        return multihead_attention(q, k, v, bias)

    out_ref, vjp = jax.vjp(ref, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    out, lse = flash_prefill_with_lse(q, k, v, mask, window=window)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )
    dq, dk, dv = flash_backward(q, k, v, mask, out, lse, g, window=window)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("H,Hkv,window,onepass", [
    # default tier: split on (MQA, no window) + one-pass on (GQA, window)
    # + the TRIANGULAR-grid one-pass (MQA, causal, no window — its only
    # admissible regime) + the TRIANGULAR split pair at an unequal block
    # ratio (bq=16/bk=32 — the aspect the 16k context runs, where tri-split
    # is the only admissible triangle); transposed pairings ride the slow
    # tier (pure compile cost)
    (4, 1, None, False),
    (4, 2, 7, True),
    (4, 1, None, "dqp"),
    (4, 1, None, "tri"),
    (4, 1, None, "tri_split"),
    pytest.param(4, 1, None, True, marks=pytest.mark.slow),
    pytest.param(4, 2, 7, False, marks=pytest.mark.slow),
    pytest.param(4, 2, 7, "dqp", marks=pytest.mark.slow),
    pytest.param(4, 2, None, "tri", marks=pytest.mark.slow),
    pytest.param(4, 2, None, "tri_split", marks=pytest.mark.slow),
])
def test_flash_backward_split_kernel_parity(H, Hkv, window, onepass):
    """The multi-k-block backward kernels (explicit block sizes force
    fused=False) match XLA autodiff — the SPLIT dq/dkv pair
    (onepass=False), the ONE-PASS kernel (onepass=True, the long-S
    default), the TRIANGULAR-grid one-pass ("tri", the long-S default
    when q_offset is statically 0), and the TRIANGULAR split pair
    ("tri_split", the only triangle past the one-pass VMEM bound) —
    covering the interior fast-path branch, the dead-block index-map
    clamps, and the live-cell index tables at block granularity."""
    tri = onepass in ("tri", "tri_split")
    block_k = 32 if onepass == "tri_split" else 16
    onepass = True if onepass == "tri" else (
        False if onepass == "tri_split" else onepass)
    from starvector_tpu.ops.flash_attention import (
        flash_backward, flash_prefill_with_lse,
    )

    B, S, D = 2, 48, 16
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
    # padded keys — short enough a tail that every query row keeps at least
    # one live key inside the window (an all-masked row is degenerate: the
    # reference's finite -1e30 bias softmaxes to uniform attention there)
    mask = jnp.ones((B, S), jnp.int32).at[1, 46:].set(0)
    g = jax.random.normal(ks[3], (B, S, H, D), jnp.float32)

    def ref(q, k, v):
        bias = make_attention_bias(mask, S, S, causal=True, window=window)
        return multihead_attention(q, k, v, bias)

    out_ref, vjp = jax.vjp(ref, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    out, lse = flash_prefill_with_lse(q, k, v, mask, window=window)
    dq, dk, dv = flash_backward(
        q, k, v, mask, out, lse, g, window=window,
        block_q=16, block_k=block_k,
        onepass=onepass, tri=tri,
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("window,onepass", [
    (None, False),
    (9, True),
    (9, "dqp"),
    pytest.param(None, True, marks=pytest.mark.slow),
    pytest.param(9, False, marks=pytest.mark.slow),
    pytest.param(None, "dqp", marks=pytest.mark.slow),
])
def test_flash_backward_split_kernel_q_offset(window, onepass):
    """Multi-k-block backward with a query-position offset (the sequence-
    parallel chunk layout): q is rows [16, 32) of a 48-key window — both
    the split pair and the one-pass kernel."""
    from starvector_tpu.ops.flash_attention import (
        flash_backward, flash_prefill_with_lse,
    )

    B, Sq, T, H, Hkv, D, off = 2, 16, 48, 4, 1, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    q = jax.random.normal(ks[0], (B, Sq, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, Hkv, D), jnp.float32)
    mask = jnp.ones((B, T), jnp.int32)
    g = jax.random.normal(ks[3], (B, Sq, H, D), jnp.float32)

    def ref(q, k, v):
        bias = make_attention_bias(
            mask, Sq, T, q_offset=off, causal=True, window=window
        )
        return multihead_attention(q, k, v, bias)

    out_ref, vjp = jax.vjp(ref, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    out, lse = flash_prefill_with_lse(
        q, k, v, mask, q_offset=off, window=window
    )
    dq, dk, dv = flash_backward(
        q, k, v, mask, out, lse, g, q_offset=off, window=window,
        block_q=8, block_k=16, onepass=onepass,
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_trainable_vjp_uses_pallas_backward():
    """End-to-end custom VJP parity at a non-divisible length."""
    from starvector_tpu.ops.flash_attention import flash_prefill_trainable

    B, S, H, Hkv, D = 1, 11, 2, 1, 8
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32)

    def f_flash(q, k, v):
        return jnp.sum(flash_prefill_trainable(q, k, v, mask) ** 2)

    def f_ref(q, k, v):
        bias = make_attention_bias(mask, S, S, causal=True)
        return jnp.sum(multihead_attention(q, k, v, bias) ** 2)

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_trainable_vjp_threads_static_tri_flag(monkeypatch):
    """flash_prefill_trainable certifies a STATICALLY-zero q_offset to BOTH
    passes (tri=True → the triangular-grid kernels are admissible at long
    S), and withholds it for a traced offset (the sequence-parallel chunk
    path), whose live set the static triangle would undercount."""
    from starvector_tpu.ops import flash_attention as fa

    seen_bwd, seen_fwd = [], []
    real_bwd = fa.flash_backward
    real_fwd = fa.flash_prefill_with_lse

    def spy_bwd(*a, **kw):
        seen_bwd.append(kw.get("tri", False))
        return real_bwd(*a, **kw)

    def spy_fwd(*a, **kw):
        seen_fwd.append(kw.get("tri", False))
        return real_fwd(*a, **kw)

    monkeypatch.setattr(fa, "flash_backward", spy_bwd)
    monkeypatch.setattr(fa, "flash_prefill_with_lse", spy_fwd)
    B, S, H, Hkv, D = 1, 8, 2, 1, 8
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32)

    jax.grad(lambda q: jnp.sum(fa.flash_prefill_trainable(q, k, v, mask)))(q)
    jax.grad(lambda q: jnp.sum(fa.flash_prefill_trainable(
        q, k, v, mask, jnp.int32(0))))(q)
    assert seen_bwd == [True, False]
    assert seen_fwd == [True, False]


def test_dots_flash_remat_saves_attention_residuals():
    """remat="dots_flash" (save flash out+LSE, tagged INSIDE the custom-vjp
    forward — ops/flash_attention.py::_fp_fwd) is a pure scheduling choice:
    grads bit-match full remat through the flash-attention training path.
    This is the policy the 8k-context train bench runs (bench.py train8k);
    the named-saveable-residuals-inside-custom_vjp mechanics are exactly
    what this test pins."""
    from starvector_tpu.models import gpt_bigcode as gbc
    from starvector_tpu.ops.layers import DTypePolicy

    cfg = gbc.tiny_config(attn_impl="flash")
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    f32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 5,
                             cfg.vocab_size)

    def grads_for(remat):
        def loss(p):
            e = gbc.embed_tokens(p, ids)
            logits, _ = gbc.forward(p, cfg, e, policy=f32, remat=remat)
            return jnp.mean(jax.nn.log_softmax(logits)[..., 0])
        return jax.jit(jax.value_and_grad(loss))(params)

    l_full, g_full = grads_for(True)
    l_df, g_df = grads_for("dots_flash")
    assert abs(float(l_full) - float(l_df)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_df)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
