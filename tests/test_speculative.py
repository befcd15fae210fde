"""Prompt-lookup speculative decoding: outputs must be EXACTLY the greedy
stream, with fewer forwards when the text is repetitive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.generation.engine import GenerationConfig, generate
from starvector_tpu.generation.speculative import generate_greedy_speculative
from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.ops.layers import DTypePolicy

F32 = DTypePolicy(compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def model():
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def reference_greedy(params, cfg, prompt_ids, n):
    embeds = gbc.embed_tokens(params, prompt_ids)
    gen = GenerationConfig(max_new_tokens=n, do_sample=False, pad_token_id=0,
                           min_new_tokens=n)
    toks, _ = generate(
        params, cfg, "gpt_bigcode", embeds,
        jnp.ones(prompt_ids.shape, jnp.int32), gen, jax.random.PRNGKey(0),
        policy=F32,
    )
    return list(np.asarray(toks[0]))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_speculative_matches_greedy(model, seed):
    cfg, params = model
    prompt = jax.random.randint(jax.random.PRNGKey(seed), (1, 5), 1,
                                cfg.vocab_size)
    ref = reference_greedy(params, cfg, prompt, 24)
    toks, lengths, n_fwd = generate_greedy_speculative(
        params, gbc.embed_tokens(params, prompt),
        jnp.ones((1, 5), jnp.int32), prompt,
        dec_name="gpt_bigcode", llm_cfg=cfg, max_new_tokens=24,
        draft_len=6, pad_token_id=0, policy=F32,
    )
    assert list(np.asarray(toks[0])) == ref
    # tiny random models loop quickly → drafting should save forwards
    assert int(n_fwd) <= 24 + 1


@pytest.mark.slow
def test_speculative_saves_forwards_on_repetition(model):
    cfg, params = model
    # force a highly repetitive prompt
    prompt = jnp.asarray([[7, 9, 7, 9, 7, 9]], jnp.int32)
    ref = reference_greedy(params, cfg, prompt, 32)
    toks, lengths, n_fwd = generate_greedy_speculative(
        params, gbc.embed_tokens(params, prompt),
        jnp.ones(prompt.shape, jnp.int32), prompt,
        dec_name="gpt_bigcode", llm_cfg=cfg, max_new_tokens=32,
        draft_len=8, pad_token_id=0, policy=F32,
    )
    assert list(np.asarray(toks[0])) == ref
    # 1 prefill + far fewer verify steps than 32 single-token steps
    assert int(n_fwd) < 20, int(n_fwd)


@pytest.mark.slow
def test_speculative_stop_sequence(model):
    cfg, params = model
    prompt = jax.random.randint(jax.random.PRNGKey(5), (1, 4), 1, cfg.vocab_size)
    ref = reference_greedy(params, cfg, prompt, 16)
    stop = (ref[2], ref[3])
    gen = GenerationConfig(max_new_tokens=16, do_sample=False,
                           stop_sequences=(stop,), pad_token_id=0)
    ref_toks, ref_len = generate(
        params, cfg, "gpt_bigcode", gbc.embed_tokens(params, prompt),
        jnp.ones(prompt.shape, jnp.int32), gen, jax.random.PRNGKey(0),
        policy=F32,
    )
    toks, lengths, _ = generate_greedy_speculative(
        params, gbc.embed_tokens(params, prompt),
        jnp.ones(prompt.shape, jnp.int32), prompt,
        dec_name="gpt_bigcode", llm_cfg=cfg, max_new_tokens=16,
        draft_len=4, stop_sequences=(stop,), pad_token_id=0, policy=F32,
    )
    L = int(ref_len[0])
    assert int(lengths[0]) == L
    assert list(np.asarray(toks[0, :L])) == list(np.asarray(ref_toks[0, :L]))


@pytest.mark.slow
def test_speculative_visual_prefix(model):
    """Prefix rows without ids (visual tokens, id = -1) don't break drafting."""
    cfg, params = model
    prompt = jax.random.randint(jax.random.PRNGKey(6), (1, 3), 1, cfg.vocab_size)
    vis = jax.random.normal(jax.random.PRNGKey(7), (1, 4, cfg.hidden_size))
    embeds = jnp.concatenate(
        [vis, gbc.embed_tokens(params, prompt)], axis=1
    )
    ids_aligned = jnp.concatenate(
        [jnp.full((1, 4), -1, jnp.int32), prompt.astype(jnp.int32)], axis=1
    )
    gen = GenerationConfig(max_new_tokens=12, do_sample=False, pad_token_id=0,
                           min_new_tokens=12)
    ref_toks, _ = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 7), jnp.int32),
        gen, jax.random.PRNGKey(0), policy=F32,
    )
    toks, lengths, _ = generate_greedy_speculative(
        params, embeds, jnp.ones((1, 7), jnp.int32), ids_aligned,
        dec_name="gpt_bigcode", llm_cfg=cfg, max_new_tokens=12,
        draft_len=4, pad_token_id=0, policy=F32,
    )
    assert list(np.asarray(toks[0])) == list(np.asarray(ref_toks[0]))


@pytest.mark.slow  # accept_margin stays default-covered at the engine level
def test_accept_margin_bounds_chains():
    """accept_margin=inf forces every draft position to be rejected (margin
    can never clear it), so speculative output degenerates to exact
    token-at-a-time greedy — one accepted token per round — while
    accept_margin=0 keeps full acceptance. Output tokens must be identical
    in both modes (fp32: no drift to bound, so the knob must not change
    WHAT is emitted, only how fast)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from starvector_tpu.generation.engine import GenerationConfig, generate
    from starvector_tpu.generation.speculative import (
        generate_greedy_speculative_batched,
    )
    from starvector_tpu.models import gpt_bigcode as gbc
    from starvector_tpu.ops.layers import DTypePolicy

    F32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.array([[3, 1, 4, 1, 5], [9, 2, 6, 5, 3]])
    prefix = gbc.embed_tokens(params, ids).astype(jnp.float32)
    mask = jnp.ones(ids.shape, jnp.int32)
    N = 16

    gen = GenerationConfig(max_new_tokens=N, do_sample=False, pad_token_id=0,
                           min_new_tokens=N)
    ref, _ = generate(params, cfg, "gpt_bigcode", prefix, mask, gen,
                      jax.random.PRNGKey(0), policy=F32)

    toks0, _, nf0 = generate_greedy_speculative_batched(
        params, prefix, mask, ids, dec_name="gpt_bigcode", llm_cfg=cfg,
        max_new_tokens=N, draft_len=4, pad_token_id=0, policy=F32,
        accept_margin=0.0,
    )
    toks_inf, _, nf_inf = generate_greedy_speculative_batched(
        params, prefix, mask, ids, dec_name="gpt_bigcode", llm_cfg=cfg,
        max_new_tokens=N, draft_len=4, pad_token_id=0, policy=F32,
        accept_margin=1e9,
    )
    np.testing.assert_array_equal(np.asarray(toks0), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(toks_inf), np.asarray(ref))
    # margin=inf rejects every draft: exactly one token per round
    assert int(nf_inf) >= N
    assert int(nf0) <= int(nf_inf)
