"""Beam search: K=1 equals greedy; wider beams never score worse; eos
freezing; GRPO logprob forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.generation.beam import beam_search
from starvector_tpu.generation.engine import GenerationConfig, generate
from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.ops.layers import DTypePolicy

F32 = DTypePolicy(compute_dtype=jnp.float32)


def setup():
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    prompt = jnp.array([[3, 1, 4]])
    embeds = gbc.embed_tokens(params, prompt)
    return cfg, params, embeds


def seq_logprob(params, cfg, prefix_embeds, tokens):
    """Log-prob of a token sequence continuing the prefix."""
    emb = jnp.concatenate(
        [prefix_embeds, gbc.embed_tokens(params, jnp.asarray([tokens]))], axis=1
    )
    logits, _ = gbc.forward(params, cfg, emb, policy=F32)
    P = prefix_embeds.shape[1]
    lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), -1)
    total = 0.0
    for t, tok in enumerate(tokens):
        total += float(lp[P - 1 + t, tok])
    return total


def test_beam1_equals_greedy():
    cfg, params, embeds = setup()
    gen = GenerationConfig(max_new_tokens=6, do_sample=False, pad_token_id=0)
    greedy, _ = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 3), jnp.int32),
        gen, jax.random.PRNGKey(0), policy=F32,
    )
    beams, lens = beam_search(
        params, embeds, jnp.ones((1, 3), jnp.int32),
        dec_name="gpt_bigcode", llm_cfg=cfg, num_beams=1, max_new_tokens=6,
        policy=F32,
    )
    assert list(np.asarray(beams[0])) == list(np.asarray(greedy[0]))


def test_wider_beam_no_worse():
    cfg, params, embeds = setup()
    out1, _ = beam_search(
        params, embeds, jnp.ones((1, 3), jnp.int32),
        dec_name="gpt_bigcode", llm_cfg=cfg, num_beams=1, max_new_tokens=5,
        policy=F32,
    )
    out4, _ = beam_search(
        params, embeds, jnp.ones((1, 3), jnp.int32),
        dec_name="gpt_bigcode", llm_cfg=cfg, num_beams=4, max_new_tokens=5,
        policy=F32,
    )
    lp1 = seq_logprob(params, cfg, embeds, list(np.asarray(out1[0])))
    lp4 = seq_logprob(params, cfg, embeds, list(np.asarray(out4[0])))
    assert lp4 >= lp1 - 1e-4


def test_beam_eos_freezes():
    cfg, params, embeds = setup()
    # pick the greedy 2nd token as eos → beams must stop early
    gen = GenerationConfig(max_new_tokens=6, do_sample=False, pad_token_id=0)
    greedy, _ = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 3), jnp.int32),
        gen, jax.random.PRNGKey(0), policy=F32,
    )
    eos = int(greedy[0, 1])
    toks, lens = beam_search(
        params, embeds, jnp.ones((1, 3), jnp.int32),
        dec_name="gpt_bigcode", llm_cfg=cfg, num_beams=2, max_new_tokens=6,
        eos_token_id=eos, pad_token_id=0, policy=F32,
    )
    assert int(lens[0]) <= 6
    t = list(np.asarray(toks[0]))
    L = int(lens[0])
    assert all(x == 0 for x in t[L:])  # pad after finish


@pytest.mark.slow  # ~11 s; test_grpo covers the GRPO loss/step surface at default
def test_grpo_forward_logprobs():
    from starvector_tpu.models import starvector as sv

    cfg = sv.tiny_config()
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    B, Q, S, G = 1, 5, 6, 2
    vis = jax.random.normal(jax.random.PRNGKey(1), (B, Q, cfg.hidden_size))
    ids = jax.random.randint(jax.random.PRNGKey(2), (B * G, S), 1,
                             cfg.llm.vocab_size)
    mask = jnp.ones((B * G, S), jnp.int32).at[1, -2:].set(0)
    lp = sv.grpo_forward(
        params, cfg, vis, ids, mask, num_generations=G, policy=F32
    )
    assert lp.shape == (B * G, S)
    assert float(lp.max()) <= 0.0
    assert float(lp[1, -1]) == 0.0  # masked positions zeroed
    # identical rollouts get identical logprobs (prefix repeat correct)
    ids2 = jnp.concatenate([ids[:1], ids[:1]], axis=0)
    lp2 = sv.grpo_forward(
        params, cfg, vis, ids2, jnp.ones_like(ids2), num_generations=G,
        policy=F32,
    )
    np.testing.assert_allclose(
        np.asarray(lp2[0]), np.asarray(lp2[1]), rtol=1e-5, atol=1e-5
    )


def test_grpo_forward_matches_full_logits():
    """The fused chunked log-prob path equals the naive full-(B,S,V)
    computation (the fused path exists so GRPO never materializes ~13 GB
    of logits at production shapes)."""
    from starvector_tpu.models import starvector as sv

    cfg = sv.tiny_config()
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    B, Q, S, G = 1, 5, 7, 2
    vis = jax.random.normal(jax.random.PRNGKey(1), (B, Q, cfg.hidden_size))
    ids = jax.random.randint(jax.random.PRNGKey(2), (B * G, S), 1,
                             cfg.llm.vocab_size)
    mask = jnp.ones((B * G, S), jnp.int32)
    lp = sv.grpo_forward(
        params, cfg, vis, ids, mask, num_generations=G, policy=F32
    )

    # naive reference: full logits + log_softmax + gather
    dec = cfg.decoder_module
    cond = jnp.repeat(vis.astype(jnp.float32), G, axis=0)
    tok_e = dec.embed_tokens(params["svg_transformer"], ids)
    embeds = jnp.concatenate([cond, tok_e.astype(jnp.float32)], axis=1)
    am = jnp.ones(embeds.shape[:2], jnp.int32)
    logits, _ = dec.forward(params["svg_transformer"], cfg.llm, embeds,
                            attention_mask=am, policy=F32)
    pred = logits[:, Q - 1 : Q - 1 + S].astype(jnp.float32)
    ref = jnp.take_along_axis(
        jax.nn.log_softmax(pred, -1), ids[..., None].astype(jnp.int32), -1
    )[..., 0]
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
