"""Generation engine tests: greedy parity with a naive loop, stop sequences,
eos, sampling filters, num_return_sequences (SURVEY.md §4 tier 1/3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.generation.engine import GenerationConfig, generate
from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.ops import sampling
from starvector_tpu.ops.layers import DTypePolicy

F32 = DTypePolicy(compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def model():
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def naive_greedy(params, cfg, embeds, steps):
    """Reference loop: full forward each step, argmax."""
    ids = []
    cur = embeds
    for _ in range(steps):
        logits, _ = gbc.forward(params, cfg, cur, policy=F32)
        nxt = int(jnp.argmax(logits[0, -1]))
        ids.append(nxt)
        cur = jnp.concatenate(
            [cur, gbc.embed_tokens(params, jnp.array([[nxt]]))], axis=1
        )
    return ids


def test_greedy_matches_naive(model):
    cfg, params = model
    prompt = jnp.array([[5, 9, 2]])
    embeds = gbc.embed_tokens(params, prompt)
    gen = GenerationConfig(max_new_tokens=6, do_sample=False, pad_token_id=0)
    toks, lengths = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 3), jnp.int32),
        gen, jax.random.PRNGKey(1), policy=F32,
    )
    assert list(np.asarray(toks[0])) == naive_greedy(params, cfg, embeds, 6)
    assert int(lengths[0]) == 6


def test_stop_sequence_halts(model):
    cfg, params = model
    prompt = jnp.array([[5, 9, 2]])
    embeds = gbc.embed_tokens(params, prompt)
    ref = naive_greedy(params, cfg, embeds, 8)
    # use the 3rd/4th greedy tokens as a 2-token stop sequence
    stop = (int(ref[2]), int(ref[3]))
    gen = GenerationConfig(
        max_new_tokens=8, do_sample=False, stop_sequences=(stop,), pad_token_id=0
    )
    toks, lengths = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 3), jnp.int32),
        gen, jax.random.PRNGKey(1), policy=F32,
    )
    expected_len = next(
        j + 1 for j in range(1, 8) if (ref[j - 1], ref[j]) == stop
    )
    assert int(lengths[0]) == expected_len
    assert list(np.asarray(toks[0, :expected_len])) == ref[:expected_len]
    assert all(t == 0 for t in np.asarray(toks[0, expected_len:]))  # pad after


def test_eos_halts(model):
    cfg, params = model
    prompt = jnp.array([[5, 9, 2]])
    embeds = gbc.embed_tokens(params, prompt)
    ref = naive_greedy(params, cfg, embeds, 8)
    eos = int(ref[1])
    gen = GenerationConfig(
        max_new_tokens=8, do_sample=False, eos_token_id=eos, pad_token_id=0,
        min_new_tokens=0,
    )
    toks, lengths = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 3), jnp.int32),
        gen, jax.random.PRNGKey(1), policy=F32,
    )
    expected_len = ref.index(eos) + 1
    assert int(lengths[0]) == expected_len


def test_per_sequence_stopping(model):
    """Different sequences stop at different steps; finished ones emit pad."""
    cfg, params = model
    prompts = jnp.array([[5, 9, 2], [1, 1, 1]])
    embeds = gbc.embed_tokens(params, prompts)
    ref0 = naive_greedy(params, cfg, embeds[:1], 8)
    eos = int(ref0[1])
    gen = GenerationConfig(
        max_new_tokens=8, do_sample=False, eos_token_id=eos, pad_token_id=0,
        min_new_tokens=0,
    )
    toks, lengths = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((2, 3), jnp.int32),
        gen, jax.random.PRNGKey(1), policy=F32,
    )
    assert int(lengths[0]) == ref0.index(eos) + 1
    # sequence 1 continues independently (may or may not hit the same eos)
    assert int(lengths[1]) >= 1


def test_num_return_sequences(model):
    cfg, params = model
    prompt = jnp.array([[5, 9, 2]])
    embeds = gbc.embed_tokens(params, prompt)
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=True, temperature=1.0,
        num_return_sequences=3, pad_token_id=0,
    )
    toks, lengths = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 3), jnp.int32),
        gen, jax.random.PRNGKey(7), policy=F32,
    )
    assert toks.shape == (3, 4)


def test_left_padded_batched_generation(model):
    """Left-padded prompt generates the same continuation as unpadded."""
    cfg, params = model
    prompt = jnp.array([[5, 9, 2]])
    embeds = gbc.embed_tokens(params, prompt)
    gen = GenerationConfig(max_new_tokens=5, do_sample=False, pad_token_id=0)
    toks_ref, _ = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 3), jnp.int32),
        gen, jax.random.PRNGKey(1), policy=F32,
    )
    padded = jnp.concatenate([jnp.zeros_like(embeds[:, :2]), embeds], axis=1)
    mask = jnp.array([[0, 0, 1, 1, 1]], jnp.int32)
    toks_pad, _ = generate(
        params, cfg, "gpt_bigcode", padded, mask, gen,
        jax.random.PRNGKey(1), policy=F32,
    )
    assert list(np.asarray(toks_pad[0])) == list(np.asarray(toks_ref[0]))


# --- sampling op unit tests -------------------------------------------------

def test_top_k_filter():
    logits = jnp.array([[1.0, 5.0, 3.0, 2.0]])
    out = sampling.apply_top_k(logits, jnp.asarray(2), max_k=4)
    assert np.isneginf(np.asarray(out)[0, 0]) or np.asarray(out)[0, 0] < -1e9
    assert np.asarray(out)[0, 1] == 5.0 and np.asarray(out)[0, 2] == 3.0


def test_top_p_filter_keeps_top_token():
    logits = jnp.array([[0.0, 10.0, -1.0]])
    out = sampling.apply_top_p(logits, jnp.asarray(0.1))
    kept = np.asarray(out)[0] > -1e9
    assert kept.tolist() == [False, True, False]


def test_repetition_penalty():
    logits = jnp.array([[2.0, -2.0, 1.0]])
    presence = jnp.array([[1, 1, 0]])
    out = sampling.apply_repetition_penalty(logits, presence, jnp.asarray(2.0))
    np.testing.assert_allclose(np.asarray(out)[0], [1.0, -4.0, 1.0])


def test_sampling_respects_distribution():
    logits = jnp.log(jnp.array([[0.7, 0.2, 0.1]]))
    draws = []
    for i in range(200):
        t = sampling.sample_token(
            jax.random.PRNGKey(i), logits,
            do_sample=jnp.asarray(True), temperature=jnp.asarray(1.0),
            top_p=jnp.asarray(1.0), top_k=jnp.asarray(0),
        )
        draws.append(int(t[0]))
    counts = np.bincount(draws, minlength=3) / len(draws)
    assert counts[0] > 0.5 and counts[2] < 0.25


def test_min_p_filter():
    # probs ≈ [0.659, 0.242, 0.089, 0.009]; min_p=0.2 keeps p >= 0.132
    logits = jnp.log(jnp.array([[0.66, 0.2425, 0.089, 0.0089]]))
    out = sampling.apply_min_p(logits, jnp.asarray(0.2))
    kept = np.asarray(out)[0] > -1e9
    assert kept.tolist() == [True, True, False, False]
    # min_p <= 0 disables
    out = sampling.apply_min_p(logits, jnp.asarray(0.0))
    assert (np.asarray(out)[0] > -1e9).all()


def test_frequency_presence_penalties():
    logits = jnp.array([[1.0, 1.0, 1.0]])
    counts = jnp.array([[3, 1, 0]])
    out = sampling.apply_frequency_presence(
        logits, counts, jnp.asarray(0.5), jnp.asarray(0.25)
    )
    np.testing.assert_allclose(np.asarray(out)[0], [-0.75, 0.25, 1.0])


def test_logit_bias_scatter():
    logits = jnp.zeros((2, 4))
    bias_ids = jnp.array([[2, -1], [0, 3]])
    bias_vals = jnp.array([[5.0, 9.0], [-3.0, 2.0]])
    out = sampling.apply_logit_bias(logits, bias_ids, bias_vals)
    np.testing.assert_allclose(
        np.asarray(out), [[0, 0, 5.0, 0], [-3.0, 0, 0, 2.0]]
    )


def test_generate_logit_bias_forces_token(model):
    """A huge positive bias on one token makes greedy emit it immediately
    (the reference's logit_bias-toward-</svg> mechanism)."""
    cfg, params = model
    prompt = jnp.array([[5, 9, 2]])
    embeds = gbc.embed_tokens(params, prompt)
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, pad_token_id=0,
        logit_bias=((7, 1e9),), eos_token_id=None,
    )
    toks, _ = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 3), jnp.int32),
        gen, jax.random.PRNGKey(1), policy=F32,
    )
    assert list(np.asarray(toks[0])) == [7, 7, 7, 7]


def test_generate_presence_penalty_blocks_repeats(model):
    """An overwhelming presence penalty forbids re-emitting any generated
    token: all sampled tokens are distinct."""
    cfg, params = model
    prompt = jnp.array([[3, 1, 4]])
    embeds = gbc.embed_tokens(params, prompt)
    gen = GenerationConfig(
        max_new_tokens=8, do_sample=True, temperature=1.0, top_p=1.0,
        presence_penalty=1e9, pad_token_id=0,
    )
    toks, _ = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 3), jnp.int32),
        gen, jax.random.PRNGKey(3), policy=F32,
    )
    out = list(np.asarray(toks[0]))
    assert len(set(out)) == len(out)


def test_num_return_sequences_prefill_once_parity(model):
    """num_return_sequences tiles the cache AFTER a single prefill; greedy
    rows must all equal the n=1 greedy output (exact tiling check)."""
    cfg, params = model
    prompt = jnp.array([[5, 9, 2]])
    embeds = gbc.embed_tokens(params, prompt)
    base = GenerationConfig(max_new_tokens=5, do_sample=False, pad_token_id=0)
    ref, _ = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 3), jnp.int32),
        base, jax.random.PRNGKey(1), policy=F32,
    )
    gen = GenerationConfig(max_new_tokens=5, do_sample=False, pad_token_id=0,
                           num_return_sequences=3)
    toks, lengths = generate(
        params, cfg, "gpt_bigcode", embeds, jnp.ones((1, 3), jnp.int32),
        gen, jax.random.PRNGKey(1), policy=F32,
    )
    assert toks.shape == (3, 5)
    for row in np.asarray(toks):
        assert list(row) == list(np.asarray(ref[0]))


def test_num_return_sequences_batched_rows_interleave(model):
    """B=2 prompts × n=2: rows interleave as [p0, p0, p1, p1] (jnp.repeat
    semantics, matching HF expand) and each pair matches its own greedy."""
    cfg, params = model
    prompts = jnp.array([[5, 9, 2], [3, 1, 4]])
    embeds = gbc.embed_tokens(params, prompts)
    mask = jnp.ones((2, 3), jnp.int32)
    base = GenerationConfig(max_new_tokens=4, do_sample=False, pad_token_id=0)
    ref, _ = generate(params, cfg, "gpt_bigcode", embeds, mask, base,
                      jax.random.PRNGKey(1), policy=F32)
    gen = GenerationConfig(max_new_tokens=4, do_sample=False, pad_token_id=0,
                           num_return_sequences=2)
    toks, _ = generate(params, cfg, "gpt_bigcode", embeds, mask, gen,
                       jax.random.PRNGKey(1), policy=F32)
    out = np.asarray(toks)
    refnp = np.asarray(ref)
    assert toks.shape == (4, 4)
    assert (out[0] == refnp[0]).all() and (out[1] == refnp[0]).all()
    assert (out[2] == refnp[1]).all() and (out[3] == refnp[1]).all()


def test_min_p_matches_hf_warper():
    """apply_min_p keeps exactly the token set HF's MinPLogitsWarper keeps
    (transformers MinPLogitsWarper semantics: prob >= min_p * max_prob)."""
    import torch
    from transformers.generation.logits_process import MinPLogitsWarper

    rng = np.random.RandomState(0)
    for min_p in (0.05, 0.2, 0.5):
        logits = rng.randn(3, 50).astype(np.float32) * 2
        ours = np.asarray(
            sampling.apply_min_p(jnp.asarray(logits), jnp.asarray(min_p))
        )
        hf = MinPLogitsWarper(min_p=min_p)(
            None, torch.tensor(logits)
        ).numpy()
        np.testing.assert_array_equal(ours > -1e9, hf > -1e30)


def test_top_p_matches_hf_warper():
    """apply_top_p keeps exactly HF TopPLogitsWarper's token set."""
    import torch
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.RandomState(1)
    for top_p in (0.3, 0.8, 0.95):
        logits = rng.randn(3, 50).astype(np.float32) * 2
        ours = np.asarray(
            sampling.apply_top_p(jnp.asarray(logits), jnp.asarray(top_p))
        )
        hf = TopPLogitsWarper(top_p=top_p)(
            None, torch.tensor(logits)
        ).numpy()
        np.testing.assert_array_equal(ours > -1e9, hf > -1e30)


def test_repetition_penalty_matches_hf():
    """apply_repetition_penalty matches HF RepetitionPenaltyLogitsProcessor
    on the penalized values, given the same seen-token set."""
    import torch
    from transformers.generation.logits_process import (
        RepetitionPenaltyLogitsProcessor,
    )

    rng = np.random.RandomState(2)
    logits = rng.randn(2, 20).astype(np.float32)
    seen = np.array([[1, 3, 5], [2, 4, 6]])
    presence = np.zeros((2, 20), np.int32)
    for b in range(2):
        presence[b, seen[b]] = 1
    ours = np.asarray(sampling.apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(presence), jnp.asarray(1.7)
    ))
    hf = RepetitionPenaltyLogitsProcessor(penalty=1.7)(
        torch.tensor(seen), torch.tensor(logits)
    ).numpy()
    np.testing.assert_allclose(ours, hf, atol=1e-6)


def test_pipelined_matches_per_batch_generate():
    """generate_pipelined (batch k+1's prefill chunked into batch k's decode
    steps — the offline port of serve/engine.py's chunked-prefill admission)
    emits EXACTLY the tokens the plain per-batch generate() does, including
    left-padded rows, stop sequences, and the no-next final phase."""
    from starvector_tpu.generation.engine import generate_pipelined

    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    B, P = 2, 12
    gen = GenerationConfig(
        max_new_tokens=8, do_sample=False, eos_token_id=None,
        pad_token_id=0, repetition_penalty=1.0,
        stop_sequences=((9, 9),),
    )
    rng = jax.random.PRNGKey(7)
    batches = []
    for i in range(3):
        ids = jax.random.randint(
            jax.random.PRNGKey(10 + i), (B, P), 5, cfg.vocab_size)
        emb = gbc.embed_tokens(params, ids).astype(jnp.float32)
        mask = jnp.ones((B, P), jnp.int32)
        mask = mask.at[1, :3].set(0)          # left-padded row
        emb = emb.at[1, :3].set(0.0)
        batches.append((emb, mask))

    ref = [generate(params, cfg, "gpt_bigcode", e, m, gen, rng, policy=F32)
           for (e, m) in batches]
    pipe = generate_pipelined(
        params, cfg, "gpt_bigcode", batches, gen, rng, policy=F32)
    assert len(pipe) == len(ref)
    for i, ((rt, rl), (pt, pl)) in enumerate(zip(ref, pipe)):
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(pt),
                                      err_msg=f"batch {i}")
        np.testing.assert_array_equal(np.asarray(rl), np.asarray(pl))


@pytest.mark.slow  # guards a measured-NEGATIVE bench path (int8 weights lose
# on the pipelined shape); the winning int8-KV path has default-tier coverage
# below, and kernel_q dispatch is covered by the serve-engine int8 tests
def test_pipelined_int8_weights_match_plain_generate():
    """generate_pipelined with an int8-quantized tree (the production
    serving quant bench.py measures as e2e_prefill1k_int8) emits exactly
    what plain generate() emits with the SAME quantized tree — the chunked
    cached-prefill/verify path must dispatch on kernel_q everywhere the
    plain path does (wte stays bf16 by design, quantize_tree only rewrites
    {'kernel': ...} dicts)."""
    from starvector_tpu.generation.engine import generate_pipelined
    from starvector_tpu.ops.quantization import quantize_tree

    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(2))
    qp = quantize_tree(params, min_elems=1 << 8, consume=False)
    assert any("kernel_q" in str(p)
               for p, _ in jax.tree_util.tree_leaves_with_path(qp))
    B, P = 2, 12
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           eos_token_id=None, pad_token_id=0,
                           repetition_penalty=1.0)
    rng = jax.random.PRNGKey(5)
    batches = []
    for i in range(2):
        ids = jax.random.randint(
            jax.random.PRNGKey(30 + i), (B, P), 5, cfg.vocab_size)
        emb = gbc.embed_tokens(params, ids).astype(jnp.float32)
        batches.append((emb, jnp.ones((B, P), jnp.int32)))
    ref = [generate(qp, cfg, "gpt_bigcode", e, m, gen, rng, policy=F32)
           for (e, m) in batches]
    pipe = generate_pipelined(
        qp, cfg, "gpt_bigcode", batches, gen, rng, policy=F32,
        chunk_positions=4)
    for (rt, _), (pt, _) in zip(ref, pipe):
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(pt))


@pytest.mark.slow  # int8-KV decode parity stays default-covered in
# test_int8_kv.py; the pipelined-path composition (like the int8-weights
# variant before it) rides the slow tier
def test_pipelined_int8_kv_matches_bf16_cache():
    """generate_pipelined(kv_cache_dtype=jnp.int8) — int8 codes + fp32
    scales through BOTH caches of the fused decode+chunk scan — emits the
    same greedy tokens as the compute-dtype cache on a tiny model at fp32
    (the same exactness bar test_serve_engine::test_int8_kv_engine holds
    the serving engine to)."""
    from starvector_tpu.generation.engine import generate_pipelined

    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(4))
    B, P = 2, 12
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           eos_token_id=None, pad_token_id=0,
                           repetition_penalty=1.0)
    rng = jax.random.PRNGKey(9)
    batches = []
    for i in range(3):
        ids = jax.random.randint(
            jax.random.PRNGKey(40 + i), (B, P), 5, cfg.vocab_size)
        emb = gbc.embed_tokens(params, ids).astype(jnp.float32)
        mask = jnp.ones((B, P), jnp.int32)
        mask = mask.at[1, :2].set(0)          # left-padded row
        emb = emb.at[1, :2].set(0.0)
        batches.append((emb, mask))
    ref = generate_pipelined(
        params, cfg, "gpt_bigcode", batches, gen, rng, policy=F32,
        chunk_positions=4)
    q = generate_pipelined(
        params, cfg, "gpt_bigcode", batches, gen, rng, policy=F32,
        chunk_positions=4, kv_cache_dtype=jnp.int8)
    for i, ((rt, rl), (qt, ql)) in enumerate(zip(ref, q)):
        rt, qt = np.asarray(rt), np.asarray(qt)
        if np.array_equal(rt, qt):
            continue
        # Int8 KV rounding may legitimately flip argmax only at near-ties.
        # Teacher-force the reference stream through a full forward and
        # require every mismatch to sit at a position whose fp32 top-2
        # logit gap is below a quantization-noise bound — a real cache bug
        # (wrong scales, index drift) diverges at wide-margin positions
        # and still fails loudly.
        (emb, mask) = batches[i]
        P_len = emb.shape[1]
        full_emb = jnp.concatenate(
            [emb, gbc.embed_tokens(params, jnp.asarray(rt)).astype(emb.dtype)],
            axis=1)
        full_mask = jnp.concatenate(
            [mask, jnp.ones(rt.shape, jnp.int32)], axis=1)
        logits, _ = gbc.forward(params, cfg, full_emb,
                                attention_mask=full_mask, policy=F32)
        pred = np.asarray(logits[:, P_len - 1:-1, :])  # predicts rt[:, t]
        top2 = np.sort(pred, axis=-1)[..., -2:]
        gap = top2[..., 1] - top2[..., 0]
        bad = (rt != qt) & (gap > 1e-2)
        assert not bad.any(), (
            f"batch {i}: int8-KV tokens diverge at wide-margin positions "
            f"(gaps {gap[rt != qt]})")


@pytest.mark.slow  # one extra _generate_jit compile; the knob is a dtype passthrough
def test_generate_int8_kv_knob():
    """plain generate() exposes kv_cache_dtype too (API parity with the
    serving engine and generate_pipelined): int8-cache greedy tokens match
    the compute-dtype tokens on a tiny fp32 model."""
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(4))
    B, P = 2, 12
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           eos_token_id=None, pad_token_id=0,
                           repetition_penalty=1.0)
    rng = jax.random.PRNGKey(9)
    ids = jax.random.randint(jax.random.PRNGKey(40), (B, P), 5,
                             cfg.vocab_size)
    emb = gbc.embed_tokens(params, ids).astype(jnp.float32)
    mask = jnp.ones((B, P), jnp.int32)
    rt, _ = generate(params, cfg, "gpt_bigcode", emb, mask, gen, rng,
                     policy=F32)
    qt, _ = generate(params, cfg, "gpt_bigcode", emb, mask, gen, rng,
                     policy=F32, kv_cache_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(qt))


@pytest.mark.slow  # pipelined_matches_per_batch covers the chunk path; this adds only the non-dividing-P shape
def test_pipelined_chunk_sizes():
    """Chunked prefill covers the prompt exactly for non-dividing shapes
    (prompt padded LEFT to a chunk multiple — the last real token stays at
    the final position, so next_last_logits seeds the next phase)."""
    from starvector_tpu.generation.engine import generate_pipelined

    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(1))
    B, P = 2, 10   # P=10 does not divide the chunk size
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           eos_token_id=None, pad_token_id=0,
                           repetition_penalty=1.0)
    rng = jax.random.PRNGKey(3)
    batches = []
    for i in range(2):
        ids = jax.random.randint(
            jax.random.PRNGKey(20 + i), (B, P), 5, cfg.vocab_size)
        emb = gbc.embed_tokens(params, ids).astype(jnp.float32)
        batches.append((emb, jnp.ones((B, P), jnp.int32)))
    ref = [generate(params, cfg, "gpt_bigcode", e, m, gen, rng, policy=F32)
           for (e, m) in batches]
    pipe = generate_pipelined(
        params, cfg, "gpt_bigcode", batches, gen, rng, policy=F32,
        chunk_positions=4)
    for (rt, _), (pt, _) in zip(ref, pipe):
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(pt))


def test_pruned_sampling_matches_full_chain():
    """sample_token(pruned=True) runs the processor chain on the
    top-max_top_k slab; for nuclei that fit in the slab the kept-token SET
    and the renormalized distribution are identical to the full-vocab
    chain. Checked distributionally (peaked logits) and exactly (min_p=1.0
    forces argmax; top_k bound respected)."""
    rng0 = np.random.RandomState(0)
    V = 400
    base = rng0.randn(2, V).astype(np.float32)
    base[:, :8] += 8.0   # sharp 8-token nucleus per row
    logits = jnp.asarray(base)
    temp = jnp.asarray(0.9, jnp.float32)
    kw = dict(do_sample=True, temperature=temp,
              top_p=jnp.asarray(0.9, jnp.float32),
              top_k=jnp.asarray(0, jnp.int32), max_top_k=64)

    full_counts = np.zeros((2, V))
    pruned_counts = np.zeros((2, V))
    n = 400
    for i in range(n):
        key = jax.random.PRNGKey(i)
        tf_ = np.asarray(sampling.sample_token(key, logits, **kw))
        tp_ = np.asarray(sampling.sample_token(key, logits, pruned=True, **kw))
        full_counts[np.arange(2), tf_] += 1
        pruned_counts[np.arange(2), tp_] += 1
    # same support (the nucleus), close frequencies
    assert set(zip(*np.nonzero(pruned_counts))) <= \
        set(zip(*np.nonzero(full_counts + (base > 4.0))))
    assert np.abs(full_counts - pruned_counts).max() < 0.15 * n

    # min_p = 1.0 forces the argmax even in the pruned chain
    t = sampling.sample_token(
        jax.random.PRNGKey(5), logits, do_sample=True, pruned=True,
        temperature=temp, top_p=jnp.asarray(1.0), top_k=jnp.asarray(0),
        min_p=jnp.asarray(1.0), max_top_k=64,
    )
    np.testing.assert_array_equal(np.asarray(t), np.argmax(base, -1))

    # top_k=3: pruned chain only ever emits one of the top-3 ids
    top3 = set(np.argsort(-base[0])[:3].tolist())
    for i in range(50):
        t = sampling.sample_token(
            jax.random.PRNGKey(100 + i), logits, do_sample=True, pruned=True,
            temperature=temp, top_p=jnp.asarray(1.0),
            top_k=jnp.asarray(3), max_top_k=64,
        )
        assert int(np.asarray(t)[0]) in top3
