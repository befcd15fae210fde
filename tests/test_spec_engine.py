"""Engine-integrated prompt-lookup speculative decoding: byte-exact greedy
parity with the offline path, rejection correctness, mixed traffic, and the
tick-count win."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.generation.engine import GenerationConfig, generate
from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.ops.layers import DTypePolicy
from starvector_tpu.serve.engine import Request, ServeEngine

F32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def offline_greedy(params, cfg, prefix, n):
    gen = GenerationConfig(max_new_tokens=n, do_sample=False, pad_token_id=0,
                           min_new_tokens=n)
    toks, _ = generate(
        params, cfg, "gpt_bigcode", prefix,
        jnp.ones(prefix.shape[:2], jnp.int32), gen,
        jax.random.PRNGKey(0), policy=F32,
    )
    return list(np.asarray(toks[0]))


def make_engine(cfg, params, **kw):
    kw.setdefault("max_batch", 3)
    kw.setdefault("max_len", 96)
    return ServeEngine(params, cfg, "gpt_bigcode", policy=F32,
                       spec_drafts=4, **kw)


def test_spec_accept_path_matches_offline(setup):
    """prompt_token_ids seeded with the true future: every lookup drafts the
    exact continuation, so acceptance is maximal — output must still be
    byte-exact greedy, in far fewer ticks."""
    cfg, params = setup
    engine = make_engine(cfg, params)
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    N = 24
    ref = offline_greedy(params, cfg, prefix, N)
    req = Request(
        prefix_embeds=prefix, max_new_tokens=N, do_sample=False,
        prompt_token_ids=[3, 1, 4] + ref,
    )
    out = engine.generate_sync(req, timeout=180)
    stats = engine.stats()
    engine.stop()
    assert out == ref
    assert stats["spec_ticks"] > 0
    assert stats["spec_extra_tokens"] > 0
    # every spec tick after the first two tokens drafts the true future,
    # so ~N/(spec_drafts+1) dispatches: assert a real multiple, not just
    # "fewer than N"
    assert stats["ticks"] <= N // 2


def test_spec_reject_path_matches_offline(setup):
    """Drafts that are WRONG (bigram matches, continuation doesn't) must be
    rejected without corrupting the stream."""
    cfg, params = setup
    engine = make_engine(cfg, params)
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    N = 12
    ref = offline_greedy(params, cfg, prefix, N)
    bad = [(t + 7) % cfg.vocab_size for t in ref]
    req = Request(
        prefix_embeds=prefix, max_new_tokens=N, do_sample=False,
        # earlier occurrences of upcoming bigrams followed by wrong tokens
        prompt_token_ids=[3, 1, 4] + ref[:2] + bad[2:],
    )
    out = engine.generate_sync(req, timeout=180)
    engine.stop()
    assert out == ref


def test_spec_no_draft_context_matches_offline(setup):
    """No prompt ids at all: speculation falls back to regular multi-step
    ticks unless the generated stream itself repeats — output unchanged."""
    cfg, params = setup
    engine = make_engine(cfg, params)
    ids = jnp.array([[9, 2]])
    prefix = gbc.embed_tokens(params, ids)
    ref = offline_greedy(params, cfg, prefix, 10)
    req = Request(prefix_embeds=prefix, max_new_tokens=10, do_sample=False)
    out = engine.generate_sync(req, timeout=180)
    engine.stop()
    assert out == ref


def test_spec_concurrent_greedy_and_sampling(setup):
    """A greedy request and a sampling request running concurrently: mixed
    slot compositions speculate too (top-k-pruned sampling inside the
    verify rounds), the greedy stream stays exact (fp32), the sampled one
    completes."""
    cfg, params = setup
    engine = make_engine(cfg, params, steps_per_tick=2)
    engine.start()
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    N = 16
    ref = offline_greedy(params, cfg, prefix, N)
    greedy = Request(
        prefix_embeds=prefix, max_new_tokens=N, do_sample=False,
        prompt_token_ids=[3, 1, 4] + ref,
    )
    sampled = Request(
        prefix_embeds=gbc.embed_tokens(params, jnp.array([[7, 8]])),
        max_new_tokens=N, do_sample=True, temperature=0.9, top_p=0.95,
    )
    engine.submit(greedy)
    engine.submit(sampled)
    outs = {}
    for req in (greedy, sampled):
        while req.request_id not in outs:
            kind, payload = req.out_queue.get(timeout=180)
            if kind == "done":
                outs[req.request_id] = payload
            assert kind != "error", payload
    engine.stop()
    assert outs[greedy.request_id] == ref
    toks = outs[sampled.request_id]
    assert len(toks) == N
    assert all(0 <= t < cfg.vocab_size for t in toks)


def test_spec_mixed_traffic_default_settings(setup):
    """Default steps_per_tick with speculation: a multi-round verify tick
    emits >=1 token per slot per round, so mixed greedy+sampling traffic is
    never slower than plain multi-step ticks and the greedy stream stays
    correct."""
    cfg, params = setup
    engine = make_engine(cfg, params)  # steps_per_tick=4, spec_drafts=4
    engine.start()
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    N = 12
    ref = offline_greedy(params, cfg, prefix, N)
    greedy = Request(prefix_embeds=prefix, max_new_tokens=N, do_sample=False,
                     prompt_token_ids=[3, 1, 4] + ref)
    sampled = Request(
        prefix_embeds=gbc.embed_tokens(params, jnp.array([[7, 8]])),
        max_new_tokens=N, do_sample=True, temperature=1.3, top_k=50,
    )
    engine.submit(greedy)
    engine.submit(sampled)
    outs = {}
    for req in (greedy, sampled):
        while req.request_id not in outs:
            kind, payload = req.out_queue.get(timeout=180)
            if kind == "done":
                outs[req.request_id] = payload
            assert kind != "error", payload
    engine.stop()
    assert outs[greedy.request_id] == ref


@pytest.mark.slow
def test_spec_beam_and_greedy_coexist(setup):
    """A beam group and a speculating greedy request run concurrently: beam
    rows are inactive in verify ticks (their cache/ctx never commits), and
    both results stay exact."""
    from starvector_tpu.generation.beam import beam_search

    cfg, params = setup
    engine = make_engine(cfg, params, max_batch=4)
    engine.start()
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    N = 12
    ref = offline_greedy(params, cfg, prefix, N)
    greedy = Request(prefix_embeds=prefix, max_new_tokens=N, do_sample=False,
                     prompt_token_ids=[3, 1, 4] + ref)
    bprefix = gbc.embed_tokens(params, jnp.array([[9, 2]]))
    btoks, blens = beam_search(
        params, bprefix, jnp.ones((1, 2), jnp.int32),
        dec_name="gpt_bigcode", llm_cfg=cfg, num_beams=2,
        max_new_tokens=8, pad_token_id=0, policy=F32,
    )
    bref = list(np.asarray(btoks[0][: int(blens[0])]))
    beam = Request(prefix_embeds=bprefix, max_new_tokens=8, num_beams=2,
                   do_sample=False)
    engine.submit(greedy)
    engine.submit(beam)
    outs = {}
    for req in (greedy, beam):
        while req.request_id not in outs:
            kind, payload = req.out_queue.get(timeout=180)
            if kind == "done":
                outs[req.request_id] = payload
            assert kind != "error", payload
    engine.stop()
    assert outs[greedy.request_id] == ref
    assert outs[beam.request_id] == bref


@pytest.mark.slow
def test_spec_engine_starcoder2_accept_path():
    """Engine speculation on the v2 decoder family (GQA + RoPE): seeded
    greedy request matches its offline run."""
    from starvector_tpu.models import starcoder2 as sc2

    cfg = sc2.tiny_config()
    params = sc2.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.array([[3, 1, 4]])
    prefix = sc2.embed_tokens(params, ids)
    N = 16
    gen = GenerationConfig(max_new_tokens=N, do_sample=False, pad_token_id=0,
                           min_new_tokens=N)
    toks, _ = generate(
        params, cfg, "starcoder2", prefix,
        jnp.ones((1, 3), jnp.int32), gen,
        jax.random.PRNGKey(0), policy=F32,
    )
    ref = list(np.asarray(toks[0]))
    engine = ServeEngine(params, cfg, "starcoder2", max_batch=2, max_len=96,
                         policy=F32, spec_drafts=4)
    req = Request(prefix_embeds=prefix, max_new_tokens=N, do_sample=False,
                  prompt_token_ids=[3, 1, 4] + ref)
    out = engine.generate_sync(req, timeout=180)
    stats = engine.stats()
    engine.stop()
    assert out == ref
    assert stats["spec_extra_tokens"] > 0


def test_spec_drafts_must_fit_sliding_window():
    from starvector_tpu.models import starcoder2 as sc2

    cfg = sc2.tiny_config(sliding_window=4)
    params = sc2.init_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="sliding window"):
        ServeEngine(params, cfg, "starcoder2", max_batch=2, max_len=64,
                    policy=F32, spec_drafts=8)


def test_spec_int8_kv_smoke(setup):
    """Speculation over an int8 KV cache: completes and stays plausible
    (chunk keys are verified in compute dtype, so near-tie greedy picks may
    differ from the sequential int8 path — exactness is not asserted)."""
    cfg, params = setup
    engine = make_engine(cfg, params, kv_cache_dtype=jnp.int8)
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    ref = offline_greedy(params, cfg, prefix, 12)
    req = Request(
        prefix_embeds=prefix, max_new_tokens=12, do_sample=False,
        prompt_token_ids=[3, 1, 4] + ref,
    )
    out = engine.generate_sync(req, timeout=180)
    engine.stop()
    assert len(out) == 12
    assert all(0 <= t < cfg.vocab_size for t in out)


def test_spec_warmup_compiles_verify(setup):
    """warmup() on an idle engine pre-compiles the verify dispatch without
    emitting tokens or leaking slots."""
    cfg, params = setup
    engine = make_engine(cfg, params)
    engine.warmup([8], group_sizes=[1])
    assert engine.num_active == 0
    st = engine.stats()
    assert st["spec_ticks"] == 0  # warmup dispatches don't count
    # engine still serves correctly afterwards
    ids = jnp.array([[5, 6]])
    prefix = gbc.embed_tokens(params, ids)
    ref = offline_greedy(params, cfg, prefix, 6)
    out = engine.generate_sync(
        Request(prefix_embeds=prefix, max_new_tokens=6, do_sample=False),
        timeout=180,
    )
    engine.stop()
    assert out == ref


def test_spec_accept_margin_engine(setup):
    """spec_accept_margin=1e9 rejects every draft (no margin clears it), so
    the engine degenerates to one accepted token per verify position-chain —
    output stays exact greedy. margin=0 accepts normally and must emit the
    same tokens (fp32: no drift to bound)."""
    cfg, params = setup
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    N = 16
    ref = offline_greedy(params, cfg, prefix, N)

    outs = {}
    for margin in (0.0, 1e9):
        engine = ServeEngine(params, cfg, "gpt_bigcode", policy=F32,
                             max_batch=2, max_len=96, spec_drafts=4,
                             spec_accept_margin=margin)
        req = Request(prefix_embeds=prefix, max_new_tokens=N,
                      do_sample=False, prompt_token_ids=[3, 1, 4] + ref)
        outs[margin] = (engine.generate_sync(req, timeout=180),
                        engine.stats()["spec_extra_tokens"])
        engine.stop()
    assert outs[0.0][0] == ref
    assert outs[1e9][0] == ref
    # margin=inf admits no extra tokens; margin=0 speculates freely
    assert outs[1e9][1] == 0
    assert outs[0.0][1] > 0
