"""Continuous-batching engine: concurrent requests, streaming, stop/eos,
parity with the offline generate path."""

import queue

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


def make_engine(cfg, params, max_batch=3):
    return ServeEngine(
        params, cfg, "gpt_bigcode", max_batch=max_batch, max_len=64, policy=F32
    )


def offline_greedy(params, cfg, prefix, n):
    gen = GenerationConfig(max_new_tokens=n, do_sample=False, pad_token_id=0,
                           min_new_tokens=n)
    toks, _ = generate(
        params, cfg, "gpt_bigcode", prefix,
        jnp.ones(prefix.shape[:2], jnp.int32), gen,
        jax.random.PRNGKey(0), policy=F32,
    )
    return list(np.asarray(toks[0]))


def test_single_request_matches_offline(setup):
    cfg, params = setup
    engine = make_engine(cfg, params)
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    ref = offline_greedy(params, cfg, prefix, 6)
    req = Request(prefix_embeds=prefix, max_new_tokens=6, do_sample=False)
    out = engine.generate_sync(req, timeout=120)
    engine.stop()
    assert out == ref


def test_concurrent_requests(setup):
    """More requests than slots: all finish, each matches its own offline
    run (continuous batching correctness under slot reuse)."""
    cfg, params = setup
    engine = make_engine(cfg, params, max_batch=2)
    engine.start()
    reqs = []
    refs = []
    for seed in range(5):
        ids = jax.random.randint(jax.random.PRNGKey(seed), (1, 3), 0, cfg.vocab_size)
        prefix = gbc.embed_tokens(params, ids)
        refs.append(offline_greedy(params, cfg, prefix, 5))
        req = Request(prefix_embeds=prefix, max_new_tokens=5, do_sample=False)
        engine.submit(req)
        reqs.append(req)
    outs = []
    for req in reqs:
        tokens = None
        while tokens is None:
            kind, payload = req.out_queue.get(timeout=120)
            if kind == "done":
                tokens = payload
        outs.append(tokens)
    engine.stop()
    assert outs == refs


def test_stop_sequence_in_engine(setup):
    cfg, params = setup
    engine = make_engine(cfg, params)
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    ref = offline_greedy(params, cfg, prefix, 8)
    stop = (ref[1], ref[2])
    req = Request(
        prefix_embeds=prefix, max_new_tokens=8, do_sample=False,
        stop_sequences=(stop,),
    )
    out = engine.generate_sync(req, timeout=120)
    engine.stop()
    expected_len = next(
        j + 1 for j in range(1, 8) if (ref[j - 1], ref[j]) == stop
    )
    assert len(out) == expected_len


def test_streaming_tokens_arrive_incrementally(setup):
    cfg, params = setup
    engine = make_engine(cfg, params)
    ids = jnp.array([[7, 7]])
    prefix = gbc.embed_tokens(params, ids)
    req = Request(prefix_embeds=prefix, max_new_tokens=4, do_sample=False)
    engine.submit(req)
    engine.start()
    seen = 0
    while True:
        kind, payload = req.out_queue.get(timeout=120)
        if kind == "token":
            seen += 1
        else:
            break
    engine.stop()
    assert seen == 4


def test_int8_engine_serves(setup):
    """The worker's --quantize path: engine over an int8 weight-only tree
    still decodes (greedy outputs may differ from bf16 within quantization
    error, so assert structure + determinism, not token equality)."""
    from starvector_tpu.ops.quantization import quantize_tree

    cfg, params = setup
    qparams = quantize_tree(params, min_elems=1 << 10, consume=False)
    engine = make_engine(cfg, qparams)
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    req = Request(prefix_embeds=prefix, max_new_tokens=6, do_sample=False)
    out = engine.generate_sync(req, timeout=120)
    out2 = engine.generate_sync(
        Request(prefix_embeds=prefix, max_new_tokens=6, do_sample=False),
        timeout=120,
    )
    engine.stop()
    assert len(out) == 6
    assert all(0 <= t < cfg.vocab_size for t in out)
    assert out == out2


def test_batched_admission_group(setup):
    """Several same-bucket requests submitted at once admit as ONE batched
    prefill (k=4): outputs still match per-request offline greedy decode."""
    cfg, params = setup
    engine = ServeEngine(
        params, cfg, "gpt_bigcode", max_batch=4, max_len=64, policy=F32
    )
    engine.start()
    prefixes = []
    refs = []
    for i in range(4):
        ids = jnp.array([[3 + i, 1, 4, 1 + i]])
        prefix = gbc.embed_tokens(params, ids)
        prefixes.append(prefix)
        refs.append(offline_greedy(params, cfg, prefix, 5))
    reqs = [
        engine.submit(Request(prefix_embeds=p, max_new_tokens=5,
                              do_sample=False))
        for p in prefixes
    ]
    outs = []
    for r in reqs:
        toks = []
        while True:
            kind, payload = r.out_queue.get(timeout=120)
            if kind == "done":
                outs.append(payload)
                break
            if kind == "error":
                raise AssertionError(payload)
            toks.append(payload)
    engine.stop()
    assert outs == refs


def test_logit_bias_and_min_p_in_engine(setup):
    """A huge logit_bias forces greedy output to the biased token from the
    FIRST token on (prefill sampling and tick sampling both apply it)."""
    cfg, params = setup
    engine = make_engine(cfg, params)
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    req = Request(prefix_embeds=prefix, max_new_tokens=5, do_sample=False,
                  logit_bias={7: 1e9})
    out = engine.generate_sync(req, timeout=120)
    # min_p=1.0 keeps only the argmax token -> sampling becomes greedy
    req2 = Request(prefix_embeds=prefix, max_new_tokens=5, do_sample=True,
                   temperature=5.0, top_p=1.0, min_p=1.0)
    out2 = engine.generate_sync(req2, timeout=120)
    ref2 = offline_greedy(params, cfg, prefix, 5)
    engine.stop()
    assert out == [7] * 5
    assert out2 == ref2


def test_presence_penalty_in_engine(setup):
    """Overwhelming presence penalty -> no token repeats within a stream,
    and the counts table resets between requests on the same slot."""
    cfg, params = setup
    engine = ServeEngine(
        params, cfg, "gpt_bigcode", max_batch=1, max_len=64, policy=F32
    )
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    outs = []
    for _ in range(2):  # second request reuses slot 0: state must reset
        req = Request(prefix_embeds=prefix, max_new_tokens=6, do_sample=True,
                      temperature=1.0, top_p=1.0, presence_penalty=1e9)
        outs.append(engine.generate_sync(req, timeout=120))
    engine.stop()
    for out in outs:
        assert len(set(out)) == len(out), out
    # identical requests, same slot, engine-stepped rng differs is fine;
    # but the FIRST token (greedy-ish penalty-free) must match across runs
    # only if sampling rng matched — don't assert equality, just no repeats


def test_repetition_penalty_with_prompt_ids(setup):
    """repetition_penalty=1e9-ish with prompt_token_ids suppresses prompt
    tokens from being emitted at all."""
    cfg, params = setup
    engine = make_engine(cfg, params)
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    ref = offline_greedy(params, cfg, prefix, 6)
    req = Request(prefix_embeds=prefix, max_new_tokens=6, do_sample=True,
                  temperature=1.0, top_p=1.0, repetition_penalty=100.0,
                  prompt_token_ids=np.array([3, 1, 4]))
    out = engine.generate_sync(req, timeout=120)
    engine.stop()
    assert all(t not in (3, 1, 4) for t in out), (out, ref)


def test_int8_kv_engine(setup):
    """Engine over an int8 KV cache (kv_cache_dtype=jnp.int8) matches the
    bf16-cache engine greedy outputs on a tiny model, including warmup."""
    cfg, params = setup
    ref_engine = make_engine(cfg, params)
    engine = ServeEngine(
        params, cfg, "gpt_bigcode", max_batch=3, max_len=64, policy=F32,
        kv_cache_dtype=jnp.int8,
    )
    engine.warmup([4], group_sizes=[1, 2], timeout=300)
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    req = Request(prefix_embeds=prefix, max_new_tokens=6, do_sample=False)
    out = engine.generate_sync(req, timeout=120)
    ref = ref_engine.generate_sync(
        Request(prefix_embeds=prefix, max_new_tokens=6, do_sample=False),
        timeout=120,
    )
    engine.stop()
    ref_engine.stop()
    assert out == ref


@pytest.mark.slow
def test_multichunk_prefill_last_token_mid_chunk(setup):
    """Regression: a prompt whose bucket spans several prefill chunks and
    whose LAST real token falls in an EARLIER chunk (P=150, bucket 256,
    chunks of 64 -> last token in chunk 2) must still sample its first
    output token from the right hidden state."""
    cfg, params = setup
    engine = ServeEngine(
        params, cfg, "gpt_bigcode", max_batch=2, max_len=384, policy=F32,
        prefill_chunk=64,
    )
    ids = jnp.arange(150)[None] % 11 + 2
    prefix = gbc.embed_tokens(params, ids)
    ref = offline_greedy(params, cfg, prefix, 5)
    req = Request(prefix_embeds=prefix, max_new_tokens=5, do_sample=False)
    out = engine.generate_sync(req, timeout=240)
    engine.stop()
    assert out == ref


@pytest.mark.slow
def test_stress_mixed_workload(setup):
    """20 requests, bursty arrivals, mixed buckets/knobs/greedy/sampling on
    a 3-slot engine: everything completes, no errors, greedy requests match
    their offline decode (shakes grouped admission, knob-cache invalidation
    and slot reuse together)."""
    import random
    import threading
    import time as _time

    cfg, params = setup
    engine = ServeEngine(
        params, cfg, "gpt_bigcode", max_batch=3, max_len=96, policy=F32
    )
    engine.start()
    rng = random.Random(0)
    reqs, refs = [], {}
    for i in range(20):
        P = rng.choice([3, 5, 9, 17])
        ids = jnp.asarray([[(7 * i + j) % 23 + 2 for j in range(P)]])
        prefix = gbc.embed_tokens(params, ids)
        greedy = rng.random() < 0.5
        n_new = rng.choice([2, 5, 8])
        req = Request(
            prefix_embeds=prefix, max_new_tokens=n_new,
            do_sample=not greedy, temperature=0.9, top_p=0.95,
            # bias/min-p only on sampling requests: the greedy ones are
            # checked against a bias-free offline reference
            min_p=0.01 if (not greedy and rng.random() < 0.3) else 0.0,
            logit_bias=({3: 0.5} if (not greedy and rng.random() < 0.3)
                        else None),
        )
        if greedy:
            refs[req.request_id] = offline_greedy(params, cfg, prefix, n_new)
        reqs.append(req)

    def submit_bursts():
        for i, r in enumerate(reqs):
            engine.submit(r)
            if i % 5 == 4:
                _time.sleep(0.05)

    t = threading.Thread(target=submit_bursts)
    t.start()
    outs = {}
    for r in reqs:
        toks = []
        while True:
            kind, payload = r.out_queue.get(timeout=300)
            if kind == "done":
                outs[r.request_id] = payload
                break
            if kind == "error":
                raise AssertionError(payload)
            toks.append(payload)
    t.join()
    engine.stop()
    assert len(outs) == 20
    for rid, ref in refs.items():
        assert outs[rid] == ref, rid


def test_multichunk_int8_kv_admission(setup):
    """Multi-chunk prefill INTO an int8 ragged cache (chunked quantized
    writes + batched insert + quantized decode) still matches the offline
    greedy path."""
    cfg, params = setup
    engine = ServeEngine(
        params, cfg, "gpt_bigcode", max_batch=2, max_len=384, policy=F32,
        prefill_chunk=64, kv_cache_dtype=jnp.int8,
    )
    ids = jnp.arange(150)[None] % 11 + 2
    prefix = gbc.embed_tokens(params, ids)
    ref = offline_greedy(params, cfg, prefix, 5)
    req = Request(prefix_embeds=prefix, max_new_tokens=5, do_sample=False)
    out = engine.generate_sync(req, timeout=240)
    engine.stop()
    assert out == ref


@pytest.mark.slow
def test_beam_group_matches_offline_beam_search(setup):
    """In-engine beam groups reproduce the offline beam_search result
    (HF pool semantics) — the VERDICT r2 #5 'beams in the engine' bar."""
    from starvector_tpu.generation.beam import beam_search

    cfg, params = setup
    engine = make_engine(cfg, params, max_batch=4)
    ids = jnp.array([[3, 1, 4, 1, 5]])
    prefix = gbc.embed_tokens(params, ids)
    n_new = 10
    ref_toks, ref_len = beam_search(
        params, prefix, jnp.ones(prefix.shape[:2], jnp.int32),
        dec_name="gpt_bigcode", llm_cfg=cfg, num_beams=2,
        max_new_tokens=n_new, eos_token_id=None, pad_token_id=0, policy=F32,
    )
    ref = list(np.asarray(ref_toks[0][: int(ref_len[0])]))
    req = Request(prefix_embeds=prefix, max_new_tokens=n_new,
                  do_sample=False, num_beams=2)
    out = engine.generate_sync(req, timeout=180)
    engine.stop()
    assert out == ref


def test_beam_and_sampling_stream_concurrently(setup):
    """A beam request and a sampling request progress simultaneously: the
    sampling stream keeps emitting while the beam group decodes, and both
    finish with correct results."""
    cfg, params = setup
    engine = make_engine(cfg, params, max_batch=4)
    engine.start()
    ids_a = jnp.array([[3, 1, 4]])
    prefix_a = gbc.embed_tokens(params, ids_a)
    ref_greedy = offline_greedy(params, cfg, prefix_a, 8)
    greedy_req = Request(prefix_embeds=prefix_a, max_new_tokens=8,
                         do_sample=False)
    beam_req = Request(prefix_embeds=prefix_a, max_new_tokens=8,
                       do_sample=False, num_beams=2)
    engine.submit(greedy_req)
    engine.submit(beam_req)
    results = {}
    for name, req in (("greedy", greedy_req), ("beam", beam_req)):
        toks = []
        while True:
            kind, payload = req.out_queue.get(timeout=120)
            if kind == "token":
                toks.append(payload)
            elif kind == "done":
                results[name] = payload
                break
            else:
                raise AssertionError(f"{name} errored: {payload}")
    engine.stop()
    assert results["greedy"] == ref_greedy
    assert len(results["beam"]) > 0


def test_beam_exceeding_slots_errors(setup):
    cfg, params = setup
    engine = make_engine(cfg, params, max_batch=2)
    ids = jnp.array([[3, 1]])
    prefix = gbc.embed_tokens(params, ids)
    req = Request(prefix_embeds=prefix, max_new_tokens=4, num_beams=3)
    engine.submit(req)
    kind, payload = req.out_queue.get(timeout=10)
    engine.stop()
    assert kind == "error" and "num_beams" in payload


def test_beam_failure_fails_concurrent_requests_not_silently(setup):
    """A beam-step failure consumes the donated cache; the rebuild zeroes
    every slot's KV context, so concurrent requests must ERROR — silently
    continuing them against a blank cache would stream garbage."""
    import starvector_tpu.serve.engine as engine_mod

    cfg, params = setup
    engine = make_engine(cfg, params, max_batch=3)
    ids = jnp.array([[3, 1, 4]])
    prefix = gbc.embed_tokens(params, ids)
    sampling_req = Request(prefix_embeds=prefix, max_new_tokens=400,
                           do_sample=False)
    beam_req = Request(prefix_embeds=prefix, max_new_tokens=8,
                       do_sample=False, num_beams=2)
    orig = engine_mod._beam_step

    def boom(*a, **k):
        raise RuntimeError("injected beam failure")

    engine_mod._beam_step = boom
    try:
        engine.submit(sampling_req)
        engine.submit(beam_req)
        engine.start()
        outcomes = {}
        for name, req in (("beam", beam_req), ("sampling", sampling_req)):
            deadline = 60
            while True:
                kind, payload = req.out_queue.get(timeout=deadline)
                if kind in ("error", "done"):
                    outcomes[name] = (kind, payload)
                    break
    finally:
        engine_mod._beam_step = orig
        engine.stop()
    assert outcomes["beam"][0] == "error"
    assert outcomes["sampling"][0] == "error", (
        "sampling request must fail with the cache rebuild, not decode "
        f"from a zeroed cache: {outcomes['sampling']}"
    )
