"""Batched prompt-lookup speculative decoding (offline, ragged rows): exact
greedy parity with per-row one-token-at-a-time generation, per-row early
stopping, and the fewer-forwards win when drafts hit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.generation.engine import GenerationConfig, generate
from starvector_tpu.generation.speculative import (
    generate_greedy_speculative_batched,
)
from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.models import starcoder2 as sc2
from starvector_tpu.ops.layers import DTypePolicy

F32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def _ref_row(mod, dec_name, params, cfg, ids, n, stops=(), eos=None):
    prefix = mod.embed_tokens(params, jnp.asarray([ids]))
    gen = GenerationConfig(
        max_new_tokens=n, do_sample=False, pad_token_id=0, min_new_tokens=1,
        stop_sequences=stops, eos_token_id=eos,
    )
    toks, lengths = generate(
        params, cfg, dec_name, prefix,
        jnp.ones((1, len(ids)), jnp.int32), gen,
        jax.random.PRNGKey(0), policy=F32,
    )
    return list(np.asarray(toks[0])), int(lengths[0])


@pytest.mark.parametrize("name", [
    "gpt_bigcode",
    # v2 variant to the slow tier: the gpt_bigcode param covers the batched
    # algorithm at default; starcoder2-specific spec behavior is covered by
    # test_spec_engine's v2 accept-path test
    pytest.param("starcoder2", marks=pytest.mark.slow),
])
def test_batched_spec_matches_per_row_greedy(name):
    mod = gbc if name == "gpt_bigcode" else sc2
    cfg = mod.tiny_config()
    params = mod.init_params(cfg, jax.random.PRNGKey(0))
    rows = [[3, 1, 4], [9, 2, 6, 5, 3], [7, 8, 1, 2]]
    N = 14
    P = max(len(r) for r in rows)
    B = len(rows)

    ids_padded = np.zeros((B, P), np.int32)
    pid = np.full((B, P), -1, np.int32)
    mask = np.zeros((B, P), np.int32)
    for b, r in enumerate(rows):
        ids_padded[b, : len(r)] = r
        pid[b, : len(r)] = r
        mask[b, : len(r)] = 1
    embeds = mod.embed_tokens(params, jnp.asarray(ids_padded))

    toks, lengths, n_fwd = generate_greedy_speculative_batched(
        params, embeds, jnp.asarray(mask), jnp.asarray(pid),
        dec_name=name, llm_cfg=cfg, max_new_tokens=N, draft_len=4,
        pad_token_id=0, policy=F32,
    )
    toks = np.asarray(toks)
    for b, r in enumerate(rows):
        ref, _ = _ref_row(mod, name, params, cfg, r, N)
        assert list(toks[b]) == ref, f"row {b} diverged"


def test_batched_spec_per_row_stop_and_fewer_forwards():
    """Stop sequences fire per row; rows seeded with their own greedy
    future accept maximal drafts (few forwards for many tokens)."""
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    rows = [[3, 1, 4], [9, 2, 6]]
    N = 24
    refs = [_ref_row(gbc, "gpt_bigcode", params, cfg, r, N) for r in rows]
    # use each row's 3rd/4th generated tokens as its stop sequence so the
    # stop fires mid-stream at a known spot
    stops = tuple(tuple(ref[0][2:4]) for ref in refs)

    B, K = len(rows), 6
    # seed prompt_ids with the true future → every draft is correct; the
    # ATTENDED prompt stays the real rows (prompt_ids is wider than the
    # inputs — it is pure draft-lookup context)
    seeded = [list(r) + refs[b][0] for b, r in enumerate(rows)]
    P = max(len(r) for r in rows)
    PC = max(len(s) for s in seeded)
    ids_padded = np.zeros((B, P), np.int32)
    pid = np.full((B, PC), -1, np.int32)
    mask = np.zeros((B, P), np.int32)
    for b, r in enumerate(rows):
        ids_padded[b, : len(r)] = r
        pid[b, : len(seeded[b])] = seeded[b]
        mask[b, : len(r)] = 1
    embeds = gbc.embed_tokens(params, jnp.asarray(ids_padded))

    toks, lengths, n_fwd = generate_greedy_speculative_batched(
        params, embeds, jnp.asarray(mask), jnp.asarray(pid),
        dec_name="gpt_bigcode", llm_cfg=cfg, max_new_tokens=N, draft_len=K,
        stop_sequences=stops, pad_token_id=0, policy=F32,
    )
    toks = np.asarray(toks)
    # per-row greedy reference with the same stops
    for b, r in enumerate(rows):
        ref, ref_len = _ref_row(gbc, "gpt_bigcode", params, cfg, r, N,
                                stops=stops)
        assert int(lengths[b]) == ref_len
        assert list(toks[b][:ref_len]) == ref[:ref_len]
        # pad-filled past the stop
        assert all(t == 0 for t in toks[b][ref_len:])
    # maximal acceptance ⇒ far fewer forwards than tokens
    assert int(n_fwd) <= N // 2 + 2


@pytest.mark.slow
def test_api_batched_speculative_matches_plain_greedy():
    """generate_im2svg(use_speculative=True) at B>1 routes through the
    batched ragged path and returns the same SVG texts as the plain greedy
    engine."""
    import numpy as np

    from starvector_tpu.api import StarVectorForCausalLM
    from starvector_tpu.models import starvector as sv

    model = StarVectorForCausalLM.from_config(sv.tiny_config())
    rng = np.random.RandomState(0)
    batch = {"image": rng.rand(2, model.cfg.image_size,
                               model.cfg.image_size, 3).astype("float32")}
    plain = model.generate_im2svg(batch, max_new_tokens=12,
                                  use_nucleus_sampling=False)
    spec = model.generate_im2svg(batch, max_new_tokens=12,
                                 use_nucleus_sampling=False,
                                 use_speculative=True)
    assert spec == plain


@pytest.mark.slow
def test_api_text2svg_speculative_matches_plain_greedy(monkeypatch):
    """generate_text2svg(use_speculative=True) re-pads right and matches
    the plain greedy path despite the v2 tokenizer's left padding — and the
    speculative route genuinely fires (guarded against a silently-failing
    spec_ok gate making this comparison vacuous)."""
    import starvector_tpu.generation.speculative as spec_mod
    from starvector_tpu.api import StarVectorForCausalLM
    from starvector_tpu.models import starvector as sv

    calls = []
    orig = spec_mod.generate_greedy_speculative_batched
    monkeypatch.setattr(
        spec_mod, "generate_greedy_speculative_batched",
        lambda *a, **k: calls.append(1) or orig(*a, **k),
    )
    model = StarVectorForCausalLM.from_config(sv.tiny_config())
    batch = {"caption": ["a red circle", "blue"]}
    plain = model.generate_text2svg(batch, max_new_tokens=12,
                                    use_nucleus_sampling=False)
    spec = model.generate_text2svg(batch, max_new_tokens=12,
                                   use_nucleus_sampling=False,
                                   use_speculative=True)
    assert spec == plain
    assert len(calls) == 1


@pytest.mark.slow
def test_text2svg_ragged_batch_rows_match_single():
    """Regression: a ragged text2svg batch row must produce the same tokens
    as running that caption alone. The v1 tokenizer pads RIGHT while the
    engine reads last-token logits at position -1, so api.generate_text2svg
    must normalize to left padding (it used to condition the short row's
    first token on trailing [PAD]s)."""
    from starvector_tpu.api import StarVectorForCausalLM
    from starvector_tpu.models import starvector as sv

    model = StarVectorForCausalLM.from_config(sv.tiny_config())
    caps = ["a tiny red circle icon", "blue square"]
    batched = model.generate_text2svg({"caption": caps}, max_new_tokens=10,
                                      use_nucleus_sampling=False)
    for i, c in enumerate(caps):
        single = model.generate_text2svg({"caption": [c]}, max_new_tokens=10,
                                         use_nucleus_sampling=False)
        assert batched[i] == single[0], c
