"""Golden parity vs the installed HF torch implementations (SURVEY.md §4
tier 3): tiny-config GPTBigCode and Starcoder2 logits must match to fp32
tolerance, with and without padding, plus cached-decode parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.models import starcoder2 as sc2
from starvector_tpu.models import convert
from starvector_tpu.ops.layers import DTypePolicy

torch = pytest.importorskip("torch")

F32 = DTypePolicy(compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def hf_gbc():
    from transformers import GPTBigCodeConfig as HFConfig
    from transformers import GPTBigCodeForCausalLM

    hf_cfg = HFConfig(
        vocab_size=512, n_positions=128, n_embd=64, n_layer=2, n_head=4,
        multi_query=True, attn_implementation="eager",
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = GPTBigCodeForCausalLM(hf_cfg).eval()
    cfg = gbc.tiny_config()
    params = convert.gpt_bigcode_from_hf(
        convert.torch_state_dict_to_numpy(model.state_dict()), cfg
    )
    return model, cfg, params


@pytest.fixture(scope="module")
def hf_sc2():
    from transformers import Starcoder2Config as HFConfig
    from transformers import Starcoder2ForCausalLM

    hf_cfg = HFConfig(
        vocab_size=512, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, sliding_window=None,
        attn_implementation="eager", tie_word_embeddings=True,
        attention_dropout=0.0, residual_dropout=0.0, embedding_dropout=0.0,
    )
    torch.manual_seed(1)
    model = Starcoder2ForCausalLM(hf_cfg).eval()
    cfg = sc2.tiny_config()
    params = convert.starcoder2_from_hf(
        convert.torch_state_dict_to_numpy(model.state_dict()), cfg
    )
    return model, cfg, params


def test_gpt_bigcode_logit_parity(hf_gbc):
    model, cfg, params = hf_gbc
    B, S = 2, 9
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, (B, S))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    embeds = gbc.embed_tokens(params, jnp.asarray(ids))
    logits, _ = gbc.forward(params, cfg, embeds, policy=F32)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


def test_gpt_bigcode_padded_parity(hf_gbc):
    model, cfg, params = hf_gbc
    rng = np.random.RandomState(1)
    S, PAD = 7, 3
    ids = rng.randint(0, cfg.vocab_size, (1, S + PAD))
    mask = np.concatenate([np.zeros((1, PAD)), np.ones((1, S))], 1).astype(np.int64)
    # the reference's vendored decoder derives position ids from the mask
    # cumsum (modeling_gpt_bigcode.py:980-988); the installed modern HF uses
    # a plain arange, so pass the reference-semantics positions explicitly
    pos = np.clip(np.cumsum(mask, -1) - 1, 0, None)
    pos[mask == 0] = 1
    with torch.no_grad():
        ref = model(
            torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(pos),
        ).logits.numpy()
    embeds = gbc.embed_tokens(params, jnp.asarray(ids))
    logits, _ = gbc.forward(
        params, cfg, embeds, attention_mask=jnp.asarray(mask, jnp.int32), policy=F32
    )
    # only compare non-pad positions (HF computes garbage on pads too but
    # values there are unspecified)
    np.testing.assert_allclose(
        np.asarray(logits)[:, PAD:], ref[:, PAD:], rtol=2e-4, atol=2e-4
    )


def test_starcoder2_logit_parity(hf_sc2):
    model, cfg, params = hf_sc2
    B, S = 2, 9
    rng = np.random.RandomState(2)
    ids = rng.randint(0, cfg.vocab_size, (B, S))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    embeds = sc2.embed_tokens(params, jnp.asarray(ids))
    logits, _ = sc2.forward(params, cfg, embeds, policy=F32)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


def test_starcoder2_cache_equivalence(hf_sc2):
    _, cfg, params = hf_sc2
    B, S, P = 2, 12, 8
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, S), 0, cfg.vocab_size)
    embeds = sc2.embed_tokens(params, ids)
    full, _ = sc2.forward(params, cfg, embeds, policy=F32)
    cache = sc2.init_cache(cfg, B, max_len=S + 2, dtype=jnp.float32)
    pre, cache = sc2.forward(params, cfg, embeds[:, :P], cache=cache, policy=F32)
    np.testing.assert_allclose(
        np.asarray(pre), np.asarray(full[:, :P]), rtol=2e-4, atol=2e-4
    )
    outs = []
    for t in range(P, S):
        lg, cache = sc2.forward(params, cfg, embeds[:, t : t + 1], cache=cache, policy=F32)
        outs.append(lg[:, 0])
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs, 1)), np.asarray(full[:, P:]), rtol=2e-4, atol=2e-4
    )


def test_starcoder2_sliding_window():
    """Sliding window masks distant keys: short-window output differs from
    full-window on long sequences but matches on short ones."""
    cfg_full = sc2.tiny_config()
    cfg_win = sc2.tiny_config(sliding_window=4)
    params = sc2.init_params(cfg_full, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0, cfg_full.vocab_size)
    embeds = sc2.embed_tokens(params, ids)
    full, _ = sc2.forward(params, cfg_full, embeds, policy=F32)
    win, _ = sc2.forward(params, cfg_win, embeds, policy=F32)
    # first 4 positions see identical context
    np.testing.assert_allclose(
        np.asarray(win[:, :4]), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-4
    )
    assert np.abs(np.asarray(win[:, -1]) - np.asarray(full[:, -1])).max() > 1e-3


def test_beam_search_matches_hf_generate(hf_gbc):
    """Beam tokens match HF generate(num_beams=2) — exercises the
    finished-hypothesis pool semantics (reference relies on HF's
    BeamSearchScorer + _reorder_cache, modeling_gpt_bigcode.py:1282-1291)."""
    from starvector_tpu.generation.beam import beam_search

    model, cfg, params = hf_gbc
    B, P, NEW = 2, 6, 24
    rng = np.random.RandomState(0)
    ids = rng.randint(1, cfg.vocab_size, size=(B, P))
    eos = 7

    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(ids), max_new_tokens=NEW, num_beams=2,
            do_sample=False, eos_token_id=eos, pad_token_id=0,
            length_penalty=1.0, early_stopping=False,
        ).numpy()[:, P:]

    embeds = gbc.embed_tokens(params, jnp.asarray(ids))
    tokens, lengths = beam_search(
        params, embeds.astype(jnp.float32), jnp.ones((B, P), jnp.int32),
        dec_name="gpt_bigcode", llm_cfg=cfg, num_beams=2,
        max_new_tokens=NEW, eos_token_id=eos, pad_token_id=0,
        length_penalty=1.0, policy=F32,
    )
    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths)
    for b in range(B):
        L_hf = hf_out.shape[1]
        hf_row = hf_out[b]
        # HF pads after eos; compare up to our reported length
        L = int(lengths[b])
        np.testing.assert_array_equal(
            tokens[b, :L], hf_row[:L],
            err_msg=f"row {b}: ours {tokens[b, :L]} vs hf {hf_row[:L]}",
        )
