"""int8 KV cache: quantization bounds, attention parity, e2e decode parity
against the fp32 cache path (opt-in decode mode — halves the dominant KV
read traffic of the decode step; reference has no KV quantization, this is
a TPU-serving addition)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.models import decode_common as dc
from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.models import starcoder2 as sc2
from starvector_tpu.ops.layers import DTypePolicy

F32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def test_quantize_roundtrip_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 2, 64)) * 3.0
    q, s = dc.quantize_kv(x)
    back = dc.dequantize_kv(q, s, jnp.float32)
    # symmetric int8: error <= scale/2 per element
    err = np.abs(np.asarray(back - x))
    bound = np.asarray(s)[..., None] / 2 + 1e-6
    assert (err <= bound).all()
    assert q.dtype == jnp.int8


def test_merged_attention_int8_close():
    rng = jax.random.PRNGKey(1)
    B, T, Hkv, G, D = 2, 16, 2, 4, 32
    ks = jax.random.split(rng, 5)
    qg = jax.random.normal(ks[0], (B, Hkv, G, D))
    k_new = jax.random.normal(ks[1], (B, Hkv, D))
    v_new = jax.random.normal(ks[2], (B, Hkv, D))
    k_c = jax.random.normal(ks[3], (B, T, Hkv, D))
    v_c = jax.random.normal(ks[4], (B, T, Hkv, D))
    mask = jnp.ones((B, T), jnp.int32)
    ref = dc.merged_decode_attention(
        qg, k_new, v_new, k_c, v_c, mask, D**-0.5
    )
    kq, ksc = dc.quantize_kv(k_c)
    vq, vsc = dc.quantize_kv(v_c)
    out = dc.merged_decode_attention(
        qg, k_new, v_new, kq, vq, mask, D**-0.5,
        k_scale=ksc, v_scale=vsc,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.03, rtol=0.03)


@pytest.mark.parametrize("mod", [gbc, sc2], ids=["gpt_bigcode", "starcoder2"])
def test_greedy_decode_matches_fp32_cache(mod):
    """Prefill + N greedy decode steps over an int8 cache emit the same
    tokens as the fp32-cache path (tiny model, deterministic seed)."""
    cfg = mod.tiny_config()
    params = mod.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.array([[3, 1, 4, 1, 5]])
    embeds = mod.embed_tokens(params, ids)
    N = 6

    def run(dtype):
        cache = mod.init_cache(cfg, 1, ids.shape[1] + N, dtype=dtype)
        logits, cache = mod.forward(
            params, cfg, embeds,
            attention_mask=jnp.ones(ids.shape, jnp.int32),
            cache=cache, policy=F32, last_logits_only=True,
        )
        toks = []
        tok = jnp.argmax(logits[:, -1], -1)
        for _ in range(N):
            toks.append(int(tok[0]))
            e = mod.embed_tokens(params, tok[:, None])
            logits, cache = mod.forward(
                params, cfg, e, attention_mask=jnp.ones((1, 1), jnp.int32),
                cache=cache, policy=F32,
            )
            tok = jnp.argmax(logits[:, -1], -1)
        return toks, cache

    ref, _ = run(jnp.float32)
    out, cache_q = run(jnp.int8)
    assert out == ref
    assert cache_q["k"].dtype == jnp.int8
    assert "k_scale" in cache_q


@pytest.mark.parametrize("mod", [gbc, sc2], ids=["gpt_bigcode", "starcoder2"])
def test_ragged_decode_int8(mod):
    """insert_prefill into an int8 ragged cache + ragged decode steps match
    the linear int8 decode tokens."""
    cfg = mod.tiny_config()
    params = mod.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.array([[3, 1, 4, 1, 5]])
    P_len = ids.shape[1]
    embeds = mod.embed_tokens(params, ids)
    N = 5

    # linear int8 reference
    cache = mod.init_cache(cfg, 1, P_len + N, dtype=jnp.int8)
    logits, cache = mod.forward(
        params, cfg, embeds, attention_mask=jnp.ones(ids.shape, jnp.int32),
        cache=cache, policy=F32, last_logits_only=True,
    )
    ref = []
    tok = jnp.argmax(logits[:, -1], -1)
    for _ in range(N):
        ref.append(int(tok[0]))
        e = mod.embed_tokens(params, tok[:, None])
        logits, cache = mod.forward(
            params, cfg, e, attention_mask=jnp.ones((1, 1), jnp.int32),
            cache=cache, policy=F32,
        )
        tok = jnp.argmax(logits[:, -1], -1)

    # ragged path: small linear prefill -> insert -> ragged steps
    small = mod.init_cache(cfg, 1, P_len, dtype=jnp.int8)
    logits, small = mod.forward(
        params, cfg, embeds, attention_mask=jnp.ones(ids.shape, jnp.int32),
        cache=small, policy=F32, last_logits_only=True,
    )
    ragged = mod.init_ragged_cache(cfg, 2, 32, dtype=jnp.int8)
    ragged = mod.insert_prefill(
        cfg, ragged, small, jnp.asarray(1), jnp.asarray(P_len)
    )
    out = []
    tok = jnp.argmax(logits[:, -1], -1)
    active = jnp.array([0, 1], jnp.int32)
    toks2 = jnp.array([0, int(tok[0])], jnp.int32)
    for _ in range(N):
        out.append(int(toks2[1]))
        lg, ragged = mod.forward_ragged_decode(
            params, cfg, toks2, ragged, active, policy=F32
        )
        toks2 = jnp.argmax(lg, -1).astype(jnp.int32)
    assert out == ref
