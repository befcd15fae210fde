"""Decode scaffolding shared by the decoder families.

GPTBigCode (v1, MQA + learned positions) and StarCoder2 (v2, GQA + RoPE)
share everything about cached decoding except the per-layer projections:
cache layout, the analytic merged-softmax attention over (cached ‖ new)
tokens, the small-output layer scan, the per-slot scatter for continuous
batching, and prefill admission. That scaffolding lives here exactly once;
each model module supplies a per-layer callback.

Reference parity: this replaces the per-step `torch.cat` KV growth of the
reference decoder (reference: starvector/model/gpt_bigcode/
modeling_gpt_bigcode.py:265-267, 612-614) with preallocated caches +
`dynamic_update_slice`, and the analytic merge keeps decode to ONE pass over
the cached K/V (the naive variant rewrites the full (L, B, T, …) cache every
step — ~2x HBM traffic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from starvector_tpu.ops.attention import NEG_INF


# ---------------------------------------------------------------------------
# caches
# ---------------------------------------------------------------------------

def init_cache(
    n_layer: int, kv_heads: int, head_dim: int,
    batch: int, max_len: int, dtype=jnp.bfloat16,
) -> dict:
    """Linear cache: one shared write index (ragged prefixes via left-padding
    + kv_mask)."""
    shape = (n_layer, batch, max_len, kv_heads, head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "index": jnp.zeros((), jnp.int32),
        "kv_mask": jnp.zeros((batch, max_len), jnp.int32),
    }


def init_ragged_cache(
    n_layer: int, kv_heads: int, head_dim: int,
    batch: int, max_len: int, dtype=jnp.bfloat16,
) -> dict:
    """Cache with PER-SLOT lengths for continuous batching (serving)."""
    shape = (n_layer, batch, max_len, kv_heads, head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "lengths": jnp.zeros((batch,), jnp.int32),
        "kv_mask": jnp.zeros((batch, max_len), jnp.int32),
    }


def insert_prefill_rows(
    ragged_cache: dict, small_cache: dict, slots: jax.Array, lengths: jax.Array
) -> dict:
    """Admit a prefilled B=k linear cache into k slots of a ragged cache in
    ONE scatter per array (batched admission: k same-bucket prompts prefill
    together, then land together)."""
    T = ragged_cache["k"].shape[2]
    Ts = small_cache["k"].shape[2]
    pad = T - Ts
    k, v, mask = small_cache["k"], small_cache["v"], small_cache["kv_mask"]
    if pad > 0:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    else:
        k, v, mask = k[:, :, :T], v[:, :, :T], mask[:, :T]
    slots = slots.astype(jnp.int32)
    new_k = ragged_cache["k"].at[:, slots].set(
        k.astype(ragged_cache["k"].dtype)
    )
    new_v = ragged_cache["v"].at[:, slots].set(
        v.astype(ragged_cache["v"].dtype)
    )
    new_mask = ragged_cache["kv_mask"].at[slots].set(mask.astype(jnp.int32))
    new_len = ragged_cache["lengths"].at[slots].set(
        lengths.astype(jnp.int32)
    )
    return {"k": new_k, "v": new_v, "lengths": new_len, "kv_mask": new_mask}


def insert_prefill(ragged_cache: dict, small_cache: dict, slot, length) -> dict:
    """Admit a prefilled B=1 linear cache into slot `slot` of a ragged cache."""
    T = ragged_cache["k"].shape[2]
    Ts = small_cache["k"].shape[2]
    pad = T - Ts
    k, v, mask = small_cache["k"], small_cache["v"], small_cache["kv_mask"]
    if pad > 0:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    else:
        k, v, mask = k[:, :, :T], v[:, :, :T], mask[:, :T]
    new_k = jax.lax.dynamic_update_slice(
        ragged_cache["k"], k.astype(ragged_cache["k"].dtype), (0, slot, 0, 0, 0)
    )
    new_v = jax.lax.dynamic_update_slice(
        ragged_cache["v"], v.astype(ragged_cache["v"].dtype), (0, slot, 0, 0, 0)
    )
    new_mask = jax.lax.dynamic_update_slice(
        ragged_cache["kv_mask"], mask.astype(jnp.int32), (slot, 0)
    )
    lengths = jax.lax.dynamic_update_slice(
        ragged_cache["lengths"], length[None].astype(jnp.int32), (slot,)
    )
    return {"k": new_k, "v": new_v, "lengths": lengths, "kv_mask": new_mask}


# ---------------------------------------------------------------------------
# merged-softmax decode attention
# ---------------------------------------------------------------------------

def merged_decode_attention(
    qg: jax.Array,        # (B, Hkv, G, D) query for the new token, grouped
    k_new: jax.Array,     # (B, Hkv, D) new token's key
    v_new: jax.Array,     # (B, Hkv, D) new token's value
    k_cached: jax.Array,  # (B, T, Hkv, D) cache BEFORE the new token
    v_cached: jax.Array,  # (B, T, Hkv, D)
    old_mask: jax.Array,  # (B, T) visibility of cached slots
    scale: float,
) -> jax.Array:
    """One decode step's attention: scores over the cached window are merged
    with the new token's self-score in a single softmax, so the big cache is
    read once and never rewritten inside the layer scan. Returns
    (B, 1, H*D) in k_cached's compute dtype."""
    B, Hkv, G, D = qg.shape
    dt = qg.dtype
    s_c = jnp.einsum(
        "bkgd,btkd->bkgt", qg, k_cached.astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) * scale                     # (B, Hkv, G, T)
    s_c = jnp.where(old_mask[:, None, None, :] > 0, s_c, NEG_INF)
    s_self = jnp.einsum(
        "bkgd,bkd->bkg", qg, k_new.astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) * scale                     # (B, Hkv, G)
    m = jnp.maximum(jnp.max(s_c, axis=-1), s_self)
    p_c = jnp.exp(s_c - m[..., None])
    p_s = jnp.exp(s_self - m)
    denom = jnp.sum(p_c, axis=-1) + p_s
    out = jnp.einsum(
        "bkgt,btkd->bkgd", p_c.astype(dt), v_cached.astype(dt),
        preferred_element_type=jnp.float32,
    )
    out = out + p_s[..., None] * v_new[:, :, None].astype(jnp.float32)
    out = (out / denom[..., None]).astype(dt)
    return out.reshape(B, 1, Hkv * G * D)


# ---------------------------------------------------------------------------
# layer scan + cache writes
# ---------------------------------------------------------------------------

def decode_scan(layers: dict, cache: dict, x: jax.Array, layer_fn):
    """Scan `layer_fn(layer_params, h, k_cached, v_cached) -> (h, k_new,
    v_new)` over the stacked layers. Layers emit only their NEW kv token;
    callers write the (L, B, Hkv, D) stack back in one small update."""
    def body(h, xs):
        layer_p, lk, lv = xs
        h, kn, vn = layer_fn(layer_p, h, lk, lv)
        return h, (kn.astype(cache["k"].dtype), vn.astype(cache["v"].dtype))

    return jax.lax.scan(body, x, (layers, cache["k"], cache["v"]))


def write_new_kv_linear(cache: dict, k_news, v_news, idx) -> dict:
    """Linear cache: one (L, B, 1, Hkv, D) write at the shared index."""
    new_k = jax.lax.dynamic_update_slice(
        cache["k"], k_news[:, :, None], (0, 0, idx, 0, 0)
    )
    new_v = jax.lax.dynamic_update_slice(
        cache["v"], v_news[:, :, None], (0, 0, idx, 0, 0)
    )
    return {"k": new_k, "v": new_v}


def write_new_kv_ragged(cache: dict, k_news, v_news, write_pos) -> tuple:
    """Ragged cache: per-row scatter at each slot's own length."""
    L = cache["k"].shape[0]
    B = write_pos.shape[0]
    layer_ids = jnp.arange(L)[:, None]
    rows = jnp.arange(B)
    ks = cache["k"].at[layer_ids, rows[None, :], write_pos[None, :]].set(k_news)
    vs = cache["v"].at[layer_ids, rows[None, :], write_pos[None, :]].set(v_news)
    return ks, vs


def ragged_step_masks(cache: dict, active: jax.Array, window: int | None):
    """(write_pos, new kv_mask, old-slot visibility mask) for one ragged
    decode step; `window` applies sliding-window visibility (StarCoder2)."""
    B, T = cache["kv_mask"].shape
    rows = jnp.arange(B)
    write_pos = jnp.clip(cache["lengths"], 0, T - 1)
    kv_mask = cache["kv_mask"].at[rows, write_pos].max(active.astype(jnp.int32))
    old_mask = cache["kv_mask"]
    if window is not None:
        slot = jnp.arange(T)[None, :]
        win_lo = (cache["lengths"] - window)[:, None]
        old_mask = old_mask & (slot > win_lo)
    return write_pos, kv_mask, old_mask
