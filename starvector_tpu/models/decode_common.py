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

def quantize_kv(x: jax.Array):
    """Per-token-per-head symmetric int8: x (..., D) → (int8, fp32 scale
    (...,)). The scale axis is D, so dequantization folds into the
    (T)-sized score/probability tensors, never the (T, D) payload."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.round(x.astype(jnp.float32) / scale[..., None]).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    return (q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)
            ).astype(dtype)


def _maybe_scales(shape, dtype) -> dict:
    """int8 caches carry per-(layer, batch, position, head) fp32 scales —
    ~1.5% of the int8 payload at D=256."""
    if dtype == jnp.int8:
        return {
            "k_scale": jnp.zeros(shape[:-1], jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], jnp.float32),
        }
    return {}


def init_cache(
    n_layer: int, kv_heads: int, head_dim: int,
    batch: int, max_len: int, dtype=jnp.bfloat16,
) -> dict:
    """Linear cache: one shared write index (ragged prefixes via left-padding
    + kv_mask). dtype=jnp.int8 stores K/V quantized (halved decode-step HBM
    traffic vs bf16; quality-checked opt-in)."""
    shape = (n_layer, batch, max_len, kv_heads, head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "index": jnp.zeros((), jnp.int32),
        "kv_mask": jnp.zeros((batch, max_len), jnp.int32),
        **_maybe_scales(shape, dtype),
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
        **_maybe_scales(shape, dtype),
    }


def insert_prefill_rows(
    ragged_cache: dict, small_cache: dict, slots: jax.Array, lengths: jax.Array
) -> dict:
    """Admit a prefilled B=k linear cache into k slots of a ragged cache in
    ONE scatter per array (batched admission: k same-bucket prompts prefill
    together, then land together)."""
    T = ragged_cache["k"].shape[2]
    Ts = small_cache["k"].shape[2]
    if small_cache["k"].dtype != ragged_cache["k"].dtype:
        raise ValueError(
            f"prefill cache dtype {small_cache['k'].dtype} != ragged cache "
            f"dtype {ragged_cache['k'].dtype}: casting int8 codes as values "
            f"(or dropping scales) would silently corrupt the admitted rows"
        )
    slots = slots.astype(jnp.int32)
    out = {}
    for key in _payload_keys(ragged_cache):
        arr = _fit_time_axis(small_cache[key], T, Ts, time_axis=2)
        out[key] = ragged_cache[key].at[:, slots].set(
            arr.astype(ragged_cache[key].dtype)
        )
    mask = _fit_time_axis(small_cache["kv_mask"], T, Ts, time_axis=1)
    out["kv_mask"] = ragged_cache["kv_mask"].at[slots].set(
        mask.astype(jnp.int32)
    )
    out["lengths"] = ragged_cache["lengths"].at[slots].set(
        lengths.astype(jnp.int32)
    )
    return out


def insert_prefill(ragged_cache: dict, small_cache: dict, slot, length) -> dict:
    """Admit a prefilled B=1 linear cache into slot `slot` of a ragged
    cache (the single-row case of insert_prefill_rows)."""
    return insert_prefill_rows(
        ragged_cache, small_cache,
        jnp.asarray(slot, jnp.int32)[None],
        jnp.asarray(length, jnp.int32)[None],
    )


def write_prefill_kv(
    layer_cache: dict, k: jax.Array, v: jax.Array, cache_index, dtype
) -> tuple[jax.Array, jax.Array, dict]:
    """Write one prefill chunk's (B, S, Hkv, D) K/V into a per-layer cache
    at `cache_index` and return (k_window, v_window, new_layer_cache) where
    the windows cover the WHOLE cache so far, in compute dtype. int8 caches
    quantize on write and dequantize the running window for the (compute-
    bound) prefill attention — decode never materializes a dequantized
    window (see merged_decode_attention)."""
    if layer_cache["k"].dtype == jnp.int8:
        kq, ksc = quantize_kv(k)
        vq, vsc = quantize_kv(v)
        ck = jax.lax.dynamic_update_slice(
            layer_cache["k"], kq, (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            layer_cache["v"], vq, (0, cache_index, 0, 0))
        cks = jax.lax.dynamic_update_slice(
            layer_cache["k_scale"], ksc, (0, cache_index, 0))
        cvs = jax.lax.dynamic_update_slice(
            layer_cache["v_scale"], vsc, (0, cache_index, 0))
        new_cache = {"k": ck, "v": cv, "k_scale": cks, "v_scale": cvs}
        return (dequantize_kv(ck, cks, dtype),
                dequantize_kv(cv, cvs, dtype), new_cache)
    ck = jax.lax.dynamic_update_slice(
        layer_cache["k"], k.astype(layer_cache["k"].dtype),
        (0, cache_index, 0, 0)
    )
    cv = jax.lax.dynamic_update_slice(
        layer_cache["v"], v.astype(layer_cache["v"].dtype),
        (0, cache_index, 0, 0)
    )
    return ck.astype(dtype), cv.astype(dtype), {"k": ck, "v": cv}


def _payload_keys(cache: dict) -> tuple[str, ...]:
    """Per-(layer, slot, position) cache arrays, incl. int8 scales."""
    return tuple(
        k for k in ("k", "v", "k_scale", "v_scale") if k in cache
    )


def _fit_time_axis(arr: jax.Array, T: int, Ts: int, *, time_axis: int):
    """Right-pad (or crop) a prefilled array's time axis to the ragged
    cache's max_len."""
    if T > Ts:
        pads = [(0, 0)] * arr.ndim
        pads[time_axis] = (0, T - Ts)
        return jnp.pad(arr, pads)
    idx = [slice(None)] * arr.ndim
    idx[time_axis] = slice(0, T)
    return arr[tuple(idx)]


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
    k_scale: jax.Array | None = None,  # (B, T, Hkv) int8-cache dequant scales
    v_scale: jax.Array | None = None,  # (B, T, Hkv)
) -> jax.Array:
    """One decode step's attention: scores over the cached window are merged
    with the new token's self-score in a single softmax, so the big cache is
    read once and never rewritten inside the layer scan. Returns
    (B, 1, H*D) in k_cached's compute dtype.

    int8 caches: the per-(position, head) scales fold into the (T)-sized
    score/probability tensors — the (T, D) int8 payload feeds the einsums
    directly (XLA converts inline as a matmul producer), so the step's HBM
    traffic really is the int8 bytes."""
    B, Hkv, G, D = qg.shape
    dt = qg.dtype
    s_c = jnp.einsum(
        "bkgd,btkd->bkgt", qg, k_cached.astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) * scale                     # (B, Hkv, G, T)
    if k_scale is not None:
        s_c = s_c * jnp.transpose(k_scale, (0, 2, 1))[:, :, None, :]
    s_c = jnp.where(old_mask[:, None, None, :] > 0, s_c, NEG_INF)
    s_self = jnp.einsum(
        "bkgd,bkd->bkg", qg, k_new.astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) * scale                     # (B, Hkv, G)
    m = jnp.maximum(jnp.max(s_c, axis=-1), s_self)
    p_c = jnp.exp(s_c - m[..., None])
    p_s = jnp.exp(s_self - m)
    denom = jnp.sum(p_c, axis=-1) + p_s
    pv = p_c
    if v_scale is not None:
        pv = p_c * jnp.transpose(v_scale, (0, 2, 1))[:, :, None, :]
    out = jnp.einsum(
        "bkgt,btkd->bkgd", pv.astype(dt), v_cached.astype(dt),
        preferred_element_type=jnp.float32,
    )
    out = out + p_s[..., None] * v_new[:, :, None].astype(jnp.float32)
    out = (out / denom[..., None]).astype(dt)
    return out.reshape(B, 1, Hkv * G * D)


def merged_verify_attention(
    qg: jax.Array,        # (B, Hkv, G, W, D) queries for the draft chunk
    k_new: jax.Array,     # (B, W, Hkv, D) the chunk's keys
    v_new: jax.Array,     # (B, W, Hkv, D)
    k_cached: jax.Array,  # (B, T, Hkv, D) cache BEFORE the chunk
    v_cached: jax.Array,  # (B, T, Hkv, D)
    old_mask: jax.Array,  # (B, T) or per-query (B, W, T) cached visibility
    scale: float,
    k_scale: jax.Array | None = None,  # (B, T, Hkv) int8-cache dequant scales
    v_scale: jax.Array | None = None,  # (B, T, Hkv)
    new_mask: jax.Array | None = None,  # (B, W) 1 = chunk token is real
) -> jax.Array:
    """W-query generalization of merged_decode_attention for speculative
    verification: each of the W chunk queries attends to the cached window
    plus the chunk's own tokens causally (query w sees chunk keys u ≤ w),
    in ONE merged softmax, without writing the chunk into the cache first
    (chunk keys stay in compute dtype — same numerics as the W=1 decode
    path). `new_mask` hides padded chunk keys from real queries (chunked
    prefill of left-padded prompts). Returns (B, W, H*D)."""
    B, Hkv, G, W, D = qg.shape
    dt = qg.dtype
    s_c = jnp.einsum(
        "bkgwd,btkd->bkgwt", qg, k_cached.astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) * scale                     # (B, Hkv, G, W, T)
    if k_scale is not None:
        s_c = s_c * jnp.transpose(k_scale, (0, 2, 1))[:, :, None, None, :]
    om = (old_mask[:, None, None, None, :] if old_mask.ndim == 2
          else old_mask[:, None, None, :, :])
    s_c = jnp.where(om > 0, s_c, NEG_INF)
    s_n = jnp.einsum(
        "bkgwd,bukd->bkgwu", qg, k_new.astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) * scale                     # (B, Hkv, G, W, W)
    tri = (jnp.arange(W)[:, None] >= jnp.arange(W)[None, :])
    allowed_n = tri[None, None, None]
    if new_mask is not None:
        nm = (new_mask > 0)
        nm = (nm[:, None, None, None, :] if nm.ndim == 2       # (B, Wk)
              else nm[:, None, None, :, :])                    # (B, Wq, Wk)
        allowed_n = jnp.logical_and(allowed_n, nm)
    s_n = jnp.where(allowed_n, s_n, NEG_INF)
    m = jnp.maximum(jnp.max(s_c, axis=-1), jnp.max(s_n, axis=-1))
    p_c = jnp.exp(s_c - m[..., None])
    p_n = jnp.exp(s_n - m[..., None])
    denom = jnp.sum(p_c, axis=-1) + jnp.sum(p_n, axis=-1)
    if v_scale is not None:
        p_c = p_c * jnp.transpose(v_scale, (0, 2, 1))[:, :, None, None, :]
    out = jnp.einsum(
        "bkgwt,btkd->bkgwd", p_c.astype(dt), v_cached.astype(dt),
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "bkgwu,bukd->bkgwd", p_n.astype(jnp.float32),
        v_new.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out = (out / denom[..., None]).astype(dt)
    # (B, Hkv, G, W, D) → (B, W, H*D), head-major like the decode path
    return jnp.moveaxis(out, 3, 1).reshape(B, W, Hkv * G * D)


# ---------------------------------------------------------------------------
# layer scan + cache writes
# ---------------------------------------------------------------------------

def decode_scan(layers: dict, cache: dict, x: jax.Array, layer_fn):
    """Scan `layer_fn(layer_params, h, k_cached, v_cached[, k_scale,
    v_scale]) -> (h, k_new, v_new)` over the stacked layers. Layers emit
    only their NEW kv token; callers write the (L, B, Hkv, D) stack back in
    one small update. int8 caches additionally scan the per-layer scale
    slices and quantize the emitted token. Returns (h, news) where news is
    a dict of per-key (L, B, ...) new-token stacks."""
    quant = "k_scale" in cache

    if quant:
        def body(h, xs):
            layer_p, lk, lv, lks, lvs = xs
            h, kn, vn = layer_fn(layer_p, h, lk, lv, lks, lvs)
            kq, ks = quantize_kv(kn)
            vq, vs = quantize_kv(vn)
            return h, {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs}

        return jax.lax.scan(
            body, x,
            (layers, cache["k"], cache["v"],
             cache["k_scale"], cache["v_scale"]),
        )

    def body(h, xs):
        layer_p, lk, lv = xs
        h, kn, vn = layer_fn(layer_p, h, lk, lv)
        return h, {"k": kn.astype(cache["k"].dtype),
                   "v": vn.astype(cache["v"].dtype)}

    return jax.lax.scan(body, x, (layers, cache["k"], cache["v"]))


def write_new_kv_linear(cache: dict, news: dict, idx) -> dict:
    """Linear cache: one (L, B, 1, Hkv[, D]) write per key at the shared
    index."""
    out = {}
    for key, new in news.items():
        start = (0, 0, idx, 0, 0)[: new.ndim + 1]
        out[key] = jax.lax.dynamic_update_slice(
            cache[key], new[:, :, None].astype(cache[key].dtype), start
        )
    return out


def write_new_kv_linear_multi(cache: dict, news: dict, idx) -> dict:
    """Linear cache: one (L, B, W, Hkv[, D]) chunk write per key at the
    shared index (multi-token generalization of write_new_kv_linear)."""
    out = {}
    for key, new in news.items():
        start = (0, 0, idx, 0, 0)[: new.ndim]
        out[key] = jax.lax.dynamic_update_slice(
            cache[key], new.astype(cache[key].dtype), start
        )
    return out


def write_new_kv_ragged(cache: dict, news: dict, write_pos) -> dict:
    """Ragged cache: per-row scatter at each slot's own length."""
    L = cache["k"].shape[0]
    B = write_pos.shape[0]
    layer_ids = jnp.arange(L)[:, None]
    rows = jnp.arange(B)
    return {
        key: cache[key]
        .at[layer_ids, rows[None, :], write_pos[None, :]]
        .set(new.astype(cache[key].dtype))
        for key, new in news.items()
    }


def write_new_kv_ragged_multi(
    cache: dict, news: dict, write_pos: jax.Array
) -> dict:
    """Ragged cache: scatter a W-token chunk per slot at positions
    `write_pos` (B, W). news values are (L, B, W, Hkv[, D])."""
    L = cache["k"].shape[0]
    B, W = write_pos.shape
    li = jnp.arange(L)[:, None, None]
    rows = jnp.arange(B)[None, :, None]
    return {
        key: cache[key]
        .at[li, rows, write_pos[None]]
        .set(new.astype(cache[key].dtype))
        for key, new in news.items()
    }


def commit_verify(cache: dict, n_commit: jax.Array) -> dict:
    """After speculative verification: advance each slot's length by its
    accepted-token count and mark exactly those slots visible. Rejected
    draft positions stay masked (and are overwritten by later writes)."""
    B, T = cache["kv_mask"].shape
    lengths = cache["lengths"]
    new_len = jnp.minimum(lengths + n_commit.astype(jnp.int32), T)
    slot = jnp.arange(T)[None, :]
    kv_mask = jnp.where(
        (slot >= lengths[:, None]) & (slot < new_len[:, None]),
        1, cache["kv_mask"],
    )
    out = dict(cache)
    out["lengths"] = new_len
    out["kv_mask"] = kv_mask
    return out


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
