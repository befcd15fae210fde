"""XLA reference attention: MQA/GQA, causal, fp32 softmax, cache-aware.

This is the always-correct baseline path; the Pallas flash-prefill and
KV-decode kernels in ops/flash_attention.py are numerically validated
against it. Semantics match the reference eager/SDPA implementations
(reference: starvector/model/gpt_bigcode/modeling_gpt_bigcode.py:151-226,
506-642): scores scaled by head_dim**-0.5, softmax computed in fp32,
masked positions filled with the dtype min before softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_attention_bias(
    pad_mask: jax.Array | None,  # (B, T_kv) 1 = attend
    q_len: int,
    kv_len: int,
    *,
    q_offset: jax.Array | int = 0,
    causal: bool = True,
    window: int | None = None,
) -> jax.Array:
    """Build an additive (B|1, 1, q_len, kv_len) fp32 bias.

    `q_offset` is the absolute position of the first query row (number of
    already-cached tokens), so the same helper serves full-sequence training,
    chunked prefill, and single-token decode. `window` enables StarCoder2's
    sliding-window attention (key positions < q_pos - window + 1 masked).
    """
    q_pos = q_offset + jnp.arange(q_len)[:, None]          # (q, 1)
    k_pos = jnp.arange(kv_len)[None, :]                    # (1, kv)
    allowed = jnp.ones((q_len, kv_len), dtype=bool)
    if causal:
        allowed &= k_pos <= q_pos
    if window is not None:
        allowed &= k_pos > q_pos - window
    bias = jnp.where(allowed, 0.0, NEG_INF)[None, None]    # (1, 1, q, kv)
    if pad_mask is not None:
        pb = jnp.where(pad_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
        bias = bias + pb
    return bias.astype(jnp.float32)


def multihead_attention(
    q: jax.Array,  # (B, S, H, D)
    k: jax.Array,  # (B, T, Hkv, D)
    v: jax.Array,  # (B, T, Hkv, D)
    bias: jax.Array | None = None,  # (B|1, 1|H, S, T) additive fp32
    *,
    scale: float | None = None,
) -> jax.Array:
    """Grouped-query attention with fp32 softmax. Returns (B, S, H, D)."""
    B, S, H, D = q.shape
    Hkv = k.shape[2]
    assert H % Hkv == 0, (H, Hkv)
    G = H // Hkv
    scale = D**-0.5 if scale is None else scale

    qg = q.reshape(B, S, Hkv, G, D)
    # (B, Hkv, G, S, T) scores, fp32 accumulation on the MXU
    scores = jnp.einsum(
        "bskgd,btkd->bkgst", qg, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * scale
    if bias is not None:
        b = bias
        if b.shape[1] == 1:
            b = b[:, :, None]          # (B, 1, 1, S, T)
        else:
            b = b.reshape(b.shape[0], Hkv, G, S, -1)
        scores = scores + b
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgst,btkd->bskgd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, S, H, D).astype(q.dtype)
