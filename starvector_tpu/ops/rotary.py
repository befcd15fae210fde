"""Rotary position embeddings (RoPE) for the StarCoder2 decoder.

HF Starcoder2 uses the GPT-NeoX rotate-half convention with full-dim rotary
(rope over all head_dim channels, theta from config.rope_theta). Positions are
passed explicitly so cached decode uses absolute positions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_frequencies(head_dim: int, theta: float = 10000.0) -> jax.Array:
    """inv_freq: (head_dim // 2,) fp32."""
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta**exponent)


def rope_cos_sin(positions: jax.Array, inv_freq: jax.Array):
    """positions: (...,) int → cos/sin of shape (..., head_dim)."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (..., D/2)
    angles = jnp.concatenate([angles, angles], axis=-1)           # (..., D)
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    x: jax.Array,          # (B, S, H, D)
    positions: jax.Array,  # (B, S) or (S,)
    inv_freq: jax.Array,
) -> jax.Array:
    cos, sin = rope_cos_sin(positions, inv_freq)  # (B, S, D) or (S, D)
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]  # (B, S, 1, D)
    x32 = x.astype(jnp.float32)
    out = x32 * cos + _rotate_half(x32) * sin
    return out.astype(x.dtype)
