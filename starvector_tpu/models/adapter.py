"""Adapter (vision→LLM projector) — JAX.

Parity target (reference: starvector/model/adapters/adapter.py:12-53):
  Dropout(p) -> Linear(d -> 2d) -> Swish -> Linear(2d -> llm_d) -> Norm
where Norm is either
  * `layer_norm`: torch nn.LayerNorm([query_length, llm_d]) — normalizes
    over the LAST TWO dims jointly with a (Q, llm_d) affine (8B default), or
  * `batch_norm`: torch nn.BatchNorm1d(query_length) — per-query-index
    statistics over (batch, feature) with running stats (1B default,
    configs/models/starvector-1b/im2svg-stack.yaml:13).
Init: glorot (xavier_uniform) weights, zero bias (:41-53).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from starvector_tpu.ops.layers import (
    DTypePolicy,
    dense,
    glorot_init,
    make_dense_params,
    swish,
)


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    input_size: int          # vision hidden size
    output_size: int         # llm hidden size
    query_length: int        # number of visual tokens (257 clip / 576 siglip)
    adapter_norm: str = "layer_norm"  # "layer_norm" | "batch_norm"
    dropout_prob: float = 0.1
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1


def init_params(cfg: AdapterConfig, rng: jax.Array, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    d = cfg.input_size
    params = {
        "c_fc": {
            "kernel": glorot_init(k1, (d, 2 * d), dtype),
            "bias": jnp.zeros((2 * d,), dtype),
        },
        "c_proj": {
            "kernel": glorot_init(k2, (2 * d, cfg.output_size), dtype),
            "bias": jnp.zeros((cfg.output_size,), dtype),
        },
    }
    if cfg.adapter_norm == "layer_norm":
        params["norm"] = {
            "scale": jnp.ones((cfg.query_length, cfg.output_size), dtype),
            "bias": jnp.zeros((cfg.query_length, cfg.output_size), dtype),
        }
    elif cfg.adapter_norm == "batch_norm":
        params["norm"] = {
            "scale": jnp.ones((cfg.query_length,), dtype),
            "bias": jnp.zeros((cfg.query_length,), dtype),
            # running stats are non-trainable state, carried in the tree
            "running_mean": jnp.zeros((cfg.query_length,), jnp.float32),
            "running_var": jnp.ones((cfg.query_length,), jnp.float32),
        }
    else:
        raise ValueError(f"unknown adapter_norm {cfg.adapter_norm!r}")
    return params


def partition_rules() -> list[tuple[str, P]]:
    return [
        (r"c_fc/kernel", P("fsdp", "tensor")),
        (r"c_fc/bias", P("tensor")),
        (r"c_proj/kernel", P("tensor", "fsdp")),
        (r"c_proj/bias", P(None)),
        (r"norm/", P(None, None)),
    ]


def _layer_norm_2d(p, x, eps=1e-5):
    """LayerNorm over the last two dims (torch LayerNorm([Q, D]) semantics)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(-2, -1), keepdims=True)
    var = jnp.var(x32, axis=(-2, -1), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _batch_norm_1d(p, x, cfg: AdapterConfig, train: bool):
    """torch BatchNorm1d(Q) on (B, Q, D): per-query-channel stats over
    (batch, feature). Inference uses running stats; training returns batch
    stats (running-stat update handled by `batch_norm_new_stats`)."""
    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=(0, 2))
        var = jnp.var(x32, axis=(0, 2))
    else:
        mean, var = p["running_mean"], p["running_var"]
    y = (x32 - mean[None, :, None]) * jax.lax.rsqrt(var[None, :, None] + cfg.bn_eps)
    y = y * p["scale"].astype(jnp.float32)[None, :, None] + p["bias"].astype(jnp.float32)[None, :, None]
    return y.astype(x.dtype)


def batch_norm_new_stats(p, x, cfg: AdapterConfig) -> dict:
    """New running stats after observing batch `x` (momentum update, torch
    convention: new = (1-m)*old + m*batch, unbiased var for running)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 2))
    n = x32.shape[0] * x32.shape[2]
    var = jnp.var(x32, axis=(0, 2)) * (n / max(n - 1, 1))
    m = cfg.bn_momentum
    return {
        "running_mean": (1 - m) * p["running_mean"] + m * mean,
        "running_var": (1 - m) * p["running_var"] + m * var,
    }


def forward_with_stats(
    params: dict,
    cfg: AdapterConfig,
    x: jax.Array,
    *,
    policy: DTypePolicy = DTypePolicy(),
    dropout_rng: jax.Array | None = None,
):
    """Training-mode forward for batch_norm adapters: returns (out, new
    running stats to merge into params['norm'])."""
    if dropout_rng is not None and cfg.dropout_prob > 0:
        keep = jax.random.bernoulli(dropout_rng, 1 - cfg.dropout_prob, x.shape)
        x = jnp.where(keep, x / (1 - cfg.dropout_prob), 0)
    h = dense(params["c_fc"], policy.cast(x), policy)
    h = swish(h)
    h = dense(params["c_proj"], h, policy)
    if cfg.adapter_norm == "layer_norm":
        return _layer_norm_2d(params["norm"], h), {}
    out = _batch_norm_1d(params["norm"], h, cfg, train=True)
    return out, batch_norm_new_stats(params["norm"], h, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "policy", "train"))
def forward(
    params: dict,
    cfg: AdapterConfig,
    x: jax.Array,  # (B, Q, input_size)
    *,
    policy: DTypePolicy = DTypePolicy(),
    train: bool = False,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    if train and dropout_rng is not None and cfg.dropout_prob > 0:
        keep = jax.random.bernoulli(dropout_rng, 1 - cfg.dropout_prob, x.shape)
        x = jnp.where(keep, x / (1 - cfg.dropout_prob), 0)
    h = dense(params["c_fc"], policy.cast(x), policy)
    h = swish(h)
    h = dense(params["c_proj"], h, policy)
    if cfg.adapter_norm == "layer_norm":
        return _layer_norm_2d(params["norm"], h)
    return _batch_norm_1d(params["norm"], h, cfg, train)


def from_torch_state_dict(sd, cfg: AdapterConfig, dtype=jnp.float32, prefix: str = "") -> dict:
    import numpy as np

    g = lambda n: np.array(sd[prefix + n])  # copy: source may alias torch buffers
    params = {
        "c_fc": {
            "kernel": jnp.asarray(np.ascontiguousarray(g("c_fc.weight").T), dtype=dtype),
            "bias": jnp.asarray(g("c_fc.bias"), dtype=dtype),
        },
        "c_proj": {
            "kernel": jnp.asarray(np.ascontiguousarray(g("c_proj.weight").T), dtype=dtype),
            "bias": jnp.asarray(g("c_proj.bias"), dtype=dtype),
        },
    }
    norm = {
        "scale": jnp.asarray(g("norm.weight"), dtype=dtype),
        "bias": jnp.asarray(g("norm.bias"), dtype=dtype),
    }
    if cfg.adapter_norm == "batch_norm":
        norm["running_mean"] = jnp.asarray(g("norm.running_mean"), jnp.float32)
        norm["running_var"] = jnp.asarray(g("norm.running_var"), jnp.float32)
    params["norm"] = norm
    return params
