"""Weight-only int8 quantization for the decode hot path.

Decode throughput on a single chip is bounded by streaming the weights from
HBM every step (SURVEY.md §6 north star: tokens/sec/chip). Symmetric
per-output-channel int8 halves that traffic vs bf16. Activations stay bf16;
dequantization happens in VMEM inside a fused Pallas matmul so the bf16
weights never touch HBM.

  * `quantize_dense(p)` — {"kernel": (K,N)} → {"kernel_q": int8,
    "scale": (N,) f32 [, "bias"]}
  * `quantize_tree(params)` — quantize every dense leaf above a size
    threshold (embeddings included); LayerNorms/biases untouched
  * `ops.layers.dense` dispatches on "kernel_q" so all model code works
    unchanged with a quantized tree
  * `quant_matmul` — Pallas kernel (int8 weights → VMEM → dequant → MXU);
    XLA dequant-einsum fallback on CPU/interpret
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_dense(p: dict) -> dict:
    """Per-output-channel symmetric int8 of p['kernel'] (K, N). Runs
    on-device via the jitted kernel — pulling GB-scale weights to host
    first is slow."""
    q, scale = _quantize_2d_keep(p["kernel"])
    out = {"kernel_q": q, "scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def _quantize_2d_impl(w):
    w32 = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=0) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quantize_stacked_impl(w):
    """(L, K, N) → per-layer per-channel int8. lax.map over the layer axis
    keeps the fp32 transient to ONE layer's (K, N) — a stacked 7B c_fc is
    5.4 GB bf16, so a whole-leaf fp32 cast (10.9 GB) OOMs a 16 GB chip."""

    def one(w_l):
        w32 = jnp.asarray(w_l, jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=0) / 127.0, 1e-12)
        q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    return jax.lax.map(one, w)


# donating variants reuse the source kernel's HBM (required near the limit);
# the non-donating ones keep it valid for callers that still need bf16
# (consume=False) — donation alone would invalidate the input buffer even
# though Python kept a reference.
_quantize_2d = jax.jit(_quantize_2d_impl, donate_argnums=(0,))
_quantize_stacked = jax.jit(_quantize_stacked_impl, donate_argnums=(0,))
_quantize_2d_keep = jax.jit(_quantize_2d_impl)
_quantize_stacked_keep = jax.jit(_quantize_stacked_impl)


def quantize_tree(params, min_elems: int = 1 << 16, *, consume: bool = True):
    """Quantize every {'kernel': ...} dict with enough elements; leaves the
    rest (LN, small projections) untouched. Works on stacked (L, K, N)
    layer weights too (per-layer, per-channel scales via lax.map — one
    layer's fp32 transient, not the whole stack).

    Memory-safe for models near the HBM limit (`consume=True`, default):
    each source kernel's device buffer is EXPLICITLY freed as soon as its
    int8 replacement materializes. JAX dispatch is async — without the
    per-leaf sync+delete, a 7B bf16 tree (14.4 GB) and its int8 copy
    (7.3 GB) coexist in HBM and OOM a 16 GB chip even though the Python
    references look clean. The input tree's kernels become unusable."""

    def rec(node):
        if isinstance(node, dict):
            if "kernel" in node and hasattr(node["kernel"], "shape"):
                w = node["kernel"]
                if w.size >= min_elems and w.ndim in (2, 3):
                    if consume:
                        quant = _quantize_2d if w.ndim == 2 else _quantize_stacked
                    else:
                        quant = (_quantize_2d_keep if w.ndim == 2
                                 else _quantize_stacked_keep)
                    node = dict(node)
                    w = node.pop("kernel")  # drop the tree's reference
                    q, scale = quant(w)
                    if consume and hasattr(w, "delete"):
                        jax.block_until_ready(q)
                        try:
                            w.delete()
                        except Exception:  # noqa: BLE001 — e.g. np.ndarray input
                            pass
                    out = {"kernel_q": q, "scale": scale}
                    if "bias" in node:
                        out["bias"] = node["bias"]
                    return out
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(params)


# ---------------------------------------------------------------------------
# fused dequant matmul kernel
# ---------------------------------------------------------------------------

def _qmm_kernel(x_ref, wq_ref, scale_ref, o_ref, acc_scr, *, block_n, block_k):
    j = pl.program_id(2)   # K blocks (innermost: accumulate)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[:]                       # (M, bk) bf16
    w = wq_ref[:].astype(jnp.bfloat16)  # (bk, bn) dequant in VMEM
    acc_scr[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[:] = (acc_scr[:] * scale_ref[0, :][None, :]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "interpret", "out_dtype")
)
def quant_matmul(
    x: jax.Array,        # (M, K) bf16/f32
    w_q: jax.Array,      # (K, N) int8
    scale: jax.Array,    # (N,) f32
    *,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool | None = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, K = x.shape
    N = w_q.shape[1]
    block_k = min(block_k, K)
    block_n = min(block_n, N)
    block_m = min(256, max(8, M))
    k_pad = (-K) % block_k
    n_pad = (-N) % block_n
    m_pad = (-M) % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    if k_pad:
        x = jnp.pad(x, ((0, 0), (0, k_pad)))
        w_q = jnp.pad(w_q, ((0, k_pad), (0, 0)))
    if n_pad:
        w_q = jnp.pad(w_q, ((0, 0), (0, n_pad)))
        scale = jnp.pad(scale, ((0, n_pad),))
    Mp, Kp, Np = x.shape[0], K + k_pad, N + n_pad

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, block_n=block_n, block_k=block_k),
        grid=(Mp // block_m, Np // block_n, Kp // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda m, i, j: (m, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda m, i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda m, i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, i, j: (m, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        interpret=interpret,
    )(x, w_q, scale[None, :])
    return out[:M, :N]


def dense_quantized(
    p: dict, x: jax.Array, compute_dtype=jnp.bfloat16,
    use_pallas: bool = False,
) -> jax.Array:
    """Drop-in quantized dense: (..., K) @ int8(K, N) * scale + bias.

    Default path is the XLA dequant-einsum: the int8→bf16 convert fuses as a
    producer into the matmul, and measured on v5e it beats the hand-written
    Pallas kernel at BOTH 7B decode (12 vs 26 ms/step, ~81% of the HBM roof)
    and prefill (0.91 vs 1.23 s at B=8/S=1024). `use_pallas=True` keeps the
    explicit VMEM-dequant kernel available for experimentation."""
    orig_shape = x.shape
    K = orig_shape[-1]
    x2 = x.reshape(-1, K).astype(compute_dtype)
    if use_pallas and jax.default_backend() not in ("cpu",):
        y = quant_matmul(x2, p["kernel_q"], p["scale"], out_dtype=jnp.float32)
    else:
        w = p["kernel_q"].astype(compute_dtype) * p["scale"].astype(compute_dtype)
        y = jnp.einsum("mk,kn->mn", x2, w, preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    # match the unquantized dense(): with a compute dtype the output is in
    # compute dtype, not the caller's input dtype (mixed trees would
    # otherwise emit fp32 from quantized layers and bf16 from plain ones)
    return y.astype(x2.dtype).reshape(*orig_shape[:-1], -1)
