"""Primitive layers with an explicit TPU dtype policy.

Policy (mirrors the reference's mixed-precision posture — bf16 everywhere,
fp32 attention softmax and fp16-safe LayerNorm; reference:
starvector/model/gpt_bigcode/modeling_gpt_bigcode.py:61-84 and
starvector/model/image_encoder/clip_model.py:117-124):
  * parameters stored in `param_dtype` (fp32 for training, bf16 for serving)
  * matmuls run in `compute_dtype` (bf16 → MXU) with fp32 accumulation via
    `preferred_element_type`
  * LayerNorm statistics and softmax always accumulate in fp32
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    def cast(self, x: jax.Array) -> jax.Array:
        return x.astype(self.compute_dtype)


# ---------------------------------------------------------------------------
# initializers (match torch defaults used by the reference)
# ---------------------------------------------------------------------------

def maybe_checkpoint(fn, remat):
    """remat: False | True (full per-layer recompute) | "dots" (save matmul
    outputs, recompute only elementwise). Full remat re-runs the forward
    matmuls in the backward, capping useful MFU at 6/8 of the hardware's;
    "dots" spends activation HBM per layer to get those FLOPs back.

    "dots" saves the `dense_out`-tagged residuals (every non-expansion
    `dense` output, tagged AFTER the downcast to compute dtype) rather than
    using XLA's dots_with_no_batch_dims_saveable policy: that policy
    captures the raw fp32 dot accumulator (2x the bytes — OOMs 1B training
    at B=8/S=1024 on a 16 GB chip), while the tagged bf16 tensors carry
    identical information for the backward. Batched attention einsums and
    4x-expansion MLP outputs (`dense_wide_out`) recompute in backward —
    together ~45% of forward matmul FLOPs re-run, vs 100% under full remat,
    for ~1/5 the residual HBM of saving everything.

    "dots_slim" additionally recomputes the attention in-projections
    (the "dense_qkv_out"-tagged outputs, ~12% of layer matmul FLOPs):
    per layer it saves only the two hidden-size-wide outputs (attn out,
    MLP down-proj), ~2/3 the residual HBM of "dots" — the mode that fits
    B=2 at the reference 8192 context where "dots" is ~350 MB over.

    "dots_flash" assumes the module actually runs the flash-attention
    path: its saved set is the MLP down-proj outputs plus the
    "flash_out"/"flash_lse" residuals tagged inside the flash custom-vjp
    forward. On a module that never emits those tags (attn_impl="xla",
    or the vision tower's XLA attention) it silently degenerates to
    saving only "dense_out" — MORE recompute than "dots". Use "dots" or
    "dots_slim" for non-flash modules.

    Unknown string modes raise (a typo like "dots-flash" would otherwise
    silently fall back to full remat and lose the measured ~9%
    long-context throughput win)."""
    if not remat:
        return fn
    if remat == "dots":
        policy = jax.checkpoint_policies.save_only_these_names(
            "dense_out", "dense_qkv_out", "dense_attn_proj_out")
    elif remat == "dots_slim":
        policy = jax.checkpoint_policies.save_only_these_names(
            "dense_out", "dense_attn_proj_out")
    elif remat == "dots_flash":
        # save the MLP down-proj outputs plus the flash attention
        # residuals (out + logsumexp, tagged inside the custom-vjp forward,
        # ops/flash_attention.py::_fp_fwd): the backward then never re-runs
        # the O(S²) forward attention kernel — the dominant recompute at
        # the 8k reference context — while qkv/attn-proj/fc1 matmuls
        # recompute cheaply from the saved stream.
        policy = jax.checkpoint_policies.save_only_these_names(
            "dense_out", "flash_out", "flash_lse")
    elif isinstance(remat, str):
        raise ValueError(
            f"unknown gradient_checkpointing mode {remat!r}; expected "
            "true | false | 'dots' | 'dots_slim' | 'dots_flash'")
    else:
        policy = None
    return jax.checkpoint(fn, policy=policy)


def normal_init(rng, shape, std=0.02, dtype=jnp.float32):
    """Bit-identical to jax.random.normal(rng, shape)·std, spelled as
    uniform+erfinv: on the axon TPU backend the builtin normal primitive
    executes ~10-30x slower than this mathematically identical expansion
    (measured 60 s vs 7.6 s at 100M elements; worse still under vmap)."""
    lo = np.nextafter(np.float32(-1), np.float32(0))
    u = jax.random.uniform(rng, shape, jnp.float32, lo, 1.0)
    w = np.sqrt(2.0).astype(np.float32) * jax.scipy.special.erfinv(u)
    return (w * std).astype(dtype)


def torch_linear_init(rng, fan_in, shape, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound).astype(dtype)


def glorot_init(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, jnp.float32, -limit, limit).astype(dtype)


def make_dense_params(rng, d_in, d_out, *, std=None, dtype=jnp.float32, bias=True):
    """Weights stored as (d_in, d_out) — x @ w, the XLA-friendly layout.

    (HF torch stores Linear weight as (out, in); the checkpoint converter
    transposes — see models/convert.py.)
    """
    k_w, k_b = jax.random.split(rng)
    if std is None:
        w = torch_linear_init(k_w, d_in, (d_in, d_out), dtype)
    else:
        w = normal_init(k_w, (d_in, d_out), std, dtype)
    params = {"kernel": w}
    if bias:
        params["bias"] = jnp.zeros((d_out,), dtype)
    return params


def dense(params, x, policy: DTypePolicy | None = None, tag: str | None = None):
    if "kernel_q" in params:
        from starvector_tpu.ops.quantization import dense_quantized

        compute = policy.compute_dtype if policy is not None else x.dtype
        return dense_quantized(params, x, compute_dtype=compute)
    w = params["kernel"]
    if policy is not None:
        x = x.astype(policy.compute_dtype)
        w = w.astype(policy.compute_dtype)
    y = jnp.einsum("...i,io->...o", x, w, preferred_element_type=jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    # identity outside a checkpoint policy; under remat="dots" this marks the
    # compute-dtype output as the saved residual (see maybe_checkpoint).
    # Expansion matmuls (MLP fc1, 4x hidden) get their own tag: their
    # residuals are 4x the bytes of everything else combined, so "dots"
    # recomputes them instead of saving them. Call sites may override the
    # tag (attention in-projections pass "dense_qkv_out" so "dots_slim"
    # can recompute them — see maybe_checkpoint).
    wide = w.shape[-1] >= 4 * w.shape[0]
    return checkpoint_name(y.astype(x.dtype),
                           tag or ("dense_wide_out" if wide else "dense_out"))


def make_layer_norm_params(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params, x, eps=1e-5):
    """LayerNorm with fp32 statistics regardless of input dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def gelu_tanh(x):
    """gelu_pytorch_tanh — GPTBigCode/StarCoder2 activation."""
    return jax.nn.gelu(x, approximate=True)


def quick_gelu(x):
    """x * sigmoid(1.702 x) — CLIP ViT activation (reference clip_model.py)."""
    return x * jax.nn.sigmoid(1.702 * x)


def swish(x):
    """x * sigmoid(x) — the Adapter activation (reference adapter.py:5-10)."""
    return x * jax.nn.sigmoid(x)
