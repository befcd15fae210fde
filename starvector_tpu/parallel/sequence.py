"""Sequence (context) parallelism for long-context training.

The reference has no sequence parallelism at all (SURVEY §5 "Long-context /
sequence parallelism: Absent") — it caps context at 8192/16000 tokens and
leans on flash-attention + MQA to fit one GPU. On TPU we go further: a
`sequence` mesh axis shards every activation's S dimension, so per-device
activation memory AND per-device attention FLOPs scale 1/sp, extending the
trainable context past what one chip holds.

Design: all-gather-KV context parallelism, not ring attention. StarVector's
decoders are MQA (1 KV head) / GQA-4, so the per-layer K/V for a FULL 16k
sequence is only S·Hkv·D·2·2 bytes ≈ 8 MB (1B) — gathering it over ICI is
cheap, while ring attention's pipelined K/V rotation would buy nothing at
this KV size and cost a kernel rewrite. Each device keeps its local query
chunk, all-gathers K/V (+ key mask), and runs the existing Pallas flash
kernel with `q_offset = axis_index * chunk` so causal masking and block
skipping stay exact. The backward differentiates through the same path:
flash's fused Pallas backward produces full-length dk/dv and the all-gather
transposes to a reduce-scatter, both emitted by XLA.

The wrapper is a `jax.shard_map` that is MANUAL over the batch + sequence
axes (the Pallas kernel must see truly local shapes — GSPMD cannot
partition a custom call) and leaves the `tensor` axis manual too, sharding
heads when divisible. It no-ops to the plain trainable flash call when the
ambient mesh has no sequence axis (or size 1), so model code calls it
unconditionally on the training path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from starvector_tpu.ops.flash_attention import flash_prefill_trainable
from starvector_tpu.parallel.mesh import (
    AXIS_SEQUENCE, AXIS_TENSOR, BATCH_AXES, sanitize_for_mesh,
)


def sp_enabled(seq_len: int | None = None) -> bool:
    """True iff the ambient mesh has a sequence axis of size > 1 (and, when
    given, the sequence length divides over it)."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return False
    sp = mesh.shape.get(AXIS_SEQUENCE, 1)
    if sp <= 1:
        return False
    return seq_len is None or seq_len % sp == 0


def sp_flash_attention(
    q: jax.Array,        # (B, S, H, D)
    k: jax.Array,        # (B, S, Hkv, D)
    v: jax.Array,        # (B, S, Hkv, D)
    kv_mask: jax.Array,  # (B, S) 1 = valid key
    *,
    causal: bool = True,
    window: int | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Training flash attention, sequence-parallel when the mesh asks for it.

    Equivalent to `flash_prefill_trainable(q, k, v, kv_mask)` numerically;
    under a mesh with `sequence > 1` the S dimension is computed chunk-local
    with all-gathered K/V.
    """
    if not sp_enabled(q.shape[1]):
        return flash_prefill_trainable(q, k, v, kv_mask, 0, causal, window,
                                       scale)

    mesh = jax.sharding.get_abstract_mesh()
    qspec = sanitize_for_mesh(
        P(BATCH_AXES, AXIS_SEQUENCE, AXIS_TENSOR, None), q.shape, mesh
    )
    kvspec = sanitize_for_mesh(
        P(BATCH_AXES, AXIS_SEQUENCE, AXIS_TENSOR, None), k.shape, mesh
    )
    # the key mask is layer-invariant: declare it sequence-REPLICATED in the
    # region (the one reshard hoists out of the layer scan) instead of
    # re-all-gathering it inside every layer's call
    mspec = sanitize_for_mesh(P(BATCH_AXES, None), kv_mask.shape, mesh)
    if AXIS_SEQUENCE not in jax.tree_util.tree_leaves(
        [list(qspec), list(kvspec)]
    ):
        # sanitize dropped the axis (indivisible S) — run unsharded
        return flash_prefill_trainable(q, k, v, kv_mask, 0, causal, window,
                                       scale)

    def inner(q, k, v, m):
        k_full = jax.lax.all_gather(k, AXIS_SEQUENCE, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v, AXIS_SEQUENCE, axis=1, tiled=True)
        off = jax.lax.axis_index(AXIS_SEQUENCE) * q.shape[1]
        return flash_prefill_trainable(q, k_full, v_full, m, off,
                                       causal, window, scale)

    manual = {
        ax
        for spec in (qspec, kvspec)
        for entry in spec
        for ax in ((entry,) if isinstance(entry, str)
                   else (entry or ()))
    } | {AXIS_SEQUENCE}
    return jax.shard_map(
        inner,
        in_specs=(qspec, kvspec, kvspec, mspec),
        out_specs=qspec,
        axis_names=manual,
        check_vma=False,
    )(q, k, v, kv_mask)
