"""Pipeline parallelism over the stacked decoder layers (training path).

The reference has no pipeline parallelism (SURVEY §2.7: PP absent, "not
required for parity; optional") — this is a TPU-first extension that
completes the dp/fsdp/tp/sp/pp parallelism set.

Because the decoders already stack their layers on a leading axis and run
them with `lax.scan`, pipelining falls out naturally: shard the LAYER axis
over a `stage` mesh axis (each device holds L/P contiguous layers), split
the local batch into microbatches, and run the classic GPipe schedule as a
`lax.scan` over `T = n_micro + P - 1` ticks inside a `jax.shard_map`:

  tick t: stage 0 ingests microbatch t; every stage runs its layer block on
          its current buffer; `ppermute` rotates buffers stage i -> i+1;
          the last stage's outputs from ticks P-1..T-1 are microbatches
          0..n_micro-1 in order (masked + psum'd back to every stage — the
          psum moves exactly one output-sized tensor, the broadcast cost).

SPMD makes the bubble explicit: inactive stages execute the same layer
block on garbage and the result is masked out — the (P-1)/T idle fraction
is the usual GPipe bubble, shrunk by raising `n_micro`. The backward pass
needs no hand-written schedule: `lax.scan` reverses the ticks and
`ppermute` transposes to the reverse rotation, which IS the backward
pipeline.

The region is manual over (stage, batch) so the Pallas flash kernel sees
local shapes; the `tensor` axis stays auto (GSPMD partitions the dense
matmuls inside as usual). ZeRO/FSDP is preserved THROUGH the manual
region: when the caller passes its partition rules, stage-local weights
enter the region still fsdp-sharded and each layer's shard is all-gathered
only at use inside the scan body (gather transposes to reduce-scatter on
the grads) — one layer's full weights live at a time, exactly like the
plain GSPMD scan. Falls back to the plain layer scan when the mesh has no
stage axis, when L or the batch doesn't divide, or when microbatching is
impossible.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from starvector_tpu.ops.layers import maybe_checkpoint
from starvector_tpu.parallel.mesh import (
    AXIS_SEQUENCE, AXIS_STAGE, AXIS_TENSOR, BATCH_AXES,
)


def _plain_scan(layers, x, arrays, body_fn, remat):
    def sbody(h, layer_p):
        return body_fn(h, layer_p, arrays), None

    f = maybe_checkpoint(sbody, remat)
    h, _ = jax.lax.scan(f, x, layers)
    return h


def _manual_weight_specs(layers, rules, mesh, manual):
    """Per-leaf (in_spec restricted to manual axes, gather plan).

    The in_spec keeps `stage` plus any manual axis the partition rules put
    on the leaf (fsdp), so weights enter the region without resharding;
    the gather plan says which dims to all-gather inside, at use. Axes not
    in the manual set (tensor) are dropped from the spec — they stay auto.
    """
    from starvector_tpu.parallel.sharding import apply_partition_rules

    specs = apply_partition_rules({"layers": layers}, rules, mesh)["layers"]

    def strip(spec, leaf):
        in_entries = []
        gathers = []  # (dim_in_scan_slice, axis_name)
        for dim, entry in enumerate(tuple(spec)):
            names = ((entry,) if isinstance(entry, str) else tuple(entry or ()))
            kept = tuple(n for n in names if n in manual)
            if dim == 0:
                # the stacked-layer dim is consumed by the stage scan;
                # every leaf enters stage-sharded here and ONLY
                # stage-sharded — a non-stage manual axis on dim 0 (a rule
                # without a leading "stage" entry) can't ride in (its
                # gather would target the nonexistent dim -1 of the
                # per-layer slice), so it resharding-drops on entry
                in_entries.append((AXIS_STAGE,))
                continue
            in_entries.append(kept if kept else None)
            for n in kept:
                if n != AXIS_STAGE:
                    # dim 0 is the stacked-layer axis consumed by the scan
                    gathers.append((dim - 1, n))
        # every stacked leaf MUST enter stage-sharded on dim 0 — a leaf the
        # rules left unsharded would otherwise arrive with all L entries
        # and break the local scan's shape agreement
        while len(in_entries) < getattr(leaf, "ndim", 1):
            in_entries.append(None)
        if not in_entries:
            in_entries = [(AXIS_STAGE,)]
        return P(*in_entries), tuple(gathers)

    flat_specs, treedef = jax.tree_util.tree_flatten(specs, is_leaf=lambda s: isinstance(s, P))
    flat_layers = jax.tree_util.tree_leaves(layers)
    stripped = [strip(s, w) for s, w in zip(flat_specs, flat_layers)]
    in_specs = jax.tree_util.tree_unflatten(treedef, [s for s, _ in stripped])
    gather_plan = jax.tree_util.tree_unflatten(treedef, [g for _, g in stripped])
    return in_specs, gather_plan


def pp_layer_scan(
    layers,            # stacked layer params, every leaf (L, ...)
    x: jax.Array,      # (B, S, E) activations
    arrays: dict,      # batch-aligned context arrays, every leaf (B, ...)
    body_fn,           # (h, layer_params, arrays) -> h
    *,
    remat: bool = False,
    n_micro: int | None = None,
    rules=None,        # the model's partition_rules() — preserves ZeRO/FSDP
) -> jax.Array:
    """Run `body_fn` over the stacked layers — pipelined over the `stage`
    mesh axis when present, the plain `lax.scan` otherwise. Numerically
    identical to the plain scan."""
    mesh = jax.sharding.get_abstract_mesh()
    n_stages = (
        1 if mesh is None or mesh.empty else mesh.shape.get(AXIS_STAGE, 1)
    )
    if n_stages <= 1:
        return _plain_scan(layers, x, arrays, body_fn, remat)
    if mesh.shape.get(AXIS_SEQUENCE, 1) > 1:
        raise ValueError(
            "mesh has both stage > 1 and sequence > 1 — pipeline and "
            "sequence parallelism cannot nest; pick one"
        )

    L = jax.tree_util.tree_leaves(layers)[0].shape[0]
    b_shards = math.prod(mesh.shape.get(a, 1) for a in BATCH_AXES)
    B = x.shape[0]
    if B % b_shards:
        # don't silently replicate the batch across the dp axes
        return _plain_scan(layers, x, arrays, body_fn, remat)
    batch_axes = BATCH_AXES
    B_local = B // b_shards
    nm = n_micro or min(n_stages * 2, B_local)
    while nm > 1 and B_local % nm:
        nm -= 1
    if L % n_stages or nm < 2:
        return _plain_scan(layers, x, arrays, body_fn, remat)

    manual = set(a for a in batch_axes if a in mesh.shape) | {AXIS_STAGE}
    if rules is not None:
        layer_specs, gather_plan = _manual_weight_specs(
            layers, rules, mesh, manual
        )
    else:
        layer_specs = jax.tree_util.tree_map(lambda _: P(AXIS_STAGE), layers)
        gather_plan = jax.tree_util.tree_map(lambda _: (), layers)
    x_spec = P(batch_axes)
    arr_specs = jax.tree_util.tree_map(lambda _: x_spec, arrays)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    gather_leaves = jax.tree_util.tree_leaves(
        gather_plan, is_leaf=lambda g: isinstance(g, tuple)
    )

    def inner(layers_local, x, arrays):
        idx = jax.lax.axis_index(AXIS_STAGE)
        Bl = x.shape[0]
        bm = Bl // nm
        micro = x.reshape(nm, bm, *x.shape[1:])
        arr_micro = jax.tree_util.tree_map(
            lambda a: a.reshape(nm, bm, *a.shape[1:]), arrays
        )

        def gather_layer(layer_p):
            # ZeRO: materialize ONE layer's full weights from their fsdp
            # shards, at use (all-gather -> reduce-scatter on grads)
            flat, tdef = jax.tree_util.tree_flatten(layer_p)
            out = []
            for w, plan in zip(flat, gather_leaves):
                for dim, ax in plan:
                    w = jax.lax.all_gather(w, ax, axis=dim, tiled=True)
                out.append(w)
            return jax.tree_util.tree_unflatten(tdef, out)

        def stage_block(h, c):
            def sbody(hh, layer_p):
                return body_fn(hh, gather_layer(layer_p), c), None

            h, _ = jax.lax.scan(sbody, h, layers_local)
            return h

        if remat:
            stage_block = maybe_checkpoint(stage_block, remat)

        T = nm + n_stages - 1

        def tick(buf, t):
            m_in = jnp.clip(t, 0, nm - 1)
            ingest = jax.lax.dynamic_index_in_dim(micro, m_in, 0, False)
            buf = jnp.where((idx == 0) & (t < nm), ingest, buf)
            m_proc = jnp.clip(t - idx, 0, nm - 1)
            c = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, m_proc, 0, False),
                arr_micro,
            )
            active = (t >= idx) & (t - idx < nm)
            y = stage_block(buf, c)
            y = jnp.where(active, y, buf)
            nxt = jax.lax.ppermute(y, AXIS_STAGE, perm)
            return nxt, y

        buf0 = jnp.zeros_like(micro[0])
        _, ys = jax.lax.scan(tick, buf0, jnp.arange(T))
        # last stage's ticks P-1..T-1 hold microbatches 0..nm-1 in order;
        # mask + psum broadcasts them to every stage
        outs = ys[n_stages - 1:]
        outs = outs * (idx == n_stages - 1).astype(outs.dtype)
        outs = jax.lax.psum(outs, AXIS_STAGE)
        return outs.reshape(Bl, *x.shape[1:])

    return jax.shard_map(
        inner,
        in_specs=(layer_specs, x_spec, arr_specs),
        out_specs=x_spec,
        axis_names=manual,
        check_vma=False,
    )(layers, x, arrays)
