"""Partition-rule machinery: map parameter-tree paths → PartitionSpecs.

Each model module exports `partition_rules()` — an ordered list of
(path-regex, PartitionSpec) pairs, first match wins, matched against the
"/"-joined flattened pytree path. This replaces the reference's FSDP
auto-wrap-policy machinery (reference: starvector/model/models/
starvector_v2.py:19-43, train/util.py:215-245): instead of wrapping modules,
we annotate arrays and let GSPMD do the rest.

Conventions used by the rules in models/:
  * 2D weights shard (fsdp, tensor) or (tensor, fsdp) depending on whether
    the output dim is the TP-parallel one (column- vs row-parallel).
  * embeddings shard vocab over fsdp, features over tensor.
  * 1D params (bias, layernorm) shard over fsdp when long, else replicated.
"""

from __future__ import annotations

import re
from typing import Any, Iterable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Rules = Iterable[tuple[str, P]]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path_s: str, rules: Rules, default: P = P()) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path_s):
            return spec
    return default


def _shrink_spec_to_shape(spec: P, ndim: int) -> P:
    """Drop trailing spec entries beyond the array rank (lets one rule cover
    weight+bias pairs)."""
    entries = tuple(spec)
    if len(entries) > ndim:
        entries = entries[:ndim]
    return P(*entries)


def _divisible(dim: int, axes, mesh: Mesh) -> bool:
    if axes is None:
        return True
    names = (axes,) if isinstance(axes, str) else tuple(axes)
    size = 1
    for n in names:
        size *= mesh.shape[n]
    return dim % size == 0


def sanitize_spec(spec: P, shape: tuple[int, ...], mesh: Mesh) -> P:
    """Replace sharded entries that don't divide the dim with None (XLA
    requires even sharding for many ops; tiny heads/dims stay replicated)."""
    entries = list(_shrink_spec_to_shape(spec, len(shape)))
    entries += [None] * (len(shape) - len(entries))
    out = [a if _divisible(d, a, mesh) else None for d, a in zip(shape, entries)]
    return P(*out)


# Embedding tables keep single-axis sharding (the (fsdp, tensor)
# double-sharded-table SPMD miscompile, see gpt_bigcode.partition_rules)
# and are excluded from ZeRO-over-sequence widening.
_TABLE_RE = r"wte$|wpe$|embed_tokens$|lm_head$"


def widen_fsdp_over_sequence(spec: P, path_s: str,
                             shape: tuple[int, ...], mesh: Mesh) -> P:
    """ZeRO over the `sequence` axis: widen plain "fsdp" weight-shard
    entries to ("fsdp", "sequence") on sequence-parallel meshes.

    On an SP mesh the activations' S dim is sharded, so each chip's weight
    gradient is a PARTIAL sum that XLA must combine across `sequence`. If
    weights (hence grads and optimizer state) shard over fsdp only, that
    combine is an all-reduce materializing a full fsdp-shard gradient stack
    per chip — at StarVector-8B/S=8192 two live 1.27 GiB bf16 stacks per
    MLP weight, the allocations that push fsdp4xsp2 over 16 GiB
    (scripts/hbm_proof.py). Widening turns it into a reduce-scatter and
    halves grad + optimizer bytes; the forward all-gathers weights over
    (fsdp, sequence) instead of fsdp — same per-chip gather volume.

    No-op when the mesh has no real sequence axis. Tables are excluded
    (single-axis invariant above); entries that don't divide the combined
    axis keep their plain "fsdp" sharding."""
    if mesh.shape.get("sequence", 1) == 1:
        return spec
    if re.search(_TABLE_RE, path_s):
        return spec
    combined = mesh.shape["fsdp"] * mesh.shape["sequence"]
    entries = list(_shrink_spec_to_shape(spec, len(shape)))
    entries += [None] * (len(shape) - len(entries))
    out = [
        ("fsdp", "sequence")
        if a == "fsdp" and dim % combined == 0 else a
        for dim, a in zip(shape, entries)
    ]
    return P(*out)


def apply_partition_rules(params: Any, rules: Rules, mesh: Mesh) -> Any:
    """Return a pytree of PartitionSpec matching `params`' structure."""
    rules = list(rules)

    def leaf_spec(path, leaf):
        path_s = _path_str(path)
        shape = getattr(leaf, "shape", ())
        s = spec_for_path(path_s, rules)
        s = widen_fsdp_over_sequence(s, path_s, shape, mesh)
        return sanitize_spec(s, shape, mesh)

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def make_param_shardings(params: Any, rules: Rules, mesh: Mesh) -> Any:
    specs = apply_partition_rules(params, rules, mesh)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


def shard_pytree(params: Any, rules: Rules, mesh: Mesh) -> Any:
    """Device-put a pytree according to the rules (sharded weight load)."""
    shardings = make_param_shardings(params, rules, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
