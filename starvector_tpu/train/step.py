"""The pjit train step: loss → grads → clip → update, fully sharded.

TPU-native replacement for the reference's Accelerate/DeepSpeed/FSDP step
(reference: starvector/train/train.py:234-269): one jitted function over the
global mesh; parameter sharding (fsdp), batch sharding (replica/data/fsdp)
and tensor parallelism are all expressed by in/out shardings — XLA inserts
the all-gathers/reduce-scatters that DeepSpeed/FSDP implement by hand.
Gradient accumulation and clipping live in the optax chain (train/optim.py).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from starvector_tpu.models import starvector as sv
from starvector_tpu.ops.layers import DTypePolicy


def make_train_step(
    cfg: sv.StarVectorConfig,
    tx: optax.GradientTransformation,
    pad_token_id: int,
    *,
    policy: DTypePolicy = DTypePolicy(),
    remat: bool = True,
    grad_dtype=None,
):
    """Returns train_step(params, opt_state, batch, rng) →
    (params, opt_state, metrics). BatchNorm running stats (1B adapter) are
    merged back into params each step.

    grad_dtype (e.g. jnp.bfloat16): differentiate w.r.t. a low-precision
    cast of the parameters instead of the fp32 masters — the classic AMP
    layout (bf16 weights in fwd/bwd, fp32 master + optimizer math). The
    forward is numerically IDENTICAL to the default (the model already
    casts every weight to policy.compute_dtype at use); what changes is
    that the backward's per-layer gradient stack accumulates in bf16, and
    the fp32 upcast happens per-leaf at the optimizer boundary where the
    activation memory is already freed. At 8B/fsdp8 this halves the
    largest backward temps (the stacked decoder grads — the dominant
    seq-independent allocations in the v5e-8 AOT audit, scripts/
    hbm_proof.py). Scan weight grads are per-layer slices — nothing
    accumulates ACROSS layers — so the only rounding is one bf16 quantize
    per gradient element."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        def loss_wrapped(p):
            return sv.loss_fn_with_bn_stats(
                p, cfg, batch, pad_token_id, policy=policy,
                dropout_rng=rng, remat=remat,
            )

        if grad_dtype is not None:
            p_low = jax.tree_util.tree_map(
                lambda w: w.astype(grad_dtype)
                if jnp.issubdtype(w.dtype, jnp.floating) else w,
                params,
            )
            (loss, aux), grads = jax.value_and_grad(
                loss_wrapped, has_aux=True)(p_low)
            grads = jax.tree_util.tree_map(
                lambda g, w: g.astype(w.dtype), grads, params)
        else:
            (loss, aux), grads = jax.value_and_grad(
                loss_wrapped, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if "bn_stats" in aux and aux["bn_stats"]:
            norm = dict(new_params["image_projection"]["norm"])
            norm.update(aux["bn_stats"])
            new_params = dict(new_params)
            new_params["image_projection"] = dict(new_params["image_projection"])
            new_params["image_projection"]["norm"] = norm
        gnorm = optax.global_norm(grads)
        return new_params, new_opt_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def make_eval_step(cfg, pad_token_id, *, policy=DTypePolicy()):
    @jax.jit
    def eval_step(params, batch):
        return sv.loss_fn(params, cfg, batch, pad_token_id, policy=policy)

    return eval_step


def opt_state_shardings(tx, params_abstract, param_shardings, mesh):
    """Shardings for a fresh optimizer state: params-like leaves (Adam
    moments, accumulators) inherit their parameter's sharding; everything
    else (step counts) replicates.

    This must be derived STRUCTURALLY (optax.tree_map_params), not left to
    XLA propagation: tx.init builds moments with zeros_like, which has no
    data dependence on the sharded params, so `out_shardings=None` lets the
    partitioner replicate them — silently 3x-ing per-chip optimizer memory
    at 8B scale (caught by the deviceless v5e-8 AOT audit,
    scripts/hbm_proof.py)."""
    from jax.sharding import NamedSharding, PartitionSpec

    state_abs = jax.eval_shape(tx.init, params_abstract)

    def axis_size(axes):
        names = (axes,) if isinstance(axes, str) else tuple(axes or ())
        size = 1
        for n in names:
            size *= mesh.shape.get(n, 1)
        return size

    def fit(leaf, sh):
        # factored states (adafactor row/col vectors) don't match the param
        # rank/shape — replicate anything the param spec can't legally shard
        spec = tuple(sh.spec)
        if len(spec) > leaf.ndim:
            return NamedSharding(mesh, PartitionSpec())
        for dim, axes in zip(leaf.shape, spec):
            if axes is not None and dim % axis_size(axes) != 0:
                return NamedSharding(mesh, PartitionSpec())
        return sh

    return optax.tree_map_params(
        tx,
        fit,
        state_abs,
        param_shardings,
        transform_non_params=lambda _: NamedSharding(mesh, PartitionSpec()),
    )


def shard_train_state(params: Any, tx, mesh):
    """Place params + fresh optimizer state on the mesh per partition rules
    (optimizer moments inherit the parameter sharding — ZeRO for free)."""
    from starvector_tpu.parallel import make_param_shardings

    shardings = make_param_shardings(params, sv.partition_rules(), mesh)
    params = jax.tree_util.tree_map(jax.device_put, params, shardings)
    o_sh = opt_state_shardings(tx, params, shardings, mesh)
    opt_state = jax.jit(tx.init, out_shardings=o_sh)(params)
    return params, opt_state
