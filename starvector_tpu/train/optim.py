"""Optimizer construction: AdamW/Adafactor + HF-style cosine warmup schedule,
grad clipping, accumulation, and component freezing.

Rebuilds the reference optimizer stack (reference: starvector/train/
util.py:132-151 get_optimizer; train/train.py:188-193 scheduler; :246-252
clip 1.0 + accumulation via Accelerator). Freezing follows
`train_image_encoder/train_LLM/train_connector` (starvector_base.py:55-66):
frozen subtrees get zero updates via optax.masked.
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def cosine_schedule_with_warmup(
    lr: float, warmup_steps: int, total_steps: int, num_cycles: float = 0.5
) -> optax.Schedule:
    """HF get_cosine_schedule_with_warmup semantics: linear warmup then
    cosine from 1 → 0 over the remaining steps."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(warmup_steps, 1)
        warmup_factor = jnp.minimum(step / warm, 1.0)
        progress = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1),
            0.0, 1.0,
        )
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_cycles * progress))
        return lr * jnp.where(step < warmup_steps, warmup_factor, jnp.maximum(cos, 0.0))

    return schedule


def build_schedule(
    lr_scheduler: str, lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """HF `get_scheduler` name → schedule; the reference passes
    `training.lr_scheduler` (cosine in every leaf) to
    transformers.get_scheduler (reference train/train.py:188-193)."""
    if lr_scheduler == "cosine":
        return cosine_schedule_with_warmup(lr, warmup_steps, total_steps)
    if lr_scheduler == "linear":
        def linear(step):
            import jax.numpy as jnp

            step = jnp.asarray(step, jnp.float32)
            warm = jnp.maximum(warmup_steps, 1)
            warmup_factor = jnp.minimum(step / warm, 1.0)
            decay = jnp.clip(
                (total_steps - step)
                / jnp.maximum(total_steps - warmup_steps, 1),
                0.0, 1.0,
            )
            return lr * jnp.where(step < warmup_steps, warmup_factor, decay)

        return linear
    if lr_scheduler == "constant":
        def constant(step):
            import jax.numpy as jnp

            step = jnp.asarray(step, jnp.float32)
            warm = jnp.maximum(warmup_steps, 1)
            return lr * jnp.minimum(step / warm, 1.0) if warmup_steps else lr * jnp.ones_like(step)

        return constant
    raise ValueError(f"unknown lr_scheduler {lr_scheduler!r}")


def freeze_mask(
    params: Any,
    *,
    train_image_encoder: bool,
    train_LLM: bool,
    train_connector: bool,
) -> Any:
    """True = trainable, per top-level component (reference
    starvector_base.py:55-66)."""
    flags = {
        "image_encoder": train_image_encoder,
        "svg_transformer": train_LLM,
        "image_projection": train_connector,
    }

    def mark(subtree, flag):
        return jax.tree_util.tree_map(lambda _: flag, subtree)

    return {k: mark(v, flags.get(k, True)) for k, v in params.items()}


def build_optimizer(
    params: Any,
    *,
    optimizer: str = "adamw",
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    warmup_steps: int = 0,
    total_steps: int = 100_000,
    lr_scheduler: str = "cosine",
    grad_clip: float = 1.0,
    grad_accum_steps: int = 1,
    train_image_encoder: bool = True,
    train_LLM: bool = True,
    train_connector: bool = True,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """``mu_dtype`` (e.g. jnp.bfloat16) halves the first-moment memory —
    the standard TPU trade for fitting AdamW state on 16 GiB chips
    (quantified by scripts/hbm_proof.py); the reference's torch AdamW has
    no equivalent knob."""
    schedule = build_schedule(lr_scheduler, lr, warmup_steps, total_steps)
    if optimizer == "adamw":
        core = optax.adamw(
            schedule, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay, mu_dtype=mu_dtype,
        )
    elif optimizer == "adafactor":
        core = optax.adafactor(schedule)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")

    chain = [optax.clip_by_global_norm(grad_clip), core]
    tx = optax.chain(*chain)

    mask = freeze_mask(
        params,
        train_image_encoder=train_image_encoder,
        train_LLM=train_LLM,
        train_connector=train_connector,
    )
    if not all(jax.tree_util.tree_leaves(mask)):
        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
