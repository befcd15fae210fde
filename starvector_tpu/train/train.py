"""Training entry point.

Rebuilds the reference train loop (reference: starvector/train/
train.py:66-271) TPU-first:
  config (yaml ⊕ dotlist) → datasets → model → mesh/shardings → optax →
  auto-resume → epoch loop {sharded train_step, grad clip+accum inside the
  optax chain, periodic validate + rotating checkpoints, jsonl metrics}.

Usage:
    python -m starvector_tpu.train.train config=configs/models/starvector-1b/im2svg.yaml \
        training.steps=1000 data.batch_size=8
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from starvector_tpu.config import ConfigNode, get_config, instantiate_from_config
from starvector_tpu.models.builder import model_builder
from starvector_tpu.models.tokenizer import build_test_tokenizer, load_tokenizer
from starvector_tpu.ops.layers import DTypePolicy
from starvector_tpu.parallel import MeshConfig, create_mesh
from starvector_tpu.parallel.mesh import local_mesh_summary
from starvector_tpu.train import checkpoint as ckpt
from starvector_tpu.train.loader import DataLoader
from starvector_tpu.train.optim import build_optimizer
from starvector_tpu.train.step import make_eval_step, make_train_step, shard_train_state


def _metrics_logger(out_dir: str, config=None):
    """jsonl sink + optional wandb mirror (`project.report_to: wandb`,
    mirroring the reference's report_to key, train/train.py:139-171)."""
    from starvector_tpu.utils.logging import MetricsSink

    sink = MetricsSink(
        out_dir,
        report_to=(config.get_path("project.report_to") if config else None),
        project=(config.get_path("project.name") if config else None),
        config=(config.to_dict() if config and hasattr(config, "to_dict") else None),
    )

    def log(record: dict):
        sink.log(record, step=record.get("step"))

    return log


def validate(eval_step, params, val_loader, mesh, max_batches: int = 16):
    """reference train/train.py:43-64: average loss over the val loader."""
    losses = []
    for i, batch in enumerate(val_loader):
        if i >= max_batches:
            break
        device_batch = _to_device(batch, mesh)
        losses.append(float(eval_step(params, device_batch)))
    return float(np.mean(losses)) if losses else float("nan")


def _to_device(batch: dict, mesh) -> dict:
    from jax.sharding import NamedSharding
    from starvector_tpu.parallel.mesh import (
        batch_spec, sanitize_for_mesh, seq_spec,
    )

    out = {}
    # token arrays also shard S over the `sequence` axis (context
    # parallelism); sanitize drops the axis on meshes without one
    for key, spec0 in (
        ("image", batch_spec(extra_dims=3)),
        ("svg_ids", seq_spec()),
        ("svg_mask", seq_spec()),
    ):
        arr = jnp.asarray(batch[key])
        spec = sanitize_for_mesh(spec0, arr.shape, mesh)
        out[key] = jax.device_put(arr, NamedSharding(mesh, spec))
    return out


def optimizer_kwargs_from_config(config) -> dict:
    """Read the full reference optimizer recipe from a config leaf
    (reference train/util.py:132-151 get_optimizer + train/train.py:188-193
    get_scheduler; leaf keys adam_beta1/adam_beta2/adam_weight_decay/
    adam_epsilon/lr_scheduler/lr_warmup_steps, e.g. configs/models/
    starvector-1b/im2svg-emoji.yaml:30-36). Legacy repo keys
    `weight_decay`/`warmup_steps` remain accepted as fallbacks so older
    leafs keep working; the adam_* spellings win when both are present."""
    g = config.get_path
    weight_decay = g("training.adam_weight_decay",
                     g("training.weight_decay", 1e-6))
    warmup = g("training.lr_warmup_steps", g("training.warmup_steps", 0))
    return dict(
        optimizer=g("training.optimizer", "adamw"),
        lr=float(g("training.lr", 1e-4)),
        weight_decay=float(weight_decay),
        betas=(float(g("training.adam_beta1", 0.95)),
               float(g("training.adam_beta2", 0.999))),
        eps=float(g("training.adam_epsilon", 1e-8)),
        warmup_steps=int(warmup),
        lr_scheduler=g("training.lr_scheduler", "cosine"),
        grad_clip=float(g("training.grad_clip", 1.0)),
        grad_accum_steps=int(g("training.grad_accum_steps", 1)),
        train_image_encoder=bool(g("training.train_image_encoder", True)),
        train_LLM=bool(g("training.train_LLM", True)),
        train_connector=bool(g("training.train_connector", True)),
    )


def _remat_mode(raw):
    """training.gradient_checkpointing: true | false | "dots" | "dots_slim"
    | "dots_flash" (the shipped 1B/8B long-context default).

    "dots" maps to a save_only_these_names checkpoint policy over bf16
    residuals tagged after each matmul (ops/layers.py::maybe_checkpoint) —
    matmul outputs are kept, only elementwise ops recompute, trading
    activation HBM for the ~2/8 of MFU that full per-layer remat burns
    re-running forward matmuls. It is deliberately NOT XLA's
    dots_with_no_batch_dims_saveable, which saves fp32 dot accumulators
    and OOMs 1B training at B=8/S=1024 on a 16 GB chip (see the
    maybe_checkpoint docstring before "simplifying" this). "dots_slim"
    also recomputes the attention in-projections — ~2/3 of "dots"'s
    residual HBM, for long-context points where "dots" is just over.
    """
    if isinstance(raw, str):
        if raw not in ("dots", "dots_slim", "dots_flash"):
            raise ValueError(
                f"training.gradient_checkpointing={raw!r} is not a known "
                "mode; expected true | false | 'dots' | 'dots_slim' | "
                "'dots_flash'")
        return raw
    return bool(raw)


def reimpose_checkpoint_model_block(config: ConfigNode, out_dir: str):
    """Resume fidelity (reference starvector/util.py:284-291 +
    train/train.py:74-118): when resuming, the checkpoint's saved `model`
    block wins over the live config — an edited architecture would
    otherwise fail late (Orbax shape mismatch) or, for shape-compatible
    edits (attn_impl, dropout, freeze flags), silently diverge. Must run
    before model_builder. Returns the checkpoint path that will be
    resumed from (or None)."""
    last = ckpt.get_last_checkpoint(out_dir)
    if not (last and config.get_path("training.resume", True)):
        return last
    saved = ckpt.load_checkpoint_config(last)
    saved_model = saved.get("model") if saved else None
    if saved_model is not None:
        live_model = config.get_path("model")
        if (live_model.to_dict() if hasattr(live_model, "to_dict")
                else live_model) != saved_model.to_dict():
            print(
                f"resume: re-imposing the model block saved at {last} "
                "over the live config (edits to `model` are ignored on "
                "resume)")
        config["model"] = saved_model
    return last


def main(config: ConfigNode):
    from starvector_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )
    from starvector_tpu.utils.experiment import (
        copy_code, generate_experiment_id,
    )

    enable_persistent_compilation_cache()
    project = config.get_path("project.name", "starvector-tpu")
    # Run identity = config hash (reference starvector/util.py:98-146):
    # without it, two different configs land in the same runs/<project>
    # dir and clobber each other's checkpoints. An explicit
    # project.out_dir overrides (tests, resumable named runs).
    exp_id = generate_experiment_id(config)[:12]
    out_dir = config.get_path(
        "project.out_dir", os.path.join("runs", str(project), exp_id)
    )

    last = reimpose_checkpoint_model_block(config, out_dir)

    os.makedirs(out_dir, exist_ok=True)
    log = _metrics_logger(out_dir, config)
    with open(os.path.join(out_dir, "config.yaml"), "w") as f:
        f.write(config.to_yaml())
    with open(os.path.join(out_dir, "experiment_id.txt"), "w") as f:
        f.write(exp_id + "\n")
    if config.get_path("project.snapshot_code", True):
        copy_code(out_dir)

    mesh = create_mesh(
        MeshConfig(
            replica=config.get_path("mesh.replica", 1),
            data=config.get_path("mesh.data", 1),
            fsdp=config.get_path("mesh.fsdp", -1),
            sequence=config.get_path("mesh.sequence", 1),
            stage=config.get_path("mesh.stage", 1),
            tensor=config.get_path("mesh.tensor", 1),
        )
    )
    print(local_mesh_summary(mesh))

    params, cfg = model_builder(config)
    tok_path = config.get_path("model.tokenizer_path")
    if tok_path:
        tokenizer = load_tokenizer(
            tok_path, version="v2" if cfg.decoder == "starcoder2" else "v1"
        )
    else:
        tokenizer = build_test_tokenizer(
            "v2" if cfg.decoder == "starcoder2" else "v1"
        )

    train_ds = instantiate_from_config(config.get_path("data.train"))
    val_cfg = config.get_path("data.val")
    val_ds = instantiate_from_config(val_cfg) if val_cfg else None

    batch_size = int(config.get_path("data.batch_size", 2))
    max_length = min(
        int(config.get_path("data.max_length", 512)), cfg.max_svg_length
    )
    loader_kw = dict(
        max_length=max_length,
        num_workers=int(config.get_path("data.num_workers", 4)),
    )
    train_loader = DataLoader(train_ds, tokenizer, batch_size, **loader_kw)
    val_loader = (
        DataLoader(val_ds, tokenizer, batch_size, shuffle=False, **loader_kw)
        if val_ds
        else None
    )

    total_steps = int(config.get_path("training.steps", 10_000))
    tx = build_optimizer(params, total_steps=total_steps,
                         **optimizer_kwargs_from_config(config))

    policy = DTypePolicy(
        param_dtype=jnp.float32,
        compute_dtype=jnp.bfloat16
        if config.get_path("training.bf16", True)
        else jnp.float32,
    )

    with jax.set_mesh(mesh):
        params, opt_state = shard_train_state(params, tx, mesh)

        step = 0
        if last and config.get_path("training.resume", True):
            state = ckpt.restore_checkpoint(
                last, {"params": params, "opt_state": opt_state}
            )
            params, opt_state = state["params"], state["opt_state"]
            step = ckpt.step_from_path(last)
            print(f"resumed from {last} at step {step}")

        grad_dtype = config.get_path("training.grad_dtype", None)
        train_step = make_train_step(
            cfg, tx, tokenizer.pad_token_id, policy=policy,
            remat=_remat_mode(config.get_path("training.gradient_checkpointing", True)),
            # "bfloat16" = AMP gradient layout: bf16 backward/grad stacks,
            # fp32 master params + optimizer math (see make_train_step);
            # the memory lever that fits 8B long-context on 16 GiB chips
            grad_dtype=jnp.dtype(grad_dtype) if grad_dtype else None,
        )
        eval_step = make_eval_step(cfg, tokenizer.pad_token_id, policy=policy)

        log_every = max(int(config.get_path("training.log_every", 10)), 1)
        ckpt_every = int(config.get_path("training.checkpointing_steps", 1000))
        total_limit = config.get_path("training.checkpoints_total_limit", 3)
        rng = jax.random.PRNGKey(int(config.get_path("training.seed", 0)))

        epochs = int(config.get_path("training.epochs", 1))
        t_step = time.time()
        done = False
        # Resume data-order fidelity (reference train/train.py:239-246):
        # per-epoch seeded permutation + fast-forward within the resumed
        # epoch, so the resumed run consumes the identical batch stream the
        # uninterrupted run would — no sample replayed, none skipped.
        steps_per_epoch = max(len(train_loader), 1)
        start_epoch = step // steps_per_epoch
        for epoch in range(start_epoch, epochs):
            if done:
                break
            train_loader.set_epoch(epoch)
            if epoch == start_epoch and step % steps_per_epoch:
                train_loader.skip_first_batches(step % steps_per_epoch)
            for batch in train_loader:
                device_batch = _to_device(batch, mesh)
                rng, step_rng = jax.random.split(rng)
                params, opt_state, metrics = train_step(
                    params, opt_state, device_batch, step_rng
                )
                step += 1
                # float(metrics[...]) is a host sync — doing it every step
                # serializes dispatch against the device and stalls the
                # loader's prefetch. Fetch only on logging steps; in
                # between, steps pipeline (the reference logs per step but
                # torch's async dispatch hides it; XLA's doesn't).
                if step % log_every == 0 or step >= total_steps:
                    now = time.time()
                    log({
                        "step": step,
                        "epoch": epoch,
                        "loss": float(metrics["loss"]),
                        "grad_norm": float(metrics["grad_norm"]),
                        "step_time": (now - t_step) / log_every,
                    })
                    t_step = now

                if step % ckpt_every == 0 or step >= total_steps:
                    if val_loader is not None:
                        vloss = validate(eval_step, params, val_loader, mesh)
                        log({"step": step, "val_loss": vloss})
                    ckpt.save_checkpoint(
                        out_dir, step,
                        {"params": params, "opt_state": opt_state},
                        total_limit=total_limit,
                        config=config,
                    )
                if step >= total_steps:
                    done = True
                    break
    return params


def main_cli():
    from starvector_tpu.config import resolve_repo_config

    main(get_config(default_path=resolve_repo_config()))


if __name__ == "__main__":
    main_cli()
