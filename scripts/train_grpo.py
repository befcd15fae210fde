#!/usr/bin/env python
"""GRPO post-training driver: render-fidelity RL on a pretrained StarVector.

The reference exposes the GRPO surface (rollouts + per-token-logprob forward,
starvector_arch.py:161-184, starvector_base.py:261-286) but ships no
trainer; this completes the loop (starvector_tpu/train/grpo.py) with the
same config conventions as SFT training.

Usage:
    python scripts/train_grpo.py config=configs/models/starvector-1b/im2svg-grpo.yaml \
        model.pretrained_path=/ckpts/starvector-1b grpo.steps=500

Without `model.pretrained_path` a from-config model is used (smoke runs).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from starvector_tpu.config import get_config, instantiate_from_config
    from starvector_tpu.data.rasterize import rasterize_svg
    from starvector_tpu.train.grpo import GRPOConfig, GRPOTrainer
    from starvector_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    from starvector_tpu.config import resolve_repo_config

    config = get_config(default_path=resolve_repo_config())

    pretrained = config.get_path("model.pretrained_path")
    from starvector_tpu.api import StarVectorForCausalLM

    if pretrained:
        model = StarVectorForCausalLM.from_pretrained(pretrained)
    else:
        from starvector_tpu.models.builder import model_builder
        from starvector_tpu.models import starvector as sv
        from starvector_tpu.models.tokenizer import build_test_tokenizer

        params, cfg = model_builder(config)
        tok = build_test_tokenizer(
            "v2" if cfg.decoder == "starcoder2" else "v1"
        )
        model = StarVectorForCausalLM(params, cfg, tok)

    gcfg = GRPOConfig(
        num_generations=int(config.get_path("grpo.num_generations", 8)),
        max_new_tokens=int(config.get_path("grpo.max_new_tokens", 512)),
        temperature=float(config.get_path("grpo.temperature", 1.0)),
        top_p=float(config.get_path("grpo.top_p", 0.9)),
        clip_eps=float(config.get_path("grpo.clip_eps", 0.2)),
        kl_beta=float(config.get_path("grpo.kl_beta", 0.0)),
        updates_per_rollout=int(config.get_path("grpo.updates_per_rollout", 1)),
        reward_resolution=int(config.get_path("grpo.reward_resolution", 224)),
        ssim_weight=float(config.get_path("grpo.ssim_weight", 0.5)),
    )
    steps = int(config.get_path("grpo.steps", 1000))
    trainer = GRPOTrainer(
        model, gcfg,
        lr=float(config.get_path("grpo.lr", 1e-6)),
        total_steps=steps,
        warmup_steps=int(config.get_path("grpo.warmup_steps", 0)),
        grad_clip=float(config.get_path("training.grad_clip", 1.0)),
    )

    ds = instantiate_from_config(config.get_path("data.train"))
    batch_size = int(config.get_path("data.batch_size", 4))

    out_dir = config.get_path(
        "project.out_dir",
        f"runs/{config.get_path('project.name', 'starvector-grpo')}",
    )
    from starvector_tpu.utils.logging import MetricsSink

    sink = MetricsSink(out_dir)

    idx = 0
    for step in range(steps):
        images, targets = [], []
        while len(images) < batch_size:
            item = ds[idx % len(ds)]
            idx += 1
            images.append(np.asarray(item["image"]))
            targets.append(
                np.asarray(
                    rasterize_svg(
                        item["svg"], resolution=gcfg.reward_resolution
                    )
                )
            )
        metrics = trainer.step(jnp.asarray(np.stack(images)), targets)
        sink.log(metrics, step=metrics["step"])
        print(
            f"step {metrics['step']}: loss {metrics['loss']:.4f} "
            f"reward {metrics['reward_mean']:.3f} "
            f"valid {metrics['valid_frac']:.2f} kl {metrics['kl']:.4f}"
        )
        if (step + 1) % int(
            config.get_path("training.checkpointing_steps", 200)
        ) == 0 or step + 1 >= steps:
            from starvector_tpu.train import checkpoint as ckpt

            ckpt.save_checkpoint(
                out_dir, metrics["step"], {"params": model.params},
                total_limit=config.get_path(
                    "training.checkpoints_total_limit", 3
                ),
            )


if __name__ == "__main__":
    main()
