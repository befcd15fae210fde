"""Experiment utilities: run identity, code snapshot, parameter summaries.

Rebuilds reference helpers (reference: starvector/util.py): exp-id hashing
(:98-146), rsync code snapshot (:230-270), model summary table (:197-210),
trainable-parameter printout (:50-62), AverageMeter (:32-48)."""

from __future__ import annotations

import hashlib
import json
import os

import jax
import numpy as np

from starvector_tpu.metrics.util import AverageMeter  # noqa: F401 (re-export)


def generate_experiment_id(config) -> str:
    """Deterministic run identity = md5 of the config (reference :98-146)."""
    from starvector_tpu.config import _unwrap

    blob = json.dumps(_unwrap(config), sort_keys=True, default=str)
    return hashlib.md5(blob.encode()).hexdigest()


def copy_code(out_dir: str, repo_root: str | None = None) -> str:
    """Snapshot the package source into the run dir (reference :230-270
    uses rsync; pure-Python copytree here so the snapshot works in images
    without rsync — every run records the code that produced it)."""
    import shutil

    repo_root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    src = os.path.join(repo_root, "starvector_tpu")
    dst = os.path.join(out_dir, "code_snapshot", "starvector_tpu")
    try:
        shutil.copytree(
            src, dst, dirs_exist_ok=True,
            ignore=shutil.ignore_patterns(
                "__pycache__", "*.pyc", "*.so", ".git", "runs"),
        )
    except OSError as e:  # best-effort: a failed snapshot never kills a run
        print(f"code snapshot skipped ({e})")
    return os.path.dirname(dst)


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


def model_summary_table(params: dict) -> str:
    """Per-component parameter counts (reference :197-210)."""
    rows = []
    total = 0
    for name, sub in params.items():
        n = count_params(sub)
        total += n
        rows.append((name, n))
    width = max(len(n) for n, _ in rows) + 2
    lines = [f"{'component':<{width}}params"]
    for name, n in rows:
        lines.append(f"{name:<{width}}{n:,}")
    lines.append(f"{'TOTAL':<{width}}{total:,}")
    return "\n".join(lines)


def print_trainable_parameters(params: dict, freeze_mask: dict | None = None):
    """reference :50-62: trainable vs total parameter counts."""
    total = count_params(params)
    if freeze_mask is None:
        trainable = total
    else:
        trainable = sum(
            int(np.prod(p.shape))
            for p, m in zip(
                jax.tree_util.tree_leaves(params),
                jax.tree_util.tree_leaves(freeze_mask),
            )
            if m and hasattr(p, "shape")
        )
    pct = 100 * trainable / max(total, 1)
    print(
        f"trainable params: {trainable:,} || all params: {total:,} || "
        f"trainable%: {pct:.2f}"
    )
    return trainable, total
