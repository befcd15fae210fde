"""Orbax checkpointing: save/rotate/auto-resume.

Rebuilds the reference checkpoint lifecycle (reference: starvector/train/
util.py:98-113 save + rotation to checkpoints_total_limit; train.py:74-118
auto-discovery + resume; starvector/util.py:177-195 get_last_checkpoint)
with Orbax: sharded async-capable save of {params, opt_state, step}, restore
onto the current mesh. The DeepSpeed ZeRO consolidation path
(zero_to_fp32.py) has no equivalent here — GSPMD-sharded state restores
directly without a merge step.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax


def _ckpt_dir(base: str, step: int) -> str:
    return os.path.join(base, f"checkpoint-{step}")


def list_checkpoints(base: str) -> list[tuple[int, str]]:
    if not os.path.isdir(base):
        return []
    out = []
    for name in os.listdir(base):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(base, name)))
    return sorted(out)


def get_last_checkpoint(base: str) -> str | None:
    """reference starvector/util.py:177-195"""
    cps = list_checkpoints(base)
    return cps[-1][1] if cps else None


def save_checkpoint(
    base: str,
    step: int,
    state: dict[str, Any],
    *,
    total_limit: int | None = None,
    config: Any | None = None,
) -> str:
    """Save {params, opt_state, ...} at checkpoint-<step>; rotate old ones
    (reference train/util.py:98-113).

    When `config` is given, a `config.yaml` snapshot is written inside the
    checkpoint dir so resume can re-impose the saved `model` block over the
    live config (reference starvector/util.py:284-291 — a resumed run must
    not silently change architecture)."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(os.path.abspath(base), step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if config is not None:
        import yaml

        blob = (config.to_yaml() if hasattr(config, "to_yaml")
                else yaml.safe_dump(dict(config), sort_keys=False))
        with open(os.path.join(path, "config.yaml"), "w") as f:
            f.write(blob)
    if total_limit:
        cps = list_checkpoints(base)
        for _, old in cps[: max(0, len(cps) - total_limit)]:
            import shutil

            shutil.rmtree(old, ignore_errors=True)
    return path


def load_checkpoint_config(path: str):
    """Read the config snapshot saved beside a checkpoint, or None if the
    checkpoint predates config snapshotting."""
    cfg_path = os.path.join(path, "config.yaml")
    if not os.path.exists(cfg_path):
        return None
    from starvector_tpu.config import load_yaml

    return load_yaml(cfg_path)


def restore_checkpoint(path: str, target: dict[str, Any]) -> dict[str, Any]:
    """Restore onto the target's shardings/structure (target = abstract or
    concrete pytree with the desired shardings)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype,
            sharding=getattr(x, "sharding", None),
        )
        if hasattr(x, "shape")
        else x,
        target,
    )
    return ckptr.restore(os.path.abspath(path), abstract)


def step_from_path(path: str) -> int:
    m = re.search(r"checkpoint-(\d+)$", path.rstrip("/"))
    return int(m.group(1)) if m else 0
