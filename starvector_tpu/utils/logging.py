"""Metrics sinks: jsonl always, wandb optionally.

The reference logs train scalars and validation tables/plots to wandb
(reference: starvector/train/train.py:139-171,
starvector/validation/svg_validator_base.py:436-451). This rebuild is
jsonl-first — every record lands in `<out_dir>/metrics.jsonl` — with an
optional wandb mirror that activates only when (a) the `wandb` package is
importable and (b) the run config asks for it (`report_to: wandb`, same key
the reference uses). Absent wandb, everything degrades to jsonl silently.
"""

from __future__ import annotations

import json
import os
from typing import Any


def _to_plain(v):
    if hasattr(v, "item"):
        try:
            return v.item()
        except Exception:  # noqa: BLE001
            return str(v)
    return v


class MetricsSink:
    """jsonl writer + optional wandb mirror + stdout echo."""

    def __init__(
        self,
        out_dir: str,
        *,
        report_to: str | None = None,
        project: str | None = None,
        run_name: str | None = None,
        config: dict | None = None,
        echo: bool = True,
    ):
        os.makedirs(out_dir, exist_ok=True)
        self._f = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self._echo = echo
        self._wandb = None
        if report_to == "wandb":
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(
                    project=project or "starvector-tpu",
                    name=run_name,
                    config=config or {},
                    dir=out_dir,
                )
            except Exception as e:  # noqa: BLE001 — wandb absent or offline
                print(f"wandb disabled ({type(e).__name__}: {e}); jsonl only")
                self._wandb = None

    def log(self, record: dict[str, Any], step: int | None = None):
        record = {k: _to_plain(v) for k, v in record.items()}
        if step is not None and "step" not in record:
            record["step"] = int(step)
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()
        if self._echo:
            print(
                " ".join(
                    f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in record.items()
                )
            )
        if self._wandb is not None:
            scalars = {
                k: v for k, v in record.items() if isinstance(v, (int, float))
            }
            self._wandb.log(scalars, step=step)

    def log_table(self, name: str, columns: list[str], rows: list[list]):
        """Validation comparison table (reference svg_validator_base.py:436-451).
        jsonl: one record with the table payload; wandb: a real Table."""
        self._f.write(
            json.dumps({"table": name, "columns": columns, "rows": [
                [_to_plain(c) for c in r] for r in rows
            ]}) + "\n"
        )
        self._f.flush()
        if self._wandb is not None:
            import wandb  # type: ignore

            self._wandb.log({name: wandb.Table(columns=columns, data=rows)})

    def log_image_pairs(self, name: str, pairs: list[tuple], captions=None):
        """GT-vs-generated comparison images. jsonl records the file paths
        (images are saved to disk by the validator already); wandb uploads."""
        self._f.write(
            json.dumps({"images": name, "pairs": [
                [str(a), str(b)] for a, b in pairs
            ]}) + "\n"
        )
        self._f.flush()
        if self._wandb is not None:
            import wandb  # type: ignore

            imgs = []
            for i, (gt, gen) in enumerate(pairs):
                cap = captions[i] if captions else f"pair {i}"
                imgs.append(wandb.Image(str(gt), caption=f"GT {cap}"))
                imgs.append(wandb.Image(str(gen), caption=f"gen {cap}"))
            self._wandb.log({name: imgs})

    def finish(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
