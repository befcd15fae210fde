"""MetricsSink (jsonl-first, wandb-optional) and validation comparison
plots (reference logs these to wandb: train/train.py:139-171,
svg_validator_base.py:436-451, data/util.py:185-389)."""

import json
import os

import numpy as np
from PIL import Image

from starvector_tpu.utils.logging import MetricsSink
from starvector_tpu.utils import plots


def test_metrics_sink_jsonl(tmp_path):
    sink = MetricsSink(str(tmp_path), echo=False)
    sink.log({"loss": np.float32(1.5), "step_time": 0.2}, step=1)
    sink.log({"loss": 1.25}, step=2)
    sink.log_table("val", ["sample", "l2"], [["a", 0.1], ["b", 0.2]])
    sink.finish()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 1
    assert isinstance(lines[0]["loss"], float)  # np scalar -> plain
    assert any("val" in str(l) for l in lines[2:])


def test_metrics_sink_wandb_gated(tmp_path):
    # report_to=wandb with no wandb importable / offline: degrades to jsonl
    sink = MetricsSink(str(tmp_path), report_to="wandb", project="t")
    sink.log({"x": 1})
    sink.finish()
    assert os.path.exists(tmp_path / "metrics.jsonl")


def test_side_by_side_plots(tmp_path):
    gen = Image.new("RGB", (64, 64), (250, 20, 20))
    gt = Image.new("RGB", (64, 64), (20, 250, 20))
    out = str(tmp_path / "panel.png")
    panel = plots.plot_images_side_by_side(gen, gt, out)
    assert os.path.exists(out)
    assert panel.size[0] > 3 * 64  # three panels + padding
    # diff panel is non-black for different images
    arr = np.asarray(panel)
    assert arr.std() > 0

    m = plots.plot_images_side_by_side_with_metrics(
        gen, gt, 0.123, True, str(tmp_path / "m.png")
    )
    assert os.path.exists(tmp_path / "m.png") and m.size[1] >= 64

    samples = {
        0.0: {"gen_im": gen, "gt_im": gt},
        0.5: {"gen_im": gen, "gt_im": gt},
    }
    metrics = {0.0: {"mse": 0.1}, 0.5: {"mse": 0.2}}
    grid = plots.plot_images_side_by_side_temperatures(
        samples, metrics, str(tmp_path), "grid"
    )
    assert os.path.exists(tmp_path / "grid_temps.png")
    assert grid is not None
