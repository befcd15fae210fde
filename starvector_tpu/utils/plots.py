"""Validation comparison plots (reference: starvector/data/util.py:185-389).

Side-by-side generated/GT/diff panels and the temperature-sweep grid the
reference logs to wandb. PIL compositing with a matplotlib fallback for the
annotated variants; all helpers return the PIL image and optionally save."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageDraw


def _diff_image(im1: Image.Image, im2: Image.Image) -> Image.Image:
    a = np.asarray(im1.convert("RGB"), np.float32)
    b = np.asarray(im2.convert("RGB").resize(im1.size), np.float32)
    return Image.fromarray(np.abs(a - b).astype(np.uint8))


def plot_images_side_by_side(
    gen_im: Image.Image, gt_im: Image.Image, out_path: str | None = None
) -> Image.Image:
    """[generated | gt | abs-diff] panel (reference data/util.py:206-224)."""
    gen = gen_im.convert("RGB")
    gt = gt_im.convert("RGB").resize(gen.size)
    diff = _diff_image(gen, gt)
    w, h = gen.size
    pad = 8
    canvas = Image.new("RGB", (3 * w + 4 * pad, h + 2 * pad), "white")
    for i, im in enumerate((gen, gt, diff)):
        canvas.paste(im, (pad + i * (w + pad), pad))
    if out_path:
        canvas.save(out_path)
    return canvas


def plot_images_side_by_side_with_metrics(
    gen_im: Image.Image, gt_im: Image.Image, l2_dist: float,
    post_processed: bool, out_path: str | None = None,
) -> Image.Image:
    """Annotated comparison panel (reference data/util.py:185-204)."""
    panel = plot_images_side_by_side(gen_im, gt_im)
    w, h = panel.size
    canvas = Image.new("RGB", (w, h + 24), "white")
    canvas.paste(panel, (0, 24))
    draw = ImageDraw.Draw(canvas)
    draw.text(
        (8, 4),
        f"MSE: {l2_dist:.4f}  post-processed: {post_processed}",
        fill="black",
    )
    if out_path:
        canvas.save(out_path)
    return canvas


def plot_images_side_by_side_temperatures(
    samples_temp: dict, metrics: dict, sample_dir: str,
    outpath_filename: str,
) -> Image.Image | None:
    """Temperature-sweep grid: GT + one panel per temperature with its MSE
    (reference data/util.py:226-280). `samples_temp` maps temperature →
    result dict holding 'gen_im' and 'gt_im' PIL images; `metrics` maps
    temperature → {'mse': float, ...}."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    temps = sorted(samples_temp)
    if not temps:
        return None
    first = samples_temp[temps[0]]
    n = len(temps)
    fig, axes = plt.subplots(1, n + 1, figsize=(3 * (n + 1), 3.4))
    axes = np.atleast_1d(axes)
    axes[0].imshow(first["gt_im"])
    axes[0].set_title("Original")
    axes[0].axis("off")
    for i, t in enumerate(temps):
        res = samples_temp[t]
        axes[i + 1].imshow(res["gen_im"])
        m = metrics.get(t, {})
        sub = f"\nMSE {m['mse']:.4f}" if "mse" in m else ""
        axes[i + 1].set_title(f"T={t:.2f}{sub}", fontsize=9)
        axes[i + 1].axis("off")
    out_path = os.path.join(sample_dir, f"{outpath_filename}_temps.png")
    fig.savefig(out_path, bbox_inches="tight", pad_inches=0.1)
    plt.close(fig)
    return Image.open(out_path)
