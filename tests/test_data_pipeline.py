"""Processor / dataset / augmentation pipeline tests."""

import numpy as np
import pytest

from starvector_tpu.data import rasterize as rz
from starvector_tpu.data.augmentation import SVGTransforms, hex2rgb, rgb2hex
from starvector_tpu.data.datasets import SVGStackDataset, EmojiSVGDataset
from starvector_tpu.data.processor import ImageProcessor, batch_preprocess_jax

needs_native = pytest.mark.skipif(
    not rz.rasterizer_available(), reason="librsvg/cairo unavailable"
)

SQUARE = (
    '<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 100 100">'
    '<path d="M 20 20 L 80 20 L 80 80 L 20 80 Z" fill="#ff0000"/></svg>'
)


def test_image_processor_basic():
    from PIL import Image

    proc = ImageProcessor(size=32)
    img = Image.new("RGB", (40, 20), (255, 0, 0))
    out = proc(img)
    assert out.shape == (32, 32, 3)
    # white pad regions normalize to (1 - mean)/std
    expected_white = (1.0 - proc.mean) / proc.std
    np.testing.assert_allclose(out[0, 16], expected_white, atol=1e-5)
    # RGBA over white
    rgba = Image.new("RGBA", (20, 20), (0, 0, 255, 0))  # fully transparent
    out2 = proc(rgba)
    np.testing.assert_allclose(out2[16, 16], expected_white, atol=1e-5)


def test_batch_preprocess_jax_close_to_pil():
    from PIL import Image

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (30, 50, 3), np.uint8)
    proc = ImageProcessor(size=32)
    ref = proc(Image.fromarray(arr))
    out = np.asarray(batch_preprocess_jax(arr[None], 32))[0]
    # different cubic kernels (PIL vs jax.image) — close, not identical
    assert np.abs(out - ref).mean() < 0.12


@needs_native
def test_augmentation_geometry():
    t = SVGTransforms({
        "rotate": {"from": 10, "to": 10},
        "shift_re": {"from": 5, "to": 5},
        "shift_im": {"from": 0, "to": 0},
        "scale": {"from": 1.0, "to": 1.0},
        "p": 1.0,
    })
    svg, img = t.augment(SQUARE)
    assert "<path" in svg
    a = np.asarray(rz.rasterize_svg(SQUARE, 64), np.float32)
    b = np.asarray(img.resize((64, 64)), np.float32)
    assert np.abs(a - b).mean() > 1.0  # actually transformed
    # still mostly a red shape on white
    assert (b[:, :, 0] > 200).mean() > 0.5


@needs_native
def test_augmentation_color_change():
    t = SVGTransforms({"color_change": True, "colors": ["#00ff00"], "p": 1.0})
    svg, img = t.augment(SQUARE)
    assert 'fill="#00ff00"' in svg
    arr = np.asarray(img)
    center = arr[arr.shape[0] // 2, arr.shape[1] // 2]
    assert center[1] > 200 and center[0] < 60


@needs_native
def test_augmentation_noise():
    t = SVGTransforms({
        "noise_std": {"from": 2.0, "to": 2.0}, "noise_type": "gaussian", "p": 1.0,
    })
    svg, _ = t.augment(
        '<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 100 100">'
        '<path d="M 10 10 C 20 20 30 20 40 10" fill="none" stroke="black"/></svg>'
    )
    assert "C" in svg


def test_color_helpers():
    np.testing.assert_allclose(hex2rgb("#ff0000"), [1, 0, 0])
    np.testing.assert_allclose(hex2rgb("red"), [1, 0, 0])
    assert rgb2hex([1, 0, 0]) == "#ff0000"


@needs_native
def test_dataset_from_memory():
    rows = [
        {"Svg": SQUARE, "Filename": "a.svg", "caption_blip2": "a red square",
         "caption_llava": "red box"},
        {"Svg": "<broken", "Filename": "b.svg", "caption_blip2": "x",
         "caption_llava": "y"},
    ]
    ds = SVGStackDataset(rows, "train", im_size=32)
    assert len(ds) == 2
    s0 = ds[0]
    assert s0["image"].shape == (32, 32, 3)
    assert s0["svg"] == SQUARE
    assert any(s0["caption"].startswith(p) for p in (
        "Draw", "Generate", "Create", "Design", "Make"))
    # broken svg → placeholder → white render → placeholder svg
    s1 = ds[1]
    assert s1["svg"] == rz.VOID_SVG


@needs_native
def test_dataset_from_parquet(tmp_path):
    import pandas as pd

    df = pd.DataFrame([
        {"Svg": SQUARE, "Filename": "a.svg", "Caption": "sq"},
    ])
    df.to_parquet(tmp_path / "test.parquet")
    ds = EmojiSVGDataset(str(tmp_path), "test", im_size=32, num_samples=-1)
    assert len(ds) == 1
    assert ds[0]["id"] == "a.svg"


def test_augment_comma_viewbox_and_resolution():
    """Comma-separated viewBox (common in real corpora) must parse, and the
    augmented raster must honor the requested resolution like the clean
    path does (review findings r2)."""
    from starvector_tpu.data.augmentation import SVGTransforms

    tf = SVGTransforms({"rotate": {"from": 5, "to": 10}})
    svg = ('<svg xmlns="http://www.w3.org/2000/svg" viewBox="10,10,100,100">'
           '<path d="M20 20 L80 20 L80 80 Z" fill="red"/></svg>')
    out_svg, im = tf.augment(svg, resolution=64)
    assert im.size == (64, 64)
    assert "<path" in out_svg
    # min-x/min-y offsets honored: (min_x, min_y, w, h)
    assert tf.get_viewbox_size(svg) == (10.0, 10.0, 100.0, 100.0)
