"""High-level API smoke: quickstart-parity flow image → svg text → raster
(SURVEY.md §4 tier 5, BASELINE config 1 shape)."""

import numpy as np
import pytest

from starvector_tpu.api import StarVectorForCausalLM, StarVectorPipeline
from starvector_tpu.data import rasterize as rz
from starvector_tpu.models import starvector as sv


@pytest.fixture(scope="module")
def model():
    cfg = sv.tiny_config()
    return StarVectorForCausalLM.from_config(cfg)


def test_generate_im2svg_decodes_text(model):
    import jax.numpy as jnp

    images = jnp.zeros((2, model.cfg.image_size, model.cfg.image_size, 3))
    out = model.generate_im2svg(
        {"image": images}, max_new_tokens=8, use_nucleus_sampling=False
    )
    assert len(out) == 2
    assert all(isinstance(s, str) and s.startswith("<svg") for s in out)


def test_generate_text2svg(model):
    out = model.generate_text2svg(
        {"caption": ["a red square"]}, max_new_tokens=6,
        use_nucleus_sampling=False,
    )
    assert len(out) == 1 and isinstance(out[0], str)


def test_num_return_sequences(model):
    import jax.numpy as jnp

    images = jnp.zeros((1, model.cfg.image_size, model.cfg.image_size, 3))
    out = model.generate_im2svg(
        {"image": images}, max_new_tokens=4, num_return_sequences=3
    )
    assert len(out) == 3


@pytest.mark.skipif(not rz.rasterizer_available(), reason="no librsvg")
def test_pipeline_end_to_end(model):
    from PIL import Image

    pipe = StarVectorPipeline(model)
    img = Image.new("RGB", (64, 64), (200, 30, 30))
    result = pipe(img, max_new_tokens=8, use_nucleus_sampling=False)
    assert "raw_svg" in result and result["raw_svg"].startswith("<svg")
    # invalid generated svg (random model) must fall back to the placeholder
    assert result["svg"] in (result["raw_svg"], rz.VOID_SVG) or "<svg" in result["svg"]
    assert np.asarray(result["raster"]).shape[2] == 3


def test_loss_via_forward(model):
    import jax.numpy as jnp

    B, S = 2, 8
    batch = {
        "image": jnp.zeros((B, model.cfg.image_size, model.cfg.image_size, 3)),
        "svg_ids": jnp.ones((B, S), jnp.int32),
        "svg_mask": jnp.ones((B, S), jnp.int32),
    }
    loss = model.forward(batch)
    assert np.isfinite(float(loss))


def test_generate_im2svg_speculative(model):
    import jax.numpy as jnp

    images = jnp.zeros((1, model.cfg.image_size, model.cfg.image_size, 3))
    normal = model.generate_im2svg(
        {"image": images}, max_new_tokens=10, use_nucleus_sampling=False
    )
    spec = model.generate_im2svg(
        {"image": images}, max_new_tokens=10, use_nucleus_sampling=False,
        use_speculative=True,
    )
    assert spec == normal
