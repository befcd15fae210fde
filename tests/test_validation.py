"""Validation harness end-to-end: tiny model → generate → post-process →
save layout → metrics files (SURVEY.md §4 tier 5)."""

import json
import os

import numpy as np
import pytest

from starvector_tpu.api import StarVectorForCausalLM
from starvector_tpu.config import ConfigNode
from starvector_tpu.data import rasterize as rz
from starvector_tpu.models import starvector as sv
from starvector_tpu.validation.jax_validator import StarVectorJAXValidator
from starvector_tpu.validation.svg_validator_base import validator_registry

needs_native = pytest.mark.skipif(
    not rz.rasterizer_available(), reason="librsvg/cairo unavailable"
)

SQUARE = (
    '<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 100 100">'
    '<path d="M 20 20 L 80 20 L 80 80 L 20 80 Z" fill="#ff0000"/></svg>'
)


class _MemDataset:
    """Mimics dataset __getitem__ contract without rasterizing."""

    def __init__(self, n, im_size):
        self.n = n
        self.im_size = im_size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        return {
            "image": rng.randn(self.im_size, self.im_size, 3).astype(np.float32),
            "svg": SQUARE,
            "id": f"sample{i}.svg",
            "caption": "a red square",
        }


@needs_native
@pytest.mark.slow
def test_validator_end_to_end(tmp_path, monkeypatch):
    cfg = ConfigNode({
        "run": {"out_dir": str(tmp_path / "eval")},
        "model": {"task": "im2svg", "name": "tiny", "generation_engine": "jax",
                  "from_checkpoint": None},
        "dataset": {
            "target": "tests.test_validation._MemDataset",
            "batch_size": 2,
            "num_samples": 4,
            "params": {"n": 4, "im_size": 28},
        },
        "generation_params": {"max_new_tokens": 8, "temperature": 0.0,
                              "generation_sweep": False},
        "metrics": {"L2": True, "SSIM": True, "ratio_post_processed": True,
                    "ratio_non_compiling": True},
    })
    model = StarVectorForCausalLM.from_config(sv.tiny_config())
    validator = StarVectorJAXValidator(cfg, model=model)
    avg, all_results = validator.validate()

    assert set(avg) >= {"L2", "SSIM", "ratio_post_processed", "ratio_non_compiling"}
    # tiny random model emits garbage → placeholder; all samples post-processed
    assert avg["ratio_non_compiling"] == 1.0
    assert len(all_results) == 4

    out = validator.out_dir
    sdir = os.path.join(out, "sample0")
    for suffix in (".svg", "_raw.svg", "_gt.svg", "_generated.png",
                   "_original.png"):
        assert os.path.exists(os.path.join(sdir, "sample0" + suffix)), suffix
    meta = json.load(open(os.path.join(sdir, "metadata.json")))
    assert meta["no_compile"] is True and meta["post_processed"] is True
    assert os.path.exists(os.path.join(out, "results", "results_avg.json"))
    assert os.path.exists(os.path.join(out, "results", "all_results.csv"))


@needs_native
def test_post_process_chain():
    cfg = ConfigNode({
        "run": {"out_dir": "/tmp/ppc"},
        "model": {"task": "im2svg", "name": "t", "generation_engine": "jax",
                  "from_checkpoint": None},
        "metrics": {"L2": True},
    })
    model = StarVectorForCausalLM.from_config(sv.tiny_config())
    v = StarVectorJAXValidator(cfg, model=model)
    ok = v.post_process_svg(SQUARE)
    assert ok["svg"] == SQUARE and not ok["post_processed"] and not ok["no_compile"]
    bad = v.post_process_svg("<svg><path d='M 0 L'/></svg>")
    assert bad["post_processed"]
    garbage = v.post_process_svg("complete garbage")
    assert garbage["no_compile"] and garbage["svg"] == rz.VOID_SVG


def test_registry():
    assert "StarVectorJAXValidator" in validator_registry


@needs_native
@pytest.mark.slow
def test_temperature_sweep(tmp_path):
    cfg = ConfigNode({
        "run": {"out_dir": str(tmp_path / "sweep")},
        "model": {"task": "im2svg", "name": "tiny", "generation_engine": "jax",
                  "from_checkpoint": None},
        "dataset": {
            "target": "tests.test_validation._MemDataset",
            "batch_size": 2,
            "num_samples": 2,
            "params": {"n": 2, "im_size": 28},
        },
        "generation_params": {"max_new_tokens": 6, "temperature": 1.0,
                              "generation_sweep": True},
        "generation_sweep": {"min_temperature": 0.0, "max_temperature": 1.0,
                             "num_generations_different_temp": 2},
        "metrics": {"L2": True, "ratio_post_processed": True,
                    "ratio_non_compiling": True},
    })
    model = StarVectorForCausalLM.from_config(sv.tiny_config())
    validator = StarVectorJAXValidator(cfg, model=model)
    avg, all_results = validator.validate()
    assert len(all_results) == 2
    # per-sample results hold one entry per temperature internally
    first = validator.results[list(validator.results)[0]]
    assert len(first) == 2  # two temperatures


def test_cli_engine_mapping():
    """validate.py maps the reference's engine short names (hf/vllm/
    vllm-api, reference validate.py:8-31) onto the TPU backends, and
    rejects unknown engines loudly."""
    from starvector_tpu.validation import validate as vcli
    from starvector_tpu.validation.serve_validator import StarVectorServeValidator

    base = {
        "run": {"out_dir": "/tmp/eval-cli-test"},
        "model": {"task": "im2svg", "name": "t", "from_checkpoint": None,
                  "generation_engine": "vllm"},
        "dataset": {"target": "tests.test_validation._MemDataset",
                    "params": {"n": 1, "im_size": 28}},
        "generation_params": {}, "metrics": {},
    }
    v = vcli.get_validator(ConfigNode(base))
    assert isinstance(v, StarVectorServeValidator)

    base["model"]["generation_engine"] = "nope"
    with pytest.raises(ValueError, match="not registered"):
        vcli.get_validator(ConfigNode(base))
