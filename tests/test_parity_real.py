"""Real-checkpoint fidelity harness (VERDICT r2 #1).

The harness machinery is fully exercised here on a tiny random model; the
real-weights test runs only when STARVECTOR_CKPT_DIR points at a converted
StarVector checkpoint (zero-egress image — weights may never be present,
so it skips with a reason rather than failing)."""

import json
import os

import jax
import pytest

from starvector_tpu.api import StarVectorForCausalLM
from starvector_tpu.models import starvector as sv
from starvector_tpu.validation import parity_real
from starvector_tpu.validation.parity_samples import SAMPLES

CKPT = os.environ.get("STARVECTOR_CKPT_DIR")


@pytest.fixture(scope="module")
def tiny_model():
    return StarVectorForCausalLM.from_config(
        sv.tiny_config(), jax.random.PRNGKey(0)
    )


def test_probe_set_rasterizes():
    """Every committed probe SVG must rasterize to a non-white image —
    otherwise its metrics are vacuous."""
    import numpy as np

    from starvector_tpu.data.rasterize import rasterize_svg, rasterizer_available

    if not rasterizer_available():
        pytest.skip("native rasterizer not built")
    for sid, svg in SAMPLES:
        img = np.asarray(rasterize_svg(svg, 224))
        assert img.shape == (224, 224, 3), sid
        assert img.min() < 250, f"{sid} rasterized all-white"


def test_score_generation_identity():
    from starvector_tpu.data.rasterize import rasterizer_available

    if not rasterizer_available():
        pytest.skip("native rasterizer not built")
    sid, svg = SAMPLES[0]
    scores = parity_real.score_generation(svg, svg)
    assert scores["mse"] < 1e-6
    assert scores["ssim"] > 0.999
    assert not scores["post_processed"]


def test_run_parity_synthetic(tiny_model, tmp_path):
    """Full harness pass on a tiny random model: JAX generation + scoring +
    converter round trip + report artifact. Random weights give garbage SVG
    (that's fine — the plumbing is under test, thresholds are not)."""
    from starvector_tpu.data.rasterize import rasterizer_available

    if not rasterizer_available():
        pytest.skip("native rasterizer not built")
    report = parity_real.run_parity(
        "synthetic", str(tmp_path),
        model=tiny_model,
        samples=SAMPLES[:2],
        max_new_tokens=8,
        resolution=64,
        with_reference=False,
    )
    assert report["jax"]["mean_mse"] >= 0
    assert len(report["jax"]["per_sample"]) == 2
    rt = report["converter_roundtrip"]
    assert rt["bit_exact"], rt["mismatched"]
    on_disk = json.load(open(tmp_path / "parity_report.json"))
    assert on_disk["n_samples"] == 2
    assert (tmp_path / f"{SAMPLES[0][0]}.jax.svg").exists()


def test_token_match_semantics(tiny_model):
    tok = tiny_model.tokenizer
    m = parity_real.token_match(tok, "<svg a b", "<svg a b")
    assert m["exact"] and m["prefix_ratio"] == 1.0
    m2 = parity_real.token_match(tok, "<svg a b", "<svg a c d")
    assert not m2["exact"]
    assert 0 < m2["prefix_match"] <= m2["len_a"]


@pytest.mark.skipif(
    not (CKPT and os.path.isdir(CKPT)),
    reason="STARVECTOR_CKPT_DIR not set — real-weights parity needs a "
    "converted StarVector checkpoint (zero-egress image)",
)
def test_real_checkpoint_parity(tmp_path):
    """The north-star artifact: greedy decode fidelity of a real converted
    checkpoint. Thresholds follow the SVG-Bench protocol (BASELINE.md —
    MSE/SSIM parity; reference README.md:156-168)."""
    report = parity_real.run_parity(
        CKPT, str(tmp_path), samples=SAMPLES, max_new_tokens=1024
    )
    assert report["converter_roundtrip"]["bit_exact"]
    # reconstruction quality: a real im2svg model reproduces simple probe
    # shapes well (paper DinoScore ≥0.92 on much harder samples)
    assert report["jax"]["mean_ssim"] > 0.8
    ref = report.get("reference", {})
    if "token_exact_rate" in ref:
        # greedy parity: tokens should agree up to numerics
        assert ref["token_prefix_ratio"] > 0.95
        assert abs(ref["mse_delta_vs_jax"]) < 0.01
        assert abs(ref["ssim_delta_vs_jax"]) < 0.02
