"""Metric calculators: L2/Masked-L2/SSIM math, Fréchet distance, the
orchestrator's per-sample/average/ratio handling."""

import numpy as np
import pytest
from PIL import Image

from starvector_tpu.metrics.l2 import L2DistanceCalculator
from starvector_tpu.metrics.metrics import SVGMetrics
from starvector_tpu.metrics.model_metrics import frechet_distance
from starvector_tpu.metrics.ssim import SSIMDistanceCalculator, ssim_single


def _img(arr):
    return Image.fromarray(arr.astype(np.uint8))


def test_l2_zero_for_identical():
    rng = np.random.RandomState(0)
    a = _img(rng.randint(0, 255, (32, 32, 3)))
    calc = L2DistanceCalculator()
    assert calc.l2_distance(gt_im=a, gen_im=a) == 0.0


def test_l2_known_value():
    a = _img(np.zeros((8, 8, 3)))
    b = _img(np.full((8, 8, 3), 255))
    calc = L2DistanceCalculator()
    assert calc.l2_distance(gt_im=a, gen_im=b) == pytest.approx(1.0)


def test_masked_l2_ignores_nonoverlap():
    # gt has a black square at top-left; gen is all white → no overlap of
    # non-white pixels → masked difference is zero everywhere
    gt = np.full((16, 16, 3), 255)
    gt[:4, :4] = 0
    gen = np.full((16, 16, 3), 255)
    calc = L2DistanceCalculator(masked_l2=True)
    assert calc.l2_distance(gt_im=_img(gt), gen_im=_img(gen)) == pytest.approx(0.0)
    # plain L2 is nonzero
    plain = L2DistanceCalculator()
    assert plain.l2_distance(gt_im=_img(gt), gen_im=_img(gen)) > 0


def test_ssim_identity_and_monotonicity():
    rng = np.random.RandomState(1)
    a = rng.randint(0, 255, (64, 64)).astype(np.uint8)
    assert ssim_single(a, a) == pytest.approx(1.0)
    noisy1 = np.clip(a + rng.normal(0, 10, a.shape), 0, 255)
    noisy2 = np.clip(a + rng.normal(0, 60, a.shape), 0, 255)
    s1 = ssim_single(a, noisy1)
    s2 = ssim_single(a, noisy2)
    assert 1 > s1 > s2


def test_ssim_matches_bruteforce():
    """Cross-check the separable filter against a direct sliding-window
    implementation (skimage-equivalent math)."""
    rng = np.random.RandomState(2)
    a = rng.randint(0, 255, (24, 24)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 20, a.shape), 0, 255)
    win, dr = 7, 255.0
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * dr) ** 2, (K2 * dr) ** 2
    NP = win * win
    cov_norm = NP / (NP - 1)
    vals = []
    r = win // 2
    for i in range(r, 24 - r):
        for j in range(r, 24 - r):
            wa = a[i - r : i + r + 1, j - r : j + r + 1].ravel()
            wb = b[i - r : i + r + 1, j - r : j + r + 1].ravel()
            ux, uy = wa.mean(), wb.mean()
            vx = cov_norm * (np.mean(wa * wa) - ux * ux)
            vy = cov_norm * (np.mean(wb * wb) - uy * uy)
            vxy = cov_norm * (np.mean(wa * wb) - ux * uy)
            vals.append(
                ((2 * ux * uy + C1) * (2 * vxy + C2))
                / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
            )
    ref = float(np.mean(vals))
    out = ssim_single(a, b, win_size=win, data_range=dr)
    assert out == pytest.approx(ref, abs=1e-9)


def test_ssim_rgb_path():
    rng = np.random.RandomState(3)
    a = _img(rng.randint(0, 255, (32, 32, 3)))
    calc = SSIMDistanceCalculator()
    assert calc.compute_SSIM(gt_im=a, gen_im=a) == pytest.approx(1.0)


def test_frechet_distance():
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)
    d = frechet_distance(mu, sigma, mu + 1.0, sigma)
    assert d == pytest.approx(4.0, abs=1e-5)


def test_svg_metrics_orchestrator():
    rng = np.random.RandomState(4)
    gt = [_img(rng.randint(0, 255, (32, 32, 3))) for _ in range(3)]
    gen = [_img(np.asarray(im) // 2) for im in gt]
    batch = {
        "gt_im": gt,
        "gen_im": gen,
        "json": [
            {"sample_id": f"s{i}", "post_processed": i % 2, "no_compile": 0}
            for i in range(3)
        ],
    }
    metrics = SVGMetrics({
        "L2": True, "Masked-L2": True, "SSIM": True,
        "ratio_post_processed": True, "ratio_non_compiling": True,
    })
    avg, per = metrics.calculate_metrics(batch)
    assert set(avg) == {"L2", "Masked-L2", "SSIM", "ratio_post_processed",
                        "ratio_non_compiling"}
    assert avg["ratio_post_processed"] == pytest.approx(1 / 3)
    assert per["s0"]["L2"] > 0
    assert 0 < avg["SSIM"] < 1


def test_base_metric_skips_errors():
    calc = L2DistanceCalculator()
    batch = {"gt_im": [None, _img(np.zeros((8, 8, 3)))],
             "gen_im": [None, _img(np.zeros((8, 8, 3)))]}
    avg, vals = calc.calculate_score(batch)
    # index-aligned: the failed sample holds None at ITS index (fixes the
    # reference's misattribution of survivor scores to wrong sample ids)
    assert vals == [None, 0.0] and avg == 0.0
