"""Real LPIPS-VGG + InceptionV3 architectures (reference inception.py,
compute_LPIPS.py): building-block numeric parity vs torch, full-net smoke
with random weights, converter naming roundtrip, FID end-to-end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.metrics import inception_v3, lpips_vgg


def test_basic_conv_bn_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    w = rng.randn(8, 3, 3, 3).astype(np.float32)
    mean = rng.randn(8).astype(np.float32)
    var = rng.rand(8).astype(np.float32) + 0.5
    gamma = rng.randn(8).astype(np.float32)
    beta = rng.randn(8).astype(np.float32)
    x = rng.randn(1, 3, 12, 12).astype(np.float32)

    tx = torch.from_numpy(x)
    t = torch.nn.functional.conv2d(tx, torch.from_numpy(w), stride=2)
    t = torch.nn.functional.batch_norm(
        t, torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(gamma), torch.from_numpy(beta), eps=1e-3,
    )
    t = torch.nn.functional.relu(t).numpy()

    p = {
        "conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))},
        "bn": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta),
               "mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    j = np.asarray(inception_v3._basic_conv(
        p, jnp.asarray(x.transpose(0, 2, 3, 1)), 2, (0, 0)
    ))
    np.testing.assert_allclose(j, t.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_avgpool_no_count_pad_matches_torch():
    import torch

    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 9, 9).astype(np.float32)
    t = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x), 3, stride=1, padding=1, count_include_pad=False
    ).numpy()
    j = np.asarray(inception_v3._avgpool3s1_nocountpad(
        jnp.asarray(x.transpose(0, 2, 3, 1))
    ))
    np.testing.assert_allclose(j, t.transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_inception_features_shape_and_converter():
    params = inception_v3.init_random(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 299, 299, 3)) * 2 - 1
    f = inception_v3.features(params, x)
    assert f.shape == (1, inception_v3.FEATURE_DIM)
    assert np.isfinite(np.asarray(f)).all()

    # synthesize a torch-named state dict from the same params; converting it
    # back must reproduce the features exactly (validates the naming map)
    sd = {}

    def put(name, p):
        sd[name + ".conv.weight"] = np.asarray(p["conv"]["kernel"]).transpose(3, 2, 0, 1)
        sd[name + ".bn.weight"] = np.asarray(p["bn"]["scale"])
        sd[name + ".bn.bias"] = np.asarray(p["bn"]["bias"])
        sd[name + ".bn.running_mean"] = np.asarray(p["bn"]["mean"])
        sd[name + ".bn.running_var"] = np.asarray(p["bn"]["var"])

    for name, *_ in inception_v3._stem():
        if name != "maxpool":
            put(name, params[name])
    for name, spec, _ in inception_v3._MIXED:
        for br, convs in spec.items():
            for i in range(len(convs)):
                t = f"{name}.{br}" if len(convs) == 1 else f"{name}.{br}_{i + 1}"
                put(t, params[name][br][i])

    conv = inception_v3.from_torch_state_dict(sd)
    f2 = inception_v3.features(conv, x)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_lpips_vgg_smoke():
    params = lpips_vgg.init_random(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 2 - 1
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 2 - 1
    d_same = np.asarray(lpips_vgg.lpips_distance(params, x, x))
    d_diff = np.asarray(lpips_vgg.lpips_distance(params, x, y))
    assert d_same.shape == (2,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 0).all()


@pytest.mark.slow
def test_fid_inception_end_to_end(tmp_path):
    """FIDCalculator drives the real InceptionV3 path from a .pth file."""
    import torch
    from PIL import Image

    from starvector_tpu.metrics.model_metrics import FIDCalculator

    params = inception_v3.init_random(jax.random.PRNGKey(3))
    sd = {}

    def put(name, p):
        sd[name + ".conv.weight"] = torch.from_numpy(
            np.asarray(p["conv"]["kernel"]).transpose(3, 2, 0, 1).copy())
        sd[name + ".bn.weight"] = torch.from_numpy(np.asarray(p["bn"]["scale"]).copy())
        sd[name + ".bn.bias"] = torch.from_numpy(np.asarray(p["bn"]["bias"]).copy())
        sd[name + ".bn.running_mean"] = torch.from_numpy(np.asarray(p["bn"]["mean"]).copy())
        sd[name + ".bn.running_var"] = torch.from_numpy(np.asarray(p["bn"]["var"]).copy())

    for name, *_ in inception_v3._stem():
        if name != "maxpool":
            put(name, params[name])
    for name, spec, _ in inception_v3._MIXED:
        for br, convs in spec.items():
            for i in range(len(convs)):
                t = f"{name}.{br}" if len(convs) == 1 else f"{name}.{br}_{i + 1}"
                put(t, params[name][br][i])
    f = tmp_path / "inception_v3.pth"
    torch.save(sd, str(f))

    calc = FIDCalculator(model_name="InceptionV3", model_path=str(f))
    rng = np.random.RandomState(0)
    mk = lambda: Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    batch = {"gt_im": [mk() for _ in range(4)], "gen_im": [mk() for _ in range(4)]}
    score = calc.calculate_score(batch)
    assert np.isfinite(score) and score >= 0


@pytest.mark.slow  # ~17 s: full VGG16 build + calibration load
def test_lpips_calculator_uses_vgg_weights(tmp_path):
    """LPIPSDistanceCalculator loads vgg16.pth + lpips_vgg.pth when present."""
    import torch
    from PIL import Image

    from starvector_tpu.metrics.model_metrics import LPIPSDistanceCalculator

    params = lpips_vgg.init_random(jax.random.PRNGKey(4))
    vgg_sd, lin_sd = {}, {}
    flat = [i for idxs in lpips_vgg._TORCH_IDX for i in idxs]
    convs = [c for blk in params["blocks"] for c in blk]
    for i, c in zip(flat, convs):
        vgg_sd[f"features.{i}.weight"] = torch.from_numpy(
            np.asarray(c["kernel"]).transpose(3, 2, 0, 1).copy())
        vgg_sd[f"features.{i}.bias"] = torch.from_numpy(np.asarray(c["bias"]).copy())
    for i, w in enumerate(params["lins"]):
        lin_sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.asarray(w).reshape(-1, 1, 1, 1).copy())
    d = tmp_path / "lpips-vgg"
    os.makedirs(d)
    torch.save(vgg_sd, str(d / "vgg16.pth"))
    torch.save(lin_sd, str(d / "lpips_vgg.pth"))

    calc = LPIPSDistanceCalculator(model_path=str(d))
    rng = np.random.RandomState(1)
    im1 = Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8))
    im2 = Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8))
    d_same = calc.lpips(gt_im=im1, gen_im=im1)
    d_diff = calc.lpips(gt_im=im1, gen_im=im2)
    assert d_same == pytest.approx(0.0, abs=1e-6)
    assert d_diff > 0
