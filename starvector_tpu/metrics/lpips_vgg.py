"""LPIPS (VGG16 variant) — real architecture, JAX, channels-last.

Parity target: the reference computes perceptual distance with the `lpips`
package's VGG16 net (reference: starvector/metrics/compute_LPIPS.py:9-55):
  d(x, y) = Σ_l  mean_hw ‖ w_l ⊙ ( x̂_l − ŷ_l ) ‖²
where x̂_l are channel-unit-normalized VGG16 activations at relu1_2, relu2_2,
relu3_3, relu4_3, relu5_3, and w_l are the LPIPS linear (1x1, non-negative)
calibration weights. Inputs are scaled to [-1, 1] then normalized by the
package's fixed shift/scale.

Weights load from torch state dicts (torchvision VGG16 `features.*` + the
lpips `lin*.model.1.weight` tensors) under STARVECTOR_METRICS_DIR — the
image is zero-egress, so the weights are checkpoint-gated like every other
neural metric. With `init_random` the architecture runs end-to-end for
tests."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# lpips package ScalingLayer constants (inputs in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv layout: (out_channels, convs in block); relu taps after each block
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
# torchvision `features` indices of the conv layers, block by block
_TORCH_IDX = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))


def init_random(rng: jax.Array, dtype=jnp.float32) -> dict:
    """Random-weight net (architecture smoke tests)."""
    keys = iter(jax.random.split(rng, 32))
    params: dict = {"blocks": []}
    cin = 3
    for cout, n_convs in _VGG_BLOCKS:
        convs = []
        for _ in range(n_convs):
            k = next(keys)
            w = jax.random.normal(k, (3, 3, cin, cout), dtype) * (
                (9 * cin) ** -0.5
            )
            convs.append({"kernel": w, "bias": jnp.zeros((cout,), dtype)})
            cin = cout
        params["blocks"].append(convs)
    params["lins"] = [
        jnp.abs(jax.random.normal(next(keys), (c,), dtype)) * 0.1
        for c, _ in _VGG_BLOCKS
    ]
    return params


def from_torch_state_dicts(vgg_sd: dict, lpips_sd: dict, dtype=jnp.float32) -> dict:
    """vgg_sd: torchvision vgg16 state dict (features.N.weight OIHW);
    lpips_sd: lpips 'vgg' checkpoint (lin{i}.model.1.weight, (C,1,1,1))."""
    params: dict = {"blocks": []}
    for idxs in _TORCH_IDX:
        convs = []
        for i in idxs:
            w = np.asarray(vgg_sd[f"features.{i}.weight"], np.float32)
            b = np.asarray(vgg_sd[f"features.{i}.bias"], np.float32)
            convs.append({
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
                "bias": jnp.asarray(b, dtype),
            })
        params["blocks"].append(convs)
    params["lins"] = [
        jnp.asarray(
            np.asarray(lpips_sd[f"lin{i}.model.1.weight"], np.float32).reshape(-1),
            dtype,
        )
        for i in range(5)
    ]
    return params


def _conv(p, x):
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(x.dtype)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


@functools.partial(jax.jit, static_argnames=())
def _taps(params: dict, x: jax.Array) -> list[jax.Array]:
    """x in [-1,1], (B,H,W,3) → the five relu taps."""
    x = (x - _SHIFT) / _SCALE
    taps = []
    for bi, convs in enumerate(params["blocks"]):
        if bi > 0:
            x = _maxpool2(x)
        for p in convs:
            x = jax.nn.relu(_conv(p, x))
        taps.append(x)
    return taps


@jax.jit
def lpips_distance(params: dict, x: jax.Array, y: jax.Array) -> jax.Array:
    """x, y: (B, H, W, 3) in [-1, 1]. Returns (B,) LPIPS distances."""
    tx = _taps(params, x)
    ty = _taps(params, y)
    total = 0.0
    for fx, fy, w in zip(tx, ty, params["lins"]):
        nx = fx * jax.lax.rsqrt(jnp.sum(fx * fx, -1, keepdims=True) + 1e-10)
        ny = fy * jax.lax.rsqrt(jnp.sum(fy * fy, -1, keepdims=True) + 1e-10)
        d = (nx - ny) ** 2                       # (B, H, W, C)
        total = total + jnp.mean(jnp.sum(d * w, -1), axis=(1, 2))
    return total


def preprocess(pil_images, size: int = 224) -> jnp.ndarray:
    """PIL → (B, size, size, 3) in [-1, 1] (the lpips convention; the
    reference feeds [0,1] tensors with normalize=True, compute_LPIPS.py:30)."""
    arrs = []
    for im in pil_images:
        im = im.convert("RGB").resize((size, size))
        arrs.append(np.asarray(im, np.float32) / 255.0 * 2.0 - 1.0)
    return jnp.asarray(np.stack(arrs))
