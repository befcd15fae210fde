"""ConvNeXt-Base trunk (open_clip 'convnext_base_w' visual tower) — JAX.

Parity target: the reference's 'convnext' backend runs
`model.visual.trunk.forward_features(image)` from open_clip and flattens the
(B, 1024, 7, 7) final stage map into 49 visual tokens of width 1024
(reference: starvector/model/image_encoder/image_encoder.py:86-89, :103-107;
starvector_base.py:96-98).

Geometry (ConvNeXt-Base): stem 4x4/4 conv → LN; 4 stages with depths
(3, 3, 27, 3) and dims (128, 256, 512, 1024); between stages LN + 2x2/2
conv downsample. Block: 7x7 depthwise conv → LN → pointwise 4x expand →
GELU → pointwise project → layer-scale gamma → residual.

TPU-first: NHWC end-to-end; the pointwise MLP runs as einsum on the MXU;
depthwise convs lower to XLA's native NHWC depthwise path. Weights load
from an open_clip state dict (weight-gated; no checkpoint ships here).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from starvector_tpu.ops.layers import DTypePolicy


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: tuple[int, ...] = (3, 3, 27, 3)
    dims: tuple[int, ...] = (128, 256, 512, 1024)
    patch: int = 4
    ln_eps: float = 1e-6

    def tokens_for(self, image_size: int) -> int:
        side = image_size // (self.patch * 2 ** (len(self.dims) - 1))
        return side * side


def tiny_config(**kw) -> ConvNeXtConfig:
    base = dict(depths=(1, 1), dims=(8, 16))
    base.update(kw)
    return ConvNeXtConfig(**base)


def _conv_p(rng, kh, kw, cin, cout, dtype, groups=1):
    fan_in = kh * kw * cin // groups
    w = jax.random.normal(rng, (kh, kw, cin // groups, cout), dtype) * (
        fan_in ** -0.5
    )
    return {"kernel": w, "bias": jnp.zeros((cout,), dtype)}


def _ln_p(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _block_p(rng, dim, dtype):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "conv_dw": _conv_p(k1, 7, 7, dim, dim, dtype, groups=dim),
        "norm": _ln_p(dim, dtype),
        "mlp": {
            "fc1": {
                "kernel": jax.random.normal(k2, (dim, 4 * dim), dtype) * dim ** -0.5,
                "bias": jnp.zeros((4 * dim,), dtype),
            },
            "fc2": {
                "kernel": jax.random.normal(k3, (4 * dim, dim), dtype)
                * (4 * dim) ** -0.5,
                "bias": jnp.zeros((dim,), dtype),
            },
        },
        "gamma": jnp.full((dim,), 1e-6, dtype),
    }


def init_params(cfg: ConvNeXtConfig, rng: jax.Array, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 8 + sum(cfg.depths)))
    params: dict = {
        "stem": {
            "conv": _conv_p(next(keys), cfg.patch, cfg.patch, 3, cfg.dims[0], dtype),
            "norm": _ln_p(cfg.dims[0], dtype),
        }
    }
    stages = []
    for si, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        stage: dict = {"blocks": [_block_p(next(keys), dim, dtype)
                                  for _ in range(depth)]}
        if si > 0:
            stage["downsample"] = {
                "norm": _ln_p(cfg.dims[si - 1], dtype),
                "conv": _conv_p(next(keys), 2, 2, cfg.dims[si - 1], dim, dtype),
            }
        stages.append(stage)
    params["stages"] = stages
    return params


def partition_rules() -> list[tuple[str, P]]:
    return [(r".*", P(None))]


def _conv(p, x, stride=1, groups=1):
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride), padding="SAME" if stride == 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return out + p["bias"].astype(x.dtype)


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _block(p, cfg, x):
    dim = x.shape[-1]
    h = _conv(p["conv_dw"], x, groups=dim)
    h = _ln(p["norm"], h, cfg.ln_eps)
    h = jnp.einsum("bhwc,cd->bhwd", h, p["mlp"]["fc1"]["kernel"].astype(h.dtype))
    h = h + p["mlp"]["fc1"]["bias"].astype(h.dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.einsum("bhwc,cd->bhwd", h, p["mlp"]["fc2"]["kernel"].astype(h.dtype))
    h = h + p["mlp"]["fc2"]["bias"].astype(h.dtype)
    return x + h * p["gamma"].astype(h.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "policy", "remat"))
def forward(
    params: dict,
    cfg: ConvNeXtConfig,
    images: jax.Array,            # (B, H, W, 3) normalized, channels-last
    *,
    policy: DTypePolicy = DTypePolicy(),
    remat: bool = False,
) -> jax.Array:
    """Returns (B, tokens, dims[-1]) — flattened final stage features
    (reference forward_features → view/permute, image_encoder.py:103-107)."""
    del remat
    x = _conv(params["stem"]["conv"], policy.cast(images), stride=cfg.patch)
    x = _ln(params["stem"]["norm"], x, cfg.ln_eps)
    for stage in params["stages"]:
        if "downsample" in stage:
            x = _ln(stage["downsample"]["norm"], x, cfg.ln_eps)
            x = _conv(stage["downsample"]["conv"], x, stride=2)
        for bp in stage["blocks"]:
            x = _block(bp, cfg, x)
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C)


def from_torch_state_dict(
    sd: dict, cfg: ConvNeXtConfig, dtype=jnp.float32,
    prefix: str = "visual.trunk.",
) -> dict:
    """Convert an open_clip convnext state dict (timm trunk naming)."""

    def conv(name, groups=1):
        w = np.asarray(sd[prefix + name + ".weight"], np.float32)
        return {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
            "bias": jnp.asarray(np.asarray(sd[prefix + name + ".bias"]), dtype),
        }

    def ln(name):
        return {
            "scale": jnp.asarray(np.asarray(sd[prefix + name + ".weight"]), dtype),
            "bias": jnp.asarray(np.asarray(sd[prefix + name + ".bias"]), dtype),
        }

    def lin(name):
        w = np.asarray(sd[prefix + name + ".weight"], np.float32)
        return {
            "kernel": jnp.asarray(w.T, dtype),
            "bias": jnp.asarray(np.asarray(sd[prefix + name + ".bias"]), dtype),
        }

    params: dict = {"stem": {"conv": conv("stem.0"), "norm": ln("stem.1")}}
    stages = []
    for si, depth in enumerate(cfg.depths):
        stage: dict = {"blocks": []}
        if si > 0:
            stage["downsample"] = {
                "norm": ln(f"stages.{si}.downsample.0"),
                "conv": conv(f"stages.{si}.downsample.1"),
            }
        for bi in range(depth):
            base = f"stages.{si}.blocks.{bi}"
            stage["blocks"].append({
                "conv_dw": conv(base + ".conv_dw", groups=cfg.dims[si]),
                "norm": ln(base + ".norm"),
                "mlp": {"fc1": lin(base + ".mlp.fc1"),
                        "fc2": lin(base + ".mlp.fc2")},
                "gamma": jnp.asarray(np.asarray(sd[prefix + base + ".gamma"]), dtype),
            })
        stages.append(stage)
    params["stages"] = stages
    return params
