"""VQGAN (taming-transformers) convolutional encoder — JAX, channels-last.

Parity target: the reference's 'vqgan' image-encoder backend builds the
taming `Encoder` from a local checkpoint's ddconfig and feeds its
(B, 256, 14, 14) feature map as 196 visual tokens of width 256
(reference: starvector/model/image_encoder/image_encoder.py:63-84,
starvector_base.py:92-94). This is the standard f16 geometry:
ch 128, ch_mult (1,1,2,2,4), 2 res blocks per level, attention at the
deepest level and in the mid stack, GroupNorm(32)+swish everywhere.

TPU-first: NHWC layout end-to-end (XLA's native conv layout on TPU), fp32
GroupNorm, attention via one fused einsum at the 14x14 resolution. Weights
load from a taming checkpoint state dict (weight-gated like the metrics
towers — no checkpoint ships with the repo).
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
class VQGANEncoderConfig:
    in_channels: int = 3
    ch: int = 128
    ch_mult: tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256
    # attention at the deepest level (taming attn_resolutions=[16] with
    # config resolution 256 → last ch_mult level)
    attn_levels: tuple[int, ...] = (4,)
    group_norm_groups: int = 32

    @property
    def num_levels(self) -> int:
        return len(self.ch_mult)

    def tokens_for(self, image_size: int) -> int:
        side = image_size // (2 ** (self.num_levels - 1))
        return side * side


def tiny_config(**kw) -> VQGANEncoderConfig:
    base = dict(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=16,
                attn_levels=(1,), group_norm_groups=4)
    base.update(kw)
    return VQGANEncoderConfig(**base)


# -- parameter construction ---------------------------------------------------

def _conv_p(rng, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    w = jax.random.normal(rng, (kh, kw, cin, cout), dtype) * (fan_in ** -0.5)
    return {"kernel": w, "bias": jnp.zeros((cout,), dtype)}


def _gn_p(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _res_block_p(rng, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(rng, 3)
    p = {
        "norm1": _gn_p(cin, dtype),
        "conv1": _conv_p(k1, 3, 3, cin, cout, dtype),
        "norm2": _gn_p(cout, dtype),
        "conv2": _conv_p(k2, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _conv_p(k3, 1, 1, cin, cout, dtype)
    return p


def _attn_block_p(rng, c, dtype):
    ks = jax.random.split(rng, 4)
    return {
        "norm": _gn_p(c, dtype),
        "q": _conv_p(ks[0], 1, 1, c, c, dtype),
        "k": _conv_p(ks[1], 1, 1, c, c, dtype),
        "v": _conv_p(ks[2], 1, 1, c, c, dtype),
        "proj_out": _conv_p(ks[3], 1, 1, c, c, dtype),
    }


def init_params(cfg: VQGANEncoderConfig, rng: jax.Array, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 64))
    params: dict = {"conv_in": _conv_p(next(keys), 3, 3, cfg.in_channels, cfg.ch, dtype)}
    cin = cfg.ch
    down = []
    for lvl, mult in enumerate(cfg.ch_mult):
        cout = cfg.ch * mult
        blocks, attns = [], []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_res_block_p(next(keys), cin, cout, dtype))
            if lvl in cfg.attn_levels:
                attns.append(_attn_block_p(next(keys), cout, dtype))
            cin = cout
        level: dict = {"block": blocks}
        if attns:
            level["attn"] = attns
        if lvl != cfg.num_levels - 1:
            level["downsample"] = {
                "conv": _conv_p(next(keys), 3, 3, cout, cout, dtype)
            }
        down.append(level)
    params["down"] = down
    params["mid"] = {
        "block_1": _res_block_p(next(keys), cin, cin, dtype),
        "attn_1": _attn_block_p(next(keys), cin, dtype),
        "block_2": _res_block_p(next(keys), cin, cin, dtype),
    }
    params["norm_out"] = _gn_p(cin, dtype)
    params["conv_out"] = _conv_p(next(keys), 3, 3, cin, cfg.z_channels, dtype)
    return params


def partition_rules() -> list[tuple[str, P]]:
    # conv kernels are small relative to the decoders; replicate
    return [(r".*", P(None))]


# -- forward ------------------------------------------------------------------

def _conv(p, x, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(x.dtype)


def _group_norm(p, x, groups, eps=1e-6):
    B, H, W, C = x.shape
    xg = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(B, H, W, C)
    return (out * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _res_block(p, x, groups):
    h = _group_norm(p["norm1"], x, groups)
    h = _conv(p["conv1"], _swish(h))
    h = _group_norm(p["norm2"], h, groups)
    h = _conv(p["conv2"], _swish(h))
    if "nin_shortcut" in p:
        x = _conv(p["nin_shortcut"], x)
    return x + h


def _attn_block(p, x, groups):
    B, H, W, C = x.shape
    h = _group_norm(p["norm"], x, groups)
    q = _conv(p["q"], h).reshape(B, H * W, C)
    k = _conv(p["k"], h).reshape(B, H * W, C)
    v = _conv(p["v"], h).reshape(B, H * W, C)
    s = jnp.einsum("bqc,bkc->bqk", q, k,
                   preferred_element_type=jnp.float32) * (C ** -0.5)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkc->bqc", a, v).reshape(B, H, W, C)
    return x + _conv(p["proj_out"], out)


@functools.partial(jax.jit, static_argnames=("cfg", "policy", "remat"))
def forward(
    params: dict,
    cfg: VQGANEncoderConfig,
    images: jax.Array,            # (B, H, W, 3) normalized, channels-last
    *,
    policy: DTypePolicy = DTypePolicy(),
    remat: bool = False,
) -> jax.Array:
    """Returns (B, tokens, z_channels) — the flattened feature map, matching
    the reference's `out.view(B, C, -1).permute(0, 2, 1)`."""
    del remat  # conv tower is shallow; nothing worth rematerializing
    g = cfg.group_norm_groups
    x = _conv(params["conv_in"], policy.cast(images))
    for lvl, level in enumerate(params["down"]):
        for i, bp in enumerate(level["block"]):
            x = _res_block(bp, x, g)
            if "attn" in level:
                x = _attn_block(level["attn"][i], x, g)
        if "downsample" in level:
            # taming pads (0,1,0,1) then convs stride 2 with VALID
            xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = _conv(level["downsample"]["conv"], xp, stride=2,
                      padding="VALID")
    x = _res_block(params["mid"]["block_1"], x, g)
    x = _attn_block(params["mid"]["attn_1"], x, g)
    x = _res_block(params["mid"]["block_2"], x, g)
    x = _group_norm(params["norm_out"], x, g)
    x = _conv(params["conv_out"], _swish(x))
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C)


# -- checkpoint conversion ----------------------------------------------------

def from_torch_state_dict(
    sd: dict, cfg: VQGANEncoderConfig, dtype=jnp.float32,
    prefix: str = "encoder.",
) -> dict:
    """Convert a taming checkpoint's encoder weights (torch OIHW convs) to
    this module's pytree (reference loads the same subtree,
    image_encoder.py:74-84)."""

    def conv(name):
        w = np.asarray(sd[prefix + name + ".weight"], np.float32)
        return {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),  # OIHW→HWIO
            "bias": jnp.asarray(np.asarray(sd[prefix + name + ".bias"]), dtype),
        }

    def gn(name):
        return {
            "scale": jnp.asarray(np.asarray(sd[prefix + name + ".weight"]), dtype),
            "bias": jnp.asarray(np.asarray(sd[prefix + name + ".bias"]), dtype),
        }

    def res(name, has_nin):
        p = {
            "norm1": gn(name + ".norm1"), "conv1": conv(name + ".conv1"),
            "norm2": gn(name + ".norm2"), "conv2": conv(name + ".conv2"),
        }
        if has_nin:
            p["nin_shortcut"] = conv(name + ".nin_shortcut")
        return p

    def attn(name):
        return {
            "norm": gn(name + ".norm"), "q": conv(name + ".q"),
            "k": conv(name + ".k"), "v": conv(name + ".v"),
            "proj_out": conv(name + ".proj_out"),
        }

    params: dict = {"conv_in": conv("conv_in")}
    down = []
    cin = cfg.ch
    for lvl, mult in enumerate(cfg.ch_mult):
        cout = cfg.ch * mult
        blocks, attns = [], []
        for i in range(cfg.num_res_blocks):
            blocks.append(res(f"down.{lvl}.block.{i}", cin != cout))
            if f"{prefix}down.{lvl}.attn.{i}.norm.weight" in sd:
                attns.append(attn(f"down.{lvl}.attn.{i}"))
            cin = cout
        level: dict = {"block": blocks}
        if attns:
            level["attn"] = attns
        if f"{prefix}down.{lvl}.downsample.conv.weight" in sd:
            level["downsample"] = {"conv": conv(f"down.{lvl}.downsample.conv")}
        down.append(level)
    params["down"] = down
    params["mid"] = {
        "block_1": res("mid.block_1", False),
        "attn_1": attn("mid.attn_1"),
        "block_2": res("mid.block_2", False),
    }
    params["norm_out"] = gn("norm_out")
    params["conv_out"] = conv("conv_out")
    return params
