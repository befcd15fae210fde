"""open_clip ViT visual tower — JAX (thin layer over clip_vit).

Parity target: the reference's 'open-clip' backend feeds
`self.visual_encoder(image)[1]` — the 256 PATCH tokens (CLS excluded) of an
open_clip VisionTransformer — through its external ln_vision
(reference: starvector/model/image_encoder/image_encoder.py:96-98,
starvector_base.py:90-91: hidden = transformer.width, query_length = 256).

Differences from the vendored LAVIS tower (clip_vit.py): GELU instead of
QuickGELU, an in-tower ln_post, and the CLS token dropped from the output.
The transformer trunk itself is identical, so this module reuses clip_vit's
parameters/forward with `act="gelu"` and adds the ln_post + token slice.
Weights load from an open_clip state dict (weight-gated)."""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from starvector_tpu.models.vision import clip_vit
from starvector_tpu.ops.layers import (
    DTypePolicy, layer_norm, make_layer_norm_params,
)


@dataclasses.dataclass(frozen=True)
class OpenCLIPViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    ln_eps: float = 1e-5

    @property
    def trunk(self) -> clip_vit.CLIPViTConfig:
        return clip_vit.CLIPViTConfig(
            image_size=self.image_size, patch_size=self.patch_size,
            width=self.width, layers=self.layers, heads=self.heads,
            ln_eps=self.ln_eps, act="gelu",
        )

    @property
    def num_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2  # CLS excluded


def tiny_config(**kw) -> OpenCLIPViTConfig:
    base = dict(image_size=28, patch_size=7, width=32, layers=2, heads=4)
    base.update(kw)
    return OpenCLIPViTConfig(**base)


def init_params(cfg: OpenCLIPViTConfig, rng: jax.Array, dtype=jnp.float32) -> dict:
    k1, _ = jax.random.split(rng)
    p = clip_vit.init_params(cfg.trunk, k1, dtype)
    p["ln_post"] = make_layer_norm_params(cfg.width, dtype)
    return p


def partition_rules() -> list[tuple[str, P]]:
    return clip_vit.partition_rules() + [(r"ln_post/", P(None))]


@functools.partial(jax.jit, static_argnames=("cfg", "policy", "remat"))
def forward(
    params: dict,
    cfg: OpenCLIPViTConfig,
    images: jax.Array,            # (B, H, W, 3) normalized
    *,
    policy: DTypePolicy = DTypePolicy(),
    remat: bool = False,
) -> jax.Array:
    """Returns the patch tokens (B, num_tokens, width), ln_post applied."""
    trunk_params = {k: v for k, v in params.items() if k != "ln_post"}
    x = clip_vit.forward(trunk_params, cfg.trunk, images,
                         policy=policy, remat=remat)
    x = layer_norm(params["ln_post"], x, cfg.ln_eps)
    return x[:, 1:]  # drop CLS → 256 tokens (reference [1] tokens output)


def from_torch_state_dict(
    sd: dict, cfg: OpenCLIPViTConfig, dtype=jnp.float32,
    prefix: str = "visual.",
) -> dict:
    """Convert an open_clip VisionTransformer state dict (same module names
    as the LAVIS tower plus ln_post)."""
    import numpy as np

    p = clip_vit.from_torch_state_dict(sd, cfg.trunk, dtype, prefix=prefix)
    p["ln_post"] = {
        "scale": jnp.asarray(np.asarray(sd[prefix + "ln_post.weight"]), dtype),
        "bias": jnp.asarray(np.asarray(sd[prefix + "ln_post.bias"]), dtype),
    }
    return p
