"""Multi-backend image encoder dispatch — JAX.

Parity target (reference: starvector/model/image_encoder/image_encoder.py:9-119):
all six backends — 'clip' (in-repo ViT + external ln_vision LayerNorm),
'siglip_512/384/256' (HF vision towers), 'vqgan' (taming encoder, 196 tokens
of width 256), 'convnext' (open_clip ConvNeXt-Base trunk, 49 tokens of width
1024), and 'open-clip' (ViT patch tokens, 256). The vqgan/convnext/open-clip
checkpoints are out-of-tree in the reference too (image_encoder.py:63-89
hardcodes a local VQGAN path); their architectures + converters live in
models/vision/ and load weights via `params_from_checkpoint` when a
state dict is available (weight-gated, like the neural metrics towers).

Hidden-size / query-length table mirrors starvector_base.py:85-106.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from starvector_tpu.models.vision import (
    clip_vit, convnext, open_clip_vit, siglip, vqgan,
)
from starvector_tpu.ops.layers import DTypePolicy, layer_norm, make_layer_norm_params

ENCODER_GEOMETRY = {
    # type -> (hidden_size, query_length) per starvector_base.py:85-106
    "clip": (1024, 257),
    "open-clip": (1024, 256),
    "vqgan": (256, 196),
    "convnext": (1024, 49),
    "siglip_512": (768, 1024),
    "siglip_384": (1024, 576),
    "siglip_256": (768, 256),
}


@dataclasses.dataclass(frozen=True)
class ImageEncoderConfig:
    image_encoder_type: str = "clip"
    image_size: int = 224
    # explicit tower geometry override: checkpoints whose towers differ from
    # the stock shapes (tiny test towers, fine-tuned geometry) carry their
    # derived config here instead of trusting the static table
    tower: object = None

    @property
    def geometry(self) -> tuple[int, int]:
        if self.tower is not None and hasattr(self.tower, "num_tokens"):
            hidden = getattr(self.tower, "hidden_size", None) or self.tower.width
            return (hidden, self.tower.num_tokens)
        if self.image_encoder_type not in ENCODER_GEOMETRY:
            raise ValueError(
                f"unknown image encoder {self.image_encoder_type!r}; "
                f"one of {sorted(ENCODER_GEOMETRY)}"
            )
        return ENCODER_GEOMETRY[self.image_encoder_type]

    @property
    def tower_config(self):
        if self.tower is not None:
            return self.tower
        t = self.image_encoder_type
        if t == "clip":
            return clip_vit.CLIPViTConfig(image_size=self.image_size)
        if t == "open-clip":
            return open_clip_vit.OpenCLIPViTConfig(image_size=self.image_size)
        if t == "vqgan":
            return vqgan.VQGANEncoderConfig()
        if t == "convnext":
            return convnext.ConvNeXtConfig()
        if t == "siglip_384":
            return siglip.siglip_large_384()
        if t == "siglip_512":
            return siglip.siglip_base_512()
        if t == "siglip_256":
            return siglip.siglip_base_256()
        raise ValueError(f"unknown image encoder {t!r}")


def _tower_module(t: str):
    return {
        "clip": clip_vit, "open-clip": open_clip_vit,
        "vqgan": vqgan, "convnext": convnext,
    }.get(t, siglip)


def init_params(cfg: ImageEncoderConfig, rng: jax.Array, dtype=jnp.float32) -> dict:
    t = cfg.image_encoder_type
    if t == "clip":
        k1, _ = jax.random.split(rng)
        return {
            "visual_encoder": clip_vit.init_params(cfg.tower_config, k1, dtype),
            # external ln_vision (reference image_encoder.py:60-61, :92-94)
            "ln_vision": make_layer_norm_params(cfg.tower_config.width, dtype),
        }
    if t == "open-clip":
        k1, _ = jax.random.split(rng)
        return {
            "visual_encoder": open_clip_vit.init_params(cfg.tower_config, k1, dtype),
            # reference 'open-clip' branch also applies ln_vision (:96-98)
            "ln_vision": make_layer_norm_params(cfg.tower_config.width, dtype),
        }
    if t in ("vqgan", "convnext") or t.startswith("siglip"):
        mod = _tower_module(t)
        return {"visual_encoder": mod.init_params(cfg.tower_config, rng, dtype)}
    raise ValueError(f"unknown image encoder {t!r}")


def params_from_checkpoint(
    cfg: ImageEncoderConfig, sd: dict, dtype=jnp.float32, prefix: str = ""
) -> dict:
    """Build encoder params from a torch state dict: a StarVector checkpoint
    subtree for clip/siglip, a taming checkpoint for vqgan, or an open_clip
    checkpoint for convnext / open-clip."""
    t = cfg.image_encoder_type
    mod = _tower_module(t)
    default_prefix = {
        "vqgan": "encoder.", "convnext": "visual.trunk.", "open-clip": "visual.",
    }.get(t, "")
    p = {"visual_encoder": mod.from_torch_state_dict(
        sd, cfg.tower_config, dtype, prefix=prefix or default_prefix
    )}
    if t in ("clip", "open-clip"):
        p["ln_vision"] = make_layer_norm_params(cfg.tower_config.width, dtype)
    return p


def partition_rules() -> list[tuple[str, "jax.sharding.PartitionSpec"]]:
    # specific rules from EVERY tower first, then the towers' catch-alls:
    # matching is first-match-wins, so appending per-module lists verbatim
    # would let clip's `layers/.*` catch-all shadow siglip's q_proj/fc1
    # sharding (replicating the whole 8B vision tower)
    specific, catchall = [], []
    for mod in (clip_vit, siglip, vqgan, convnext):
        for pattern, spec in mod.partition_rules():
            full = r"visual_encoder/" + pattern.lstrip("^")
            is_catchall = pattern.rstrip("$") in (r"layers/.*", r".*")
            (catchall if is_catchall else specific).append((full, spec))
    from jax.sharding import PartitionSpec as P

    specific.append((r"visual_encoder/ln_post/", P(None)))
    specific.append((r"ln_vision/", P(None)))
    return specific + catchall


@functools.partial(jax.jit, static_argnames=("cfg", "policy", "remat"))
def forward(
    params: dict,
    cfg: ImageEncoderConfig,
    images: jax.Array,  # (B, H, W, 3) normalized, channels-last
    *,
    policy: DTypePolicy = DTypePolicy(),
    remat: bool = False,
) -> jax.Array:
    """(B, query_length, hidden) visual embeddings."""
    t = cfg.image_encoder_type
    mod = _tower_module(t)
    embeds = mod.forward(
        params["visual_encoder"], cfg.tower_config, images,
        policy=policy, remat=remat,
    )
    if t in ("clip", "open-clip"):
        embeds = layer_norm(params["ln_vision"], embeds)
    return embeds
