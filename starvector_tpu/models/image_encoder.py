"""Multi-backend image encoder dispatch — JAX.

Parity target (reference: starvector/model/image_encoder/image_encoder.py:9-119):
backends 'clip' (in-repo ViT + external ln_vision LayerNorm), 'siglip_512/384/256'
(HF vision towers). The reference's 'vqgan'/'convnext'/'open-clip' backends
depend on taming/open_clip checkpoints not shipped with the repo (reference
image_encoder.py:63-89 hardcodes a local VQGAN path); they raise with a clear
message here and share the same (B, query_length, hidden) output contract.

Hidden-size / query-length table mirrors starvector_base.py:85-106.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from starvector_tpu.models.vision import clip_vit, siglip
from starvector_tpu.ops.layers import DTypePolicy, layer_norm, make_layer_norm_params

ENCODER_GEOMETRY = {
    # type -> (hidden_size, query_length)
    "clip": (1024, 257),
    "siglip_512": (768, 1024),
    "siglip_384": (1024, 576),
    "siglip_256": (768, 256),
}

UNSUPPORTED = {
    "vqgan": "taming-transformers checkpoint required (reference image_encoder.py:63-84)",
    "convnext": "open_clip checkpoint required (reference image_encoder.py:86-89)",
    "open-clip": "open_clip checkpoint required",
}


@dataclasses.dataclass(frozen=True)
class ImageEncoderConfig:
    image_encoder_type: str = "clip"
    image_size: int = 224

    @property
    def geometry(self) -> tuple[int, int]:
        if self.image_encoder_type in UNSUPPORTED:
            raise NotImplementedError(
                f"{self.image_encoder_type}: {UNSUPPORTED[self.image_encoder_type]}"
            )
        return ENCODER_GEOMETRY[self.image_encoder_type]

    @property
    def tower_config(self):
        t = self.image_encoder_type
        if t == "clip":
            return clip_vit.CLIPViTConfig(image_size=self.image_size)
        if t == "siglip_384":
            return siglip.siglip_large_384()
        if t == "siglip_512":
            return siglip.siglip_base_512()
        if t == "siglip_256":
            return siglip.siglip_base_256()
        raise NotImplementedError(f"{t}: {UNSUPPORTED.get(t, 'unknown encoder type')}")


def init_params(cfg: ImageEncoderConfig, rng: jax.Array, dtype=jnp.float32) -> dict:
    t = cfg.image_encoder_type
    if t == "clip":
        k1, _ = jax.random.split(rng)
        return {
            "visual_encoder": clip_vit.init_params(cfg.tower_config, k1, dtype),
            # external ln_vision (reference image_encoder.py:60-61, :92-94)
            "ln_vision": make_layer_norm_params(cfg.tower_config.width, dtype),
        }
    if t.startswith("siglip"):
        return {"visual_encoder": siglip.init_params(cfg.tower_config, rng, dtype)}
    raise NotImplementedError(f"{t}: {UNSUPPORTED.get(t, 'unknown encoder type')}")


def partition_rules() -> list[tuple[str, "jax.sharding.PartitionSpec"]]:
    rules = []
    for pattern, spec in clip_vit.partition_rules():
        rules.append((r"visual_encoder/" + pattern.lstrip("^"), spec))
    for pattern, spec in siglip.partition_rules():
        rules.append((r"visual_encoder/" + pattern.lstrip("^"), spec))
    from jax.sharding import PartitionSpec as P

    rules.append((r"ln_vision/", P(None)))
    return rules


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
    if t == "clip":
        embeds = clip_vit.forward(
            params["visual_encoder"], cfg.tower_config, images,
            policy=policy, remat=remat,
        )
        return layer_norm(params["ln_vision"], embeds)
    if t.startswith("siglip"):
        return siglip.forward(
            params["visual_encoder"], cfg.tower_config, images,
            policy=policy, remat=remat,
        )
    raise NotImplementedError(t)
