"""SigLIP vision tower (the 8B model's image encoder) — JAX.

Parity target: HF `SiglipVisionModel.vision_model` as used by the reference
(reference: starvector/model/image_encoder/image_encoder.py:32-47,105-106 —
`visual_encoder(image)["last_hidden_state"]`):
  * conv patchify WITH bias, patch 16, no CLS token
  * learned position embedding over all patches
  * pre-LN encoder blocks: layer_norm1 -> MHA (separate q/k/v/out, bias) ->
    +res; layer_norm2 -> MLP (fc1 -> gelu_tanh -> fc2) -> +res
  * final post_layernorm applied to the last hidden state
  * google/siglip-large-patch16-384: width 1024, 24 layers, 16 heads,
    intermediate 4096, 576 tokens (the 8B query length,
    starvector_base.py:100-106)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from starvector_tpu.ops.attention import multihead_attention
from starvector_tpu.ops.layers import (
    DTypePolicy,
    dense,
    gelu_tanh,
    layer_norm,
    make_dense_params,
    make_layer_norm_params,
    maybe_checkpoint,
    normal_init,
)
from starvector_tpu.models.vision.clip_vit import patchify
from starvector_tpu.parallel.mesh import batch_spec, maybe_constrain


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate_size: int = 4096
    ln_eps: float = 1e-6

    @property
    def num_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def siglip_large_384(**kw) -> SigLIPConfig:
    return SigLIPConfig(**kw)


def siglip_base_512(**kw) -> SigLIPConfig:
    base = dict(image_size=512, hidden_size=768, layers=12, heads=12,
                intermediate_size=3072)
    base.update(kw)
    return SigLIPConfig(**base)


def siglip_base_256(**kw) -> SigLIPConfig:
    base = dict(image_size=256, hidden_size=768, layers=12, heads=12,
                intermediate_size=3072)
    base.update(kw)
    return SigLIPConfig(**base)


def tiny_config(**kw) -> SigLIPConfig:
    base = dict(image_size=32, patch_size=8, hidden_size=32, layers=2,
                heads=4, intermediate_size=64)
    base.update(kw)
    return SigLIPConfig(**base)


def init_params(cfg: SigLIPConfig, rng: jax.Array, dtype=jnp.float32) -> dict:
    Wd = cfg.hidden_size
    keys = jax.random.split(rng, 4)

    def layer_params(k):
        ks = jax.random.split(k, 6)
        return {
            "layer_norm1": make_layer_norm_params(Wd, dtype),
            "attn": {
                "q_proj": make_dense_params(ks[0], Wd, Wd, dtype=dtype),
                "k_proj": make_dense_params(ks[1], Wd, Wd, dtype=dtype),
                "v_proj": make_dense_params(ks[2], Wd, Wd, dtype=dtype),
                "out_proj": make_dense_params(ks[3], Wd, Wd, dtype=dtype),
            },
            "layer_norm2": make_layer_norm_params(Wd, dtype),
            "mlp": {
                "fc1": make_dense_params(ks[4], Wd, cfg.intermediate_size, dtype=dtype),
                "fc2": make_dense_params(ks[5], cfg.intermediate_size, Wd, dtype=dtype),
            },
        }

    # vmap over layer keys (see gpt_bigcode.init_params: compile-time floor)
    layers = jax.vmap(layer_params)(jax.random.split(keys[2], cfg.layers))
    return {
        "patch_embed": {
            "kernel": normal_init(
                keys[0], (cfg.patch_size * cfg.patch_size * 3, Wd), 0.02, dtype
            ),
            "bias": jnp.zeros((Wd,), dtype),
        },
        "position_embedding": normal_init(keys[1], (cfg.num_tokens, Wd), 0.02, dtype),
        "layers": layers,
        "post_layernorm": make_layer_norm_params(Wd, dtype),
    }


def partition_rules() -> list[tuple[str, P]]:
    return [
        (r"patch_embed/kernel", P(None, "tensor")),
        (r"position_embedding$", P(None, None)),
        (r"layers/.*(q_proj|k_proj|v_proj)/kernel", P(None, "fsdp", "tensor")),
        (r"layers/.*(q_proj|k_proj|v_proj)/bias", P(None, "tensor")),
        (r"layers/.*out_proj/kernel", P(None, "tensor", "fsdp")),
        (r"layers/.*fc1/kernel", P(None, "fsdp", "tensor")),
        (r"layers/.*fc1/bias", P(None, "tensor")),
        (r"layers/.*fc2/kernel", P(None, "tensor", "fsdp")),
        (r"layers/.*", P(None, None)),
        (r"post_layernorm/", P(None)),
    ]


def _block(p, cfg: SigLIPConfig, x, policy: DTypePolicy):
    B, N, Wd = x.shape
    H = cfg.heads
    D = Wd // H
    h = layer_norm(p["layer_norm1"], x, cfg.ln_eps)
    q = dense(p["attn"]["q_proj"], h, policy).reshape(B, N, H, D)
    k = dense(p["attn"]["k_proj"], h, policy).reshape(B, N, H, D)
    v = dense(p["attn"]["v_proj"], h, policy).reshape(B, N, H, D)
    attn = multihead_attention(q, k, v, None).reshape(B, N, Wd)
    x = x + dense(p["attn"]["out_proj"], attn, policy)
    h = layer_norm(p["layer_norm2"], x, cfg.ln_eps)
    h = dense(p["mlp"]["fc1"], h, policy)
    h = gelu_tanh(h)
    h = dense(p["mlp"]["fc2"], h, policy)
    return x + h


@functools.partial(jax.jit, static_argnames=("cfg", "policy", "remat"))
def forward(
    params: dict,
    cfg: SigLIPConfig,
    images: jax.Array,  # (B, H, W, 3) normalized
    *,
    policy: DTypePolicy = DTypePolicy(),
    remat: bool = False,
) -> jax.Array:
    """Returns last_hidden_state (B, num_tokens, hidden) incl. post_layernorm."""
    x = patchify(policy.cast(images), cfg.patch_size)
    x = jnp.einsum(
        "bnp,pw->bnw", x, policy.cast(params["patch_embed"]["kernel"]),
        preferred_element_type=jnp.float32,
    )
    x = (x + params["patch_embed"]["bias"].astype(jnp.float32)).astype(
        policy.compute_dtype
    )
    x = x + policy.cast(params["position_embedding"])[None]
    x = maybe_constrain(x, batch_spec(extra_dims=2))

    def body(h, layer_p):
        return _block(layer_p, cfg, h, policy), None

    body_fn = maybe_checkpoint(body, remat)
    x, _ = jax.lax.scan(body_fn, x, params["layers"])
    return layer_norm(params["post_layernorm"], x, cfg.ln_eps)


def config_from_state_dict(
    sd: dict, prefix: str = "vision_model.", heads: int | None = None
) -> SigLIPConfig:
    """Derive the tower geometry from checkpoint weight shapes (same
    philosophy as the decoder loaders and clip_vit.config_from_state_dict:
    trust the weights — real StarVector-8B towers are siglip-large-384
    shaped, exports of fine-tuned/test towers are not)."""
    import math

    import numpy as np

    conv = np.asarray(sd[prefix + "embeddings.patch_embedding.weight"])
    width, _, patch, _ = conv.shape  # (W, 3, P, P)
    n_tokens = np.asarray(
        sd[prefix + "embeddings.position_embedding.weight"]
    ).shape[0]
    grid = int(math.isqrt(n_tokens))  # no CLS token in siglip
    layers = 1 + max(
        int(k[len(prefix) + len("encoder.layers."):].split(".")[0])
        for k in sd if k.startswith(prefix + "encoder.layers.")
    )
    inter = np.asarray(sd[prefix + "encoder.layers.0.mlp.fc1.weight"]).shape[0]
    if heads is None:
        # heads are not recoverable from weight shapes; our own exports
        # record the true value in config.json (vision_geometry). For
        # torch-side checkpoints, map known SigLIP widths explicitly —
        # so400m (width 1152) uses 16 heads of head_dim 72, which the
        # naive head_dim-64 rule would silently mis-split as 18 heads
        # (1152 % 64 == 0, every reshape succeeds, outputs are wrong).
        known = {768: 12, 1024: 16, 1152: 16, 1280: 16}
        if width in known:
            heads = known[width]
        else:
            head_dim = 64 if width % 64 == 0 else max(width // 4, 1)
            heads = max(width // head_dim, 1)
    return SigLIPConfig(
        image_size=grid * patch, patch_size=patch, hidden_size=width,
        layers=layers, heads=heads, intermediate_size=inter,
    )


def from_hf_state_dict(sd, cfg: SigLIPConfig, dtype=jnp.float32, prefix: str = "vision_model.") -> dict:
    """Convert HF SiglipVisionModel weights."""
    import numpy as np

    g = lambda n: np.array(sd[prefix + n])  # copy: source may alias torch buffers
    L = cfg.layers
    conv = g("embeddings.patch_embedding.weight")  # (W, 3, P, P)
    patch_kernel = conv.reshape(cfg.hidden_size, -1).T

    def dense_p(name):
        ws = [np.ascontiguousarray(g(f"encoder.layers.{i}.{name}.weight").T) for i in range(L)]
        bs = [g(f"encoder.layers.{i}.{name}.bias") for i in range(L)]
        return {
            "kernel": jnp.asarray(np.stack(ws), dtype=dtype),
            "bias": jnp.asarray(np.stack(bs), dtype=dtype),
        }

    def ln_p(name):
        return {
            "scale": jnp.asarray(
                np.stack([g(f"encoder.layers.{i}.{name}.weight") for i in range(L)]), dtype=dtype
            ),
            "bias": jnp.asarray(
                np.stack([g(f"encoder.layers.{i}.{name}.bias") for i in range(L)]), dtype=dtype
            ),
        }

    return {
        "patch_embed": {
            "kernel": jnp.asarray(patch_kernel, dtype=dtype),
            "bias": jnp.asarray(g("embeddings.patch_embedding.bias"), dtype=dtype),
        },
        "position_embedding": jnp.asarray(
            g("embeddings.position_embedding.weight"), dtype=dtype
        ),
        "layers": {
            "layer_norm1": ln_p("layer_norm1"),
            "attn": {
                "q_proj": dense_p("self_attn.q_proj"),
                "k_proj": dense_p("self_attn.k_proj"),
                "v_proj": dense_p("self_attn.v_proj"),
                "out_proj": dense_p("self_attn.out_proj"),
            },
            "layer_norm2": ln_p("layer_norm2"),
            "mlp": {"fc1": dense_p("mlp.fc1"), "fc2": dense_p("mlp.fc2")},
        },
        "post_layernorm": {
            "scale": jnp.asarray(g("post_layernorm.weight"), dtype=dtype),
            "bias": jnp.asarray(g("post_layernorm.bias"), dtype=dtype),
        },
    }
