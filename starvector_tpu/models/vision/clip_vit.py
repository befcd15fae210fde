"""CLIP ViT vision tower (the 1B model's image encoder) — JAX.

Parity target: the reference's vendored LAVIS VisionTransformer
(reference: starvector/model/image_encoder/clip_model.py:167-191):
  * conv patchify, patch 14, width 1024, 23 layers, 16 heads, no conv bias
  * CLS token + learned positional embedding, pre-LN (`ln_pre`)
  * residual blocks: ln_1 -> MHA -> +res; ln_2 -> MLP(QuickGELU) -> +res
    (torch nn.MultiheadAttention: fused in_proj (3E, E) + out_proj)
  * NO final ln_post inside the tower — the ImageEncoder applies an external
    `ln_vision` LayerNorm (reference image_encoder.py:50-61, :91-94)
  * returns all 257 tokens (CLS + 16x16 patches at 224px)

TPU-first: patchify as reshape+matmul (einsum hits the MXU directly, no
conv lowering), layers stacked + lax.scan, fp32 LN/softmax.
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
    layer_norm,
    make_dense_params,
    make_layer_norm_params,
    maybe_checkpoint,
    normal_init,
    quick_gelu,
)
from starvector_tpu.parallel.mesh import batch_spec, maybe_constrain


@dataclasses.dataclass(frozen=True)
class CLIPViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 23
    heads: int = 16
    ln_eps: float = 1e-5
    act: str = "quick_gelu"   # LAVIS/openai towers; open_clip ViTs use "gelu"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_tokens(self) -> int:
        return self.num_patches + 1  # + CLS ⇒ 257 at 224/14


def tiny_config(**kw) -> CLIPViTConfig:
    base = dict(image_size=28, patch_size=7, width=32, layers=2, heads=4)
    base.update(kw)
    return CLIPViTConfig(**base)


def init_params(cfg: CLIPViTConfig, rng: jax.Array, dtype=jnp.float32) -> dict:
    W = cfg.width
    scale = W**-0.5
    keys = jax.random.split(rng, 5)

    def layer_params(k):
        ks = jax.random.split(k, 3)
        return {
            "ln_1": make_layer_norm_params(W, dtype),
            "attn": {
                # torch MultiheadAttention layout: fused qkv in_proj
                "in_proj": make_dense_params(ks[0], W, 3 * W, dtype=dtype),
                "out_proj": make_dense_params(ks[1], W, W, dtype=dtype),
            },
            "ln_2": make_layer_norm_params(W, dtype),
            "mlp": {
                "c_fc": make_dense_params(ks[2], W, 4 * W, dtype=dtype),
                "c_proj": make_dense_params(jax.random.fold_in(ks[2], 1), 4 * W, W, dtype=dtype),
            },
        }

    # vmap over layer keys: one traced layer body, not `layers` unrolled
    # copies (compile time dominates jitted-init cold start)
    layers = jax.vmap(layer_params)(jax.random.split(keys[3], cfg.layers))
    return {
        # stored as (patch_size*patch_size*3, width): patchify-matmul layout
        "patch_embed": normal_init(
            keys[0], (cfg.patch_size * cfg.patch_size * 3, W), scale, dtype
        ),
        "class_embedding": normal_init(keys[1], (W,), scale, dtype),
        "positional_embedding": normal_init(keys[2], (cfg.num_tokens, W), scale, dtype),
        "ln_pre": make_layer_norm_params(W, dtype),
        "layers": layers,
    }


def partition_rules() -> list[tuple[str, P]]:
    return [
        (r"patch_embed$", P(None, "tensor")),
        (r"positional_embedding$", P(None, None)),
        (r"class_embedding$", P(None)),
        (r"layers/.*in_proj/kernel", P(None, "fsdp", "tensor")),
        (r"layers/.*in_proj/bias", P(None, "tensor")),
        (r"layers/.*out_proj/kernel", P(None, "tensor", "fsdp")),
        (r"layers/.*c_fc/kernel", P(None, "fsdp", "tensor")),
        (r"layers/.*c_fc/bias", P(None, "tensor")),
        (r"layers/.*c_proj/kernel", P(None, "tensor", "fsdp")),
        (r"layers/.*", P(None, None)),
        (r"ln_pre/", P(None)),
    ]


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) → (B, N, patch*patch*3), channel-fastest per pixel but
    matching torch Conv2d weight layout after the converter's reshape."""
    B, H, Wd, C = images.shape
    gh, gw = H // patch, Wd // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, gh, gw, C, ph, pw
    return x.reshape(B, gh * gw, C * patch * patch)


def _block(p, cfg: CLIPViTConfig, x, policy: DTypePolicy):
    B, N, W = x.shape
    H = cfg.heads
    D = W // H
    h = layer_norm(p["ln_1"], x, cfg.ln_eps)
    qkv = dense(p["attn"]["in_proj"], h, policy)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, N, H, D)
    k = k.reshape(B, N, H, D)
    v = v.reshape(B, N, H, D)
    attn = multihead_attention(q, k, v, None).reshape(B, N, W)
    x = x + dense(p["attn"]["out_proj"], attn, policy)
    h = layer_norm(p["ln_2"], x, cfg.ln_eps)
    h = dense(p["mlp"]["c_fc"], h, policy)
    h = quick_gelu(h) if cfg.act == "quick_gelu" else jax.nn.gelu(
        h, approximate=False
    )
    h = dense(p["mlp"]["c_proj"], h, policy)
    return x + h


@functools.partial(jax.jit, static_argnames=("cfg", "policy", "remat"))
def forward(
    params: dict,
    cfg: CLIPViTConfig,
    images: jax.Array,  # (B, H, W, 3) normalized
    *,
    policy: DTypePolicy = DTypePolicy(),
    remat: bool = False,
) -> jax.Array:
    """Returns all token embeddings (B, num_tokens, width) — pre-ln_vision."""
    B = images.shape[0]
    x = patchify(policy.cast(images), cfg.patch_size)
    x = jnp.einsum(
        "bnp,pw->bnw", x, policy.cast(params["patch_embed"]),
        preferred_element_type=jnp.float32,
    ).astype(policy.compute_dtype)
    cls = jnp.broadcast_to(
        policy.cast(params["class_embedding"])[None, None, :], (B, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + policy.cast(params["positional_embedding"])[None]
    x = layer_norm(params["ln_pre"], x, cfg.ln_eps)
    x = maybe_constrain(x, batch_spec(extra_dims=2))

    def body(h, layer_p):
        return _block(layer_p, cfg, h, policy), None

    body_fn = maybe_checkpoint(body, remat)
    x, _ = jax.lax.scan(body_fn, x, params["layers"])
    return x


def config_from_state_dict(
    sd: dict, prefix: str = "", heads: int | None = None
) -> CLIPViTConfig:
    """Derive the tower geometry from a checkpoint (same philosophy as the
    decoder loaders: trust the weights, not the default config — real
    StarVector towers are CLIP-L-shaped but tests/custom towers are not)."""
    import math

    import numpy as np

    conv = np.asarray(sd[prefix + "conv1.weight"])
    width, _, patch, _ = conv.shape
    n_tokens = np.asarray(sd[prefix + "positional_embedding"]).shape[0]
    grid = int(math.isqrt(n_tokens - 1))
    layers = 1 + max(
        int(k[len(prefix) + len("transformer.resblocks."):].split(".")[0])
        for k in sd if k.startswith(prefix + "transformer.resblocks.")
    )
    if heads is None:
        # heads are NOT recoverable from weight shapes; real towers follow
        # the CLIP head_dim-64 convention, and our own exports record the
        # true value in config.json (vision_geometry)
        head_dim = 64 if width % 64 == 0 else 16
        heads = max(width // head_dim, 1)
    return CLIPViTConfig(
        image_size=grid * patch, patch_size=patch, width=width,
        layers=layers, heads=heads,
    )


def from_torch_state_dict(sd, cfg: CLIPViTConfig, dtype=jnp.float32, prefix: str = "") -> dict:
    """Convert the reference VisionTransformer weights (e.g. loaded from a
    StarVector checkpoint under `image_encoder.visual_encoder.`)."""
    import numpy as np

    g = lambda n: np.array(sd[prefix + n])  # copy: source may alias torch buffers
    L = cfg.layers
    # conv1.weight: (width, 3, P, P) → (3*P*P, width) matching patchify order
    conv = g("conv1.weight")
    patch_embed = conv.reshape(cfg.width, -1).T  # (C*P*P, width)

    def dense_p(name, transpose=True):
        ws, bs = [], []
        for i in range(L):
            w = g(f"transformer.resblocks.{i}.{name}.weight")
            ws.append(np.ascontiguousarray(w.T) if transpose else w)
            bs.append(g(f"transformer.resblocks.{i}.{name}.bias"))
        return {
            "kernel": jnp.asarray(np.stack(ws), dtype=dtype),
            "bias": jnp.asarray(np.stack(bs), dtype=dtype),
        }

    def in_proj_p():
        ws, bs = [], []
        for i in range(L):
            w = g(f"transformer.resblocks.{i}.attn.in_proj_weight")  # (3W, W)
            ws.append(np.ascontiguousarray(w.T))  # (W, 3W)
            bs.append(g(f"transformer.resblocks.{i}.attn.in_proj_bias"))
        return {
            "kernel": jnp.asarray(np.stack(ws), dtype=dtype),
            "bias": jnp.asarray(np.stack(bs), dtype=dtype),
        }

    def ln_p(name):
        return {
            "scale": jnp.asarray(
                np.stack([g(f"transformer.resblocks.{i}.{name}.weight") for i in range(L)]),
                dtype=dtype,
            ),
            "bias": jnp.asarray(
                np.stack([g(f"transformer.resblocks.{i}.{name}.bias") for i in range(L)]),
                dtype=dtype,
            ),
        }

    return {
        "patch_embed": jnp.asarray(patch_embed, dtype=dtype),
        "class_embedding": jnp.asarray(g("class_embedding"), dtype=dtype),
        "positional_embedding": jnp.asarray(g("positional_embedding"), dtype=dtype),
        "ln_pre": {
            "scale": jnp.asarray(g("ln_pre.weight"), dtype=dtype),
            "bias": jnp.asarray(g("ln_pre.bias"), dtype=dtype),
        },
        "layers": {
            "ln_1": ln_p("ln_1"),
            "attn": {"in_proj": in_proj_p(), "out_proj": dense_p("attn.out_proj")},
            "ln_2": ln_p("ln_2"),
            "mlp": {"c_fc": dense_p("mlp.c_fc"), "c_proj": dense_p("mlp.c_proj")},
        },
    }
