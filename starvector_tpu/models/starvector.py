"""StarVector task model: vision tower + adapter + code-LLM decoder — JAX.

Rebuilds the task logic of `StarVectorBase` / `StarVectorForCausalLM`
(reference: starvector/model/models/starvector_base.py:22-339,
starvector/model/starvector_arch.py:96-194):
  * v1 ("gpt_bigcode" decoder, CLIP tower, 257 visual tokens) vs
    v2 ("starcoder2" decoder, SigLIP tower, 576 visual tokens) dispatched on
    the starcoder model name (starvector_arch.py:140-145)
  * im2svg: inputs_embeds = [visual_prefix ‖ embed(svg_ids)], attention mask
    ones over the prefix, targets −100 over the prefix and at pads
    (starvector_base.py:150-172)
  * text2svg: no vision tower; caption + svg token stream
    (starvector_base.py:131-148)
  * loss: shifted CE inside the decoder semantics (starvector_base.py:174-194)

Tokenization stays host-side (outside jit); this module works on ids/images.
Generation entry points live in starvector_tpu/generation/engine.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from starvector_tpu.models import adapter as adapter_mod
from starvector_tpu.models import gpt_bigcode, image_encoder, starcoder2
from starvector_tpu.ops.layers import DTypePolicy


@dataclasses.dataclass(frozen=True)
class StarVectorConfig:
    """Mirrors the reference StarVectorConfig defaults
    (starvector_arch.py:96-131) with the decoder dispatched explicitly."""

    decoder: str = "gpt_bigcode"  # "gpt_bigcode" (v1) | "starcoder2" (v2)
    image_encoder_type: str = "clip"
    adapter_norm: str = "layer_norm"
    image_size: int = 224
    max_length_train: int = 8192
    task: str = "im2svg"  # "im2svg" | "text2svg"
    use_cache: bool = True
    # decoder geometry; None → family defaults (1B / 7B)
    llm: Any = None
    # vision tower geometry override (a frozen tower config dataclass);
    # None → the stock tower for image_encoder_type. Set by checkpoint
    # loaders that derive geometry from the weights.
    vision_tower: Any = None

    def __post_init__(self):
        if self.llm is None:
            if self.decoder == "gpt_bigcode":
                object.__setattr__(self, "llm", gpt_bigcode.GPTBigCodeConfig())
            elif self.decoder == "starcoder2":
                object.__setattr__(self, "llm", starcoder2.StarCoder2Config())
            else:
                raise ValueError(f"unknown decoder {self.decoder!r}")

    @property
    def use_image_encoder(self) -> bool:
        return self.task == "im2svg"  # reference starvector_base.py:70-72

    @property
    def hidden_size(self) -> int:
        return self.llm.hidden_size

    @property
    def vision_geometry(self) -> tuple[int, int]:
        return image_encoder.ImageEncoderConfig(
            self.image_encoder_type, self.image_size
        ).geometry

    @property
    def query_length(self) -> int:
        return self.vision_geometry[1] if self.use_image_encoder else 0

    @property
    def encoder_config(self) -> image_encoder.ImageEncoderConfig:
        return image_encoder.ImageEncoderConfig(
            self.image_encoder_type, self.image_size, tower=self.vision_tower
        )

    @property
    def adapter_config(self) -> adapter_mod.AdapterConfig:
        hidden, qlen = self.vision_geometry
        return adapter_mod.AdapterConfig(
            input_size=hidden,
            output_size=self.hidden_size,
            query_length=qlen,
            adapter_norm=self.adapter_norm,
        )

    @property
    def max_svg_length(self) -> int:
        # reference starvector_base.py:40: minus prefix and special tokens
        return self.max_length_train - self.query_length - 4

    @property
    def decoder_module(self):
        return gpt_bigcode if self.decoder == "gpt_bigcode" else starcoder2


def starvector_1b_config(**kw) -> StarVectorConfig:
    base = dict(
        decoder="gpt_bigcode",
        image_encoder_type="clip",
        adapter_norm="batch_norm",  # configs/models/starvector-1b/im2svg-stack.yaml:13
        max_length_train=8192,
        # production default: Pallas flash prefill (154 vs 109 TFLOP/s XLA
        # at B=64/S=1024 on v5e) + XLA fused decode step
        llm=gpt_bigcode.GPTBigCodeConfig(attn_impl="mixed"),
    )
    base.update(kw)
    return StarVectorConfig(**base)


def starvector_8b_config(**kw) -> StarVectorConfig:
    base = dict(
        decoder="starcoder2",
        image_encoder_type="siglip_384",
        adapter_norm="layer_norm",
        image_size=384,
        max_length_train=16000,  # configs/models/starvector-8b/im2svg-stack.yaml:7
        llm=starcoder2.StarCoder2Config(attn_impl="mixed"),
    )
    base.update(kw)
    return StarVectorConfig(**base)


def tiny_config(task: str = "im2svg", decoder: str = "gpt_bigcode", **kw) -> StarVectorConfig:
    from starvector_tpu.models.vision import clip_vit  # noqa: F401

    llm = (
        gpt_bigcode.tiny_config()
        if decoder == "gpt_bigcode"
        else starcoder2.tiny_config()
    )
    base = dict(
        decoder=decoder,
        image_encoder_type="clip",
        image_size=28,
        max_length_train=128,
        task=task,
        llm=llm,
    )
    base.update(kw)
    return StarVectorConfig(**base)


# The tiny config needs a tiny vision tower; dispatch on image_size.
def _encoder_cfg(cfg: StarVectorConfig):
    enc = cfg.encoder_config
    if enc.tower is None and cfg.image_encoder_type == "clip" and cfg.image_size != 224:
        # small-image test towers keep the 'clip' wiring with scaled geometry
        from starvector_tpu.models.vision.clip_vit import CLIPViTConfig

        return dataclasses.replace(enc), CLIPViTConfig(
            image_size=cfg.image_size, patch_size=7, width=32, layers=2, heads=4
        )
    return enc, enc.tower_config


def init_params(cfg: StarVectorConfig, rng: jax.Array, dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, 3)
    params: dict = {}
    dec = cfg.decoder_module
    params["svg_transformer"] = dec.init_params(cfg.llm, keys[0], dtype)
    if cfg.use_image_encoder:
        enc, tower_cfg = _encoder_cfg(cfg)
        if cfg.image_encoder_type == "clip":
            from starvector_tpu.models.vision import clip_vit
            from starvector_tpu.ops.layers import make_layer_norm_params

            params["image_encoder"] = {
                "visual_encoder": clip_vit.init_params(tower_cfg, keys[1], dtype),
                "ln_vision": make_layer_norm_params(tower_cfg.width, dtype),
            }
            vision_hidden = tower_cfg.width
            qlen = tower_cfg.num_tokens
        else:
            params["image_encoder"] = image_encoder.init_params(enc, keys[1], dtype)
            vision_hidden, qlen = enc.geometry
        ad_cfg = dataclasses.replace(
            cfg.adapter_config, input_size=vision_hidden, query_length=qlen
        )
        params["image_projection"] = adapter_mod.init_params(ad_cfg, keys[2], dtype)
    return params


def init_params_jit(cfg: StarVectorConfig, rng: jax.Array, dtype=jnp.float32,
                    mesh=None) -> dict:
    """Single-dispatch on-device init.

    Eager `init_params` pays one dispatch per leaf; through a tunneled
    backend (~30 ms/dispatch) that is >1 min at 1B geometry. Jitting the
    whole tree is one compile + one dispatch, and with `mesh` the params
    materialize directly sharded (out_shardings from partition_rules) —
    never host-materialized then transferred."""
    fn = functools.partial(init_params, cfg, dtype=dtype)
    if mesh is None:
        return jax.jit(fn)(rng)
    from starvector_tpu.parallel import make_param_shardings

    shapes = jax.eval_shape(fn, rng)
    shardings = make_param_shardings(shapes, partition_rules(), mesh)
    return jax.jit(fn, out_shardings=shardings)(rng)


def partition_rules() -> list[tuple[str, P]]:
    rules: list[tuple[str, P]] = []
    for pat, spec in gpt_bigcode.partition_rules():
        rules.append((r"svg_transformer/" + pat.lstrip("^"), spec))
    for pat, spec in starcoder2.partition_rules():
        rules.append((r"svg_transformer/" + pat.lstrip("^"), spec))
    for pat, spec in image_encoder.partition_rules():
        rules.append((r"image_encoder/" + pat.lstrip("^"), spec))
    for pat, spec in adapter_mod.partition_rules():
        rules.append((r"image_projection/" + pat.lstrip("^"), spec))
    return rules


def _adapter_cfg_for(cfg: StarVectorConfig, params: dict) -> adapter_mod.AdapterConfig:
    # derive geometry from the actual params (supports tiny test towers)
    qlen, out = (
        params["image_projection"]["norm"]["scale"].shape
        if cfg.adapter_norm == "layer_norm"
        else (params["image_projection"]["norm"]["scale"].shape[0], cfg.hidden_size)
    )
    d_in = params["image_projection"]["c_fc"]["kernel"].shape[0]
    return adapter_mod.AdapterConfig(
        input_size=d_in,
        output_size=cfg.hidden_size,
        query_length=qlen,
        adapter_norm=cfg.adapter_norm,
    )


def encode_image(
    params: dict,
    cfg: StarVectorConfig,
    images: jax.Array,  # (B, H, W, 3) normalized
    *,
    policy: DTypePolicy = DTypePolicy(),
    train: bool = False,
    dropout_rng: jax.Array | None = None,
    remat: bool = False,
) -> jax.Array:
    """Vision tower + adapter → (B, query_length, llm_hidden) conditioning
    embeds (reference get_image_embeddings, starvector_base.py:150-156)."""
    enc, tower_cfg = _encoder_cfg(cfg)
    if cfg.image_encoder_type == "clip":
        from starvector_tpu.models.vision import clip_vit
        from starvector_tpu.ops.layers import layer_norm

        embeds = clip_vit.forward(
            params["image_encoder"]["visual_encoder"], tower_cfg, images,
            policy=policy, remat=remat,
        )
        embeds = layer_norm(params["image_encoder"]["ln_vision"], embeds)
    else:
        embeds = image_encoder.forward(
            params["image_encoder"], enc, images, policy=policy, remat=remat
        )
    ad_cfg = _adapter_cfg_for(cfg, params)
    return adapter_mod.forward(
        params["image_projection"], ad_cfg, embeds,
        policy=policy, train=train, dropout_rng=dropout_rng,
    )


def im2svg_inputs(
    params: dict,
    cfg: StarVectorConfig,
    images: jax.Array,
    svg_ids: jax.Array,        # (B, S) tokenized svg text (+eos etc.)
    svg_mask: jax.Array,       # (B, S) 1 = real token
    pad_token_id: int,
    *,
    policy: DTypePolicy = DTypePolicy(),
    train: bool = False,
    dropout_rng: jax.Array | None = None,
    remat: bool = False,
):
    """Build (inputs_embeds, attention_mask, targets) for the im2svg loss
    (reference embed_im_to_svg, starvector_base.py:150-172)."""
    dec = cfg.decoder_module
    cond = encode_image(
        params, cfg, images, policy=policy, train=train,
        dropout_rng=dropout_rng, remat=remat,
    )
    B, Q, _ = cond.shape
    tok_embeds = dec.embed_tokens(params["svg_transformer"], svg_ids)
    inputs_embeds = jnp.concatenate([cond, policy.cast(tok_embeds)], axis=1)
    attention_mask = jnp.concatenate(
        [jnp.ones((B, Q), jnp.int32), svg_mask.astype(jnp.int32)], axis=1
    )
    # Mask targets by position (svg_mask == 0), not token-id equality with
    # pad: when the checkpoint tokenizer has pad == eos (<|endoftext|>), id
    # masking would also erase the terminal EOS the loader appends and the
    # model would never learn to stop (reference pads with a distinct [PAD],
    # starcoder.py:40-53).
    svg_targets = jnp.where(svg_mask == 0, -100, svg_ids)
    targets = jnp.concatenate(
        [jnp.full((B, Q), -100, jnp.int32), svg_targets.astype(jnp.int32)], axis=1
    )
    return inputs_embeds, attention_mask, targets


def text2svg_inputs(
    params: dict,
    cfg: StarVectorConfig,
    input_ids: jax.Array,   # (B, S) caption + svg_start + svg + eos
    input_mask: jax.Array,
    pad_token_id: int,
    *,
    policy: DTypePolicy = DTypePolicy(),
):
    """reference embed_text_to_svg (starvector_base.py:131-148)."""
    dec = cfg.decoder_module
    tok_embeds = dec.embed_tokens(params["svg_transformer"], input_ids)
    # position-based masking; see im2svg_inputs for the pad==eos rationale
    targets = jnp.where(input_mask == 0, -100, input_ids).astype(jnp.int32)
    return policy.cast(tok_embeds), input_mask.astype(jnp.int32), targets


@functools.partial(
    jax.jit, static_argnames=("cfg", "policy", "num_generations", "remat")
)
def grpo_forward(
    params: dict,
    cfg: StarVectorConfig,
    vision_embeds: jax.Array,   # (B, Q, llm_hidden) projected visual prefix
    input_ids: jax.Array,       # (B * num_generations, S) generated ids
    attention_mask: jax.Array,  # (B * num_generations, S)
    *,
    num_generations: int = 1,
    policy: DTypePolicy = DTypePolicy(),
    remat: bool | str = False,
) -> jax.Array:
    """GRPO-style forward (reference StarVectorForCausalLM.forward,
    starvector_arch.py:161-184): repeat each image's visual prefix for its
    `num_generations` rollouts, run the decoder over [prefix ‖ tokens], and
    return per-token log-probs of the generated ids (B*G, S) for the policy
    gradient. Positions before each row's first real token get logprob 0.
    `remat` (as in loss_fn) is required at RL scale: B·G rows × long
    rollouts would otherwise store every layer's activations for the
    update's backward."""
    dec = cfg.decoder_module
    G = num_generations
    B, Q, E = vision_embeds.shape
    cond = jnp.repeat(policy.cast(vision_embeds), G, axis=0)  # (B*G, Q, E)
    tok_embeds = policy.cast(
        dec.embed_tokens(params["svg_transformer"], input_ids)
    )
    inputs_embeds = jnp.concatenate([cond, tok_embeds], axis=1)
    am = jnp.concatenate(
        [jnp.ones((B * G, Q), jnp.int32), attention_mask.astype(jnp.int32)],
        axis=1,
    )
    hidden, _ = dec.forward(
        params["svg_transformer"], cfg.llm, inputs_embeds,
        attention_mask=am, policy=policy, return_hidden=True, remat=remat,
    )
    # hidden at position Q-1+t predicts input_ids[:, t]; the LM head is
    # fused into a chunked scan so (B*G, S, V) logits never materialize
    # (~13 GB fp32 at B*G=8, S=8k, V=49k)
    pred_h = hidden[:, Q - 1 : Q - 1 + input_ids.shape[1]]
    token_lp = gpt_bigcode.token_logprobs_fused(
        dec.lm_head_table(params["svg_transformer"], cfg.llm), pred_h,
        input_ids, policy=policy,
    )
    return jnp.where(attention_mask > 0, token_lp, 0.0)


def loss_fn_with_bn_stats(
    params: dict,
    cfg: StarVectorConfig,
    batch: dict,
    pad_token_id: int,
    *,
    policy: DTypePolicy = DTypePolicy(),
    dropout_rng: jax.Array | None = None,
    remat: bool = False,
):
    """Training loss + updated BatchNorm running stats for the 1B adapter
    (aux = {} for layer_norm adapters). Differentiate w.r.t. params with
    has_aux=True."""
    if cfg.task != "im2svg" or cfg.adapter_norm != "batch_norm":
        loss = loss_fn(
            params, cfg, batch, pad_token_id, policy=policy, train=True,
            dropout_rng=dropout_rng, remat=remat,
        )
        return loss, {}

    from starvector_tpu.models import adapter as adapter_mod

    enc, tower_cfg = _encoder_cfg(cfg)
    if cfg.image_encoder_type == "clip":
        from starvector_tpu.models.vision import clip_vit
        from starvector_tpu.ops.layers import layer_norm

        embeds = clip_vit.forward(
            params["image_encoder"]["visual_encoder"], tower_cfg,
            batch["image"], policy=policy, remat=remat,
        )
        embeds = layer_norm(params["image_encoder"]["ln_vision"], embeds)
    else:
        embeds = image_encoder.forward(
            params["image_encoder"], enc, batch["image"], policy=policy,
            remat=remat,
        )
    ad_cfg = _adapter_cfg_for(cfg, params)
    cond, bn_stats = adapter_mod.forward_with_stats(
        params["image_projection"], ad_cfg, embeds, policy=policy,
        dropout_rng=dropout_rng,
    )
    dec = cfg.decoder_module
    svg_ids, svg_mask = batch["svg_ids"], batch["svg_mask"]
    B, Q, _ = cond.shape
    tok_embeds = dec.embed_tokens(params["svg_transformer"], svg_ids)
    inputs_embeds = jnp.concatenate([cond, policy.cast(tok_embeds)], axis=1)
    attention_mask = jnp.concatenate(
        [jnp.ones((B, Q), jnp.int32), svg_mask.astype(jnp.int32)], axis=1
    )
    svg_targets = jnp.where(svg_mask == 0, -100, svg_ids)
    targets = jnp.concatenate(
        [jnp.full((B, Q), -100, jnp.int32), svg_targets.astype(jnp.int32)],
        axis=1,
    )
    hidden, _ = dec.forward(
        params["svg_transformer"], cfg.llm, inputs_embeds,
        attention_mask=attention_mask, policy=policy, remat=remat,
        return_hidden=True,
    )
    # same sequence-parallel gather as loss_fn: the chunked LM-head loss
    # must not reshard S-sharded hidden on every chunk step
    from starvector_tpu.parallel.mesh import batch_spec, maybe_constrain

    hidden = maybe_constrain(hidden, batch_spec(extra_dims=2))
    loss = gpt_bigcode.causal_lm_loss_fused(
        dec.lm_head_table(params["svg_transformer"], cfg.llm), hidden,
        targets, policy=policy,
    )
    return loss, {"bn_stats": jax.lax.stop_gradient(bn_stats)}


@functools.partial(
    jax.jit, static_argnames=("cfg", "pad_token_id", "policy", "train", "remat")
)
def loss_fn(
    params: dict,
    cfg: StarVectorConfig,
    batch: dict,
    pad_token_id: int,
    *,
    policy: DTypePolicy = DTypePolicy(),
    train: bool = False,
    dropout_rng: jax.Array | None = None,
    remat: bool = False,
) -> jax.Array:
    """Training loss (reference StarVectorBase.forward,
    starvector_base.py:174-194). batch keys:
      im2svg:  image (B,H,W,3), svg_ids, svg_mask
      text2svg: input_ids, input_mask
    """
    dec = cfg.decoder_module
    if cfg.task == "im2svg":
        inputs_embeds, attention_mask, targets = im2svg_inputs(
            params, cfg, batch["image"], batch["svg_ids"], batch["svg_mask"],
            pad_token_id, policy=policy, train=train,
            dropout_rng=dropout_rng, remat=remat,
        )
    else:
        inputs_embeds, attention_mask, targets = text2svg_inputs(
            params, cfg, batch["input_ids"], batch["input_mask"], pad_token_id,
            policy=policy,
        )
    hidden, _ = dec.forward(
        params["svg_transformer"], cfg.llm, inputs_embeds,
        attention_mask=attention_mask, policy=policy, remat=remat,
        return_hidden=True,
    )
    # Under sequence parallelism the decoder leaves hidden sharded over S;
    # gather it to the batch layout before the chunked LM-head loss (a
    # (B, S, E) bf16 all-gather — tiny next to the per-layer compute) so the
    # loss's chunk scan doesn't reshard every step.
    from starvector_tpu.parallel.mesh import batch_spec, maybe_constrain

    hidden = maybe_constrain(hidden, batch_spec(extra_dims=2))
    return gpt_bigcode.causal_lm_loss_fused(
        dec.lm_head_table(params["svg_transformer"], cfg.llm), hidden,
        targets, policy=policy,
    )
