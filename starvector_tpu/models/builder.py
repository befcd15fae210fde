"""Model builder: from-scratch init or local checkpoint load.

Rebuilds the reference builder (reference: starvector/model/builder.py:7-47):
  * `model_builder(config)` — training path: StarVectorConfig from the yaml
    model block, params initialized from scratch or restored from a local
    checkpoint directory
  * `load_pretrained_model(path)` — serve path: returns (params, cfg,
    tokenizer, processor, context_len)

Checkpoint directory layout accepted:
  * our own Orbax/npz checkpoints (train/checkpoint.py)
  * an HF StarVector checkpoint dir (model.safetensors shards +
    tokenizer.json) converted on load via models/convert.py
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

from starvector_tpu.models import convert, starvector as sv
from starvector_tpu.models.tokenizer import SVGTokenizer, load_tokenizer
from starvector_tpu.data.processor import processor_for_encoder


def config_from_yaml_block(model_block: dict) -> sv.StarVectorConfig:
    """Map the reference's model yaml block (configs/models/*.yaml) onto
    StarVectorConfig."""
    # same detection _detect_version uses (some checkpoints carry only
    # _name_or_path) — disagreeing here loads the v2 state dict against
    # the v1 base config
    name = str(model_block.get("starcoder_model_name", "")) + str(
        model_block.get("_name_or_path", "")
    )
    version = "v2" if "starcoder2" in name else "v1"
    preset = model_block.get("preset")
    if preset in ("tiny", "tiny-v2"):
        # CPU smoke/e2e runs (tests, docs): full wiring, toy geometry
        base = sv.tiny_config(
            decoder="starcoder2" if preset == "tiny-v2" else "gpt_bigcode"
        )
    elif preset not in (None, "", "full"):
        raise ValueError(f"unknown model.preset {preset!r}")
    else:
        base = (
            sv.starvector_8b_config() if version == "v2"
            else sv.starvector_1b_config()
        )
    import dataclasses

    overrides: dict[str, Any] = {}
    if "image_encoder_type" in model_block:
        overrides["image_encoder_type"] = model_block["image_encoder_type"]
    if "adapter_norm" in model_block:
        overrides["adapter_norm"] = model_block["adapter_norm"]
    if "image_size" in model_block:
        overrides["image_size"] = model_block["image_size"]
    if "max_length" in model_block:
        overrides["max_length_train"] = int(model_block["max_length"])
    if "task" in model_block:
        overrides["task"] = model_block["task"]
    cfg = dataclasses.replace(base, **overrides)
    if "attn_impl" in model_block:
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, attn_impl=model_block["attn_impl"])
        )
    return cfg


def _detect_version(path: str) -> str:
    cfgf = os.path.join(path, "config.json")
    if os.path.exists(cfgf):
        import json

        with open(cfgf) as f:
            cfg = json.load(f)
        name = str(cfg.get("starcoder_model_name", "")) + str(
            cfg.get("_name_or_path", "")
        )
        if "starcoder2" in name:
            return "v2"
    return "v1"


def load_hf_starvector_checkpoint(
    path: str, dtype=jnp.bfloat16
) -> tuple[dict, sv.StarVectorConfig, SVGTokenizer]:
    """Convert an HF StarVector checkpoint directory (safetensors) to our
    pytree layout. State-dict prefixes follow the reference module tree:
    model.svg_transformer.transformer.*, model.image_encoder.*,
    model.image_projection.* (starvector_base.py:23-48)."""
    import json

    version = _detect_version(path)
    sd = convert.load_safetensors_dir(path)
    # strip a leading "model." if present (saved via StarVectorForCausalLM)
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}

    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)

    cfg = config_from_yaml_block(hf_cfg)
    params: dict = {}
    if version == "v1":
        import dataclasses

        from starvector_tpu.models.gpt_bigcode import GPTBigCodeConfig

        vocab = sd["svg_transformer.transformer.transformer.wte.weight"].shape[0]
        n_pos, hidden = sd["svg_transformer.transformer.transformer.wpe.weight"].shape
        n_layer = max(
            int(k.split(".")[4]) for k in sd
            if k.startswith("svg_transformer.transformer.transformer.h.")
        ) + 1
        # n_head from the fused c_attn shape: out = E + 2*head_dim (MQA)
        attn_out = sd[
            "svg_transformer.transformer.transformer.h.0.attn.c_attn.weight"
        ].shape[0]
        head_dim = max((attn_out - hidden) // 2, 1)
        llm = GPTBigCodeConfig(
            vocab_size=vocab, n_positions=n_pos, hidden_size=hidden,
            n_layer=n_layer, n_head=max(hidden // head_dim, 1),
        )
        cfg = dataclasses.replace(cfg, llm=llm, decoder="gpt_bigcode")
        params["svg_transformer"] = convert.gpt_bigcode_from_hf(
            sd, llm, dtype, prefix="svg_transformer.transformer.transformer."
        )
    else:
        import dataclasses

        from starvector_tpu.models.starcoder2 import StarCoder2Config

        # Derive geometry from the checkpoint like the v1 branch: the
        # reference resizes embeddings after adding special tokens
        # (starcoder2.py:38-53), so vocab is ~49157, not the base 49152.
        pfx = "svg_transformer.transformer.model."
        vocab, hidden = sd[pfx + "embed_tokens.weight"].shape
        n_layer = max(
            int(k[len(pfx) + len("layers."):].split(".")[0])
            for k in sd if k.startswith(pfx + "layers.")
        ) + 1
        q_out = sd[pfx + "layers.0.self_attn.q_proj.weight"].shape[0]
        kv_out = sd[pfx + "layers.0.self_attn.k_proj.weight"].shape[0]
        inter = sd[pfx + "layers.0.mlp.c_fc.weight"].shape[0]
        # all StarCoder2 sizes (3b/7b/15b) use head_dim 128; our own exports
        # record the geometry explicitly (train/hub.py) for other shapes
        geo = hf_cfg.get("llm_geometry", {})
        head_dim = int(geo.get("head_dim") or 128)
        n_head = q_out // head_dim
        # a separate trained lm_head in the checkpoint means untied
        # embeddings (starcoder2-15b and any untied fine-tune) — decoding
        # through embed_tokens instead would be silently wrong
        untied = ("svg_transformer.transformer.lm_head.weight" in sd)
        llm = StarCoder2Config(
            vocab_size=vocab, hidden_size=hidden, num_hidden_layers=n_layer,
            num_attention_heads=n_head, num_key_value_heads=kv_out // head_dim,
            intermediate_size=inter,
            rope_theta=float(geo.get("rope_theta") or 1e6),
            sliding_window=(geo["sliding_window"]
                            if "sliding_window" in geo else 4096),
            tie_word_embeddings=not untied,
        )
        cfg = dataclasses.replace(cfg, llm=llm, decoder="starcoder2")
        params["svg_transformer"] = convert.starcoder2_from_hf(
            sd, llm, dtype, prefix="svg_transformer.transformer.model."
        )

    if cfg.use_image_encoder:
        import dataclasses

        if cfg.image_encoder_type == "clip":
            from starvector_tpu.models.vision import clip_vit

            tower_cfg = clip_vit.config_from_state_dict(
                sd, prefix="image_encoder.visual_encoder.",
                heads=hf_cfg.get("vision_geometry", {}).get("heads"),
            )
            params["image_encoder"] = {
                "visual_encoder": clip_vit.from_torch_state_dict(
                    sd, tower_cfg, dtype, prefix="image_encoder.visual_encoder."
                ),
                "ln_vision": {
                    "scale": jnp.asarray(sd["image_encoder.ln_vision.weight"], dtype),
                    "bias": jnp.asarray(sd["image_encoder.ln_vision.bias"], dtype),
                },
            }
        elif cfg.image_encoder_type.startswith("siglip"):
            from starvector_tpu.models.vision import siglip

            # derive the tower geometry from the weights (like the decoder
            # and clip branches) — exports of non-stock towers round-trip
            tower_cfg = siglip.config_from_state_dict(
                sd, prefix="image_encoder.visual_encoder.",
                heads=hf_cfg.get("vision_geometry", {}).get("heads"),
            )
            params["image_encoder"] = {
                "visual_encoder": siglip.from_hf_state_dict(
                    sd, tower_cfg, dtype,
                    prefix="image_encoder.visual_encoder.",
                )
            }
        else:
            from starvector_tpu.models import image_encoder as ie

            tower_cfg = cfg.encoder_config.tower_config
            params["image_encoder"] = ie.params_from_checkpoint(
                cfg.encoder_config, sd, dtype,
                prefix="image_encoder.visual_encoder.",
            )
        # record the checkpoint-derived tower so downstream forwards use
        # the true geometry, not the stock table
        cfg = dataclasses.replace(cfg, vision_tower=tower_cfg)
        from starvector_tpu.models import adapter as adapter_mod

        params["image_projection"] = adapter_mod.from_torch_state_dict(
            sd, cfg.adapter_config, dtype, prefix="image_projection."
        )

    tokenizer = load_tokenizer(path, version=version)
    return params, cfg, tokenizer


def model_builder(config) -> tuple[dict, sv.StarVectorConfig]:
    """Training path (reference builder.py:14-47): build from scratch from
    the config's model block, or restore a local checkpoint."""
    block = config["model"] if "model" in config else config
    cfg = config_from_yaml_block(dict(block))
    pretrained = block.get("model_name") or block.get("pretrained_path")
    if pretrained and os.path.isdir(str(pretrained)):
        params, cfg, _ = load_hf_starvector_checkpoint(str(pretrained))
        return params, cfg
    rng = jax.random.PRNGKey(int(block.get("seed", 0)))
    params = sv.init_params_jit(cfg, rng)
    return params, cfg


def load_pretrained_model(path: str, dtype=jnp.bfloat16):
    """Serve path (reference builder.py:7-12): returns
    (params, cfg, tokenizer, processor, context_len)."""
    params, cfg, tokenizer = load_hf_starvector_checkpoint(path, dtype)
    processor = processor_for_encoder(cfg.image_encoder_type, cfg.image_size)
    context_len = cfg.max_length_train
    return params, cfg, tokenizer, processor, context_len
