"""Export JAX pytrees back to HF-layout state dicts / safetensors.

The inverse of models/convert.py — lets checkpoints trained here be loaded
by the reference torch stack (parity for the reference's HF-Hub push,
reference: starvector/train/util.py:115-130). Kernels transpose back to
torch (out, in); stacked layer axes unstack to per-layer keys."""

from __future__ import annotations

import numpy as np

from starvector_tpu.models.gpt_bigcode import GPTBigCodeConfig
from starvector_tpu.models.starcoder2 import StarCoder2Config


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x).T)


def gpt_bigcode_to_hf(params: dict, cfg: GPTBigCodeConfig,
                      prefix: str = "transformer.") -> dict:
    sd: dict[str, np.ndarray] = {}
    sd[prefix + "wte.weight"] = np.asarray(params["wte"])
    sd[prefix + "wpe.weight"] = np.asarray(params["wpe"])
    L = cfg.n_layer
    layers = params["layers"]

    def put_dense(name, p):
        for i in range(L):
            sd[prefix + f"h.{i}.{name}.weight"] = _t(p["kernel"][i])
            if "bias" in p:
                sd[prefix + f"h.{i}.{name}.bias"] = np.asarray(p["bias"][i])

    def put_ln(name, p):
        for i in range(L):
            sd[prefix + f"h.{i}.{name}.weight"] = np.asarray(p["scale"][i])
            sd[prefix + f"h.{i}.{name}.bias"] = np.asarray(p["bias"][i])

    put_ln("ln_1", layers["ln_1"])
    put_dense("attn.c_attn", layers["attn"]["c_attn"])
    put_dense("attn.c_proj", layers["attn"]["c_proj"])
    put_ln("ln_2", layers["ln_2"])
    put_dense("mlp.c_fc", layers["mlp"]["c_fc"])
    put_dense("mlp.c_proj", layers["mlp"]["c_proj"])
    sd[prefix + "ln_f.weight"] = np.asarray(params["ln_f"]["scale"])
    sd[prefix + "ln_f.bias"] = np.asarray(params["ln_f"]["bias"])
    # v1 is always tied: HF/safetensors omit the duplicate lm_head
    return sd


def starcoder2_to_hf(params: dict, cfg: StarCoder2Config,
                     prefix: str = "model.") -> dict:
    sd: dict[str, np.ndarray] = {}
    sd[prefix + "embed_tokens.weight"] = np.asarray(params["embed_tokens"])
    L = cfg.num_hidden_layers
    layers = params["layers"]

    def put_dense(name, p):
        for i in range(L):
            sd[prefix + f"layers.{i}.{name}.weight"] = _t(p["kernel"][i])
            if "bias" in p:
                sd[prefix + f"layers.{i}.{name}.bias"] = np.asarray(p["bias"][i])

    def put_ln(name, p):
        for i in range(L):
            sd[prefix + f"layers.{i}.{name}.weight"] = np.asarray(p["scale"][i])
            sd[prefix + f"layers.{i}.{name}.bias"] = np.asarray(p["bias"][i])

    put_ln("input_layernorm", layers["input_layernorm"])
    put_dense("self_attn.q_proj", layers["attn"]["q_proj"])
    put_dense("self_attn.k_proj", layers["attn"]["k_proj"])
    put_dense("self_attn.v_proj", layers["attn"]["v_proj"])
    put_dense("self_attn.o_proj", layers["attn"]["o_proj"])
    put_ln("post_attention_layernorm", layers["post_attention_layernorm"])
    put_dense("mlp.c_fc", layers["mlp"]["c_fc"])
    put_dense("mlp.c_proj", layers["mlp"]["c_proj"])
    sd[prefix + "norm.weight"] = np.asarray(params["norm"]["scale"])
    sd[prefix + "norm.bias"] = np.asarray(params["norm"]["bias"])
    if "lm_head" in params:
        # untied head only: HF/safetensors omit tied duplicates, and the
        # loader detects untying by this key's presence. lm_head is a
        # SIBLING of the "model." subtree: strip a trailing "model." so
        # wrapped exports keep the head inside the wrapper
        head_prefix = (prefix[:-len("model.")]
                       if prefix.endswith("model.") else prefix)
        sd[head_prefix + "lm_head.weight"] = np.asarray(params["lm_head"])
    return sd


def _siglip_to_hf(enc: dict, pfx: str) -> dict:
    """Inverse of siglip.from_hf_state_dict: JAX pytree → HF
    SiglipVisionModel.vision_model state-dict naming. The reference's
    `visual_encoder` for the 8B IS that vision_model
    (reference image_encoder.py:42-45), so keys carry no 'vision_model.'
    segment in a saved StarVector checkpoint."""
    sd: dict[str, np.ndarray] = {}
    pe = np.asarray(enc["patch_embed"]["kernel"])  # (P*P*3, W)
    W = pe.shape[1]
    p2 = int(np.sqrt(pe.shape[0] // 3))
    sd[pfx + "embeddings.patch_embedding.weight"] = np.ascontiguousarray(
        pe.T.reshape(W, 3, p2, p2)
    )
    sd[pfx + "embeddings.patch_embedding.bias"] = np.asarray(
        enc["patch_embed"]["bias"]
    )
    sd[pfx + "embeddings.position_embedding.weight"] = np.asarray(
        enc["position_embedding"]
    )
    layers = enc["layers"]
    L = layers["layer_norm1"]["scale"].shape[0]
    for i in range(L):
        base = pfx + f"encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            sd[base + ln + ".weight"] = np.asarray(layers[ln]["scale"][i])
            sd[base + ln + ".bias"] = np.asarray(layers[ln]["bias"][i])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            p = layers["attn"][proj]
            sd[base + f"self_attn.{proj}.weight"] = _t(p["kernel"][i])
            sd[base + f"self_attn.{proj}.bias"] = np.asarray(p["bias"][i])
        for mm in ("fc1", "fc2"):
            p = layers["mlp"][mm]
            sd[base + f"mlp.{mm}.weight"] = _t(p["kernel"][i])
            sd[base + f"mlp.{mm}.bias"] = np.asarray(p["bias"][i])
    sd[pfx + "post_layernorm.weight"] = np.asarray(enc["post_layernorm"]["scale"])
    sd[pfx + "post_layernorm.bias"] = np.asarray(enc["post_layernorm"]["bias"])
    return sd


def vision_to_hf(params: dict, cfg) -> dict:
    """Inverse of the checkpoint-load converters for the vision tower +
    adapter: emits the reference's state-dict naming
    (model.image_encoder.visual_encoder.* / model.image_projection.*,
    starvector_base.py:23-48) so an exported checkpoint round-trips through
    load_hf_starvector_checkpoint. CLIP (the 1B tower) and siglip_* (the 8B
    tower) are supported; vqgan/convnext/open-clip towers are out-of-tree
    in the reference too (image_encoder.py:63-89) and stay load-only."""
    if cfg.image_encoder_type.startswith("siglip"):
        sd = _siglip_to_hf(
            params["image_encoder"]["visual_encoder"],
            "model.image_encoder.visual_encoder.",
        )
        sd.update(_adapter_to_hf(params["image_projection"]))
        return sd
    if cfg.image_encoder_type != "clip":
        raise NotImplementedError(
            f"vision export for {cfg.image_encoder_type!r} not implemented; "
            "clip (1B) and siglip (8B) towers are"
        )
    enc = params["image_encoder"]["visual_encoder"]
    pfx = "model.image_encoder.visual_encoder."
    sd: dict = {}
    # patch_embed (C*P*P, W) → conv1.weight (W, 3, P, P)
    pe = np.asarray(enc["patch_embed"])
    W = pe.shape[1]
    p2 = int(np.sqrt(pe.shape[0] // 3))
    sd[pfx + "conv1.weight"] = np.ascontiguousarray(
        pe.T.reshape(W, 3, p2, p2)
    )
    sd[pfx + "class_embedding"] = np.asarray(enc["class_embedding"])
    sd[pfx + "positional_embedding"] = np.asarray(enc["positional_embedding"])
    sd[pfx + "ln_pre.weight"] = np.asarray(enc["ln_pre"]["scale"])
    sd[pfx + "ln_pre.bias"] = np.asarray(enc["ln_pre"]["bias"])
    layers = enc["layers"]
    L = layers["ln_1"]["scale"].shape[0]
    for i in range(L):
        base = pfx + f"transformer.resblocks.{i}."
        for ln in ("ln_1", "ln_2"):
            sd[base + ln + ".weight"] = np.asarray(layers[ln]["scale"][i])
            sd[base + ln + ".bias"] = np.asarray(layers[ln]["bias"][i])
        sd[base + "attn.in_proj_weight"] = _t(layers["attn"]["in_proj"]["kernel"][i])
        sd[base + "attn.in_proj_bias"] = np.asarray(layers["attn"]["in_proj"]["bias"][i])
        sd[base + "attn.out_proj.weight"] = _t(layers["attn"]["out_proj"]["kernel"][i])
        sd[base + "attn.out_proj.bias"] = np.asarray(layers["attn"]["out_proj"]["bias"][i])
        for mm in ("c_fc", "c_proj"):
            sd[base + f"mlp.{mm}.weight"] = _t(layers["mlp"][mm]["kernel"][i])
            sd[base + f"mlp.{mm}.bias"] = np.asarray(layers["mlp"][mm]["bias"][i])
    sd["model.image_encoder.ln_vision.weight"] = np.asarray(
        params["image_encoder"]["ln_vision"]["scale"]
    )
    sd["model.image_encoder.ln_vision.bias"] = np.asarray(
        params["image_encoder"]["ln_vision"]["bias"]
    )

    sd.update(_adapter_to_hf(params["image_projection"]))
    return sd


def _adapter_to_hf(ad: dict, apfx: str = "model.image_projection.") -> dict:
    sd: dict[str, np.ndarray] = {}
    for mm in ("c_fc", "c_proj"):
        sd[apfx + mm + ".weight"] = _t(ad[mm]["kernel"])
        sd[apfx + mm + ".bias"] = np.asarray(ad[mm]["bias"])
    sd[apfx + "norm.weight"] = np.asarray(ad["norm"]["scale"])
    sd[apfx + "norm.bias"] = np.asarray(ad["norm"]["bias"])
    if "running_mean" in ad["norm"]:
        sd[apfx + "norm.running_mean"] = np.asarray(ad["norm"]["running_mean"])
        sd[apfx + "norm.running_var"] = np.asarray(ad["norm"]["running_var"])
        # torch BatchNorm1d serializes this counter; strict torch loads of
        # our exports fail without it
        sd[apfx + "norm.num_batches_tracked"] = np.asarray(
            ad["norm"].get("num_batches_tracked", 0), np.int64
        )
    return sd


def save_safetensors(sd: dict, path: str):
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
