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
    sd["lm_head.weight"] = np.asarray(params["wte"])  # tied
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
    head = params.get("lm_head", params["embed_tokens"])
    sd["lm_head.weight"] = np.asarray(head)
    return sd


def save_safetensors(sd: dict, path: str):
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
