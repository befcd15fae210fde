"""HF checkpoint → JAX pytree converters (bit-faithful).

Handles the layout quirks called out in SURVEY.md §7 "hard parts":
  * torch Linear weight is (out, in); ours is (in, out) → transpose
  * GPTBigCode fused c_attn keeps its [Q(E) | K(D_kv) | V(D_kv)] column
    order (reference modeling_gpt_bigcode.py:138,253) — the transpose
    preserves it, our forward splits identically
  * tied lm_head (wte) and resized embedding rows for added special tokens
    come through as-is
  * per-layer tensors are stacked onto a leading layer axis for lax.scan

Input is a flat `dict[str, np.ndarray]` state dict — from torch
(`{k: v.numpy() for ...}`) or safetensors (`load_file`). No torch import
here; loading helpers that need safetensors are lazy.
"""

from __future__ import annotations

import os
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from starvector_tpu.models.gpt_bigcode import GPTBigCodeConfig
from starvector_tpu.models.starcoder2 import StarCoder2Config


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(x))


def _stack(arrays: list[np.ndarray], dtype) -> jnp.ndarray:
    return jnp.asarray(np.stack(arrays), dtype=dtype)


def gpt_bigcode_from_hf(
    sd: Mapping[str, np.ndarray], cfg: GPTBigCodeConfig, dtype=jnp.float32,
    prefix: str = "transformer.",
) -> dict:
    """Convert an HF GPTBigCodeForCausalLM state dict (reference decoder for
    the 1B model, starvector/model/llm/starcoder.py:9-53)."""
    g = lambda name: sd[prefix + name]
    L = cfg.n_layer

    def dense_p(name):
        p = {"kernel": [], "bias": []}
        for i in range(L):
            p["kernel"].append(_t(g(f"h.{i}.{name}.weight")))
            p["bias"].append(g(f"h.{i}.{name}.bias"))
        return {
            "kernel": _stack(p["kernel"], dtype),
            "bias": _stack(p["bias"], dtype),
        }

    def ln_p(name):
        return {
            "scale": _stack([g(f"h.{i}.{name}.weight") for i in range(L)], dtype),
            "bias": _stack([g(f"h.{i}.{name}.bias") for i in range(L)], dtype),
        }

    return {
        "wte": jnp.asarray(g("wte.weight"), dtype=dtype),
        "wpe": jnp.asarray(g("wpe.weight"), dtype=dtype),
        "layers": {
            "ln_1": ln_p("ln_1"),
            "attn": {"c_attn": dense_p("attn.c_attn"), "c_proj": dense_p("attn.c_proj")},
            "ln_2": ln_p("ln_2"),
            "mlp": {"c_fc": dense_p("mlp.c_fc"), "c_proj": dense_p("mlp.c_proj")},
        },
        "ln_f": {
            "scale": jnp.asarray(g("ln_f.weight"), dtype=dtype),
            "bias": jnp.asarray(g("ln_f.bias"), dtype=dtype),
        },
    }


def starcoder2_from_hf(
    sd: Mapping[str, np.ndarray], cfg: StarCoder2Config, dtype=jnp.float32,
    prefix: str = "model.",
) -> dict:
    """Convert an HF Starcoder2ForCausalLM state dict (reference decoder for
    the 8B model, starvector/model/llm/starcoder2.py:13-53)."""
    g = lambda name: sd[prefix + name]
    L = cfg.num_hidden_layers
    has_bias = cfg.use_bias

    def dense_p(name):
        kernels = [_t(g(f"layers.{i}.{name}.weight")) for i in range(L)]
        out = {"kernel": _stack(kernels, dtype)}
        if has_bias:
            out["bias"] = _stack([g(f"layers.{i}.{name}.bias") for i in range(L)], dtype)
        return out

    def ln_p(name):
        return {
            "scale": _stack([g(f"layers.{i}.{name}.weight") for i in range(L)], dtype),
            "bias": _stack([g(f"layers.{i}.{name}.bias") for i in range(L)], dtype),
        }

    params = {
        "embed_tokens": jnp.asarray(g("embed_tokens.weight"), dtype=dtype),
        "layers": {
            "input_layernorm": ln_p("input_layernorm"),
            "attn": {
                "q_proj": dense_p("self_attn.q_proj"),
                "k_proj": dense_p("self_attn.k_proj"),
                "v_proj": dense_p("self_attn.v_proj"),
                "o_proj": dense_p("self_attn.o_proj"),
            },
            "post_attention_layernorm": ln_p("post_attention_layernorm"),
            "mlp": {"c_fc": dense_p("mlp.c_fc"), "c_proj": dense_p("mlp.c_proj")},
        },
        "norm": {
            "scale": jnp.asarray(g("norm.weight"), dtype=dtype),
            "bias": jnp.asarray(g("norm.bias"), dtype=dtype),
        },
    }
    if not cfg.tie_word_embeddings:
        head_prefix = (prefix[:-len("model.")]
                       if prefix.endswith("model.") else "")
        params["lm_head"] = jnp.asarray(
            sd[head_prefix + "lm_head.weight"], dtype=dtype
        )
    return params


def load_safetensors_dir(path: str) -> dict:
    """Load all *.safetensors shards in a checkpoint directory."""
    from safetensors.numpy import load_file

    sd: dict[str, np.ndarray] = {}
    for fname in sorted(os.listdir(path)):
        if fname.endswith(".safetensors"):
            sd.update(load_file(os.path.join(path, fname)))
    return sd


def torch_state_dict_to_numpy(sd) -> dict:
    """Convert a torch state dict to numpy (bf16 → fp32 via float())."""
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach()
            if str(v.dtype) == "torch.bfloat16":
                v = v.float()
            v = v.cpu().numpy()
        out[k] = np.array(v)  # copy: source may alias torch buffers
    return out
