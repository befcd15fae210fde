from starvector_tpu.ops.layers import (
    DTypePolicy,
    dense,
    layer_norm,
    gelu_tanh,
    quick_gelu,
    swish,
)
from starvector_tpu.ops.attention import multihead_attention, make_attention_bias

__all__ = [
    "DTypePolicy",
    "dense",
    "layer_norm",
    "gelu_tanh",
    "quick_gelu",
    "swish",
    "multihead_attention",
    "make_attention_bias",
]
