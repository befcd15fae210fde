"""int8 weight-only quantization: kernel parity, tree transform, and
end-to-end decoder quality."""

import jax
import jax.numpy as jnp
import numpy as np

from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.ops import quantization as q
from starvector_tpu.ops.layers import DTypePolicy

F32 = DTypePolicy(compute_dtype=jnp.float32)


def test_quant_matmul_parity():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    w = rng.randn(256, 384).astype(np.float32) * 0.1
    p = q.quantize_dense({"kernel": w})
    ref = x @ (np.asarray(p["kernel_q"], np.float32) * np.asarray(p["scale"]))
    out = q.quant_matmul(x, p["kernel_q"], p["scale"], block_n=128,
                         block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_quantize_dense_error_bound():
    rng = np.random.RandomState(1)
    w = rng.randn(128, 64).astype(np.float32)
    p = q.quantize_dense({"kernel": w})
    deq = np.asarray(p["kernel_q"], np.float32) * np.asarray(p["scale"])
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # int8 per-channel ≈ 0.4% worst-case


def test_quantize_tree_targets_big_kernels():
    cfg = gbc.tiny_config(hidden_size=256, n_head=4)
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    qp = q.quantize_tree(params, min_elems=1 << 12)
    assert "kernel_q" in qp["layers"]["mlp"]["c_fc"]
    assert qp["layers"]["mlp"]["c_fc"]["kernel_q"].dtype == jnp.int8
    # stacked layer axis preserved
    assert qp["layers"]["mlp"]["c_fc"]["kernel_q"].shape[0] == cfg.n_layer
    # embeddings and LNs untouched
    assert "wte" in qp and qp["wte"].dtype != jnp.int8
    assert "scale" in qp["ln_f"]


def test_quantized_decoder_quality():
    """Quantized forward stays close to fp32: same top-1 for most positions."""
    cfg = gbc.tiny_config(hidden_size=256, n_head=4, vocab_size=1024)
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    qp = q.quantize_tree(params, min_elems=1 << 12, consume=False)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    embeds = gbc.embed_tokens(params, ids)
    ref, _ = gbc.forward(params, cfg, embeds, policy=F32)
    out, _ = gbc.forward(qp, cfg, embeds, policy=F32)
    agree = np.mean(
        np.asarray(jnp.argmax(ref, -1)) == np.asarray(jnp.argmax(out, -1))
    )
    assert agree > 0.9
    # logit error small relative to logit scale
    rel = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
    assert rel < 0.1


def test_quantized_cached_decode_runs():
    cfg = gbc.tiny_config(hidden_size=256, n_head=4)
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    qp = q.quantize_tree(params, min_elems=1 << 12)
    cache = gbc.init_cache(cfg, 1, 16, dtype=jnp.float32)
    e = gbc.embed_tokens(qp, jnp.array([[1, 2, 3]]))
    lg, cache = gbc.forward(qp, cfg, e, cache=cache, policy=F32)
    lg2, _ = gbc.forward(qp, cfg, e[:, :1], cache=cache, policy=F32)
    assert np.isfinite(np.asarray(lg2)).all()
