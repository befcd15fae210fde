"""Sequence (context) parallelism tests on the 8-device virtual CPU mesh.

The reference has NO sequence parallelism (SURVEY §5: absent) — this is a
TPU-first extension. These tests pin the all-gather-KV context-parallel
flash attention (parallel/sequence.py) to the unsharded kernel: forward,
gradients, GQA + sliding window, and the full task-model training step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.ops.flash_attention import flash_prefill_trainable
from starvector_tpu.parallel import MeshConfig, create_mesh
from starvector_tpu.parallel.mesh import batch_sharding, seq_spec
from starvector_tpu.parallel.sequence import sp_flash_attention


def _sp_mesh(data=2, sequence=4):
    return create_mesh(MeshConfig(data=data, fsdp=1, sequence=sequence,
                                  tensor=1))


def _rand_qkv(B=2, S=32, H=4, Hkv=1, D=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
    # left-padding on row 1 (the batched-generation mask pattern)
    mask = jnp.ones((B, S), jnp.int32).at[1, :5].set(0)
    return q, k, v, mask


def test_sp_flash_matches_unsharded():
    q, k, v, mask = _rand_qkv()
    ref = flash_prefill_trainable(q, k, v, mask)

    mesh = _sp_mesh()
    with jax.set_mesh(mesh):
        out = jax.jit(sp_flash_attention)(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_flash_gradients_match():
    q, k, v, mask = _rand_qkv(seed=3)

    def loss(fn, q, k, v):
        out = fn(q, k, v, mask)
        w = jnp.linspace(0.5, 1.5, out.size).reshape(out.shape)
        return jnp.sum(out * w)

    ref_grads = jax.grad(
        lambda q, k, v: loss(flash_prefill_trainable, q, k, v),
        argnums=(0, 1, 2),
    )(q, k, v)

    mesh = _sp_mesh()
    with jax.set_mesh(mesh):
        sp_grads = jax.jit(jax.grad(
            lambda q, k, v: loss(sp_flash_attention, q, k, v),
            argnums=(0, 1, 2),
        ))(q, k, v)
    for g_ref, g_sp in zip(ref_grads, sp_grads):
        np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)


def test_sp_flash_gqa_sliding_window():
    q, k, v, mask = _rand_qkv(H=8, Hkv=2, seed=5)
    ref = flash_prefill_trainable(q, k, v, mask, 0, True, 16)

    mesh = _sp_mesh()
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda q, k, v, m: sp_flash_attention(q, k, v, m, window=16)
        )(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_noop_without_sequence_axis():
    """On a mesh without a sequence axis the wrapper is the plain kernel."""
    q, k, v, mask = _rand_qkv(seed=7)
    ref = flash_prefill_trainable(q, k, v, mask)
    mesh = create_mesh(MeshConfig(data=2, fsdp=4, sequence=1, tensor=1))
    with jax.set_mesh(mesh):
        out = jax.jit(sp_flash_attention)(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_sp_training_step_loss_and_grads_match():
    """Full task-model loss + grads, mesh (data=2, sequence=4) vs unsharded."""
    from starvector_tpu.models import starvector as sv
    from starvector_tpu.ops.layers import DTypePolicy
    from starvector_tpu.parallel import make_param_shardings

    cfg = sv.tiny_config()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, attn_impl="flash")
    )
    policy = DTypePolicy(compute_dtype=jnp.float32)
    params = sv.init_params(cfg, jax.random.PRNGKey(0))

    # tiny CLIP tower yields 17 visual tokens; 17 + 47 = 64 divides the
    # 4-way sequence axis so the SP attention path actually engages
    B, S = 2, 47
    batch = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(1), (B, cfg.image_size, cfg.image_size, 3)
        ),
        "svg_ids": jax.random.randint(
            jax.random.PRNGKey(2), (B, S), 1, cfg.llm.vocab_size
        ),
        "svg_mask": jnp.ones((B, S), jnp.int32),
    }

    def loss_fn(p, batch):
        return sv.loss_fn(p, cfg, batch, 0, policy=policy, train=True)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, batch)

    mesh = _sp_mesh(data=2, sequence=4)
    shardings = make_param_shardings(params, sv.partition_rules(), mesh)
    sp_params = jax.tree_util.tree_map(jax.device_put, params, shardings)
    # S=47 itself doesn't divide the 4-way axis (sanitize falls back to the
    # batch layout for the ids) — the SP region engages on the concatenated
    # [17 visual ‖ 47 svg] = 64-token activations inside the decoder
    from starvector_tpu.parallel.mesh import sanitize_for_mesh

    ids_sh = jax.sharding.NamedSharding(
        mesh, sanitize_for_mesh(seq_spec(), batch["svg_ids"].shape, mesh)
    )
    sp_batch = {
        "image": jax.device_put(batch["image"], batch_sharding(mesh, 3)),
        "svg_ids": jax.device_put(batch["svg_ids"], ids_sh),
        "svg_mask": jax.device_put(batch["svg_mask"], ids_sh),
    }
    with jax.set_mesh(mesh):
        sp_loss, sp_grads = jax.jit(jax.value_and_grad(loss_fn))(
            sp_params, sp_batch
        )
    np.testing.assert_allclose(float(sp_loss), float(ref_loss),
                               rtol=2e-5, atol=2e-5)
    ref_flat, _ = jax.tree_util.tree_flatten(ref_grads)
    sp_flat, _ = jax.tree_util.tree_flatten(sp_grads)
    for g_ref, g_sp in zip(ref_flat, sp_flat):
        np.testing.assert_allclose(
            np.asarray(g_sp), np.asarray(g_ref), rtol=5e-4, atol=5e-4
        )
