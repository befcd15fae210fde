"""Pipeline-parallelism tests on the 8-device virtual CPU mesh.

The reference has NO pipeline parallelism (SURVEY §2.7: absent) — this is a
TPU-first extension: the stacked-layer axis shards over a `stage` mesh axis
and the GPipe microbatch schedule runs as a scan of ticks inside shard_map
(parallel/pipeline.py). These tests pin it to the plain layer scan.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.ops.layers import DTypePolicy
from starvector_tpu.parallel import MeshConfig, create_mesh, make_param_shardings
from starvector_tpu.parallel.mesh import batch_sharding

F32 = DTypePolicy(compute_dtype=jnp.float32)


def _pp_mesh(data=2, stage=4):
    return create_mesh(MeshConfig(data=data, fsdp=1, stage=stage, tensor=1))


def _model(n_layer=4, attn="xla"):
    cfg = gbc.tiny_config(n_layer=n_layer, attn_impl=attn)
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    B, S = 8, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    embeds = gbc.embed_tokens(params, ids)
    mask = jnp.ones((B, S), jnp.int32).at[1, :3].set(0)
    return cfg, params, embeds, mask


def test_pp_forward_matches_single_device():
    cfg, params, embeds, mask = _model()
    ref_logits, _ = gbc.forward(params, cfg, embeds, attention_mask=mask,
                                policy=F32)

    mesh = _pp_mesh()
    shardings = make_param_shardings(params, gbc.partition_rules(), mesh)
    pp = jax.tree_util.tree_map(jax.device_put, params, shardings)
    pe = jax.device_put(embeds, batch_sharding(mesh, extra_dims=2))
    with jax.set_mesh(mesh):
        logits, _ = jax.jit(
            lambda p, e, m: gbc.forward(p, cfg, e, attention_mask=m,
                                        policy=F32)
        )(pp, pe, mask)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


def test_pp_forward_flash_impl():
    cfg, params, embeds, mask = _model(attn="flash")
    ref_logits, _ = gbc.forward(params, cfg, embeds, attention_mask=mask,
                                policy=F32)
    mesh = _pp_mesh()
    shardings = make_param_shardings(params, gbc.partition_rules(), mesh)
    pp = jax.tree_util.tree_map(jax.device_put, params, shardings)
    pe = jax.device_put(embeds, batch_sharding(mesh, extra_dims=2))
    with jax.set_mesh(mesh):
        logits, _ = jax.jit(
            lambda p, e, m: gbc.forward(p, cfg, e, attention_mask=m,
                                        policy=F32)
        )(pp, pe, mask)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pp_training_step_loss_and_grads_match():
    from starvector_tpu.models import starvector as sv

    cfg = sv.tiny_config()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, n_layer=4)
    )
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    B, S = 8, 24
    batch = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(1), (B, cfg.image_size, cfg.image_size, 3)
        ),
        "svg_ids": jax.random.randint(
            jax.random.PRNGKey(2), (B, S), 1, cfg.llm.vocab_size
        ),
        "svg_mask": jnp.ones((B, S), jnp.int32),
    }

    def loss_fn(p, b):
        return sv.loss_fn(p, cfg, b, 0, policy=F32, train=True, remat=True)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, batch)

    mesh = _pp_mesh()
    shardings = make_param_shardings(params, sv.partition_rules(), mesh)
    pparams = jax.tree_util.tree_map(jax.device_put, params, shardings)
    pbatch = {k: jax.device_put(v, batch_sharding(mesh, v.ndim - 1))
              for k, v in batch.items()}
    with jax.set_mesh(mesh):
        pp_loss, pp_grads = jax.jit(jax.value_and_grad(loss_fn))(
            pparams, pbatch
        )
    np.testing.assert_allclose(float(pp_loss), float(ref_loss),
                               rtol=2e-5, atol=2e-5)
    ref_flat, _ = jax.tree_util.tree_flatten(ref_grads)
    pp_flat, _ = jax.tree_util.tree_flatten(pp_grads)
    for g_ref, g_pp in zip(ref_flat, pp_flat):
        np.testing.assert_allclose(
            np.asarray(g_pp), np.asarray(g_ref), rtol=5e-4, atol=5e-4
        )


def test_pp_indivisible_layers_falls_back():
    """L=3 doesn't divide 4 stages: plain scan, identical results."""
    cfg, params, embeds, mask = _model(n_layer=3)
    ref_logits, _ = gbc.forward(params, cfg, embeds, attention_mask=mask,
                                policy=F32)
    mesh = _pp_mesh()
    shardings = make_param_shardings(params, gbc.partition_rules(), mesh)
    pp = jax.tree_util.tree_map(jax.device_put, params, shardings)
    pe = jax.device_put(embeds, batch_sharding(mesh, extra_dims=2))
    with jax.set_mesh(mesh):
        logits, _ = jax.jit(
            lambda p, e, m: gbc.forward(p, cfg, e, attention_mask=m,
                                        policy=F32)
        )(pp, pe, mask)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


def test_pp_sequence_conflict_raises():
    import pytest

    cfg, params, embeds, mask = _model()
    mesh = create_mesh(MeshConfig(data=1, fsdp=1, sequence=2, stage=4,
                                  tensor=1))
    with jax.set_mesh(mesh):
        with pytest.raises(ValueError, match="pipeline and"):
            # S=16 divides sequence=2 so SP would engage; attn=xla keeps the
            # error on the pipeline check
            jax.jit(
                lambda p, e, m: gbc.forward(p, cfg, e, attention_mask=m,
                                            policy=F32)
            )(params, embeds, mask)


def test_pp_with_fsdp_matches_single_device():
    """stage=2 x fsdp=2 x data=2: layer weights stay fsdp-sharded through
    the manual region (gathered per layer at use — ZeRO semantics), and the
    numerics still match the unsharded forward."""
    cfg, params, embeds, mask = _model(n_layer=4)
    ref_logits, _ = gbc.forward(params, cfg, embeds, attention_mask=mask,
                                policy=F32)
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, stage=2, tensor=1))
    shardings = make_param_shardings(params, gbc.partition_rules(), mesh)
    pp = jax.tree_util.tree_map(jax.device_put, params, shardings)
    pe = jax.device_put(embeds, batch_sharding(mesh, extra_dims=2))
    with jax.set_mesh(mesh):
        logits, _ = jax.jit(
            lambda p, e, m: gbc.forward(p, cfg, e, attention_mask=m,
                                        policy=F32)
        )(pp, pe, mask)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
