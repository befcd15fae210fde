"""Mesh + sharding tests on the 8-device virtual CPU platform
(SURVEY.md §4 tier 4)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from starvector_tpu.parallel import (
    MeshConfig,
    apply_partition_rules,
    create_mesh,
    make_param_shardings,
)
from starvector_tpu.parallel.mesh import batch_sharding
from starvector_tpu.models import gpt_bigcode as gbc


def test_mesh_shapes():
    assert jax.device_count() == 8
    mesh = create_mesh(MeshConfig(fsdp=-1))
    assert mesh.shape["fsdp"] == 8
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    assert mesh.devices.size == 8


def test_partition_rules_on_decoder_params():
    cfg = gbc.tiny_config(hidden_size=128, n_head=8, vocab_size=1024)
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    mesh = create_mesh(MeshConfig(fsdp=4, tensor=2))
    specs = apply_partition_rules(params, gbc.partition_rules(), mesh)
    assert specs["wte"] == P("fsdp", None)
    assert specs["layers"]["attn"]["c_proj"]["kernel"] == P(None, "tensor", "fsdp")
    # small/indivisible dims fall back to replicated entries
    flat = jax.tree_util.tree_leaves(specs)
    assert all(isinstance(s, P) for s in flat)


def test_sharded_forward_matches_single_device():
    cfg = gbc.tiny_config(hidden_size=128, n_head=8, vocab_size=1024)
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    B, S = 8, 6
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    embeds = gbc.embed_tokens(params, ids)
    from starvector_tpu.ops.layers import DTypePolicy

    f32 = DTypePolicy(compute_dtype=jnp.float32)
    ref_logits, _ = gbc.forward(params, cfg, embeds, policy=f32)

    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    shardings = make_param_shardings(params, gbc.partition_rules(), mesh)
    sharded_params = jax.tree_util.tree_map(jax.device_put, params, shardings)
    sharded_embeds = jax.device_put(embeds, batch_sharding(mesh, extra_dims=2))
    with jax.set_mesh(mesh):
        logits, _ = gbc.forward(sharded_params, cfg, sharded_embeds, policy=f32)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_batch_sharding_layout():
    mesh = create_mesh(MeshConfig(data=4, fsdp=2))
    x = jnp.zeros((8, 16))
    xs = jax.device_put(x, batch_sharding(mesh, extra_dims=1))
    assert isinstance(xs.sharding, NamedSharding)
    # 8 batch rows spread over data(4) x fsdp(2) = 8 shards
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (1, 16)
