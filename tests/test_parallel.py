"""Mesh + sharding tests on the 8-device virtual CPU platform
(SURVEY.md §4 tier 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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
    # leading layer axis shards over the (size-1 here) pipeline `stage` axis
    assert specs["layers"]["attn"]["c_proj"]["kernel"] == P(
        "stage", "tensor", "fsdp"
    )
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


def test_sharded_starcoder2_matches_single_device():
    from starvector_tpu.models import starcoder2 as sc2
    from starvector_tpu.ops.layers import DTypePolicy

    f32 = DTypePolicy(compute_dtype=jnp.float32)
    cfg = sc2.tiny_config(
        hidden_size=128, num_attention_heads=8, num_key_value_heads=2,
        intermediate_size=256, vocab_size=1024,
    )
    params = sc2.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 6), 0, cfg.vocab_size)
    embeds = sc2.embed_tokens(params, ids)
    ref, _ = sc2.forward(params, cfg, embeds, policy=f32)

    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    sp = jax.tree_util.tree_map(
        jax.device_put, params,
        make_param_shardings(params, sc2.partition_rules(), mesh),
    )
    se = jax.device_put(embeds, batch_sharding(mesh, extra_dims=2))
    with jax.set_mesh(mesh):
        out, _ = sc2.forward(sp, cfg, se, policy=f32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4
    )


def test_sharded_task_model_loss_matches():
    from starvector_tpu.models import starvector as sv
    from starvector_tpu.ops.layers import DTypePolicy
    from starvector_tpu.parallel import shard_pytree

    f32 = DTypePolicy(compute_dtype=jnp.float32)
    cfg = sv.tiny_config()
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    rngs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rngs.randn(8, cfg.image_size, cfg.image_size, 3),
                             jnp.float32),
        "svg_ids": jnp.asarray(rngs.randint(1, cfg.llm.vocab_size, (8, 10)),
                               jnp.int32),
        "svg_mask": jnp.ones((8, 10), jnp.int32),
    }
    ref = sv.loss_fn(params, cfg, batch, 0, policy=f32)

    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    sp = shard_pytree(params, sv.partition_rules(), mesh)
    sb = {
        "image": jax.device_put(batch["image"], batch_sharding(mesh, 3)),
        "svg_ids": jax.device_put(batch["svg_ids"], batch_sharding(mesh, 1)),
        "svg_mask": jax.device_put(batch["svg_mask"], batch_sharding(mesh, 1)),
    }
    with jax.set_mesh(mesh):
        out = sv.loss_fn(sp, cfg, sb, 0, policy=f32)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-4)


@pytest.mark.slow
def test_tp_sharded_serving_engine_parity():
    """The continuous-batching ServeEngine over TP=4-sharded params emits
    the same greedy tokens as unsharded (BASELINE config 4: TP decode
    serving for the 8B/StarCoder2 family — XLA inserts the collectives
    from the param shardings; the engine needs no mesh plumbing)."""
    from starvector_tpu.models import starcoder2 as sc2
    from starvector_tpu.ops.layers import DTypePolicy
    from starvector_tpu.parallel import make_param_shardings
    from starvector_tpu.serve.engine import Request, ServeEngine

    f32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
    cfg = sc2.tiny_config()
    params = sc2.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.array([[3, 1, 4, 1]])
    prefix = sc2.embed_tokens(params, ids)

    ref_eng = ServeEngine(params, cfg, "starcoder2", max_batch=2, max_len=64,
                          policy=f32)
    ref = ref_eng.generate_sync(
        Request(prefix_embeds=prefix, max_new_tokens=6, do_sample=False),
        timeout=240,
    )
    ref_eng.stop()

    mesh = create_mesh(MeshConfig(tensor=4))
    sharded = jax.device_put(
        params, make_param_shardings(params, sc2.partition_rules(), mesh)
    )
    eng = ServeEngine(sharded, cfg, "starcoder2", max_batch=2, max_len=64,
                      policy=f32)
    out = eng.generate_sync(
        Request(prefix_embeds=prefix, max_new_tokens=6, do_sample=False),
        timeout=240,
    )
    eng.stop()
    assert out == ref


def test_siglip_tower_rules_not_shadowed():
    """clip_vit's `layers/.*` catch-all must not shadow siglip's specific
    sharding rules: an 8B (siglip) tower q_proj kernel gets a REAL
    fsdp/tensor spec, not the replicated fallback (review finding r2)."""
    from starvector_tpu.models import image_encoder
    from starvector_tpu.parallel.sharding import spec_for_path

    rules = image_encoder.partition_rules()
    spec = spec_for_path(
        "image_encoder/visual_encoder/layers/attn/q_proj/kernel", rules
    )
    assert "fsdp" in jax.tree_util.tree_leaves(tuple(spec)), spec
    # clip's own params still replicate via its catch-all
    spec_ln = spec_for_path(
        "image_encoder/visual_encoder/layers/ln_1/scale", rules
    )
    assert "fsdp" not in jax.tree_util.tree_leaves(tuple(spec_ln)), spec_ln
