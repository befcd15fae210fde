"""Task-model tests: im2svg/text2svg loss assembly, prefix masking, both
decoder families (SURVEY.md §3.1 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.models import starvector as sv
from starvector_tpu.ops.layers import DTypePolicy

F32 = DTypePolicy(compute_dtype=jnp.float32)
PAD = 0


def make_batch(cfg, rng=0, B=2, S=10):
    r = np.random.RandomState(rng)
    img = r.randn(B, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    ids = r.randint(1, cfg.llm.vocab_size, (B, S))
    ids[1, -3:] = PAD  # ragged batch
    mask = (ids != PAD).astype(np.int32)
    return {
        "image": jnp.asarray(img),
        "svg_ids": jnp.asarray(ids),
        "svg_mask": jnp.asarray(mask),
    }


@pytest.mark.parametrize("decoder", ["gpt_bigcode", "starcoder2"])
def test_im2svg_loss(decoder):
    cfg = sv.tiny_config(decoder=decoder)
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    loss = sv.loss_fn(params, cfg, batch, PAD, policy=F32)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_prefix_is_masked_from_loss():
    """The visual prefix must contribute no loss terms: replacing the image
    changes logits but the target layout keeps prefix masked (-100)."""
    cfg = sv.tiny_config()
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    ie, am, tg = sv.im2svg_inputs(
        params, cfg, batch["image"], batch["svg_ids"], batch["svg_mask"], PAD,
        policy=F32,
    )
    Q = ie.shape[1] - batch["svg_ids"].shape[1]
    assert Q == params["image_projection"]["norm"]["scale"].shape[0]
    assert bool(jnp.all(tg[:, :Q] == -100))
    assert bool(jnp.all(am[:, :Q] == 1))
    # pads in svg ids are masked too
    assert bool(jnp.all(tg[1, Q + 7 :] == -100))


def test_image_affects_loss():
    cfg = sv.tiny_config()
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    b1 = make_batch(cfg, rng=0)
    b2 = dict(b1)
    b2["image"] = b1["image"] + 1.0
    l1 = sv.loss_fn(params, cfg, b1, PAD, policy=F32)
    l2 = sv.loss_fn(params, cfg, b2, PAD, policy=F32)
    assert not np.isclose(float(l1), float(l2))


def test_text2svg_loss():
    cfg = sv.tiny_config(task="text2svg")
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    assert "image_encoder" not in params  # reference use_image_encoder()
    r = np.random.RandomState(3)
    ids = r.randint(1, cfg.llm.vocab_size, (2, 12))
    mask = np.ones_like(ids)
    batch = {"input_ids": jnp.asarray(ids), "input_mask": jnp.asarray(mask)}
    loss = sv.loss_fn(params, cfg, batch, PAD, policy=F32)
    assert np.isfinite(float(loss)) and float(loss) > 0


@pytest.mark.slow
def test_loss_grad_flows():
    cfg = sv.tiny_config()
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)

    grads = jax.grad(
        lambda p: sv.loss_fn(p, cfg, batch, PAD, policy=F32)
    )(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0
    )
    assert np.isfinite(gnorm) and gnorm > 0
    # every major component receives gradient
    for key in ("svg_transformer", "image_encoder", "image_projection"):
        sub = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads[key], 0.0
        )
        assert sub > 0, key


@pytest.mark.slow
def test_init_params_jit_matches_eager():
    """init_params_jit is the same tree, same values (up to XLA fusion/FMA
    reassociation — observed ~6e-8) — in one dispatch."""
    cfg = sv.tiny_config()
    key = jax.random.PRNGKey(3)
    eager = sv.init_params(cfg, key)
    jitted = sv.init_params_jit(cfg, key)
    flat_e = jax.tree_util.tree_leaves_with_path(eager)
    flat_j = dict(jax.tree_util.tree_leaves_with_path(jitted))
    assert len(flat_e) == len(flat_j)
    for path, leaf in flat_e:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_j[path]), atol=1e-6, rtol=1e-5
        )


@pytest.mark.slow
def test_init_params_jit_sharded_on_mesh():
    """With a mesh, params materialize directly sharded per partition_rules
    (the tunneled-backend cold-start fix: no host materialize + transfer)."""
    from starvector_tpu.parallel import MeshConfig, create_mesh

    cfg = sv.tiny_config()
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    params = sv.init_params_jit(cfg, jax.random.PRNGKey(3), mesh=mesh)
    eager = sv.init_params(cfg, jax.random.PRNGKey(3))
    kern = params["svg_transformer"]["layers"]["attn"]["c_attn"]["kernel"]
    assert not kern.sharding.is_fully_replicated
    np.testing.assert_allclose(
        np.asarray(kern),
        np.asarray(eager["svg_transformer"]["layers"]["attn"]["c_attn"]["kernel"]),
        atol=1e-6, rtol=1e-5,
    )
