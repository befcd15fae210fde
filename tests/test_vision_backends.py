"""vqgan / convnext / open-clip vision backends (reference
image_encoder.py:63-107): geometry, converter layout parity vs torch,
partition rules, and encoder dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.models import image_encoder
from starvector_tpu.models.vision import convnext, open_clip_vit, vqgan
from starvector_tpu.ops.layers import DTypePolicy

f32 = DTypePolicy(compute_dtype=jnp.float32)


# -- geometry (reference starvector_base.py:85-106) --------------------------

@pytest.mark.slow
def test_vqgan_tokens_geometry():
    cfg = vqgan.VQGANEncoderConfig()
    assert cfg.tokens_for(224) == 196  # 14 x 14 at f16
    assert cfg.z_channels == 256

    tiny = vqgan.tiny_config()
    p = vqgan.init_params(tiny, jax.random.PRNGKey(0))
    out = vqgan.forward(p, tiny, jnp.ones((2, 16, 16, 3)), policy=f32)
    assert out.shape == (2, tiny.tokens_for(16), tiny.z_channels)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_convnext_tokens_geometry():
    cfg = convnext.ConvNeXtConfig()
    assert cfg.tokens_for(224) == 49  # 7 x 7
    assert cfg.dims[-1] == 1024

    tiny = convnext.tiny_config()
    p = convnext.init_params(tiny, jax.random.PRNGKey(0))
    out = convnext.forward(p, tiny, jnp.ones((2, 32, 32, 3)), policy=f32)
    assert out.shape == (2, tiny.tokens_for(32), tiny.dims[-1])
    assert np.isfinite(np.asarray(out)).all()


def test_open_clip_tokens_geometry():
    cfg = open_clip_vit.OpenCLIPViTConfig()
    assert cfg.num_tokens == 256  # CLS excluded (reference [1] output)

    tiny = open_clip_vit.tiny_config()
    p = open_clip_vit.init_params(tiny, jax.random.PRNGKey(0))
    out = open_clip_vit.forward(p, tiny, jnp.ones((2, 28, 28, 3)), policy=f32)
    assert out.shape == (2, tiny.num_tokens, tiny.width)


# -- converter layout parity vs torch ----------------------------------------

def test_vqgan_conv_layout_matches_torch():
    """OIHW→HWIO conversion + taming's (0,1,0,1)-pad stride-2 downsample."""
    import torch

    rng = np.random.RandomState(0)
    w = rng.randn(8, 3, 3, 3).astype(np.float32)  # (O, I, kh, kw)
    b = rng.randn(8).astype(np.float32)
    x = rng.randn(2, 3, 9, 9).astype(np.float32)  # NCHW

    t_out = torch.nn.functional.conv2d(
        torch.from_numpy(np.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))),
        torch.from_numpy(w), torch.from_numpy(b), stride=2,
    ).numpy()

    p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))  # NHWC
    xp = jnp.pad(xj, ((0, 0), (0, 1), (0, 1), (0, 0)))
    j_out = np.asarray(vqgan._conv(p, xp, stride=2, padding="VALID"))
    np.testing.assert_allclose(
        j_out, t_out.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_convnext_depthwise_matches_torch():
    import torch

    rng = np.random.RandomState(1)
    dim = 8
    w = rng.randn(dim, 1, 7, 7).astype(np.float32)
    b = rng.randn(dim).astype(np.float32)
    x = rng.randn(1, dim, 10, 10).astype(np.float32)

    t_out = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        padding=3, groups=dim,
    ).numpy()

    p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    j_out = np.asarray(convnext._conv(p, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                      groups=dim))
    np.testing.assert_allclose(
        j_out, t_out.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow  # ~18 s: full taming-VQGAN build + converter roundtrip
def test_vqgan_converter_roundtrip():
    """A synthetic taming state dict converts into a forward-able pytree."""
    tiny = vqgan.tiny_config()
    ref = vqgan.init_params(tiny, jax.random.PRNGKey(2))

    sd = {}

    def put_conv(name, p):
        sd[f"encoder.{name}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        sd[f"encoder.{name}.bias"] = np.asarray(p["bias"])

    def put_gn(name, p):
        sd[f"encoder.{name}.weight"] = np.asarray(p["scale"])
        sd[f"encoder.{name}.bias"] = np.asarray(p["bias"])

    def put_res(name, p):
        put_gn(name + ".norm1", p["norm1"]); put_conv(name + ".conv1", p["conv1"])
        put_gn(name + ".norm2", p["norm2"]); put_conv(name + ".conv2", p["conv2"])
        if "nin_shortcut" in p:
            put_conv(name + ".nin_shortcut", p["nin_shortcut"])

    def put_attn(name, p):
        put_gn(name + ".norm", p["norm"])
        for k in ("q", "k", "v", "proj_out"):
            put_conv(f"{name}.{k}", p[k])

    put_conv("conv_in", ref["conv_in"])
    for lvl, level in enumerate(ref["down"]):
        for i, bp in enumerate(level["block"]):
            put_res(f"down.{lvl}.block.{i}", bp)
        for i, ap in enumerate(level.get("attn", [])):
            put_attn(f"down.{lvl}.attn.{i}", ap)
        if "downsample" in level:
            put_conv(f"down.{lvl}.downsample.conv", level["downsample"]["conv"])
    put_res("mid.block_1", ref["mid"]["block_1"])
    put_attn("mid.attn_1", ref["mid"]["attn_1"])
    put_res("mid.block_2", ref["mid"]["block_2"])
    put_gn("norm_out", ref["norm_out"])
    put_conv("conv_out", ref["conv_out"])

    conv = vqgan.from_torch_state_dict(sd, tiny)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 3))
    out_ref = np.asarray(vqgan.forward(ref, tiny, x, policy=f32))
    out_conv = np.asarray(vqgan.forward(conv, tiny, x, policy=f32))
    np.testing.assert_allclose(out_conv, out_ref, rtol=1e-5, atol=1e-6)


# -- encoder dispatch + partition rules ---------------------------------------

@pytest.mark.parametrize("etype,hidden,qlen", [
    ("vqgan", 256, 196), ("convnext", 1024, 49), ("open-clip", 1024, 256),
])
def test_encoder_geometry_table(etype, hidden, qlen):
    cfg = image_encoder.ImageEncoderConfig(etype, 224)
    assert cfg.geometry == (hidden, qlen)


@pytest.mark.parametrize("etype", [
    "vqgan",
    # heaviest tower to the slow tier; vqgan keeps the dispatch+partition
    # surface covered at default
    pytest.param("convnext", marks=pytest.mark.slow),
])
def test_encoder_dispatch_and_partition(etype):
    from starvector_tpu.parallel import MeshConfig, create_mesh, make_param_shardings

    cfg = image_encoder.ImageEncoderConfig(etype, 224)
    # geometry check at the REAL size is covered above; run tiny towers here
    tower = (vqgan.tiny_config() if etype == "vqgan" else convnext.tiny_config())
    mod = vqgan if etype == "vqgan" else convnext
    p = {"visual_encoder": mod.init_params(tower, jax.random.PRNGKey(0))}
    mesh = create_mesh(MeshConfig(replica=1, data=2, fsdp=2, tensor=2))
    shardings = make_param_shardings(p, image_encoder.partition_rules(), mesh)
    assert jax.tree_util.tree_structure(shardings) == jax.tree_util.tree_structure(p)
