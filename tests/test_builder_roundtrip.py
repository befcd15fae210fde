"""Checkpoint round trip: export_hf_checkpoint → load_hf_starvector_checkpoint.

Guards the geometry-derivation path (ADVICE r1 high): the reference resizes
embeddings after adding special tokens (reference llm/starcoder2.py:38-53),
so a real checkpoint's vocab differs from the base config — the loader must
derive vocab/hidden/layer-count from the state dict, v1 and v2 alike."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starvector_tpu.models import builder, starvector as sv
from starvector_tpu.models.tokenizer import build_test_tokenizer
from starvector_tpu.ops.layers import DTypePolicy
from starvector_tpu.train.hub import export_hf_checkpoint

F32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


@pytest.mark.parametrize("decoder,name", [
    ("gpt_bigcode", "bigcode/starcoderbase-1b"),
    ("starcoder2", "bigcode/starcoder2-7b"),
])
def test_export_then_load_roundtrip(tmp_path, decoder, name):
    cfg = sv.tiny_config(decoder=decoder)
    # resized vocab like a real StarVector checkpoint (base 512 + 5 added)
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, vocab_size=517)
    )
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    tok = build_test_tokenizer("v1" if decoder == "gpt_bigcode" else "v2")
    out = export_hf_checkpoint(
        params, cfg, tok, str(tmp_path / "ckpt"), starcoder_model_name=name
    )

    params2, cfg2, tok2 = builder.load_hf_starvector_checkpoint(
        out, dtype=jnp.float32
    )
    assert cfg2.decoder == decoder
    assert cfg2.llm.vocab_size == 517        # derived from the state dict
    if decoder == "starcoder2":
        assert cfg2.llm.num_hidden_layers == cfg.llm.num_hidden_layers
        assert cfg2.llm.hidden_size == cfg.llm.hidden_size

    # numerics: same decoder forward on both param trees
    dec = cfg.decoder_module
    ids = jnp.array([[5, 9, 2, 6]])
    e1 = dec.embed_tokens(params["svg_transformer"], ids)
    e2 = dec.embed_tokens(params2["svg_transformer"], ids)
    lg1, _ = dec.forward(params["svg_transformer"], cfg.llm, e1, policy=F32)
    lg2, _ = dec.forward(params2["svg_transformer"], cfg2.llm, e2, policy=F32)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                               atol=2e-5, rtol=2e-5)


def test_siglip_export_roundtrip(tmp_path):
    """8B-geometry export→reload: the siglip tower inverse (models/export.py)
    plus checkpoint-derived tower geometry (VERDICT r2 missing #3 — an 8B
    model trained here must round-trip to the reference HF layout,
    reference train/util.py:115-130)."""
    from starvector_tpu.models import starvector
    from starvector_tpu.models.vision import siglip

    cfg = sv.tiny_config(
        decoder="starcoder2", image_encoder_type="siglip_384",
        adapter_norm="layer_norm", image_size=32,
        vision_tower=siglip.tiny_config(),
    )
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    tok = build_test_tokenizer("v2")
    out = export_hf_checkpoint(
        params, cfg, tok, str(tmp_path / "ckpt"),
        starcoder_model_name="bigcode/starcoder2-7b",
    )

    params2, cfg2, _ = builder.load_hf_starvector_checkpoint(
        out, dtype=jnp.float32
    )
    # tower geometry derived from the weights, heads from vision_geometry
    assert cfg2.vision_tower == cfg.vision_tower
    assert cfg2.image_encoder_type == "siglip_384"

    # bit-exact vision + adapter round trip
    for sub in ("image_encoder", "image_projection"):
        leaves1 = jax.tree_util.tree_leaves_with_path(params[sub])
        leaves2 = dict(jax.tree_util.tree_leaves_with_path(params2[sub]))
        for path, leaf in leaves1:
            np.testing.assert_array_equal(
                np.asarray(leaf, np.float32), np.asarray(leaves2[path]),
                err_msg=str(path),
            )

    # forward parity through the full conditioning path
    img = jax.random.uniform(jax.random.PRNGKey(7), (1, 32, 32, 3))
    e1 = starvector.encode_image(params, cfg, img, policy=F32)
    e2 = starvector.encode_image(params2, cfg2, img, policy=F32)
    np.testing.assert_allclose(
        np.asarray(e1), np.asarray(e2), atol=2e-5, rtol=2e-5
    )
