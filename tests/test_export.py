"""Export round-trip: our pytree → HF state dict → back, and through the
actual HF torch model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from starvector_tpu.models import convert, export
from starvector_tpu.models import gpt_bigcode as gbc
from starvector_tpu.models import starcoder2 as sc2
from starvector_tpu.ops.layers import DTypePolicy

torch = pytest.importorskip("torch")
F32 = DTypePolicy(compute_dtype=jnp.float32)


def test_gbc_roundtrip():
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    sd = export.gpt_bigcode_to_hf(params, cfg)
    back = convert.gpt_bigcode_from_hf(sd, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sc2_export_loads_in_hf():
    """Exported weights drive the real HF torch model to identical logits."""
    from transformers import Starcoder2Config as HFConfig
    from transformers import Starcoder2ForCausalLM

    cfg = sc2.tiny_config()
    params = sc2.init_params(cfg, jax.random.PRNGKey(1))
    sd = export.starcoder2_to_hf(params, cfg)

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta, sliding_window=None,
        attn_implementation="eager", tie_word_embeddings=True,
    )
    model = Starcoder2ForCausalLM(hf_cfg).eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False
    )
    # tied lm_head is intentionally NOT serialized (HF/safetensors omit
    # tied duplicates); HF re-ties it below
    assert not [m for m in missing
                if "rotary" not in m and "lm_head" not in m], missing
    assert not unexpected, unexpected
    model.tie_weights()
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (1, 6))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours, _ = sc2.forward(
        params, cfg, sc2.embed_tokens(params, jnp.asarray(ids)), policy=F32
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_safetensors_write(tmp_path):
    cfg = gbc.tiny_config()
    params = gbc.init_params(cfg, jax.random.PRNGKey(0))
    sd = export.gpt_bigcode_to_hf(params, cfg)
    path = str(tmp_path / "model.safetensors")
    export.save_safetensors(sd, path)
    from safetensors.numpy import load_file

    loaded = load_file(path)
    assert set(loaded) == set(sd)


def test_vision_export_roundtrip():
    """vision_to_hf emits the reference naming; converting back reproduces
    the encoder + adapter outputs exactly."""
    import jax
    import jax.numpy as jnp

    from starvector_tpu.models import adapter as adapter_mod
    from starvector_tpu.models import starvector as sv
    from starvector_tpu.models.vision import clip_vit
    from starvector_tpu.ops.layers import DTypePolicy

    cfg = sv.tiny_config()
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    sd = export.vision_to_hf(params, cfg)
    assert "model.image_encoder.visual_encoder.conv1.weight" in sd
    assert "model.image_projection.c_fc.weight" in sd

    # strip the 'model.' prefix like the checkpoint loader does
    sd = {k[len("model."):]: v for k, v in sd.items()}
    tower_cfg = clip_vit.CLIPViTConfig(
        image_size=cfg.image_size, patch_size=7, width=32, layers=2, heads=4
    )
    enc2 = clip_vit.from_torch_state_dict(
        sd, tower_cfg, prefix="image_encoder.visual_encoder."
    )
    f32 = DTypePolicy(compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 28, 28, 3))
    out1 = clip_vit.forward(params["image_encoder"]["visual_encoder"],
                            tower_cfg, x, policy=f32)
    out2 = clip_vit.forward(enc2, tower_cfg, x, policy=f32)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               rtol=1e-5, atol=1e-6)

    ad_cfg = sv._adapter_cfg_for(cfg, params)
    ad2 = adapter_mod.from_torch_state_dict(
        sd, ad_cfg, prefix="image_projection."
    )
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, ad_cfg.query_length,
                                                    ad_cfg.input_size))
    a1 = adapter_mod.forward(params["image_projection"], ad_cfg, emb, policy=f32)
    a2 = adapter_mod.forward(ad2, ad_cfg, emb, policy=f32)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                               rtol=1e-5, atol=1e-6)
