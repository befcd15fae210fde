"""Vision towers + adapter parity tests vs torch (SURVEY.md §4 tier 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from starvector_tpu.models.vision import clip_vit, siglip
from starvector_tpu.models import adapter as adapter_mod
from starvector_tpu.ops.layers import DTypePolicy

torch = pytest.importorskip("torch")
F32 = DTypePolicy(compute_dtype=jnp.float32)


def test_clip_vit_parity_vs_torch_mha():
    """Our CLIP block must match the reference's torch stack
    (nn.MultiheadAttention + QuickGELU MLP, clip_model.py:130-191),
    rebuilt here in torch with the same weights."""
    import torch.nn as nn
    from collections import OrderedDict

    cfg = clip_vit.tiny_config()
    W, H, L, P, R = cfg.width, cfg.heads, cfg.layers, cfg.patch_size, cfg.image_size

    class QuickGELU(nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = nn.MultiheadAttention(W, H)
            self.ln_1 = nn.LayerNorm(W)
            self.mlp = nn.Sequential(OrderedDict([
                ("c_fc", nn.Linear(W, W * 4)),
                ("gelu", QuickGELU()),
                ("c_proj", nn.Linear(W * 4, W)),
            ]))
            self.ln_2 = nn.LayerNorm(W)

        def forward(self, x):
            x = x + self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x), need_weights=False)[0]
            x = x + self.mlp(self.ln_2(x))
            return x

    class Tower(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, W, P, stride=P, bias=False)
            scale = W ** -0.5
            self.class_embedding = nn.Parameter(scale * torch.randn(W))
            self.positional_embedding = nn.Parameter(
                scale * torch.randn((R // P) ** 2 + 1, W)
            )
            self.ln_pre = nn.LayerNorm(W)
            self.resblocks = nn.ModuleList([Block() for _ in range(L)])

        def forward(self, x):
            x = self.conv1(x)
            x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
            cls = self.class_embedding + torch.zeros(x.shape[0], 1, x.shape[-1])
            x = torch.cat([cls, x], dim=1) + self.positional_embedding
            x = self.ln_pre(x).permute(1, 0, 2)
            for blk in self.resblocks:
                x = blk(x)
            return x.permute(1, 0, 2)

    torch.manual_seed(0)
    tower = Tower().eval()

    sd = {k: v.detach().numpy() for k, v in tower.state_dict().items()}
    # rename resblocks.* to transformer.resblocks.* (checkpoint layout)
    sd = {k.replace("resblocks.", "transformer.resblocks."): v for k, v in sd.items()}
    params = clip_vit.from_torch_state_dict(sd, cfg)

    img = np.random.RandomState(0).randn(2, R, R, 3).astype(np.float32)
    with torch.no_grad():
        ref = tower(torch.tensor(img).permute(0, 3, 1, 2)).numpy()
    out = clip_vit.forward(params, cfg, jnp.asarray(img), policy=F32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_siglip_parity_vs_hf():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    cfg = siglip.tiny_config()
    hf_cfg = SiglipVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = SiglipVisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = siglip.from_hf_state_dict(sd, cfg)

    img = np.random.RandomState(1).randn(2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(img).permute(0, 3, 1, 2)).last_hidden_state.numpy()
    out = siglip.forward(params, cfg, jnp.asarray(img), policy=F32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("norm", ["layer_norm", "batch_norm"])
def test_adapter_parity_vs_torch(norm):
    import torch.nn as nn

    Q, DIN, DOUT = 5, 16, 24
    cfg = adapter_mod.AdapterConfig(
        input_size=DIN, output_size=DOUT, query_length=Q, adapter_norm=norm,
        dropout_prob=0.0,
    )

    class TorchAdapter(nn.Module):
        def __init__(self):
            super().__init__()
            self.c_fc = nn.Linear(DIN, DIN * 2)
            self.c_proj = nn.Linear(DIN * 2, DOUT)
            if norm == "layer_norm":
                self.norm = nn.LayerNorm([Q, DOUT])
            else:
                self.norm = nn.BatchNorm1d(Q)

        def forward(self, x):
            x = self.c_fc(x)
            x = x * torch.sigmoid(x)
            x = self.c_proj(x)
            return self.norm(x)

    torch.manual_seed(2)
    ta = TorchAdapter().eval()
    sd = {k: v.detach().numpy() for k, v in ta.state_dict().items()}
    params = adapter_mod.from_torch_state_dict(sd, cfg)

    x = np.random.RandomState(2).randn(3, Q, DIN).astype(np.float32)
    with torch.no_grad():
        ref = ta(torch.tensor(x)).numpy()
    out = adapter_mod.forward(params, cfg, jnp.asarray(x), policy=F32, train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)

    if norm == "batch_norm":
        # training mode: batch statistics (torch train() forward)
        ta.train()
        ref_t = ta(torch.tensor(x)).detach().numpy()
        out_t = adapter_mod.forward(params, cfg, jnp.asarray(x), policy=F32, train=True)
        np.testing.assert_allclose(np.asarray(out_t), ref_t, rtol=2e-4, atol=2e-4)
        # running-stat update matches torch's momentum rule (stats are over
        # the norm's input, i.e. post-c_proj activations)
        out_ws, stats = adapter_mod.forward_with_stats(
            params, cfg, jnp.asarray(x), policy=F32
        )
        np.testing.assert_allclose(
            np.asarray(out_ws), ref_t, rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(stats["running_mean"]),
            ta.norm.running_mean.numpy(), rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(stats["running_var"]),
            ta.norm.running_var.numpy(), rtol=1e-4, atol=1e-5,
        )
