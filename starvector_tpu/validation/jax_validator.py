"""The TPU/JAX validator backend (reference HF validator equivalent:
starvector/validation/starvector_hf_validator.py:43-88 — rasterizes the GT
SVG as model input, runs generate_im2svg / generate_text2svg, greedy when
temperature == 0)."""

from __future__ import annotations

import numpy as np

from starvector_tpu.validation.svg_validator_base import SVGValidator, register_validator


@register_validator
class StarVectorJAXValidator(SVGValidator):
    def __init__(self, config, model=None):
        super().__init__(config)
        if model is None:
            from starvector_tpu.api import StarVectorForCausalLM

            ckpt = config.get_path("model.from_checkpoint")
            if not ckpt:
                raise ValueError("model.from_checkpoint required for the jax engine")
            model = StarVectorForCausalLM.from_pretrained(str(ckpt))
        self.model = model

    def get_dataloader(self):
        for items in self.iter_dataset_batches(default_batch_size=2):
            yield {
                "image": np.stack([np.asarray(s["image"]) for s in items]),
                "svg": [s["svg"] for s in items],
                "id": [s["id"] for s in items],
                "caption": [s["caption"] for s in items],
            }

    def generate_svg(self, batch, generate_config):
        import jax.numpy as jnp

        kwargs = dict(generate_config)
        kwargs.pop("generation_sweep", None)
        temp = float(kwargs.get("temperature", 1.0))
        if temp == 0.0:
            # temp==0 → greedy (reference starvector_hf_validator.py:77-83)
            kwargs["use_nucleus_sampling"] = False
        if "max_length" in kwargs and "max_new_tokens" not in kwargs:
            kwargs["max_new_tokens"] = int(kwargs.pop("max_length"))
        if self.task == "im2svg":
            return self.model.generate_im2svg(
                {"image": jnp.asarray(batch["image"])}, **kwargs
            )
        return self.model.generate_text2svg({"caption": batch["caption"]}, **kwargs)
