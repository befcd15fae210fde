"""HF Hub export/push (reference: starvector/train/util.py:115-130).

`export_hf_checkpoint` writes an HF-layout StarVector checkpoint directory
(safetensors in the reference state-dict naming via models/export.py +
config.json + tokenizer.json) from a trained JAX pytree; `push_to_hub`
uploads that directory with huggingface_hub. The image is zero-egress, so
pushing only works where the hub is reachable — the export half always
works and is what the serve/eval loaders consume."""

from __future__ import annotations

import json
import os


def export_hf_checkpoint(
    params: dict, cfg, tokenizer, out_dir: str,
    *, starcoder_model_name: str | None = None,
) -> str:
    """Write an HF-loadable StarVector checkpoint directory."""
    from starvector_tpu.models import export

    os.makedirs(out_dir, exist_ok=True)
    sd = {}
    if cfg.decoder == "gpt_bigcode":
        sd.update(export.gpt_bigcode_to_hf(
            params["svg_transformer"], cfg.llm,
            prefix="model.svg_transformer.transformer.transformer.",
        ))
        default_name = "bigcode/starcoderbase-1b"
    else:
        sd.update(export.starcoder2_to_hf(
            params["svg_transformer"], cfg.llm,
            prefix="model.svg_transformer.transformer.model.",
        ))
        default_name = "bigcode/starcoder2-7b"
    if "image_encoder" in params:
        from starvector_tpu.models import export as ex

        sd.update(ex.vision_to_hf(params, cfg))
    export.save_safetensors(sd, os.path.join(out_dir, "model.safetensors"))

    hf_cfg = {
        "model_type": "starvector",
        "starcoder_model_name": starcoder_model_name or default_name,
        # decoder geometry (reference checkpoints imply it via the base
        # model name; recording it makes round trips self-contained)
        "vision_geometry": (
            {"heads": cfg.encoder_config.tower_config.heads}
            if cfg.use_image_encoder
            and hasattr(cfg.encoder_config.tower_config, "heads") else {}
        ),
        "llm_geometry": {
            "head_dim": cfg.llm.head_dim,
            "rope_theta": getattr(cfg.llm, "rope_theta", None),
            "sliding_window": getattr(cfg.llm, "sliding_window", None),
        },
        "image_encoder_type": cfg.image_encoder_type,
        "adapter_norm": cfg.adapter_norm,
        "image_size": cfg.image_size,
        "max_length": cfg.max_length_train,
        "task": cfg.task,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    if hasattr(tokenizer, "tokenizer"):
        tokenizer.tokenizer.save(os.path.join(out_dir, "tokenizer.json"))
    return out_dir


def push_model_to_hub(
    repo_id: str, checkpoint_dir: str, *, token: str | None = None,
    private: bool = True, commit_message: str | None = None,
) -> str:
    """Upload an exported checkpoint dir (reference push_model_to_hub,
    train/util.py:115-130 — model + tokenizer + processor in one repo)."""
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    api.upload_folder(
        folder_path=checkpoint_dir,
        repo_id=repo_id,
        commit_message=commit_message or f"upload {os.path.basename(checkpoint_dir)}",
    )
    return f"https://huggingface.co/{repo_id}"
