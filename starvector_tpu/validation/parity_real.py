"""Real-checkpoint fidelity harness: prove a converted StarVector checkpoint
reproduces reference outputs (the BASELINE north star — MSE/SSIM parity on
SVG-Bench; reference flow: starvector/validation/validate.py:33-56 +
scripts/quickstart.py:9-20).

Weights-gated by design: the image is zero-egress, so real checkpoints may
be absent. The harness itself is fully exercised on tiny random models in
tests; pointing `STARVECTOR_CKPT_DIR` at a real HF StarVector checkpoint
directory produces the parity artifact with one command:

    python scripts/parity_real_checkpoint.py --ckpt $STARVECTOR_CKPT_DIR \
        --out runs/parity

Three nested levels of evidence, strongest available wins:
  1. JAX-vs-reference greedy decode on the fixed probe set — token exact
     match + per-sample raster MSE/SSIM deltas (requires torch + the
     checkpoint's bundled remote code; the reference HF path,
     starvector_hf_validator.py:43-88).
  2. JAX-only fidelity vs ground truth: greedy im2svg on rasterized probe
     SVGs, MSE/SSIM of the reconstruction (the SVG-Bench protocol without
     the paired reference run).
  3. Converter self-consistency: export→reload→bit-compare of the loaded
     pytree (no generation; catches layout drift on real geometry).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Sequence

import numpy as np

from starvector_tpu.data.rasterize import process_and_rasterize_svg, rasterize_svg
from starvector_tpu.metrics.ssim import ssim_single
from starvector_tpu.validation.parity_samples import SAMPLES


def raster_mse(img_a, img_b) -> float:
    """Mean squared error on [0,1] floats (the SVG-Bench L2 protocol,
    reference metrics/compute_l2.py:14-22)."""
    a = np.asarray(img_a, np.float32) / 255.0
    b = np.asarray(img_b, np.float32) / 255.0
    return float(np.mean((a - b) ** 2))


def raster_ssim(img_a, img_b) -> float:
    """Mean channelwise SSIM (reference compute_SSIM.py:12-35 semantics)."""
    a = np.asarray(img_a, np.float64)
    b = np.asarray(img_b, np.float64)
    return float(np.mean([
        ssim_single(a[..., c], b[..., c]) for c in range(a.shape[-1])
    ]))


def score_generation(gt_svg: str, gen_svg: str, resolution: int = 224) -> dict:
    """Post-process + rasterize a generated SVG and score it against the
    ground-truth raster (the validator's per-sample metric core)."""
    gt_img = rasterize_svg(gt_svg, resolution)
    out_svg, gen_img = process_and_rasterize_svg(gen_svg, resolution)
    return {
        "mse": raster_mse(gt_img, gen_img),
        "ssim": raster_ssim(gt_img, gen_img),
        "post_processed": out_svg != gen_svg,
        "svg": out_svg,
    }


def generate_jax(model, samples: Sequence[tuple[str, str]],
                 *, max_new_tokens: int = 512, resolution: int = 224) -> list[dict]:
    """Greedy im2svg through the JAX model on the probe set. `model` is any
    object with the reference generation surface (process_images +
    generate_im2svg) — api.StarVectorForCausalLM in production, a tiny
    from_config model in tests."""
    results = []
    for sid, gt_svg in samples:
        image = rasterize_svg(gt_svg, resolution)
        t0 = time.perf_counter()
        svg = model.generate_im2svg(
            {"image": model.process_images([image])},
            max_new_tokens=max_new_tokens,
            use_nucleus_sampling=False,
            temperature=0.0,
        )[0]
        scores = score_generation(gt_svg, svg, resolution)
        results.append({
            "id": sid,
            "gen_svg": svg,
            "latency_s": round(time.perf_counter() - t0, 3),
            **{k: scores[k] for k in ("mse", "ssim", "post_processed")},
        })
    return results


def _reference_unavailable_reason(ckpt_dir: str) -> str | None:
    """The paired reference run needs torch + the checkpoint's bundled
    trust_remote_code modules (the reference serves its arch that way,
    starvector_arch.py:133)."""
    try:
        import torch  # noqa: F401
    except ImportError:
        return "torch unavailable"
    if not os.path.exists(os.path.join(ckpt_dir, "starvector_arch.py")) and \
       not os.path.exists(os.path.join(ckpt_dir, "config.json")):
        return "checkpoint carries no config"
    try:
        import transformers  # noqa: F401
    except ImportError:
        return "transformers unavailable"
    return None


def generate_reference(ckpt_dir: str, samples: Sequence[tuple[str, str]],
                       *, max_new_tokens: int = 512,
                       resolution: int = 224) -> list[dict] | str:
    """Greedy im2svg through the reference HF path (torch CPU/GPU,
    AutoModelForCausalLM + trust_remote_code — the checkpoint ships the
    reference modules). Returns a reason string when that path can't run."""
    reason = _reference_unavailable_reason(ckpt_dir)
    if reason:
        return reason
    import torch
    from transformers import AutoModelForCausalLM

    try:
        model = AutoModelForCausalLM.from_pretrained(
            ckpt_dir, trust_remote_code=True, torch_dtype=torch.float32,
            use_flash_attn=False,
        )
    except Exception as e:  # remote code may need CUDA-only deps
        return f"reference load failed: {e!r}"
    model.eval()
    results = []
    for sid, gt_svg in samples:
        image = rasterize_svg(gt_svg, resolution)
        t0 = time.perf_counter()
        with torch.no_grad():
            batch = {"image": model.process_images([image]).to(torch.float32)}
            svg = model.generate_im2svg(
                batch, max_length=max_new_tokens, num_beams=1,
                use_nucleus_sampling=False, temperature=0.0,
            )[0]
        scores = score_generation(gt_svg, svg, resolution)
        results.append({
            "id": sid,
            "gen_svg": svg,
            "latency_s": round(time.perf_counter() - t0, 3),
            **{k: scores[k] for k in ("mse", "ssim", "post_processed")},
        })
    return results


def token_match(tokenizer, svg_a: str, svg_b: str) -> dict:
    """Exact + prefix token agreement between two generations (greedy
    decode parity should be token-exact up to numerics)."""
    ids_a = list(tokenizer([svg_a], add_special_tokens=False)["input_ids"][0])
    ids_b = list(tokenizer([svg_b], add_special_tokens=False)["input_ids"][0])
    n = min(len(ids_a), len(ids_b))
    prefix = 0
    for x, y in zip(ids_a, ids_b):
        if x != y:
            break
        prefix += 1
    return {
        "exact": ids_a == ids_b,
        "prefix_match": prefix,
        "len_a": len(ids_a),
        "len_b": len(ids_b),
        "prefix_ratio": prefix / max(n, 1),
    }


def converter_self_consistency(params: dict, cfg, tokenizer, tmp_dir: str) -> dict:
    """Export→reload→bit-compare of a loaded pytree: catches state-dict
    layout drift at the checkpoint's true geometry without any generation."""
    import jax
    import jax.numpy as jnp

    from starvector_tpu.models.builder import load_hf_starvector_checkpoint
    from starvector_tpu.train.hub import export_hf_checkpoint

    out = export_hf_checkpoint(params, cfg, tokenizer, tmp_dir)
    params2, cfg2, _ = load_hf_starvector_checkpoint(out, dtype=jnp.float32)
    leaves1 = jax.tree_util.tree_leaves_with_path(params)
    leaves2 = dict(jax.tree_util.tree_leaves_with_path(params2))
    mismatched = []
    for path, leaf in leaves1:
        other = leaves2.get(path)
        a = np.asarray(leaf, np.float32)
        if other is None or a.shape != np.asarray(other).shape or \
                not np.array_equal(a, np.asarray(other, np.float32)):
            mismatched.append(jax.tree_util.keystr(path))
    return {
        "n_leaves": len(leaves1),
        "mismatched": mismatched,
        "bit_exact": not mismatched,
        "decoder": cfg2.decoder,
    }


def run_parity(
    ckpt_dir: str,
    out_dir: str,
    *,
    model: Any = None,
    samples: Sequence[tuple[str, str]] | None = None,
    max_new_tokens: int = 512,
    resolution: int = 224,
    with_reference: bool = True,
    with_roundtrip: bool = True,
) -> dict:
    """Produce the parity artifact: parity_report.json + generated SVGs in
    `out_dir`. `model` overrides checkpoint loading (tests pass a tiny
    from_config model and set ckpt_dir='synthetic')."""
    samples = list(samples if samples is not None else SAMPLES)
    os.makedirs(out_dir, exist_ok=True)
    if model is None:
        from starvector_tpu.api import StarVectorForCausalLM

        model = StarVectorForCausalLM.from_pretrained(ckpt_dir)

    report: dict[str, Any] = {
        "checkpoint": ckpt_dir,
        "n_samples": len(samples),
        "max_new_tokens": max_new_tokens,
        "resolution": resolution,
    }

    jax_results = generate_jax(
        model, samples, max_new_tokens=max_new_tokens, resolution=resolution
    )
    report["jax"] = {
        "per_sample": [
            {k: r[k] for k in ("id", "mse", "ssim", "post_processed", "latency_s")}
            for r in jax_results
        ],
        "mean_mse": float(np.mean([r["mse"] for r in jax_results])),
        "mean_ssim": float(np.mean([r["ssim"] for r in jax_results])),
    }
    for r in jax_results:
        with open(os.path.join(out_dir, f"{r['id']}.jax.svg"), "w") as f:
            f.write(r["gen_svg"])

    if with_reference:
        ref = generate_reference(
            ckpt_dir, samples, max_new_tokens=max_new_tokens,
            resolution=resolution,
        )
        if isinstance(ref, str):
            report["reference"] = {"skipped": ref}
        else:
            matches = [
                token_match(model.tokenizer, j["gen_svg"], r["gen_svg"])
                for j, r in zip(jax_results, ref)
            ]
            report["reference"] = {
                "per_sample": [
                    {k: r[k] for k in ("id", "mse", "ssim", "latency_s")}
                    for r in ref
                ],
                "mean_mse": float(np.mean([r["mse"] for r in ref])),
                "mean_ssim": float(np.mean([r["ssim"] for r in ref])),
                "token_exact_rate": float(np.mean([m["exact"] for m in matches])),
                "token_prefix_ratio": float(
                    np.mean([m["prefix_ratio"] for m in matches])
                ),
                "mse_delta_vs_jax": float(
                    report["jax"]["mean_mse"] - np.mean([r["mse"] for r in ref])
                ),
                "ssim_delta_vs_jax": float(
                    report["jax"]["mean_ssim"] - np.mean([r["ssim"] for r in ref])
                ),
            }
            for r in ref:
                with open(os.path.join(out_dir, f"{r['id']}.ref.svg"), "w") as f:
                    f.write(r["gen_svg"])

    if with_roundtrip:
        report["converter_roundtrip"] = converter_self_consistency(
            model.params, model.cfg, model.tokenizer,
            os.path.join(out_dir, "roundtrip_ckpt"),
        )

    with open(os.path.join(out_dir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report
