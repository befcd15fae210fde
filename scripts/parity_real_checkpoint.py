"""One-command real-checkpoint parity artifact (the BASELINE north star:
MSE/SSIM parity of converted StarVector checkpoints vs the reference path).

    python scripts/parity_real_checkpoint.py --ckpt $STARVECTOR_CKPT_DIR \
        --out runs/parity [--max-new-tokens 7800] [--no-reference]

Writes <out>/parity_report.json plus the generated SVGs for inspection.
See starvector_tpu/validation/parity_real.py for the evidence levels."""

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.environ.get("STARVECTOR_CKPT_DIR"),
                    help="HF StarVector checkpoint dir (safetensors)")
    ap.add_argument("--out", default="runs/parity")
    ap.add_argument("--max-new-tokens", type=int, default=7800,
                    help="reference eval budget (configs/generation/hf/"
                         "starvector-1b/im2svg.yaml:33)")
    ap.add_argument("--resolution", type=int, default=224)
    ap.add_argument("--num-samples", type=int, default=-1)
    ap.add_argument("--no-reference", action="store_true",
                    help="skip the paired torch reference run")
    ap.add_argument("--no-roundtrip", action="store_true",
                    help="skip the export→reload bit-compare")
    args = ap.parse_args()

    if not args.ckpt or not os.path.isdir(args.ckpt):
        print("no checkpoint: set --ckpt or STARVECTOR_CKPT_DIR to an HF "
              "StarVector checkpoint directory", file=sys.stderr)
        return 2

    from starvector_tpu.validation.parity_real import SAMPLES, run_parity

    samples = SAMPLES[: args.num_samples] if args.num_samples > 0 else SAMPLES
    report = run_parity(
        args.ckpt, args.out,
        samples=samples,
        max_new_tokens=args.max_new_tokens,
        resolution=args.resolution,
        with_reference=not args.no_reference,
        with_roundtrip=not args.no_roundtrip,
    )
    print(json.dumps({
        "jax_mean_mse": report["jax"]["mean_mse"],
        "jax_mean_ssim": report["jax"]["mean_ssim"],
        "reference": report.get("reference", {}).get("skipped", "ran"),
        "token_exact_rate": report.get("reference", {}).get("token_exact_rate"),
        "roundtrip_bit_exact": report.get("converter_roundtrip", {}).get("bit_exact"),
        "report": os.path.join(args.out, "parity_report.json"),
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
