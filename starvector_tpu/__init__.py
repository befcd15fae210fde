"""starvector_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for multimodal
SVG code generation (im2svg / text2svg), with the capabilities of the
StarVector reference (joanrod/star-vector).

Layer map (mirrors reference SURVEY.md §1):
  models/      — GPTBigCode (MQA) + StarCoder2 (GQA/RoPE) decoders, CLIP/SigLIP
                 vision towers, adapter projector, StarVector task model
  ops/         — Pallas kernels (flash prefill, KV-decode) + XLA reference ops
  parallel/    — device mesh + sharding rules (DP/FSDP/HSDP/TP)
  generation/  — jit-compiled autoregressive decode engine w/ KV cache
  data/        — SVG rasterization (native librsvg), cleaning, datasets, aug
  train/       — pjit train step, optimizer, orbax checkpointing, loop
  validation/  — SVG-Bench eval harness (validator registry + CLI)
  metrics/     — L2/SSIM/LPIPS/CLIP/DINO/FID quality metrics
  serve/       — controller/worker REST + continuous-batching engine
"""

__version__ = "0.1.0"
