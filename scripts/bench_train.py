"""Training-step throughput CLI: full StarVector-1B train step (vision tower
+ adapter + decoder, loss+grads+AdamW) on the current devices.

    python scripts/bench_train.py [batch] [seq_len] [remat] [grad_dtype]

Thin wrapper over bench.bench_train (the driver bench) so the step protocol,
timing, and MFU model live in exactly one place. Prints one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # the axon PJRT plugin registers itself regardless of JAX_PLATFORMS;
    # mirror the env var into the config like bench.py does
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from bench import bench_train

    on_tpu = jax.default_backend() != "cpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else None
    S = int(sys.argv[2]) if len(sys.argv) > 2 else None
    remat = sys.argv[3] if len(sys.argv) > 3 else None
    if remat in ("true", "True"):
        remat = True
    elif remat in ("false", "False"):
        remat = False
    grad_dtype = jnp.bfloat16 if (len(sys.argv) > 4
                                  and sys.argv[4] == "bfloat16") else None

    detail = bench_train(jax, jnp, np, on_tpu, B=B, S=S, remat=remat,
                         grad_dtype=grad_dtype)
    print(json.dumps({
        "metric": "training SVG tokens/sec/chip (1B full model, bf16)",
        "value": detail["train_tok_per_s_chip"],
        "unit": "tokens/s/chip",
        "detail": {**detail, "devices": jax.device_count()},
    }))


if __name__ == "__main__":
    main()
