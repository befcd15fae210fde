"""Training-step throughput: full StarVector-1B train step (vision tower +
adapter + decoder, loss+grads+AdamW) on the current devices.

    python scripts/bench_train.py [batch] [seq_len]

Prints one JSON line: training tokens/sec/chip (SVG tokens, visual prefix
excluded from the count, matching how the reference reports sequence length).
"""

import json
import statistics
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from starvector_tpu.models import starvector as sv
    from starvector_tpu.ops.layers import DTypePolicy
    from starvector_tpu.train.optim import build_optimizer
    from starvector_tpu.train.step import make_train_step

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        import dataclasses

        cfg = sv.starvector_1b_config(adapter_norm="layer_norm")
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, attn_impl="mixed")
        )
        B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
        S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
        reps = 3
    else:
        cfg = sv.tiny_config()
        B, S, reps = 2, 16, 1

    # bf16 params on the single bench chip: fp32 params + fp32 AdamW moments
    # for 1B exceed one v5e's 16 GB; real runs shard over fsdp instead
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    policy = DTypePolicy(param_dtype=dtype, compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = sv.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    tx = build_optimizer(params, lr=1e-4, total_steps=1000)
    opt_state = tx.init(params)
    remat = sys.argv[3] if len(sys.argv) > 3 else ("dots" if on_tpu else True)
    step = make_train_step(cfg, tx, 0, policy=policy, remat=remat)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.randn(B, cfg.image_size, cfg.image_size, 3), jnp.float32
        ),
        "svg_ids": jnp.asarray(rng.randint(1, cfg.llm.vocab_size, (B, S)), jnp.int32),
        "svg_mask": jnp.ones((B, S), jnp.int32),
    }
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    params, opt_state, m = step(params, opt_state, batch, key)
    _ = float(m["loss"])  # host sync
    compile_s = time.time() - t0

    times = []
    for i in range(reps):
        t0 = time.time()
        params, opt_state, m = step(params, opt_state, batch, key)
        _ = float(m["loss"])
        times.append(time.time() - t0)
    dt = statistics.median(times)
    toks = B * S
    print(json.dumps({
        "metric": f"training SVG tokens/sec/chip (1B full model, bf16, remat={remat})",
        "value": round(toks / dt, 1),
        "unit": "tokens/s/chip",
        "detail": {
            "batch": B, "seq_len": S, "step_s": round(dt, 3),
            "compile_s": round(compile_s, 1),
            "devices": jax.device_count(),
        },
    }))


if __name__ == "__main__":
    main()
