"""Benchmark: StarVector-1B im2svg decode throughput on one TPU chip.

Measures the serving hot path end-to-end on device: CLIP-257 visual-prefix
prefill followed by batched autoregressive decode through the Pallas
flash/MQA kernels, on the real 1B geometry (hidden 2048, 24 layers, MQA,
bf16). Reports SVG tokens/sec/chip (the BASELINE.json headline metric).

`vs_baseline` is the speedup over the same model running the reference-
equivalent XLA attention path on the same chip (the in-framework stand-in
for the reference HF implementation; the reference repo publishes no
throughput numbers — BASELINE.md).

Prints ONE JSON line.
"""

from __future__ import annotations

import dataclasses
import json
import statistics
import time


def main():
    import jax
    import jax.numpy as jnp

    from starvector_tpu.generation.engine import GenerationConfig, generate
    from starvector_tpu.models import gpt_bigcode as gbc
    from starvector_tpu.ops.layers import DTypePolicy

    on_tpu = jax.default_backend() != "cpu"
    policy = DTypePolicy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)

    if on_tpu:
        llm = gbc.GPTBigCodeConfig()  # real 1B geometry
        # realistic serving point: SVG-Stack sequences average ~1.8k tokens
        # (BASELINE.md), so measure decode against a ~1k-deep KV cache.
        # NEW is large to amortize the fixed per-call dispatch overhead of
        # the tunneled TPU runtime (~30ms/call measured).
        B, PREFIX, NEW = 64, 1024, 256
        reps = 2
    else:
        llm = gbc.tiny_config()
        B, PREFIX, NEW = 2, 20, 16
        reps = 1

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    params = gbc.init_params(llm, rng, dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x), params)
    init_s = time.time() - t0

    prefix = jax.random.normal(
        jax.random.PRNGKey(1), (B, PREFIX, llm.hidden_size), jnp.bfloat16
    )
    mask = jnp.ones((B, PREFIX), jnp.int32)
    gen = GenerationConfig(
        max_new_tokens=NEW, do_sample=False, pad_token_id=0, min_new_tokens=NEW
    )

    import numpy as np

    def run(cfg, key=2):
        toks, _ = generate(
            params, cfg_llm, "gpt_bigcode", prefix, mask, gen,
            jax.random.PRNGKey(key), policy=policy,
        )
        # fetch to host: on the tunneled TPU backend block_until_ready does
        # not reliably synchronize; a host transfer is a true data dependency
        return np.asarray(toks)

    results = {}
    for impl in (["mixed", "xla"] if on_tpu else ["xla"]):
        cfg_llm = dataclasses.replace(llm, attn_impl=impl)
        run(cfg_llm)  # compile + warm
        times = []
        for i in range(reps):
            t0 = time.time()
            run(cfg_llm, key=i)
            times.append(time.time() - t0)
        dt = statistics.median(times)
        results[impl] = (B * NEW) / dt
        if impl == "mixed":
            # single-image latency: prefill + 64 tokens, batch 1
            p1 = prefix[:1]
            m1 = mask[:1]
            g1 = dataclasses.replace(gen, max_new_tokens=64, min_new_tokens=64)
            lat_ts = []
            np.asarray(generate(params, cfg_llm, "gpt_bigcode", p1, m1, g1,
                                jax.random.PRNGKey(3), policy=policy)[0])
            for i in range(3):
                t0 = time.time()
                np.asarray(generate(params, cfg_llm, "gpt_bigcode", p1, m1, g1,
                                    jax.random.PRNGKey(10 + i), policy=policy)[0])
                lat_ts.append(time.time() - t0)
            results["p50_latency_s"] = statistics.median(lat_ts)

    main_impl = "mixed" if on_tpu else "xla"
    toks_per_sec = results[main_impl]
    vs = toks_per_sec / results["xla"] if "xla" in results and results["xla"] else 1.0
    print(json.dumps({
        "metric": "SVG tokens/sec/chip (1B im2svg batched decode @1k ctx, bf16)",
        "value": round(toks_per_sec, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(vs, 3),
        "detail": {
            "batch": B,
            "prefix_len": PREFIX,
            "new_tokens": NEW,
            "xla_tokens_per_sec": round(results.get("xla", 0.0), 1),
            "p50_image_to_svg64_latency_s": round(
                results.get("p50_latency_s", float("nan")), 4
            ) if "p50_latency_s" in results else None,
            "param_init_s": round(init_s, 1),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
