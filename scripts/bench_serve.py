"""Serving engine bench: sustained tokens/s under concurrent admissions.

Builds the 1B decoder with synthetic bf16 weights, starts the
continuous-batching ServeEngine, and submits a staggered stream of requests
with mixed prompt lengths (exercising the power-of-two prefill buckets and
the admission thread running alongside decode ticks). Reports aggregate
tokens/s, per-request completion, and tick cadence.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_serve.py
"""

from __future__ import annotations

import json
import os
import queue
import sys
import threading
import time


def main():
    import jax

    # the axon TPU plugin registers itself regardless of JAX_PLATFORMS; honor
    # an explicit env request (e.g. CPU smoke runs) through jax.config
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from starvector_tpu.models import gpt_bigcode as gbc
    from starvector_tpu.ops.layers import DTypePolicy
    from starvector_tpu.serve.engine import Request, ServeEngine

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        llm = gbc.GPTBigCodeConfig()
        MAX_BATCH, MAX_LEN = 8, 2048
        N_REQ, NEW = 16, 128
        prompt_lens = [257 + 30, 400, 700, 1000]  # mixed buckets: 512/1024
    else:
        llm = gbc.tiny_config()
        MAX_BATCH, MAX_LEN = 4, 256
        N_REQ, NEW = 6, 16
        prompt_lens = [20, 40, 70]

    policy = DTypePolicy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    params = gbc.init_params(llm, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    kv_int8 = os.environ.get("STARVECTOR_KV_INT8", "") == "1"
    # engine prompt-lookup speculation (STARVECTOR_SPEC_DRAFTS=N): drafting
    # depends on the output stream actually repeating, so the reported
    # spec_* stats carry the measured acceptance alongside tokens/s
    spec = int(os.environ.get("STARVECTOR_SPEC_DRAFTS", "0"))
    engine = ServeEngine(
        params, llm, "gpt_bigcode", max_batch=MAX_BATCH, max_len=MAX_LEN,
        policy=policy,
        steps_per_tick=int(os.environ.get("STARVECTOR_STEPS_PER_TICK", "4")),
        kv_cache_dtype=jnp.int8 if kv_int8 else None,
        spec_drafts=spec,
    )
    engine.start()

    # warm the compile caches: every (bucket, admission-group-size) pair
    # plus the fused tick — compiles must not land in the measured window
    t0w = time.time()
    engine.warmup(prompt_lens)
    print(f"warmup done in {time.time()-t0w:.1f}s", flush=True)

    reqs: list[Request] = []
    t_submit: dict[str, float] = {}
    t_done: dict[str, float] = {}
    lock = threading.Lock()

    def submit_all():
        rng = np.random.RandomState(0)
        for i in range(N_REQ):
            P = prompt_lens[i % len(prompt_lens)]
            req = Request(
                prefix_embeds=jnp.asarray(
                    rng.randn(1, P, llm.hidden_size), jnp.bfloat16
                ),
                max_new_tokens=NEW,
                temperature=0.7 if i % 2 else 0.0,
                do_sample=bool(i % 2),
            )
            with lock:
                reqs.append(req)
                t_submit[req.request_id] = time.time()
            engine.submit(req)
            time.sleep(0.05)  # staggered arrivals → admissions during decode

    t0 = time.time()
    sub = threading.Thread(target=submit_all)
    sub.start()

    done_tokens = 0
    finished = 0
    deadline = time.time() + 900
    while finished < N_REQ and time.time() < deadline:
        with lock:
            pending = [r for r in reqs if r.request_id not in t_done]
        progressed = False
        for r in pending:
            try:
                kind, payload = r.out_queue.get_nowait()
            except queue.Empty:
                continue
            progressed = True
            if kind == "done":
                t_done[r.request_id] = time.time()
                done_tokens += len(payload)
                finished += 1
            elif kind == "error":
                raise RuntimeError(payload)
        if not progressed:
            time.sleep(0.01)
    sub.join()
    wall = time.time() - t0
    stats = engine.stats()
    engine.stop()

    if finished < N_REQ:
        print(json.dumps({"error": f"only {finished}/{N_REQ} finished"}))
        sys.exit(1)
    lat = [t_done[r.request_id] - t_submit[r.request_id] for r in reqs]
    lat.sort()
    print(json.dumps({
        "serving_tokens_per_s": round(done_tokens / wall, 1),
        "requests": N_REQ,
        "new_tokens_per_req": NEW,
        "wall_s": round(wall, 2),
        "p50_request_latency_s": round(lat[len(lat) // 2], 3),
        "p95_request_latency_s": round(lat[int(len(lat) * 0.95)], 3),
        "kv_cache": "int8" if kv_int8 else "bf16",
        "spec_drafts": spec,
        "spec_ticks": stats["spec_ticks"],
        "spec_extra_tokens": stats["spec_extra_tokens"],
        "ticks": stats["ticks"],
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
