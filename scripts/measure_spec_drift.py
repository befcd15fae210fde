"""Quantify bf16 speculative drift vs margin threshold, across logit
sharpness (VERDICT r3 weak #4 / next #6).

Greedy speculation is exact in exact arithmetic; in bf16 the W-token verify
forward's different reduction order can flip argmax against the 1-token
decode on NEAR-TIE positions. An UNTRAINED model is almost all near-ties
(round-3 measured token_agreement ~0.4 between bf16 re-runs), which says
nothing about trained models whose margins are large. This script emulates
trained-margin sharpness by scaling the final layer-norm gain (logits scale
linearly with it; the draft/embedding path is untouched) and measures token
agreement between the plain bf16 greedy decoder and the speculative path at
several `accept_margin` thresholds.

Writes runs/spec_drift.json and prints the table for PARITY.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_spec_drift.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from starvector_tpu.generation.engine import GenerationConfig, generate
    from starvector_tpu.generation.speculative import (
        generate_greedy_speculative_batched,
    )
    from starvector_tpu.models import gpt_bigcode as gbc
    from starvector_tpu.ops.layers import DTypePolicy

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    llm = gbc.GPTBigCodeConfig() if on_tpu else gbc.tiny_config()
    policy = DTypePolicy(param_dtype=dtype, compute_dtype=dtype)
    params = gbc.init_params(llm, jax.random.PRNGKey(0), dtype=dtype)

    B, P, NEW = (16, 256, 256) if on_tpu else (2, 16, 24)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, llm.vocab_size, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), jnp.int32)

    gen = GenerationConfig(max_new_tokens=NEW, do_sample=False,
                           eos_token_id=None, pad_token_id=0,
                           min_new_tokens=NEW, repetition_penalty=1.0)

    results = []
    for sharp in (1.0, 2.0, 4.0, 8.0):
        p2 = dict(params)
        ln = dict(params["ln_f"])
        ln["scale"] = params["ln_f"]["scale"] * sharp
        ln["bias"] = params["ln_f"]["bias"] * sharp
        p2["ln_f"] = ln

        prefix = gbc.embed_tokens(p2, ids).astype(policy.compute_dtype)
        ref, ref_len = generate(p2, llm, "gpt_bigcode", prefix, mask, gen,
                                jax.random.PRNGKey(0), policy=policy)
        ref = np.asarray(ref)

        # the verify forward's mean top1-top2 margin at this sharpness
        lg, _ = gbc.forward(p2, llm, prefix, attention_mask=mask,
                            policy=policy, last_logits_only=True)
        top2 = jax.lax.top_k(lg[:, -1].astype(jnp.float32), 2)[0]
        mean_margin = float(jnp.mean(top2[:, 0] - top2[:, 1]))

        for margin in (0.0, 0.25, 1.0, 4.0):
            toks, lens, nf = generate_greedy_speculative_batched(
                p2, prefix, mask, ids, dec_name="gpt_bigcode", llm_cfg=llm,
                max_new_tokens=NEW, draft_len=8, pad_token_id=0,
                policy=policy, accept_margin=margin,
            )
            toks = np.asarray(toks)
            agree = float((toks == ref).mean())
            row = {
                "logit_sharpness": sharp,
                "mean_top1_top2_margin": round(mean_margin, 3),
                "accept_margin": margin,
                "token_agreement_vs_plain": round(agree, 4),
                "n_forwards": int(np.asarray(nf)),
                "tokens": B * NEW,
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    # noise floor: the plain bf16 decoder vs the plain fp32 decoder at the
    # base sharpness — how much bf16 ITSELF forks from the model's true
    # output. Speculation's agreement should be judged against this, not
    # against 1.0.
    floor = None
    if on_tpu:
        f32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
        p32 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), params)
        prefix32 = gbc.embed_tokens(p32, ids).astype(jnp.float32)
        ref32, _ = generate(p32, llm, "gpt_bigcode", prefix32, mask, gen,
                            jax.random.PRNGKey(0), policy=f32)
        prefix16 = gbc.embed_tokens(params, ids).astype(policy.compute_dtype)
        ref16, _ = generate(params, llm, "gpt_bigcode", prefix16, mask, gen,
                            jax.random.PRNGKey(0), policy=policy)
        floor = float((np.asarray(ref16) == np.asarray(ref32)).mean())
        print(json.dumps({"bf16_vs_fp32_plain_agreement": round(floor, 4)}),
              flush=True)

    out = {"bf16_vs_fp32_plain_agreement": floor,
           "backend": jax.default_backend(),
           "model": "1B GPT-BigCode synthetic bf16" if on_tpu else "tiny f32",
           "B": B, "prefix": P, "new_tokens": NEW, "results": results}
    os.makedirs("runs", exist_ok=True)
    with open("runs/spec_drift.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote runs/spec_drift.json")


if __name__ == "__main__":
    main()
