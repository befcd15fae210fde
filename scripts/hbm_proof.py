"""Deviceless AOT per-chip HBM proof for the REAL StarVector-8B geometry.

VERDICT r3 item 1: BENCH_r03 claimed "8B needs >1 chip by construction" but
never demonstrated the true StarCoder2-7B + SigLIP-384 geometry (the config
the reference trains with HSDP on 8 GPUs, reference
configs/models/starvector-8b/im2svg-stack.yaml:36-47) actually fits and
shards on a v5e-8. This script proves it WITHOUT hardware:

  - builds a TPU v5e 2x4 TopologyDescription (jax.experimental.topologies)
  - constructs the real 8B parameter tree abstractly (jax.eval_shape — no
    host RAM, no weights)
  - AOT-lowers + compiles, against that topology, the PRODUCTION train step
    (train/step.py::make_train_step — loss + grads + AdamW with the
    reference recipe, bf16 compute / fp32 params+moments, remat) on fsdp=8
    and fsdp=4×tp=2 meshes, and the tp=8 serve decode/prefill steps
  - reads compiled.memory_analysis() — XLA's own per-chip byte accounting
    (arguments + temps + outputs − donated aliases)

and writes HBM_PROOF.json asserting per-chip HBM < 16 GB with headroom.

Run:  PYTHONPATH=/root/repo python scripts/hbm_proof.py [--out HBM_PROOF.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

V5E_HBM_BYTES = 16 * 1024**3  # v5e: 16 GiB HBM per chip
GiB = 1024**3


def v5e8_devices():
    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    return np.asarray(topo.devices)


def build_mesh(devices, *, replica=1, data=1, fsdp=1, sequence=1, stage=1,
               tensor=1):
    """Same axis names/order as parallel/mesh.py::create_mesh, but over
    deviceless topology devices (create_mesh insists on jax.devices())."""
    shape = (replica, data, fsdp, sequence, stage, tensor)
    assert int(np.prod(shape)) == devices.size, (shape, devices.size)
    return Mesh(devices.reshape(shape),
                ("replica", "data", "fsdp", "sequence", "stage", "tensor"))


def with_shardings(abs_tree, shardings):
    return jax.tree_util.tree_map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        abs_tree, shardings,
    )


def mem_report(compiled) -> dict:
    ma = compiled.memory_analysis()
    arg = int(ma.argument_size_in_bytes)
    out = int(ma.output_size_in_bytes)
    tmp = int(ma.temp_size_in_bytes)
    alias = int(ma.alias_size_in_bytes)
    code = int(getattr(ma, "generated_code_size_in_bytes", 0))
    # donated inputs alias outputs: the live set is args + temps + code +
    # (outputs that are NOT aliases of donated args)
    peak = arg + tmp + code + max(out - alias, 0)
    return {
        "argument_bytes": arg,
        "output_bytes": out,
        "temp_bytes": tmp,
        "alias_bytes": alias,
        "generated_code_bytes": code,
        "per_chip_peak_bytes": peak,
        "per_chip_peak_gib": round(peak / GiB, 3),
        "fits_16gib": peak < V5E_HBM_BYTES,
        "headroom_gib": round((V5E_HBM_BYTES - peak) / GiB, 3),
    }


def abstract_8b_params():
    from starvector_tpu.models import starvector as sv

    cfg = sv.starvector_8b_config()
    p_abs = jax.eval_shape(
        lambda k: sv.init_params(cfg, k, dtype=jnp.float32),
        jax.random.PRNGKey(0),
    )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(p_abs))
    return cfg, p_abs, n_params


def train_case(mesh, mesh_name: str, *, B: int, S: int, remat,
               grad_accum_steps: int = 1, optimizer: str = "adamw",
               mu_dtype=None, grad_dtype=None) -> dict:
    """AOT-compile the production train step at the real 8B geometry."""
    from starvector_tpu.models import starvector as sv
    from starvector_tpu.ops.layers import DTypePolicy
    from starvector_tpu.parallel.mesh import batch_spec, sanitize_for_mesh, seq_spec
    from starvector_tpu.parallel.sharding import make_param_shardings
    from starvector_tpu.train.optim import build_optimizer
    from starvector_tpu.train.step import make_train_step

    cfg, p_abs, n_params = abstract_8b_params()
    p_sh = make_param_shardings(p_abs, sv.partition_rules(), mesh)
    p_abs = with_shardings(p_abs, p_sh)

    # reference AdamW recipe (train/util.py:132-151)
    tx = build_optimizer(
        p_abs, optimizer=optimizer, lr=1e-5, weight_decay=1e-6,
        betas=(0.95, 0.999), eps=1e-8, warmup_steps=10, total_steps=10_000,
        grad_accum_steps=grad_accum_steps, mu_dtype=mu_dtype,
    )
    # optimizer-state shardings derived structurally, the same way
    # train/step.py::shard_train_state places them on devices (moments
    # inherit the parameter sharding — ZeRO)
    from starvector_tpu.train.step import opt_state_shardings

    o_abs = jax.eval_shape(tx.init, p_abs)
    o_sh = opt_state_shardings(tx, p_abs, p_sh, mesh)
    o_abs = with_shardings(o_abs, o_sh)

    def sds(shape, dtype, spec):
        spec = sanitize_for_mesh(spec, shape, mesh)
        return jax.ShapeDtypeStruct(shape, dtype, sharding=NamedSharding(mesh, spec))

    batch_abs = {
        "image": sds((B, cfg.image_size, cfg.image_size, 3), jnp.float32,
                     batch_spec(extra_dims=3)),
        "svg_ids": sds((B, S), jnp.int32, seq_spec()),
        "svg_mask": sds((B, S), jnp.int32, seq_spec()),
    }
    rng_abs = jax.ShapeDtypeStruct(
        (2,), jnp.uint32, sharding=NamedSharding(mesh, P()))

    policy = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
    step = make_train_step(cfg, tx, 0, policy=policy, remat=remat,
                           grad_dtype=grad_dtype)

    t0 = time.time()
    # jax.set_mesh puts the topology mesh in context so the model's
    # maybe_constrain layer-boundary constraints apply during AOT lowering
    # (they no-op without an ambient mesh, and propagation alone replicates)
    with jax.set_mesh(mesh):
        compiled = step.lower(p_abs, o_abs, batch_abs, rng_abs).compile()
    rep = mem_report(compiled)
    rep.update({
        "case": f"train/{mesh_name}",
        "mesh": mesh_name,
        "batch_global": B,
        "seq_len": S,
        "remat": str(remat),
        "optimizer": optimizer + ("/bf16-mu" if mu_dtype is not None else ""),
        "grad_dtype": str(jnp.dtype(grad_dtype)) if grad_dtype else "float32",
        "grad_accum_steps": grad_accum_steps,
        "n_params": n_params,
        "compile_s": round(time.time() - t0, 1),
    })
    return rep


def serve_decode_case(mesh, mesh_name: str, *, B: int, max_len: int,
                      kv_dtype=None) -> dict:
    """AOT-compile the ragged continuous-batching decode step (the serving
    hot path, serve/engine.py) at the real 8B geometry, bf16 weights.

    The cache argument is DONATED, exactly like the production dispatch
    (serve/engine.py:198 donate_argnames=("cache", ...)) — without donation
    XLA double-counts the cache (input + output copy), which is not what
    the engine pays. kv_dtype=jnp.int8 exercises the engine's opt-in int8
    KV cache (engine kv_cache_dtype knob)."""
    import functools

    from starvector_tpu.models import starcoder2 as sc2
    from starvector_tpu.ops.layers import DTypePolicy
    from starvector_tpu.parallel.mesh import batch_spec, sanitize_for_mesh
    from starvector_tpu.parallel.sharding import (
        apply_partition_rules, make_param_shardings,
    )

    cfg = sc2.starcoder2_7b_config(attn_impl="mixed")
    p_abs = jax.eval_shape(
        lambda k: sc2.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    p_abs = with_shardings(
        p_abs, make_param_shardings(p_abs, sc2.partition_rules(), mesh))

    from starvector_tpu.parallel.mesh import BATCH_AXES

    # ragged-cache layout (decode_common.init_ragged_cache): k/v are
    # (L, B, T, Hkv, D) — batch rows shard over the batch axes, kv heads
    # over `tensor` when divisible (7B has 4 kv heads: tp4 shards them,
    # tp8 falls back to replicated kv via sanitize)
    cache_rules = [
        (r"k$|v$", P(None, BATCH_AXES, None, "tensor", None)),
        (r"k_scale$|v_scale$", P(None, BATCH_AXES, None, "tensor")),
        (r"kv_mask$", P(BATCH_AXES, None)),
        (r"lengths$", P(BATCH_AXES)),
    ]
    c_abs = jax.eval_shape(
        lambda: sc2.init_ragged_cache(
            cfg, B, max_len, dtype=kv_dtype or jnp.bfloat16))
    c_specs = apply_partition_rules(c_abs, cache_rules, mesh)
    c_abs = jax.tree_util.tree_map(
        lambda a, s: jax.ShapeDtypeStruct(
            a.shape, a.dtype,
            sharding=NamedSharding(mesh, sanitize_for_mesh(s, a.shape, mesh))),
        c_abs, c_specs,
    )

    def sds(shape, dtype, spec):
        spec = sanitize_for_mesh(spec, shape, mesh)
        return jax.ShapeDtypeStruct(shape, dtype, sharding=NamedSharding(mesh, spec))

    tok_abs = sds((B,), jnp.int32, batch_spec(extra_dims=0))
    act_abs = sds((B,), jnp.int32, batch_spec(extra_dims=0))

    policy = DTypePolicy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_step(params, tokens, cache, active):
        return sc2.forward_ragged_decode(
            params, cfg, tokens, cache, active, policy=policy)

    t0 = time.time()
    with jax.set_mesh(mesh):
        compiled = decode_step.lower(p_abs, tok_abs, c_abs, act_abs).compile()
    rep = mem_report(compiled)
    rep.update({
        "case": f"serve_decode/{mesh_name}",
        "mesh": mesh_name,
        "batch": B,
        "cache_max_len": max_len,
        "kv_dtype": str(jnp.dtype(kv_dtype or jnp.bfloat16)),
        "compile_s": round(time.time() - t0, 1),
    })
    return rep


def run(out_path: str, quick: bool = False, only: str | None = None,
        merge: bool = False) -> dict:
    devs = v5e8_devices()
    results = []
    if merge and os.path.exists(out_path):
        with open(out_path) as f:
            results = [r for r in json.load(f).get("results", [])
                       if not (only and only in r.get("case", ""))]

    import jax.numpy as _jnp

    cases = [
        # (name, mesh kwargs, train kwargs) — the matrix brackets what the
        # real recipe can be on 16 GiB chips: context length x optimizer x
        # mesh. OOM cases stay in the artifact as documented negatives
        # (fp32-moment AdamW at 8B needs >8 v5e chips; the TPU-native
        # recipes are adafactor — which the reference itself supports,
        # train/util.py:141-148 — or bf16-mu AdamW at shorter context).
        ("fsdp8/s8192/adamw",
         dict(fsdp=8), dict(B=8, S=8192, remat=True)),
        ("fsdp8/s8192/adafactor",
         dict(fsdp=8), dict(B=8, S=8192, remat=True, optimizer="adafactor")),
        ("fsdp8/s4096/adafactor",
         dict(fsdp=8), dict(B=8, S=4096, remat=True, optimizer="adafactor")),
        ("fsdp8/s2048/adamw-bf16mu",
         dict(fsdp=8), dict(B=8, S=2048, remat=True, mu_dtype=_jnp.bfloat16)),
        ("fsdp4xtp2/s8192/adafactor",
         dict(fsdp=4, tensor=2),
         dict(B=4, S=8192, remat=True, optimizer="adafactor")),
        # sequence parallelism (the TPU-native long-context axis the
        # reference lacks, parallel/sequence.py): S shards over `sequence`,
        # halving per-chip activation temps where pure fsdp OOMs
        ("fsdp4xsp2/s8192/adafactor",
         dict(fsdp=4, sequence=2),
         dict(B=4, S=8192, remat=True, optimizer="adafactor")),
        ("fsdp4xsp2/s8192/adamw-bf16mu",
         dict(fsdp=4, sequence=2),
         dict(B=4, S=8192, remat=True, mu_dtype=_jnp.bfloat16)),
        # bf16 gradients (train/step.py grad_dtype): the AMP layout halves
        # the stacked decoder grad temps — the seq-independent allocations
        # that dominate the OOM dumps above. Composed with sequence
        # parallelism this is the recipe that fits the REFERENCE context
        # (S=8192, im2svg-stack.yaml:7) on a 16 GiB v5e-8.
        ("fsdp4xsp2/s8192/adafactor+bf16grads",
         dict(fsdp=4, sequence=2),
         dict(B=4, S=8192, remat=True, optimizer="adafactor",
              grad_dtype=_jnp.bfloat16)),
        ("fsdp8/s8192/adafactor+bf16grads",
         dict(fsdp=8), dict(B=8, S=8192, remat=True, optimizer="adafactor",
                            grad_dtype=_jnp.bfloat16)),
        ("fsdp4xsp2/s8192/adamw-bf16mu+bf16grads",
         dict(fsdp=4, sequence=2),
         dict(B=4, S=8192, remat=True, mu_dtype=_jnp.bfloat16,
              grad_dtype=_jnp.bfloat16)),
        # the audited recipe upgraded to "dots_flash" remat (save flash
        # out+LSE; backward skips the O(S²) forward attention recompute —
        # +9% measured at the 1B geometry): proves the FAST recipe also
        # fits the reference context on a v5e-8
        ("fsdp4xsp2/s8192/adafactor+bf16grads+dotsflash",
         dict(fsdp=4, sequence=2),
         dict(B=4, S=8192, remat="dots_flash", optimizer="adafactor",
              grad_dtype=_jnp.bfloat16)),
    ]
    if quick:
        cases = cases[:1]
    if only:
        cases = [c for c in cases if only in f"train/{c[0]}"]
    for name, mk, tk in cases:
        mesh = build_mesh(devs, **mk)
        print(f"[hbm_proof] compiling train {name} ...", flush=True)
        try:
            rep = train_case(mesh, name, **tk)
        except Exception as e:  # noqa: BLE001 — record OOM-at-compile etc.
            rep = {"case": f"train/{name}", "error": f"{type(e).__name__}: {e}"}
        print(f"[hbm_proof]   -> {json.dumps({k: rep.get(k) for k in ('per_chip_peak_gib','fits_16gib','headroom_gib','error')})}",
              flush=True)
        results.append(rep)

    if not quick:
        serve_cases = [
            ("tp8", dict(tensor=8), 16, 8192, None),
            # 7B has 4 kv heads: tp8 can't shard them 8-way, so the cache
            # replicates per chip — int8 KV (the engine's kv_cache_dtype
            # knob) halves that replicated cache and makes pure-tp8 fit
            ("tp8-int8kv", dict(tensor=8), 16, 8192, "int8"),
            # 7B geometry (36 q / 4 kv heads) shards cleanly on tp=4; the
            # remaining factor of 2 batch-shards the cache over `data` —
            # the natural 8-chip serving layout for this model
            ("tp4xdp2", dict(data=2, tensor=4), 64, 8192, None),
        ]
        if only:
            serve_cases = [c for c in serve_cases
                           if only in f"serve_decode/{c[0]}"]
        for name, mk, B, L, kvd in serve_cases:
            mesh = build_mesh(devs, **mk)
            print(f"[hbm_proof] compiling serve {name} B={B} L={L} ...", flush=True)
            try:
                rep = serve_decode_case(
                    mesh, name, B=B, max_len=L,
                    kv_dtype=jnp.int8 if kvd == "int8" else None)
            except Exception as e:  # noqa: BLE001
                rep = {"case": f"serve_decode/{name}/B{B}", "error": f"{type(e).__name__}: {e}"}
            print(f"[hbm_proof]   -> {json.dumps({k: rep.get(k) for k in ('per_chip_peak_gib','fits_16gib','headroom_gib','error')})}",
                  flush=True)
            results.append(rep)

    ok_cases = [r for r in results if r.get("fits_16gib")]
    artifact = {
        "topology": "tpu v5e 2x4 (deviceless AOT, jax.experimental.topologies)",
        "hbm_per_chip_gib": 16,
        "geometry": "StarVector-8B: StarCoder2-7B decoder + SigLIP-384 tower "
                    "(reference configs/models/starvector-8b/im2svg-stack.yaml:36-47)",
        "method": "jax.jit(...).lower(abstract shardings).compile() against the "
                  "v5e topology; per-chip bytes from compiled.memory_analysis()",
        "results": results,
        "n_fitting_cases": len(ok_cases),
        "ok": any(r.get("fits_16gib") and r["case"].startswith("train/")
                  for r in results)
            and any(r.get("fits_16gib") and r["case"].startswith("serve")
                    for r in results),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"[hbm_proof] wrote {out_path} ok={artifact['ok']}")
    return artifact


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "HBM_PROOF.json"))
    ap.add_argument("--quick", action="store_true",
                    help="one train case only (smoke)")
    ap.add_argument("--only", default=None,
                    help="substring filter: run only matching train cases")
    ap.add_argument("--merge", action="store_true",
                    help="merge into an existing artifact instead of replacing")
    args = ap.parse_args()
    art = run(args.out, quick=args.quick, only=args.only, merge=args.merge)
    sys.exit(0 if art["ok"] or args.quick else 1)
