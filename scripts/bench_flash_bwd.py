#!/usr/bin/env python
"""Sweep flash-attention backward block shapes on the real chip.

Times the full custom-VJP path (forward-with-lse + Pallas dq / dkv kernels)
at the training shapes that matter: the 1B bench point (B=8, S=1282 =
1024 + 257-visual + 1) and the long-context points. Reports TF/s using the
causal-halved matmul-FLOPs model so numbers are comparable across shapes.

Tunnel-aware timing: marginal cost between two trip counts, scalar fetch
only (see .claude/skills/verify — block_until_ready is unreliable on the
tunneled backend).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def attn_bwd_tflops(B, S, H, D, causal=True):
    """fwd 2 matmuls + bwd 5 matmuls of S×S×D each, per head."""
    f = B * H * S * S * D * 2 * 5
    return (f / 2 if causal else f) / 1e12


def time_marginal(fn, n1=3, n2=9):
    def run(n):
        t0 = time.time()
        s = 0.0
        for _ in range(n):
            s += fn()
        return time.time() - t0, s

    run(1)  # warm
    t_a, _ = run(n1)
    t_b, _ = run(n2)
    return (t_b - t_a) / (n2 - n1)


def make_scanned(fa, q, k, v, mask, out, lse, bq, bk, inner=8, onepass=None,
                 tri=False):
    """Amortize the ~30 ms tunnel dispatch: `inner` backward calls inside ONE
    jit, g varied per iteration so XLA cannot CSE them."""

    @jax.jit
    def scanned(gs):
        def body(acc, g):
            dq, dk, dv = fa.flash_backward(
                q, k, v, mask, out, lse, g, block_q=bq, block_k=bk,
                onepass=onepass, tri=tri,
            )
            return acc + jnp.sum(dq[0, 0, 0]) + jnp.sum(dk[0, 0, 0]), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), gs)
        return acc

    return scanned, inner


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only-s", type=int, default=None,
                    help="restrict the sweep to shapes with this S")
    args = ap.parse_args()

    from starvector_tpu.ops import flash_attention as fa

    shapes = [
        dict(B=8, S=1282, H=16, Hkv=1, D=128),    # 1B train bench point
        dict(B=2, S=8192, H=16, Hkv=1, D=128),    # long-context
        dict(B=2, S=8450, H=16, Hkv=1, D=128),    # true 8k train point
                                                  # (8192 + 257 visual + 1)
        dict(B=8, S=1282, H=32, Hkv=4, D=128),    # 8B-geometry (GQA-4)
        dict(B=1, S=16384, H=16, Hkv=1, D=128),   # 16k context (past the
                                                  # one-pass VMEM bound)
    ]
    if args.only_s is not None:
        shapes = [s for s in shapes if s["S"] == args.only_s]
    sweeps = [
        (None, None, None),          # adaptive default
        (512, 512, "tri"),           # TRIANGULAR-grid resident one-pass
        (512, 512, True),            # resident one-pass, rectangular grid
        (1024, 1024, "dqp"),         # HBM-dq-partials one-pass (VMEM flat in T)
        (512, 2048, "dqp"),
        (1536, 1024, "dqp"),         # 1.5x block product — VMEM borderline
        (1024, 1536, "dqp"),
        (512, 1024, False),          # split pair (the r4 long-S default)
        (None, None, "tri_split"),   # TRIANGULAR split at adaptive blocks
                                     # (the only triangle past the one-pass
                                     # VMEM bound — the 16k default)
    ]
    for shp in shapes:
        B, S, H, Hkv, D = shp["B"], shp["S"], shp["H"], shp["Hkv"], shp["D"]
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.bfloat16)
        mask = jnp.ones((B, S), jnp.int32)
        inner = 8
        gs = jnp.asarray(rng.randn(inner, B, S, H, D), jnp.bfloat16)
        out, lse = fa.flash_prefill_with_lse(q, k, v, mask)
        tf = attn_bwd_tflops(B, S, H, D)
        print(f"--- shape {shp} ({tf*1e3:.1f} GFLOP bwd)")
        for bq, bk, onepass in sweeps:
            if bq is not None and (bq > S + 254 or bk > 2 * S):
                continue
            tri = onepass in ("tri", "tri_split")
            label = "tri" if onepass == "tri" else (
                "tri_split" if onepass == "tri_split" else onepass)
            if onepass == "tri":
                onepass = True
            elif onepass == "tri_split":
                onepass = False
            try:
                scanned, _ = make_scanned(
                    fa, q, k, v, mask, out, lse, bq, bk, inner,
                    onepass=onepass, tri=tri,
                )
                dt = time_marginal(lambda: float(scanned(gs))) / inner
                print(f"  bq={bq} bk={bk} onepass={label}: "
                      f"{dt*1e3:7.2f} ms  {tf/dt:6.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001 — sweep survives bad configs
                print(f"  bq={bq} bk={bk} onepass={onepass} tri={tri}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
