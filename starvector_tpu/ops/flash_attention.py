"""Pallas TPU kernels for the attention hot paths.

Replaces the reference's CUDA flash_attn + SDPA fallbacks
(reference: modeling_gpt_bigcode.py:288-503, 506-642; pyproject.toml:56)
with TPU-native kernels:

  * `flash_prefill` — causal flash attention with online softmax, fp32
    accumulation, key-padding mask and query-position offset (for cached /
    chunked prefill). Grid (batch, q_heads, q_blocks, k_blocks): the k axis
    is innermost so the Mosaic pipeliner double-buffers K/V HBM→VMEM loads
    behind the MXU matmuls; fully-masked causal blocks are skipped with
    @pl.when so the causal wedge costs ~half the FLOPs.
  * `mqa_decode` — single-token decode over a long KV cache. MQA means all
    Q heads share one KV head: the kernel loads each KV block once and
    computes all H head scores against it, which keeps decode HBM-bandwidth-
    bound at the cache size (the MQA economics the reference exploits,
    configuration_gpt_bigcode.py:119).

Both kernels run in interpret mode on CPU (tests) and compiled on TPU.
Numerics are validated against ops.attention.multihead_attention.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# dead-block DMA elision helpers
# ---------------------------------------------------------------------------
# The kernels skip COMPUTE on blocks fully outside the causal/window wedge
# (@pl.when), but block DMAs are driven by the index maps, which the
# pipeliner evaluates for every grid cell. Clamping the data-dependent axis
# to the live range makes dead cells re-request the block just fetched,
# which Pallas elides (index unchanged → copy skipped) — so the dead ~half
# of the rectangular grid stops paying HBM traffic. ceil-div via
# -(-a // b) (jnp // floors); bounds kept in-range for padded shapes.

def _make_live_j(block_q, block_k, nj, causal, window):
    """Clamp for a k-block axis swept per q block (forward / dq grids)."""
    if not causal:
        return lambda i, j, qo: j

    def live_j(i, j, qo):
        j_hi = jnp.maximum((qo[0] + (i + 1) * block_q - 1) // block_k, 0)
        jj = jnp.minimum(j, j_hi)
        if window is not None:
            lo = qo[0] + i * block_q - window  # strict lower edge
            j_lo = jnp.clip(-(-(lo - block_k + 2) // block_k), 0, nj - 1)
            jj = jnp.maximum(jj, j_lo)
        return jj

    return live_j


def _make_live_i(block_q, block_k, ni, causal, window):
    """Clamp for the q-block axis swept per k block (dkv grid, u = g·ni+i)."""
    if not causal:
        return lambda j, u, qo: u % ni

    def live_i(j, u, qo):
        i = u % ni
        i_lo = jnp.maximum((j * block_k - qo[0]) // block_q, 0)
        ii = jnp.maximum(i, i_lo)
        if window is not None:
            hi = j * block_k + block_k - 1 + window - qo[0]
            i_hi = jnp.clip(-(-hi // block_q) - 1, 0, ni - 1)
            ii = jnp.minimum(ii, jnp.maximum(i_hi, i_lo))
        return ii

    return live_i


# ---------------------------------------------------------------------------
# flash prefill
# ---------------------------------------------------------------------------

def _flash_fwd_cell(
    q_ref, k_ref, v_ref, kvmask_ref, m_scr, l_scr, acc_scr, i, j, q_off,
    *, scale, block_q, block_k, causal, window, pos_masked,
):
    """One online-softmax update for forward cell (q block i, k block j).
    `i`/`j`/`q_off` are traced scalars (program ids on the rectangular
    grid, prefetched table entries on the triangular one); `pos_masked`
    statically elides the iota/compare VPU work on strict-interior cells
    where the positional mask is all-True."""
    q = q_ref[0, 0]  # (bq, D)
    k = k_ref[0, 0]  # (bk, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)

    mask = kvmask_ref[0, 0, :][None, :] > 0
    if pos_masked:
        q_pos = q_off + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        if causal:
            mask &= k_pos <= q_pos
        if window is not None:
            mask &= k_pos > q_pos - window
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scr[:, :1]                                # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)           # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                               # (bq, bk)
    corr = jnp.exp(m_prev - m_new)                       # (bq, 1)
    l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)


def _flash_kernel(
    # scalar-prefetch
    q_offset_ref,    # (1,) absolute position of query row 0
    # inputs
    q_ref,           # (1, 1, bq, D)
    k_ref,           # (1, 1, bk, D)
    v_ref,           # (1, 1, bk, D)
    kvmask_ref,      # (1, 1, bk)
    # outputs
    o_ref,           # (1, 1, bq, D)
    # scratch
    m_scr,           # (bq, 128) running max (broadcast over lanes)
    l_scr,           # (bq, 128) running denom
    acc_scr,         # (bq, D) fp32 accumulator
    *,
    scale: float,
    block_q: int,
    block_k: int,
    causal: bool,
    window: int | None,
):
    j = pl.program_id(3)
    nj = pl.num_programs(3)
    i = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_off = q_offset_ref[0]

    # skip blocks entirely in the causal future or beyond the sliding window
    run = True
    interior = False
    if causal:
        first_q = q_off + i * block_q
        first_k = j * block_k
        run = first_k <= first_q + block_q - 1
        # fully below the diagonal (and fully inside the window): the
        # positional mask is all-True — skip the iota/compare VPU work
        interior = first_k + block_k - 1 <= first_q
        if window is not None:
            # block is entirely left of every query's window
            last_k = first_k + block_k - 1
            run = jnp.logical_and(run, last_k > first_q - window)
            interior = jnp.logical_and(
                interior, first_k > first_q + block_q - 1 - window
            )

    def _compute(pos_masked):
        _flash_fwd_cell(
            q_ref, k_ref, v_ref, kvmask_ref, m_scr, l_scr, acc_scr,
            i, j, q_off,
            scale=scale, block_q=block_q, block_k=block_k,
            causal=causal, window=window, pos_masked=pos_masked,
        )

    if causal:
        pl.when(jnp.logical_and(run, jnp.logical_not(interior)))(
            lambda: _compute(True)
        )
        pl.when(interior)(lambda: _compute(False))
    else:
        pl.when(run)(lambda: _compute(window is not None))

    @pl.when(j == nj - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "block_q", "block_k", "interpret", "scale", "window"
    ),
)
def flash_prefill(
    q: jax.Array,            # (B, S, H, D)
    k: jax.Array,            # (B, T, Hkv, D)
    v: jax.Array,            # (B, T, Hkv, D)
    kv_mask: jax.Array,      # (B, T) 1 = valid key
    q_offset: jax.Array | int = 0,
    *,
    causal: bool = True,
    window: int | None = None,
    scale: float | None = None,
    block_q: int = 1024,  # tuned on v5e at B=64/S=1024/MQA: 1024/1024 runs
    block_k: int = 1024,  # 7.02 ms vs 7.58 (512/1024) and 11.1 (256/512)
    interpret: bool | None = None,
) -> jax.Array:
    """Flash attention; returns (B, S, H, D). `q_offset` is the absolute
    position of q[:, 0] within the KV window (cached chunked prefill)."""
    if interpret is None:
        interpret = _interpret_default()
    B, S, H, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    scale = D**-0.5 if scale is None else scale

    block_q = min(block_q, max(S, 8))
    block_k = min(block_k, max(T, 128))
    q_pad = (-S) % block_q
    k_pad = (-T) % block_k
    # head-major layouts for clean blocking
    qh = jnp.moveaxis(q, 2, 1)                      # (B, H, S, D)
    kh = jnp.moveaxis(k, 2, 1)                      # (B, Hkv, T, D)
    vh = jnp.moveaxis(v, 2, 1)
    if q_pad:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, k_pad)))
    Sp, Tp = S + q_pad, T + k_pad

    grid = (B, H, Sp // block_q, Tp // block_k)
    _live_j = _make_live_j(block_q, block_k, grid[3], causal, window)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_q=block_q, block_k=block_k,
            causal=causal, window=window,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_k, D),
                    lambda b, h, i, j, qo, G=G: (b, h // G, _live_j(i, j, qo), 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_k, D),
                    lambda b, h, i, j, qo, G=G: (b, h // G, _live_j(i, j, qo), 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_k),
                    lambda b, h, i, j, qo: (b, 0, _live_j(i, j, qo)),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
        interpret=interpret,
    )(jnp.asarray([q_offset], jnp.int32), qh, kh, vh,
      kv_mask.astype(jnp.int32)[:, None, :])

    out = jnp.moveaxis(out, 1, 2)  # (B, Sp, H, D)
    return out[:, :S]


# ---------------------------------------------------------------------------
# flash prefill that also emits the logsumexp (residual for the backward)
# ---------------------------------------------------------------------------

# lse/delta ride through HBM as (B, H, S, LANES): a trailing lane dim equal
# to the overall array dim satisfies Mosaic's block-shape rule (a bare
# (1, 1, bq) block does not — the squeezed head dim still counts).
_LSE_LANES = 8


def _flash_lse_kernel(
    q_offset_ref, q_ref, k_ref, v_ref, kvmask_ref,
    o_ref,
    lse_ref,         # (1, 1, bq, LANES) logsumexp per query row (broadcast)
    m_scr, l_scr, acc_scr,
    *, scale, block_q, block_k, causal, window,
):
    _flash_kernel(
        q_offset_ref, q_ref, k_ref, v_ref, kvmask_ref, o_ref,
        m_scr, l_scr, acc_scr,
        scale=scale, block_q=block_q, block_k=block_k,
        causal=causal, window=window,
    )
    j = pl.program_id(3)

    @pl.when(j == pl.num_programs(3) - 1)
    def _write_lse():
        lse = m_scr[:, :1] + jnp.log(jnp.maximum(l_scr[:, :1], 1e-30))
        lse_ref[0, 0] = jnp.broadcast_to(
            lse, (lse.shape[0], _LSE_LANES)
        ).astype(lse_ref.dtype)


def _flash_lse_tri_kernel(
    # scalar-prefetch
    q_offset_ref,    # (1,) statically 0 by the tri contract (kept for mask math)
    ti_ref,          # (G·n_tri,) linear step → q block row   (index tables)
    tj_ref,          # (G·n_tri,) linear step → k block col
    th_ref,          # (G·n_tri,) linear step → q head-in-group
    q_ref, k_ref, v_ref, kvmask_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, scale, block_q, block_k,
):
    """Forward + LSE on a TRIANGULAR grid: axis 2 walks ONLY the live
    lower-triangle (i, j) cells of each q-head's block matrix, row-major,
    via prefetched full-axis index tables — grid (B, Hkv, G·n_tri), the
    same enumeration as `_flash_bwd_onepass_tri_kernel`. The rectangular
    sweep skips dead-cell compute and elides their DMAs, but each dead
    cell still pays grid-step sequencing — measured 53.9 TF/s causal vs
    77.2 per LIVE cell non-causal at the 8k train shape (B=2, S=8450,
    bq=512/bk=1024 defaults on v5e). Row-major order keeps each q row's
    online-softmax updates consecutive: state inits at j == 0, the
    diagonal cell (j == i) is the row's last live cell and finalizes
    o/lse. Requires causal, no window, S == T, bq == bk, and a STATICALLY
    zero q_offset (the live set is baked into the static tables)."""
    t = pl.program_id(2)
    i = ti_ref[t]
    j = tj_ref[t]
    q_off = q_offset_ref[0]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def _compute(pos_masked):
        _flash_fwd_cell(
            q_ref, k_ref, v_ref, kvmask_ref, m_scr, l_scr, acc_scr,
            i, j, q_off,
            scale=scale, block_q=block_q, block_k=block_k,
            causal=True, window=None, pos_masked=pos_masked,
        )

    pl.when(j == i)(lambda: _compute(True))
    pl.when(j < i)(lambda: _compute(False))

    @pl.when(j == i)
    def _finalize():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)
        lse = m_scr[:, :1] + jnp.log(denom)
        lse_ref[0, 0] = jnp.broadcast_to(
            lse, (lse.shape[0], _LSE_LANES)
        ).astype(lse_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret", "scale",
                     "window", "tri"),
)
def flash_prefill_with_lse(
    q, k, v, kv_mask, q_offset: jax.Array | int = 0, *,
    causal: bool = True, window: int | None = None, scale: float | None = None,
    block_q: int | None = None, block_k: int | None = None,
    interpret: bool | None = None, tri: bool = False,
):
    """flash_prefill that also returns the per-row logsumexp (B, S, H) fp32 —
    the only residual the recompute-based backward needs beyond the inputs.
    `q_offset` is the absolute position of q[:, 0] in the KV window (used by
    the sequence-parallel training path, where each device holds a query
    chunk against the all-gathered K/V).

    `tri=True` (the caller certifies q_offset is STATICALLY zero —
    flash_prefill_trainable does) runs the TRIANGULAR-grid kernel when the
    live set is the exact lower triangle (causal, no window, S == T,
    bq == bk): only live cells are enumerated, removing the rectangular
    sweep's dead-cell sequencing tax (see `_flash_lse_tri_kernel`).
    STARVECTOR_FLASH_FWD_TRI=0 opts out (trace-time, for A/Bs)."""
    if interpret is None:
        interpret = _interpret_default()
    B, S, H, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    scale = D**-0.5 if scale is None else scale
    tri_ok = (
        tri and causal and window is None and S == T
        and os.environ.get("STARVECTOR_FLASH_FWD_TRI", "1") != "0"
    )
    if block_q is None and block_k is None:
        # rect default tuned on v5e at B=64/S=1024 MQA (see flash_prefill);
        # tri requires bq == bk — 1024 measured best causal at the 8k train
        # shape (60.0 TF/s rect vs 39.7 at 512/512, B=2/S=8450)
        block_q, block_k = (1024, 1024) if tri_ok else (512, 1024)
    elif block_q is None:
        block_q = 512
    elif block_k is None:
        block_k = 1024
    block_q = min(block_q, max(S, 8))
    block_k = min(block_k, max(T, 128))
    tri_ok = tri_ok and block_q == block_k
    q_pad = (-S) % block_q
    k_pad = (-T) % block_k
    qh = jnp.moveaxis(q, 2, 1)
    kh = jnp.moveaxis(k, 2, 1)
    vh = jnp.moveaxis(v, 2, 1)
    if q_pad:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, k_pad)))
    Sp, Tp = S + q_pad, T + k_pad

    if tri_ok and Sp == Tp:
        ni = Sp // block_q
        n_tri = ni * (ni + 1) // 2
        # full-axis tables (head factor baked in): every index-map eval is
        # one SMEM load — no div/rem by the non-power-of-two n_tri
        tri_ij = [(i, j) for i in range(ni) for j in range(i + 1)]
        ti_arr = jnp.asarray([i for _ in range(G) for i, _j in tri_ij],
                             jnp.int32)
        tj_arr = jnp.asarray([j for _ in range(G) for _i, j in tri_ij],
                             jnp.int32)
        th_arr = jnp.asarray([g for g in range(G) for _ in tri_ij],
                             jnp.int32)
        out, lse = pl.pallas_call(
            functools.partial(
                _flash_lse_tri_kernel, scale=scale,
                block_q=block_q, block_k=block_k,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(B, Hkv, G * n_tri),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, t, qo, ti, tj, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, hk, t, qo, ti, tj, th: (b, hk, tj[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, hk, t, qo, ti, tj, th: (b, hk, tj[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k),
                        lambda b, hk, t, qo, ti, tj, th: (b, 0, tj[t]),
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, t, qo, ti, tj, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, _LSE_LANES),
                        lambda b, hk, t, qo, ti, tj, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_q, 128), jnp.float32),
                    pltpu.VMEM((block_q, 128), jnp.float32),
                    pltpu.VMEM((block_q, D), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
                jax.ShapeDtypeStruct((B, H, Sp, _LSE_LANES), jnp.float32),
            ],
            interpret=interpret,
        )(jnp.asarray([q_offset], jnp.int32), ti_arr, tj_arr, th_arr,
          qh, kh, vh, kv_mask.astype(jnp.int32)[:, None, :])
        return jnp.moveaxis(out, 1, 2)[:, :S], lse[:, :, :S, 0]

    grid = (B, H, Sp // block_q, Tp // block_k)
    _live_j = _make_live_j(block_q, block_k, grid[3], causal, window)

    out, lse = pl.pallas_call(
        functools.partial(
            _flash_lse_kernel, scale=scale, block_q=block_q, block_k=block_k,
            causal=causal, window=window,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, block_k, D),
                    lambda b, h, i, j, qo, G=G: (b, h // G, _live_j(i, j, qo), 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_k, D),
                    lambda b, h, i, j, qo, G=G: (b, h // G, _live_j(i, j, qo), 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_k),
                    lambda b, h, i, j, qo: (b, 0, _live_j(i, j, qo)),
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, block_q, _LSE_LANES),
                    lambda b, h, i, j, *_: (b, h, i, 0),
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Sp, _LSE_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray([q_offset], jnp.int32), qh, kh, vh,
      kv_mask.astype(jnp.int32)[:, None, :])
    return jnp.moveaxis(out, 1, 2)[:, :S], lse[:, :, :S, 0]


# ---------------------------------------------------------------------------
# flash backward kernels (recompute-based; FlashAttention-2 style)
# ---------------------------------------------------------------------------

def _dq_cell(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
    dq_scr, i, j, q_off,
    *, scale, block_q, block_k, causal, window, pos_masked,
):
    """One dq accumulation for backward cell (q block i, k block j).
    `i`/`j`/`q_off` are traced scalars (program ids on the rectangular
    grid, prefetched table entries on the triangular one)."""
    q = q_ref[0, 0]                  # (bq, D)
    k = k_ref[0, 0]                  # (bk, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]                # (bq, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                        # (bq, bk)
    mask = kvmask_ref[0, 0, :][None, :] > 0
    if pos_masked:
        q_pos = q_off + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        if causal:
            mask &= k_pos <= q_pos
        if window is not None:
            mask &= k_pos > q_pos - window
    lse = lse_ref[0, 0][:, :1]       # (bq, 1)
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)            # (bq, bk)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # (bq, bk)
    delta = delta_ref[0, 0][:, :1]                        # (bq, 1)
    ds = p * (dp - delta) * scale                         # (bq, bk)
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_dq_kernel(
    q_offset_ref,    # (1,) absolute position of query row 0
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
    dq_ref,
    dq_scr,          # (bq, D) fp32 accumulator
    *, scale, block_q, block_k, causal, window,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    nj = pl.num_programs(3)
    q_off = q_offset_ref[0]

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    run = True
    interior = False
    if causal:
        first_q = q_off + i * block_q
        first_k = j * block_k
        run = first_k <= first_q + block_q - 1
        # block fully below the diagonal (and fully inside the window):
        # the positional mask is all-True there, so the iota/compare VPU
        # work can be skipped — at bq=512/bk=2048 most live blocks qualify
        interior = first_k + block_k - 1 <= first_q
        if window is not None:
            run = jnp.logical_and(
                run, first_k + block_k - 1 > first_q - window
            )
            interior = jnp.logical_and(
                interior, first_k > first_q + block_q - 1 - window
            )

    def _compute(pos_masked):
        _dq_cell(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
            dq_scr, i, j, q_off,
            scale=scale, block_q=block_q, block_k=block_k,
            causal=causal, window=window, pos_masked=pos_masked,
        )

    if causal:
        pl.when(jnp.logical_and(run, jnp.logical_not(interior)))(
            lambda: _compute(True)
        )
        pl.when(interior)(lambda: _compute(False))
    else:
        pl.when(run)(lambda: _compute(window is not None))

    @pl.when(j == nj - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_cell(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
    dk_scr, dv_scr, i, j, q_off,
    *, scale, block_q, block_k, causal, window, pos_masked,
):
    """One dk/dv accumulation for backward cell (q block i, k block j),
    transposed layout (k-major). `i`/`j`/`q_off` are traced scalars."""
    q = q_ref[0, 0]                  # (bq, D)
    k = k_ref[0, 0]                  # (bk, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]                # (bq, D)
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                        # (bk, bq)
    mask = kvmask_ref[0, 0, :][:, None] > 0
    if pos_masked:
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 0
        )
        q_pos = q_off + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 1
        )
        if causal:
            mask &= k_pos <= q_pos
        if window is not None:
            mask &= k_pos > q_pos - window
    lse = lse_ref[0, 0][:, 0][None, :]   # (1, bq)
    p_t = jnp.where(mask, jnp.exp(s_t - lse), 0.0)        # (bk, bq)
    dv_scr[:] += jax.lax.dot_general(
        p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # (bk, bq)
    delta = delta_ref[0, 0][:, 0][None, :]                # (1, bq)
    ds_t = p_t * (dp_t - delta) * scale                   # (bk, bq)
    dk_scr[:] += jax.lax.dot_general(
        ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_dkv_kernel(
    q_offset_ref,    # (1,) absolute position of query row 0
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,  # (bk, D) fp32 accumulators
    *, scale, block_q, block_k, causal, window, n_i,
):
    j = pl.program_id(2)      # k block
    u = pl.program_id(3)      # combined (group, q block) inner axis
    nu = pl.num_programs(3)
    i = jax.lax.rem(u, n_i)
    q_off = q_offset_ref[0]

    @pl.when(u == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    run = True
    interior = False
    if causal:
        first_q = q_off + i * block_q
        first_k = j * block_k
        run = first_k <= first_q + block_q - 1
        # fully-below-diagonal blocks skip the iota/compare mask build
        interior = first_k + block_k - 1 <= first_q
        if window is not None:
            run = jnp.logical_and(
                run, first_k + block_k - 1 > first_q - window
            )
            interior = jnp.logical_and(
                interior, first_k > first_q + block_q - 1 - window
            )

    def _compute(pos_masked):
        _dkv_cell(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
            dk_scr, dv_scr, i, j, q_off,
            scale=scale, block_q=block_q, block_k=block_k,
            causal=causal, window=window, pos_masked=pos_masked,
        )

    if causal:
        pl.when(jnp.logical_and(run, jnp.logical_not(interior)))(
            lambda: _compute(True)
        )
        pl.when(interior)(lambda: _compute(False))
    else:
        pl.when(run)(lambda: _compute(window is not None))

    @pl.when(u == nu - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_dq_tri_kernel(
    # scalar-prefetch
    q_offset_ref,    # (1,) statically 0 by the tri contract
    ti_ref,          # (n_live,) linear step → q block row
    tj_ref,          # (n_live,) linear step → k block col
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
    dq_ref,
    dq_scr,          # (bq, D) fp32 accumulator
    *, scale, block_q, block_k, n_j,
):
    """dq on a TRIANGULAR grid: axis 2 walks ONLY the live causal cells of
    the (ni × nj) block matrix, row-major, via prefetched index tables —
    grid (B, H, n_live). Unlike the one-pass triangle this admits ANY
    bq/bk ratio (the tables encode the block-aspect diagonal band), which
    matters at the 16k context where the split pair is the only
    VMEM-feasible path and its tuned blocks are bq=512/bk=2048. Diagonal-
    band cells (k block straddling the causal edge) keep the positional
    mask; strict-interior cells skip the iota/compare work. Requires
    causal, no window, S == T, and a STATICALLY-zero q_offset."""
    t = pl.program_id(2)
    i = ti_ref[t]
    j = tj_ref[t]
    q_off = q_offset_ref[0]

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    interior = j * block_k + block_k - 1 <= q_off + i * block_q

    def _compute(pos_masked):
        _dq_cell(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
            dq_scr, i, j, q_off,
            scale=scale, block_q=block_q, block_k=block_k,
            causal=True, window=None, pos_masked=pos_masked,
        )

    pl.when(interior)(lambda: _compute(False))
    pl.when(jnp.logical_not(interior))(lambda: _compute(True))

    # last live k block for this q row (row-major ⇒ the row's final cell)
    j_last = jnp.minimum(n_j - 1, (i * block_q + block_q - 1) // block_k)

    @pl.when(j == j_last)
    def _finalize():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_dkv_tri_kernel(
    # scalar-prefetch
    q_offset_ref,    # (1,) statically 0 by the tri contract
    tj_ref,          # (G·n_live,) linear step → k block col (outer)
    ti_ref,          # (G·n_live,) linear step → q block row
    th_ref,          # (G·n_live,) linear step → q head-in-group
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,  # (bk, D) fp32 accumulators
    *, scale, block_q, block_k, n_i, n_g,
):
    """dk/dv on a TRIANGULAR grid: per k block j, only the live q rows
    i ≥ ⌊j·bk/bq⌋ are enumerated (each swept for all G grouped q heads,
    g outer / i inner, matching `_flash_dkv_kernel`'s u = g·ni + i order)
    — grid (B, Hkv, Σ_j G·(ni − i_min(j))). Same contract as
    `_flash_dq_tri_kernel`; any bq/bk ratio."""
    t = pl.program_id(2)
    j = tj_ref[t]
    i = ti_ref[t]
    g = th_ref[t]
    q_off = q_offset_ref[0]

    # first live q row for this k block: smallest i with i·bq+bq-1 ≥ j·bk
    i_min = (j * block_k) // block_q

    @pl.when(jnp.logical_and(g == 0, i == i_min))
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    interior = j * block_k + block_k - 1 <= q_off + i * block_q

    def _compute(pos_masked):
        _dkv_cell(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
            dk_scr, dv_scr, i, j, q_off,
            scale=scale, block_q=block_q, block_k=block_k,
            causal=True, window=None, pos_masked=pos_masked,
        )

    pl.when(interior)(lambda: _compute(False))
    pl.when(jnp.logical_not(interior))(lambda: _compute(True))

    @pl.when(jnp.logical_and(g == n_g - 1, i == n_i - 1))
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dqp_kernel(
    q_offset_ref,    # (1,) absolute position of query row 0
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
    dk_ref, dv_ref, dqp_ref,
    dk_scr, dv_scr,  # (bk, D) fp32 accumulators
    *, scale, block_q, block_k, causal, window, n_i,
):
    """One-pass backward with HBM dq partials: the split dkv grid
    (B, Hkv, nj, G·ni — k block outer, q sweep inner) extended so each live
    cell's P feeds ALL FIVE backward matmuls. dk/dv accumulate per k block
    in small (bk, D) fp32 scratch exactly like `_flash_dkv_kernel`; dq's
    k-strip contribution is written to its own slot of a (B, H, nj, Sp, D)
    partials array and reduced over the nj axis in XLA after the call.
    Unlike the resident-scratch one-pass kernel this keeps VMEM flat in T
    (blocks + 2·bk·D fp32 only — the resident variant needs T·D·12 bytes
    and stops compiling past (512, 512) blocks at T=8192), so it admits
    MXU-friendly block pairs at any context length; the price is one extra
    HBM round trip of the partials (nj·S·D·2 bytes per head — ~1.3 ms of
    the ~10 ms budget at B=2/S=8192/bk=1024). Dead causal cells zero their
    dq slot (the reduce reads every slot) but skip all compute and, via the
    live_i clamp in the q/do index maps, their input DMAs."""
    j = pl.program_id(2)      # k block
    u = pl.program_id(3)      # combined (group, q block) inner axis
    nu = pl.num_programs(3)
    i = jax.lax.rem(u, n_i)
    q_off = q_offset_ref[0]

    @pl.when(u == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    run = True
    interior = False
    if causal:
        first_q = q_off + i * block_q
        first_k = j * block_k
        run = first_k <= first_q + block_q - 1
        interior = first_k + block_k - 1 <= first_q
        if window is not None:
            run = jnp.logical_and(
                run, first_k + block_k - 1 > first_q - window
            )
            interior = jnp.logical_and(
                interior, first_k > first_q + block_q - 1 - window
            )

    def _compute(pos_masked):
        q = q_ref[0, 0]                  # (bq, D)
        k = k_ref[0, 0]                  # (bk, D)
        v = v_ref[0, 0]
        do = do_ref[0, 0]                # (bq, D)
        s_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                        # (bk, bq)
        mask = kvmask_ref[0, 0, :][:, None] > 0
        if pos_masked:
            k_pos = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, block_q), 0
            )
            q_pos = q_off + i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, block_q), 1
            )
            if causal:
                mask &= k_pos <= q_pos
            if window is not None:
                mask &= k_pos > q_pos - window
        lse = lse_ref[0, 0][:, 0][None, :]   # (1, bq)
        p_t = jnp.where(mask, jnp.exp(s_t - lse), 0.0)        # (bk, bq)
        dv_scr[:] += jax.lax.dot_general(
            p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                     # (bk, bq)
        delta = delta_ref[0, 0][:, 0][None, :]                # (1, bq)
        ds_t = p_t * (dp_t - delta) * scale                   # (bk, bq)
        ds_b = ds_t.astype(q.dtype)
        dk_scr[:] += jax.lax.dot_general(
            ds_b, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dq strip: contract the shared bk axis — no (bq, bk) transpose
        dqp_ref[0, 0, 0] = jax.lax.dot_general(
            ds_b, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqp_ref.dtype)

    if causal:
        pl.when(jnp.logical_and(run, jnp.logical_not(interior)))(
            lambda: _compute(True)
        )
        pl.when(interior)(lambda: _compute(False))
        pl.when(jnp.logical_not(run))(
            lambda: dqp_ref.__setitem__(
                (0, 0, 0), jnp.zeros_like(dqp_ref[0, 0, 0])
            )
        )
    else:
        pl.when(run)(lambda: _compute(window is not None))
        if window is not None:
            pl.when(jnp.logical_not(run))(
                lambda: dqp_ref.__setitem__(
                    (0, 0, 0), jnp.zeros_like(dqp_ref[0, 0, 0])
                )
            )

    @pl.when(u == nu - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_dqdkv_fused_kernel(
    q_offset_ref,    # (1,) absolute position of query row 0
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
    dq_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,  # (Tp, D) fp32 accumulators
    *, scale, block_q, causal, window, n_i,
):
    """Single-k-block fused backward (T fits one block, the common training
    shape): grid (B, Hkv, G·n_i) with K/V resident per (b, hkv). Each step
    recomputes Pᵀ ONCE and emits its dq block directly while accumulating
    dk/dv in scratch — vs the two-kernel path this halves the program count,
    the exp/mask VPU work, and the K/V reloads, which is where the time goes
    at S≈1k (the kernels are overhead/VPU-bound there, not MXU-bound:
    measured 7.1 ms → see flash_backward docstring)."""
    u = pl.program_id(2)
    nu = pl.num_programs(2)
    i = jax.lax.rem(u, n_i)
    q_off = q_offset_ref[0]
    Tp = k_ref.shape[2]

    @pl.when(u == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]                  # (bq, D)
    k = k_ref[0, 0]                  # (Tp, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]                # (bq, D)
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                        # (Tp, bq)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (Tp, block_q), 0)
    q_pos = q_off + i * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (Tp, block_q), 1
    )
    mask = kvmask_ref[0, 0, :][:, None] > 0
    if causal:
        mask &= k_pos <= q_pos
    if window is not None:
        mask &= k_pos > q_pos - window
    lse = lse_ref[0, 0][:, 0][None, :]       # (1, bq)
    p_t = jnp.where(mask, jnp.exp(s_t - lse), 0.0)        # (Tp, bq)
    dv_scr[:] += jax.lax.dot_general(
        p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # (Tp, bq)
    delta = delta_ref[0, 0][:, 0][None, :]                # (1, bq)
    ds_t = p_t * (dp_t - delta) * scale                   # (Tp, bq)
    ds_b = ds_t.astype(q.dtype)
    dk_scr[:] += jax.lax.dot_general(
        ds_b, q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dq = dsᵀ · k, contracting the shared T axis (no transpose materialized)
    dq_ref[0, 0] = jax.lax.dot_general(
        ds_b, k, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)

    @pl.when(u == nu - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _onepass_cell(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
    dq_scr, dk_scr, dv_scr, i, j, q_off,
    *, scale, block_q, block_k, causal, window, pos_masked,
):
    """Per-cell math shared by the one-pass backward kernels (rectangular
    and triangular grids): recompute P for the (q block i, k block j) cell
    from the forward LSE, then feed all five backward matmuls — dq into the
    per-q-block scratch, dk/dv into this k block's strip of the full-length
    scratch. `pos_masked=False` is the interior fast path (cell fully below
    the causal diagonal / inside the window): the positional mask and its
    two iotas are skipped, only the key-padding mask applies."""
    q = q_ref[0, 0]                  # (bq, D)
    k = k_ref[0, 0]                  # (bk, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]                # (bq, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                        # (bq, bk)
    mask = kvmask_ref[0, 0, :][None, :] > 0
    if pos_masked:
        q_pos = q_off + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        if causal:
            mask &= k_pos <= q_pos
        if window is not None:
            mask &= k_pos > q_pos - window
    lse = lse_ref[0, 0][:, :1]       # (bq, 1)
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)            # (bq, bk)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # (bq, bk)
    delta = delta_ref[0, 0][:, :1]                        # (bq, 1)
    ds = p * (dp - delta) * scale                         # (bq, bk)
    ds_b = ds.astype(q.dtype)
    dq_scr[:] += jax.lax.dot_general(
        ds_b, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # contract the shared q axis — no (bk, bq) transposes materialize
    sl = pl.ds(j * block_k, block_k)
    dv_scr[sl] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_scr[sl] += jax.lax.dot_general(
        ds_b, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_bwd_onepass_kernel(
    q_offset_ref,    # (1,) absolute position of query row 0
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
    dq_ref, dk_ref, dv_ref,
    dq_scr,          # (bq, D) fp32
    dk_scr, dv_scr,  # (Tp, D) fp32 — FULL-length accumulators
    *, scale, block_q, block_k, causal, window, n_i, n_j,
):
    """One-pass long-S backward: grid (B, Hkv, G·ni, nj) with the k-block
    axis innermost. Each live (q block, k block) cell computes P ONCE and
    feeds all five backward matmuls — the split dq/dkv pair recomputes the
    S·T scores in both kernels (7 executed matmuls for 5 counted by the
    FLOPs model, capping the model rate at ~5/7 of the MXU rate; measured
    69-74 TF/s at S=8192 vs 147.9 TF/s forward). dq accumulates in a
    per-q-block scratch (finalized when its k sweep ends, exactly like
    _flash_dq_kernel); dk/dv accumulate across the WHOLE (u, j) sweep in a
    full-length fp32 scratch — (Tp, 128) fp32 ×2 is 8 MiB at T=8192, well
    inside v5e VMEM — and flush once at the final cell. Dead cells skip
    compute and their DMAs are elided via the live_j index-map clamp."""
    u = pl.program_id(2)
    j = pl.program_id(3)
    nu = pl.num_programs(2)
    i = jax.lax.rem(u, n_i)
    q_off = q_offset_ref[0]

    @pl.when(jnp.logical_and(u == 0, j == 0))
    def _init_kv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(j == 0)
    def _init_q():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    run = True
    interior = False
    if causal:
        first_q = q_off + i * block_q
        first_k = j * block_k
        run = first_k <= first_q + block_q - 1
        interior = first_k + block_k - 1 <= first_q
        if window is not None:
            run = jnp.logical_and(
                run, first_k + block_k - 1 > first_q - window
            )
            interior = jnp.logical_and(
                interior, first_k > first_q + block_q - 1 - window
            )

    def _compute(pos_masked):
        _onepass_cell(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
            dq_scr, dk_scr, dv_scr, i, j, q_off,
            scale=scale, block_q=block_q, block_k=block_k,
            causal=causal, window=window, pos_masked=pos_masked,
        )

    if causal:
        pl.when(jnp.logical_and(run, jnp.logical_not(interior)))(
            lambda: _compute(True)
        )
        pl.when(interior)(lambda: _compute(False))
    else:
        pl.when(run)(lambda: _compute(window is not None))

    @pl.when(j == n_j - 1)
    def _finalize_q():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)

    @pl.when(jnp.logical_and(u == nu - 1, j == n_j - 1))
    def _finalize_kv():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_onepass_tri_kernel(
    q_offset_ref,    # (1,) prefetched but statically 0 on this path
    ti_ref, tj_ref,  # (G·n_tri,) linear step → (q block i, k block j)
    th_ref,          # (G·n_tri,) linear step → q head-in-group (index maps)
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
    dq_ref, dk_ref, dv_ref,
    dq_scr,          # (bq, D) fp32
    dk_scr, dv_scr,  # (Tp, D) fp32 — FULL-length accumulators
    *, scale, block_q, block_k,
):
    """One-pass backward on a TRIANGULAR grid: axis 2 walks ONLY the live
    lower-triangle (i, j) cells of each q-head's block matrix, row-major,
    via prefetched index tables — grid (B, Hkv, G·n_tri) with
    n_tri = ni(ni+1)/2. The tables span the full axis (head factor baked
    in), so neither the kernel nor the index maps divide by the
    non-power-of-two n_tri — each eval is one SMEM load.

    The rectangular kernel skips dead-cell compute and elides their DMAs,
    but each dead cell still pays a full grid-step sequencing cost —
    measured 88.1 TF/s causal vs 133.9 TF/s per LIVE cell non-causal at
    S=8192/bq=bk=512 on v5e, i.e. ~35% of causal wall-clock went to the
    ~47% dead cells. Enumerating only live cells removes that tax; the
    diagonal (j == i) keeps the positional mask, strict-interior cells
    (j < i) run the unmasked fast path. Requires causal, no window, S == T,
    bq == bk, and a STATICALLY-zero q_offset (a runtime offset changes the
    live set, which is baked into the static tables)."""
    t = pl.program_id(2)
    nt = pl.num_programs(2)
    i = ti_ref[t]
    j = tj_ref[t]

    @pl.when(t == 0)
    def _init_kv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(j == 0)
    def _init_q():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    def _compute(pos_masked):
        _onepass_cell(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvmask_ref,
            dq_scr, dk_scr, dv_scr, i, j, 0,
            scale=scale, block_q=block_q, block_k=block_k,
            causal=True, window=None, pos_masked=pos_masked,
        )

    pl.when(j == i)(lambda: _compute(True))
    pl.when(j < i)(lambda: _compute(False))

    @pl.when(j == i)
    def _finalize_q():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)

    @pl.when(t == nt - 1)
    def _finalize_kv():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


# Above this KV length the fused kernel's resident K/V + fp32 dk/dv scratch
# (~T·128·12 bytes + double-buffered q/do blocks) would crowd VMEM; the
# two-kernel path also stops being overhead-bound there, so split wins.
_FUSED_BWD_MAX_T = 2048

# One-pass kernel bound: its full-length fp32 dk/dv scratch plus the
# resident bf16 dk/dv output blocks cost Tp·D·12 bytes (12.6 MiB at
# Tp=8192, D=128) BEFORE the double-buffered q/do/k/v blocks — measured
# on v5e (~16 MiB VMEM/core): (bq=512, bk=512) compiles and runs 96-97
# TF/s at S=8192 while every config with larger blocks (bk≥1024 or
# bq=1024) fails Mosaic compile on VMEM. The bound is the largest
# MEASURED-compiling padded length: Tp=8704 (13.4 MiB scratch+outs), the
# 1B train decoder's true backward length (8192 ctx + 257 visual + 1,
# padded to the 512 block) — the full train step runs 11,195 tok/s /
# MFU 0.543 through it vs 10,359 / 0.503 via the split pair. T=16384's
# scratch alone (16 MiB) can never fit; past the bound the split pair is
# the default (77 TF/s at S=8192) and `onepass="dqp"` the opt-in.
_ONEPASS_BWD_MAX_T = 8704

# Largest block pair measured to fit beside the one-pass kernel's resident
# full-length scratch at T=8192 (see the cliff note above).
_ONEPASS_BWD_BLOCKS = (512, 512)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "window", "scale", "block_q", "block_k",
                     "interpret", "fused", "onepass", "tri"),
)
def flash_backward(
    q, k, v, kv_mask, out, lse, g, q_offset: jax.Array | int = 0, *,
    causal: bool = True, window: int | None = None, scale: float | None = None,
    block_q: int | None = None, block_k: int | None = None,
    interpret: bool | None = None, fused: bool | None = None,
    onepass: bool | None = None, tri: bool = False,
):
    """Flash-attention backward: dq/dk/dv with recomputed P blocks and
    fp32 accumulation — nothing O(S·T) ever materializes (the reference gets
    this from the flash_attn CUDA backward, modeling_gpt_bigcode.py:288-503).
    `lse` is the forward's logsumexp (B, H, S); `g` the output cotangent;
    `q_offset` the absolute position of q[:, 0] in the KV window (sequence-
    parallel chunks).

    Two paths, chosen by KV length (override with `fused`):
      * T ≤ _FUSED_BWD_MAX_T — single-k-block fused kernel
        (`_flash_dqdkv_fused_kernel`): one program per q block computes Pᵀ
        once and emits dq + dk/dv-accumulation together. At S≈1k the
        split kernels are overhead/VPU-bound (~8.5 µs/program measured on
        v5e — exp+mask recompute twice, 768 programs), not MXU-bound;
        fusing halves the programs and the VPU work.
      * longer T (up to _ONEPASS_BWD_MAX_T) — ONE-PASS kernel
        (`_flash_bwd_onepass_kernel`): P computed once per live cell feeds
        all five matmuls, vs 7 executed matmuls across the split pair
        (the split's 5/7-capped model rate by construction; one pass
        removes the double score recompute). Measured 96.9 TF/s at S=8192
        vs 77.0 for the split pair, at the only block pair
        (_ONEPASS_BWD_BLOCKS) whose VMEM fits beside the full-length
        scratch. When `tri=True` (the caller certifies q_offset is
        STATICALLY zero — flash_prefill_trainable does) and the live set
        is the exact lower triangle (causal, no window, S == T, bq == bk),
        the one-pass kernel runs on a TRIANGULAR grid
        (`_flash_bwd_onepass_tri_kernel`) that enumerates only live cells
        via prefetched index tables — the rectangular sweep's dead cells
        skip compute/DMA but still pay grid sequencing, measured ~35% of
        causal wall-clock at S=8192 (88.1 TF/s rect-causal vs 133.9 per
        live cell non-causal). STARVECTOR_FLASH_BWD_TRI=0 opts out.
      * T beyond the one-pass VMEM bound, or `onepass=False` — split
        dq / dkv kernels with shape-adaptive blocks (bq=512, bk minimizing
        padded KV length: 69 TF/s at S=8192 vs 11 TF/s for uniform
        128/128 — small blocks drown in grid overhead, and a bk that pads
        T (e.g. 1024 → Tp=2048 at T=1282) wastes up to 60% of the k
        sweep). Under the same `tri` contract the split pair ALSO runs on
        triangular grids (`_flash_dq_tri_kernel` / `_flash_dkv_tri_kernel`)
        — unlike the one-pass triangle these admit ANY bq/bk ratio, since
        the tables encode the block-aspect diagonal band. This is the only
        triangle past _ONEPASS_BWD_MAX_T: 92.0 TF/s at S=16384 (tri
        default blocks 1024/1024) vs 85.2 for the rect-adaptive split,
        and 66.1 vs 61.2 at forced-split S=8192."""
    if interpret is None:
        interpret = _interpret_default()
    B, S, H, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    scale = D**-0.5 if scale is None else scale
    if fused is None:
        fused = block_k is None and T <= _FUSED_BWD_MAX_T
    if onepass is None:
        # STARVECTOR_FLASH_BWD_ONEPASS ∈ {resident, dqp, split} overrides
        # the adaptive long-S variant (read at trace time; the fused short-T
        # path is unaffected): "dqp" trades a B·H·(T/bk)·T·D·2-byte HBM
        # transient for ~+6% kernel rate over "resident" (103 vs 97 TF/s at
        # S=8192), "split" is the no-scratch fallback (77 TF/s).
        env = os.environ.get("STARVECTOR_FLASH_BWD_ONEPASS", "")
        if not fused and env:
            onepass = {"resident": True, "dqp": "dqp", "split": False}[env]
        else:
            onepass = not fused and T <= _ONEPASS_BWD_MAX_T
    if onepass is True and block_q is None and block_k is None:
        # the one-pass kernel's VMEM is dominated by its full-length
        # resident scratch; only the measured (512, 512) pair fits at the
        # long-S shapes this path serves (explicit blocks override for
        # sweeps and will fail Mosaic compile past the cliff)
        block_q, block_k = _ONEPASS_BWD_BLOCKS
    if onepass == "dqp" and block_q is None and block_k is None:
        # largest block product that compiles (the fp32 score+dp
        # intermediates dominate dqp's VMEM): 103 TF/s at S=8192
        block_q, block_k = 1024, 1024
    tri_admissible = (
        tri and causal and window is None and S == T
        and os.environ.get("STARVECTOR_FLASH_BWD_TRI", "1") != "0"
    )
    if (tri_admissible and not fused and onepass is False
            and block_q is None and block_k is None):
        # tri-split default: with dead cells enumerated away, padded-length
        # minimization stops mattering and a fixed (1024, 1024) wins every
        # measured point — 92.0 TF/s at S=16384 (vs 86.6 rect-adaptive
        # 512/2048) and 86.3 at the TRUE 16k decoder length T=16642 (vs
        # 85.8 for pad-minimizing 512/1536; 1024/1536 exceeds the Mosaic
        # scoped-VMEM limit by 240 KB inside the full train step, and
        # 1024/2048 / 512/4096 fail standalone)
        block_q, block_k = 1024, 1024
    if block_q is None:
        block_q = 512
    if block_k is None:
        block_k = (
            max(-(-T // 128) * 128, 128) if fused
            else min((1024, 1536, 2048), key=lambda b: (-(-T // b) * b, -b))
        )
    block_q = min(block_q, max(S, 8))
    block_k = min(block_k, max(T, 128))
    q_pad = (-S) % block_q
    k_pad = (-T) % block_k

    qh = jnp.moveaxis(q, 2, 1)                       # (B, H, S, D)
    kh = jnp.moveaxis(k, 2, 1)                       # (B, Hkv, T, D)
    vh = jnp.moveaxis(v, 2, 1)
    doh = jnp.moveaxis(g, 2, 1)                      # (B, H, S, D)
    oh = jnp.moveaxis(out, 2, 1)
    # delta_i = rowsum(dO_i * O_i) — tiny elementwise pre-pass
    delta = jnp.sum(
        doh.astype(jnp.float32) * oh.astype(jnp.float32), axis=-1
    )                                                # (B, H, S)
    if q_pad:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, q_pad), (0, 0)))
        doh = jnp.pad(doh, ((0, 0), (0, 0), (0, q_pad), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, q_pad)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, q_pad)))
    if k_pad:
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, k_pad)))
    # lane-expand (see _LSE_LANES note above)
    lse = jnp.broadcast_to(lse[..., None], (*lse.shape, _LSE_LANES))
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, _LSE_LANES))
    Sp, Tp = S + q_pad, T + k_pad
    ni, nj = Sp // block_q, Tp // block_k
    kvm = kv_mask.astype(jnp.int32)[:, None, :]

    common = dict(scale=scale, block_q=block_q, block_k=block_k,
                  causal=causal, window=window)

    q_off_arr = jnp.asarray([q_offset], jnp.int32)
    if fused:
        assert nj == 1, (Tp, block_k)
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _flash_dqdkv_fused_kernel, scale=scale, block_q=block_q,
                causal=causal, window=window, n_i=ni,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, Hkv, G * ni),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, u, *_, G=G, ni=ni:
                            (b, hk * G + u // ni, u % ni, 0),
                    ),
                    pl.BlockSpec((1, 1, Tp, D),
                                 lambda b, hk, u, *_: (b, hk, 0, 0)),
                    pl.BlockSpec((1, 1, Tp, D),
                                 lambda b, hk, u, *_: (b, hk, 0, 0)),
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, u, *_, G=G, ni=ni:
                            (b, hk * G + u // ni, u % ni, 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, _LSE_LANES),
                        lambda b, hk, u, *_, G=G, ni=ni:
                            (b, hk * G + u // ni, u % ni, 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, _LSE_LANES),
                        lambda b, hk, u, *_, G=G, ni=ni:
                            (b, hk * G + u // ni, u % ni, 0),
                    ),
                    pl.BlockSpec((1, 1, Tp),
                                 lambda b, hk, u, *_: (b, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, u, *_, G=G, ni=ni:
                            (b, hk * G + u // ni, u % ni, 0),
                    ),
                    pl.BlockSpec((1, 1, Tp, D),
                                 lambda b, hk, u, *_: (b, hk, 0, 0)),
                    pl.BlockSpec((1, 1, Tp, D),
                                 lambda b, hk, u, *_: (b, hk, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((Tp, D), jnp.float32),
                    pltpu.VMEM((Tp, D), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
                jax.ShapeDtypeStruct((B, Hkv, Tp, D), k.dtype),
                jax.ShapeDtypeStruct((B, Hkv, Tp, D), v.dtype),
            ],
            interpret=interpret,
        )(q_off_arr, qh, kh, vh, doh, lse, delta, kvm)
        dq = jnp.moveaxis(dq, 1, 2)[:, :S]
        dk = jnp.moveaxis(dk, 1, 2)[:, :T]
        dv = jnp.moveaxis(dv, 1, 2)[:, :T]
        return dq, dk, dv
    _live_j = _make_live_j(block_q, block_k, nj, causal, window)
    _live_i = _make_live_i(block_q, block_k, ni, causal, window)

    if onepass == "dqp":
        dk, dv, dqp = pl.pallas_call(
            functools.partial(_flash_bwd_dqp_kernel, **common, n_i=ni),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, Hkv, nj, G * ni),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, j, u, qo, G=G, ni=ni:
                            (b, hk * G + u // ni, _live_i(j, u, qo), 0),
                    ),
                    pl.BlockSpec((1, 1, block_k, D),
                                 lambda b, hk, j, u, *_: (b, hk, j, 0)),
                    pl.BlockSpec((1, 1, block_k, D),
                                 lambda b, hk, j, u, *_: (b, hk, j, 0)),
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, j, u, qo, G=G, ni=ni:
                            (b, hk * G + u // ni, _live_i(j, u, qo), 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, _LSE_LANES),
                        lambda b, hk, j, u, qo, G=G, ni=ni:
                            (b, hk * G + u // ni, _live_i(j, u, qo), 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, _LSE_LANES),
                        lambda b, hk, j, u, qo, G=G, ni=ni:
                            (b, hk * G + u // ni, _live_i(j, u, qo), 0),
                    ),
                    pl.BlockSpec((1, 1, block_k),
                                 lambda b, hk, j, u, *_: (b, 0, j)),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, block_k, D),
                                 lambda b, hk, j, u, *_: (b, hk, j, 0)),
                    pl.BlockSpec((1, 1, block_k, D),
                                 lambda b, hk, j, u, *_: (b, hk, j, 0)),
                    pl.BlockSpec(
                        (1, 1, 1, block_q, D),
                        lambda b, hk, j, u, *_, G=G, ni=ni:
                            (b, hk * G + u // ni, j, u % ni, 0),
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_k, D), jnp.float32),
                    pltpu.VMEM((block_k, D), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, Hkv, Tp, D), k.dtype),
                jax.ShapeDtypeStruct((B, Hkv, Tp, D), v.dtype),
                jax.ShapeDtypeStruct((B, H, nj, Sp, D), q.dtype),
            ],
            interpret=interpret,
        )(q_off_arr, qh, kh, vh, doh, lse, delta, kvm)
        # fp32 strip reduction; each bf16 strip is one k block's exact
        # fp32-accumulated contribution rounded once
        dq = dqp.astype(jnp.float32).sum(axis=2).astype(q.dtype)
        dq = jnp.moveaxis(dq, 1, 2)[:, :S]
        dk = jnp.moveaxis(dk, 1, 2)[:, :T]
        dv = jnp.moveaxis(dv, 1, 2)[:, :T]
        return dq, dk, dv

    # Triangular grid: only when the live set is static (causal, no window,
    # q_offset statically 0 — the `tri` flag certifies that) and the block
    # geometry makes the live set the exact lower triangle (S == T,
    # bq == bk). STARVECTOR_FLASH_BWD_TRI=0 opts back into the rectangular
    # sweep (trace-time, for A/Bs).
    use_tri = (
        tri and onepass is True and causal and window is None
        and S == T and block_q == block_k and Sp == Tp
        and os.environ.get("STARVECTOR_FLASH_BWD_TRI", "1") != "0"
    )
    if use_tri:
        n_tri = ni * (ni + 1) // 2
        # full-axis tables (head factor baked in): every index-map eval is
        # one SMEM load — no div/rem by the non-power-of-two n_tri on the
        # scalar core, which is measurable across ~G·n_tri steps
        tri_ij = [(i, j) for i in range(ni) for j in range(i + 1)]
        ti_arr = jnp.asarray([i for _ in range(G) for i, _j in tri_ij],
                             jnp.int32)
        tj_arr = jnp.asarray([j for _ in range(G) for _i, j in tri_ij],
                             jnp.int32)
        th_arr = jnp.asarray([g for g in range(G) for _ in tri_ij],
                             jnp.int32)
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _flash_bwd_onepass_tri_kernel, scale=scale,
                block_q=block_q, block_k=block_k,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(B, Hkv, G * n_tri),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, t, qo, ti, tj, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, hk, t, qo, ti, tj, th:
                            (b, hk, tj[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, hk, t, qo, ti, tj, th:
                            (b, hk, tj[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, t, qo, ti, tj, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, _LSE_LANES),
                        lambda b, hk, t, qo, ti, tj, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, _LSE_LANES),
                        lambda b, hk, t, qo, ti, tj, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k),
                        lambda b, hk, t, qo, ti, tj, th:
                            (b, 0, tj[t]),
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, t, qo, ti, tj, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                    pl.BlockSpec((1, 1, Tp, D),
                                 lambda b, hk, t, *_: (b, hk, 0, 0)),
                    pl.BlockSpec((1, 1, Tp, D),
                                 lambda b, hk, t, *_: (b, hk, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_q, D), jnp.float32),
                    pltpu.VMEM((Tp, D), jnp.float32),
                    pltpu.VMEM((Tp, D), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
                jax.ShapeDtypeStruct((B, Hkv, Tp, D), k.dtype),
                jax.ShapeDtypeStruct((B, Hkv, Tp, D), v.dtype),
            ],
            interpret=interpret,
        )(q_off_arr, ti_arr, tj_arr, th_arr, qh, kh, vh, doh, lse, delta,
          kvm)
        dq = jnp.moveaxis(dq, 1, 2)[:, :S]
        dk = jnp.moveaxis(dk, 1, 2)[:, :T]
        dv = jnp.moveaxis(dv, 1, 2)[:, :T]
        return dq, dk, dv

    if onepass:
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _flash_bwd_onepass_kernel, **common, n_i=ni, n_j=nj,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, Hkv, G * ni, nj),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, u, j, *_, G=G, ni=ni:
                            (b, hk * G + u // ni, u % ni, 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, hk, u, j, qo, ni=ni:
                            (b, hk, _live_j(u % ni, j, qo), 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, hk, u, j, qo, ni=ni:
                            (b, hk, _live_j(u % ni, j, qo), 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, u, j, *_, G=G, ni=ni:
                            (b, hk * G + u // ni, u % ni, 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, _LSE_LANES),
                        lambda b, hk, u, j, *_, G=G, ni=ni:
                            (b, hk * G + u // ni, u % ni, 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, _LSE_LANES),
                        lambda b, hk, u, j, *_, G=G, ni=ni:
                            (b, hk * G + u // ni, u % ni, 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k),
                        lambda b, hk, u, j, qo, ni=ni:
                            (b, 0, _live_j(u % ni, j, qo)),
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, u, j, *_, G=G, ni=ni:
                            (b, hk * G + u // ni, u % ni, 0),
                    ),
                    pl.BlockSpec((1, 1, Tp, D),
                                 lambda b, hk, u, j, *_: (b, hk, 0, 0)),
                    pl.BlockSpec((1, 1, Tp, D),
                                 lambda b, hk, u, j, *_: (b, hk, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_q, D), jnp.float32),
                    pltpu.VMEM((Tp, D), jnp.float32),
                    pltpu.VMEM((Tp, D), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
                jax.ShapeDtypeStruct((B, Hkv, Tp, D), k.dtype),
                jax.ShapeDtypeStruct((B, Hkv, Tp, D), v.dtype),
            ],
            interpret=interpret,
        )(q_off_arr, qh, kh, vh, doh, lse, delta, kvm)
        dq = jnp.moveaxis(dq, 1, 2)[:, :S]
        dk = jnp.moveaxis(dk, 1, 2)[:, :T]
        dv = jnp.moveaxis(dv, 1, 2)[:, :T]
        return dq, dk, dv

    # Triangular grids for the SPLIT pair: the same static-live-set contract
    # as the one-pass triangle (causal, no window, S == T, q_offset
    # STATICALLY zero — `tri` certifies it) but for ANY bq/bk ratio, since
    # the tables encode the block-aspect diagonal band. This is the only
    # tri option past _ONEPASS_BWD_MAX_T (the 16k context), where the
    # resident one-pass scratch can never fit.
    # Unlike the one-pass triangle, Sp == Tp / bq == bk are NOT required:
    # the tables encode the exact live predicate for any block aspect, the
    # per-row last-j and per-column first-i are computed from the same
    # predicate in-kernel, and (for S == T) every k block starts below Sp
    # so no dk/dv output block is left unwritten.
    if tri_admissible:
        dq_cells = [(i, j) for i in range(ni) for j in range(nj)
                    if j * block_k <= i * block_q + block_q - 1]
        dq_ti = jnp.asarray([i for i, _j in dq_cells], jnp.int32)
        dq_tj = jnp.asarray([j for _i, j in dq_cells], jnp.int32)
        dq = pl.pallas_call(
            functools.partial(
                _flash_dq_tri_kernel, scale=scale,
                block_q=block_q, block_k=block_k, n_j=nj,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(B, H, len(dq_cells)),
                in_specs=[
                    pl.BlockSpec((1, 1, block_q, D),
                                 lambda b, h, t, qo, ti, tj: (b, h, ti[t], 0)),
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, h, t, qo, ti, tj, G=G:
                            (b, h // G, tj[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, h, t, qo, ti, tj, G=G:
                            (b, h // G, tj[t], 0),
                    ),
                    pl.BlockSpec((1, 1, block_q, D),
                                 lambda b, h, t, qo, ti, tj: (b, h, ti[t], 0)),
                    pl.BlockSpec((1, 1, block_q, _LSE_LANES),
                                 lambda b, h, t, qo, ti, tj: (b, h, ti[t], 0)),
                    pl.BlockSpec((1, 1, block_q, _LSE_LANES),
                                 lambda b, h, t, qo, ti, tj: (b, h, ti[t], 0)),
                    pl.BlockSpec((1, 1, block_k),
                                 lambda b, h, t, qo, ti, tj: (b, 0, tj[t])),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, block_q, D),
                    lambda b, h, t, qo, ti, tj: (b, h, ti[t], 0),
                ),
                scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
            interpret=interpret,
        )(q_off_arr, dq_ti, dq_tj, qh, kh, vh, doh, lse, delta, kvm)

        dkv_cells = [(j, g, i)
                     for j in range(nj) for g in range(G)
                     for i in range((j * block_k) // block_q, ni)]
        kv_tj = jnp.asarray([j for j, _g, _i in dkv_cells], jnp.int32)
        kv_ti = jnp.asarray([i for _j, _g, i in dkv_cells], jnp.int32)
        kv_th = jnp.asarray([g for _j, g, _i in dkv_cells], jnp.int32)
        dk, dv = pl.pallas_call(
            functools.partial(
                _flash_dkv_tri_kernel, scale=scale,
                block_q=block_q, block_k=block_k, n_i=ni, n_g=G,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(B, Hkv, len(dkv_cells)),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, t, qo, tj, ti, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, hk, t, qo, tj, ti, th: (b, hk, tj[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, hk, t, qo, tj, ti, th: (b, hk, tj[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, D),
                        lambda b, hk, t, qo, tj, ti, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, _LSE_LANES),
                        lambda b, hk, t, qo, tj, ti, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_q, _LSE_LANES),
                        lambda b, hk, t, qo, tj, ti, th, G=G:
                            (b, hk * G + th[t], ti[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k),
                        lambda b, hk, t, qo, tj, ti, th: (b, 0, tj[t]),
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, hk, t, qo, tj, ti, th: (b, hk, tj[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, block_k, D),
                        lambda b, hk, t, qo, tj, ti, th: (b, hk, tj[t], 0),
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_k, D), jnp.float32),
                    pltpu.VMEM((block_k, D), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, Hkv, Tp, D), k.dtype),
                jax.ShapeDtypeStruct((B, Hkv, Tp, D), v.dtype),
            ],
            interpret=interpret,
        )(q_off_arr, kv_tj, kv_ti, kv_th, qh, kh, vh, doh, lse, delta, kvm)

        dq = jnp.moveaxis(dq, 1, 2)[:, :S]
        dk = jnp.moveaxis(dk, 1, 2)[:, :T]
        dv = jnp.moveaxis(dv, 1, 2)[:, :T]
        return dq, dk, dv

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, ni, nj),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, block_k, D),
                    lambda b, h, i, j, qo, G=G: (b, h // G, _live_j(i, j, qo), 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_k, D),
                    lambda b, h, i, j, qo, G=G: (b, h // G, _live_j(i, j, qo), 0),
                ),
                pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, _LSE_LANES),
                             lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, _LSE_LANES),
                             lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, block_k),
                    lambda b, h, i, j, qo: (b, 0, _live_j(i, j, qo)),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)
            ),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
        interpret=interpret,
    )(q_off_arr, qh, kh, vh, doh, lse, delta, kvm)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, **common, n_i=ni),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hkv, nj, G * ni),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, D),
                    lambda b, hk, j, u, qo, G=G, ni=ni:
                        (b, hk * G + u // ni, _live_i(j, u, qo), 0),
                ),
                pl.BlockSpec((1, 1, block_k, D),
                             lambda b, hk, j, u, *_: (b, hk, j, 0)),
                pl.BlockSpec((1, 1, block_k, D),
                             lambda b, hk, j, u, *_: (b, hk, j, 0)),
                pl.BlockSpec(
                    (1, 1, block_q, D),
                    lambda b, hk, j, u, qo, G=G, ni=ni:
                        (b, hk * G + u // ni, _live_i(j, u, qo), 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_q, _LSE_LANES),
                    lambda b, hk, j, u, qo, G=G, ni=ni:
                        (b, hk * G + u // ni, _live_i(j, u, qo), 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_q, _LSE_LANES),
                    lambda b, hk, j, u, qo, G=G, ni=ni:
                        (b, hk * G + u // ni, _live_i(j, u, qo), 0),
                ),
                pl.BlockSpec((1, 1, block_k),
                             lambda b, hk, j, u, *_: (b, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_k, D),
                             lambda b, hk, j, u, *_: (b, hk, j, 0)),
                pl.BlockSpec((1, 1, block_k, D),
                             lambda b, hk, j, u, *_: (b, hk, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, Tp, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hkv, Tp, D), v.dtype),
        ],
        interpret=interpret,
    )(q_off_arr, qh, kh, vh, doh, lse, delta, kvm)

    dq = jnp.moveaxis(dq, 1, 2)[:, :S]
    dk = jnp.moveaxis(dk, 1, 2)[:, :T]
    dv = jnp.moveaxis(dv, 1, 2)[:, :T]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# trainable flash prefill (custom VJP: Pallas forward AND backward)
# ---------------------------------------------------------------------------

def flash_prefill_trainable(q, k, v, kv_mask, q_offset=0, causal=True,
                            window=None, scale=None):
    """flash_prefill with a fused Pallas backward (dq/dk/dv recompute-based,
    fp32 accumulation): at the 8k/16k training contexts (SURVEY §6) nothing
    O(S²) materializes in either pass. `q_offset` (traced int) is the
    absolute position of q[:, 0] — 0 in plain training, the device's chunk
    offset under sequence parallelism.

    A STATICALLY-zero q_offset (the plain-training call) is certified here
    — before jit erases the int — so the long-S backward may use the
    triangular grid (its live-cell tables are trace-time constants)."""
    tri = isinstance(q_offset, int) and q_offset == 0
    return _fp_trainable(q, k, v, kv_mask, q_offset, causal, window, scale,
                         tri)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fp_trainable(q, k, v, kv_mask, q_offset, causal, window, scale, tri):
    return flash_prefill(q, k, v, kv_mask, q_offset, causal=causal,
                         window=window, scale=scale)


def _fp_fwd(q, k, v, kv_mask, q_offset, causal, window, scale, tri):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = flash_prefill_with_lse(
        q, k, v, kv_mask, q_offset, causal=causal, window=window, scale=scale,
        tri=tri,
    )
    # named so a remat policy can SAVE the attention residuals instead of
    # re-running the whole O(S²) forward kernel during backward: at the 8k
    # training context that recompute is ~46% of a layer's forward FLOPs,
    # while out+lse cost only (B,S,H,D) bf16 + (B,H,S) fp32 of HBM.
    # ops/layers.py::maybe_checkpoint's "dots_flash" policy uses these.
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, kv_mask, q_offset, out, lse)


def _fp_bwd(causal, window, scale, tri, residuals, g):
    q, k, v, kv_mask, q_offset, out, lse = residuals
    dq, dk, dv = flash_backward(
        q, k, v, kv_mask, out, lse, g, q_offset,
        causal=causal, window=window, scale=scale, tri=tri,
    )
    return dq, dk, dv, None, None


_fp_trainable.defvjp(_fp_fwd, _fp_bwd)


# ---------------------------------------------------------------------------
# batched MQA decode (all batch rows per program — the serving hot kernel)
# ---------------------------------------------------------------------------

def _decode_all_kernel(
    len_ref,        # (2,) [valid len, window start]
    q_ref,          # (B, H, D)
    k_ref,          # (B, bk, D)
    v_ref,          # (B, bk, D)
    kvmask_ref,     # (B, bk)
    o_ref,          # (B, H, D)
    m_scr,          # (B*H, 128)
    l_scr,          # (B*H, 128)
    acc_scr,        # (B*H, D)
    *,
    scale: float,
    block_k: int,
):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    valid_len = len_ref[0]
    win_start = len_ref[1]
    run = jnp.logical_and(
        j * block_k < valid_len, (j + 1) * block_k > win_start
    )

    @pl.when(run)
    def _compute():
        B, H, D = q_ref.shape
        q = q_ref[:]                     # (B, H, D)
        k = k_ref[:]                     # (B, bk, D)
        # batched scores: one MXU pass over all rows/heads
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                        # (B, H, bk)
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (B, H, block_k), 2
        )
        mask = (kvmask_ref[:][:, None, :] > 0) & (k_pos < valid_len)
        mask &= k_pos >= win_start
        s = jnp.where(mask, s, NEG_INF)
        s2 = s.reshape(B * H, block_k)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s2, axis=-1, keepdims=True))
        p = jnp.exp(s2 - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
            l_scr.shape,
        )
        pv = jax.lax.dot_general(
            p.reshape(B, H, block_k).astype(v_ref.dtype), v_ref[:],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                # (B, H, D)
        acc_scr[:] = acc_scr[:] * corr + pv.reshape(B * H, D)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == nj - 1)
    def _finalize():
        B, H, D = q_ref.shape
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[:] = (acc_scr[:] / denom).reshape(B, H, D).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_k", "interpret", "scale")
)
def mqa_decode_batched(
    q: jax.Array,          # (B, H, D)
    k_cache: jax.Array,    # (B, T, D)
    v_cache: jax.Array,    # (B, T, D)
    kv_mask: jax.Array,    # (B, T)
    cache_len: jax.Array,
    window_start: jax.Array | int = 0,
    *,
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Single-token MQA decode, one program per KV block covering ALL batch
    rows and heads (big MXU tiles instead of per-row matvecs)."""
    if interpret is None:
        interpret = _interpret_default()
    B, H, D = q.shape
    T = k_cache.shape[1]
    scale = D**-0.5 if scale is None else scale
    block_k = min(block_k, max(T, 128))
    k_pad = (-T) % block_k
    if k_pad:
        k_cache = jnp.pad(k_cache, ((0, 0), (0, k_pad), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, k_pad), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, k_pad)))
    Tp = T + k_pad

    out = pl.pallas_call(
        functools.partial(_decode_all_kernel, scale=scale, block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Tp // block_k,),
            in_specs=[
                pl.BlockSpec((B, H, D), lambda j, *_: (0, 0, 0)),
                pl.BlockSpec((B, block_k, D), lambda j, *_: (0, j, 0)),
                pl.BlockSpec((B, block_k, D), lambda j, *_: (0, j, 0)),
                pl.BlockSpec((B, block_k), lambda j, *_: (0, j)),
            ],
            out_specs=pl.BlockSpec((B, H, D), lambda j, *_: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((B * H, 128), jnp.float32),
                pltpu.VMEM((B * H, 128), jnp.float32),
                pltpu.VMEM((B * H, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        interpret=interpret,
    )(
        jnp.stack([jnp.asarray(cache_len, jnp.int32),
                   jnp.asarray(window_start, jnp.int32)]),
        q, k_cache, v_cache, kv_mask.astype(jnp.int32),
    )
    return out


def gqa_decode_batched(
    q: jax.Array,          # (B, H, D)
    k_cache: jax.Array,    # (B, T, Hkv, D)
    v_cache: jax.Array,    # (B, T, Hkv, D)
    kv_mask: jax.Array,
    cache_len: jax.Array,
    window_start: jax.Array | int = 0,
    *,
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """GQA wrapper over the batched decode kernel (kv heads fold to batch)."""
    B, H, D = q.shape
    Hkv = k_cache.shape[2]
    G = H // Hkv
    T = k_cache.shape[1]
    qf = q.reshape(B, Hkv, G, D).reshape(B * Hkv, G, D)
    kf = jnp.moveaxis(k_cache, 2, 1).reshape(B * Hkv, T, D)
    vf = jnp.moveaxis(v_cache, 2, 1).reshape(B * Hkv, T, D)
    mf = jnp.repeat(kv_mask, Hkv, axis=0)
    out = mqa_decode_batched(
        qf, kf, vf, mf, cache_len, window_start,
        scale=scale, block_k=block_k, interpret=interpret,
    )
    return out.reshape(B, Hkv, G, D).reshape(B, H, D)


# ---------------------------------------------------------------------------
# MQA decode
# ---------------------------------------------------------------------------

def _decode_kernel(
    len_ref,        # (2,) [valid cache length, window start]
    q_ref,          # (1, H, D)
    k_ref,          # (1, bk, D)
    v_ref,          # (1, bk, D)
    kvmask_ref,     # (1, 1, bk)
    o_ref,          # (1, H, D)
    m_scr,          # (H, 128)
    l_scr,          # (H, 128)
    acc_scr,        # (H, D)
    *,
    scale: float,
    block_k: int,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    valid_len = len_ref[0]
    win_start = len_ref[1]
    # skip blocks beyond the written region or left of the sliding window
    run = jnp.logical_and(
        j * block_k < valid_len, (j + 1) * block_k > win_start
    )

    @pl.when(run)
    def _compute():
        q = q_ref[0]            # (H, D)
        k = k_ref[0]            # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale               # (H, bk)
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (q.shape[0], block_k), 1
        )
        mask = (kvmask_ref[0, 0][None, :] > 0) & (k_pos < valid_len)
        mask &= k_pos >= win_start
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
            l_scr.shape,
        )
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == nj - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_k", "interpret", "scale")
)
def mqa_decode(
    q: jax.Array,          # (B, H, D) single query token per sequence
    k_cache: jax.Array,    # (B, T, D) MQA cache (single KV head)
    v_cache: jax.Array,    # (B, T, D)
    kv_mask: jax.Array,    # (B, T)
    cache_len: jax.Array,  # scalar: number of written slots (bound for skip)
    window_start: jax.Array | int = 0,  # first visible slot (sliding window)
    *,
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Single-token MQA attention over the cache; returns (B, H, D)."""
    if interpret is None:
        interpret = _interpret_default()
    B, H, D = q.shape
    T = k_cache.shape[1]
    scale = D**-0.5 if scale is None else scale
    block_k = min(block_k, max(T, 128))
    k_pad = (-T) % block_k
    if k_pad:
        k_cache = jnp.pad(k_cache, ((0, 0), (0, k_pad), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, k_pad), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, k_pad)))
    Tp = T + k_pad

    grid = (B, Tp // block_k)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, H, D), lambda b, j, *_: (b, 0, 0)),
                pl.BlockSpec((1, block_k, D), lambda b, j, *_: (b, j, 0)),
                pl.BlockSpec((1, block_k, D), lambda b, j, *_: (b, j, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b, j, *_: (b, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, H, D), lambda b, j, *_: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        interpret=interpret,
    )(
        jnp.stack(
            [jnp.asarray(cache_len, jnp.int32),
             jnp.asarray(window_start, jnp.int32)]
        ),
        q, k_cache, v_cache, kv_mask.astype(jnp.int32)[:, None, :],
    )
    return out


def gqa_decode(
    q: jax.Array,          # (B, H, D)
    k_cache: jax.Array,    # (B, T, Hkv, D)
    v_cache: jax.Array,    # (B, T, Hkv, D)
    kv_mask: jax.Array,    # (B, T)
    cache_len: jax.Array,
    window_start: jax.Array | int = 0,
    *,
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Grouped-query decode: folds the KV-head axis into the batch so the
    MQA kernel serves GQA (each kv head handles H/Hkv query heads)."""
    B, H, D = q.shape
    Hkv = k_cache.shape[2]
    G = H // Hkv
    T = k_cache.shape[1]
    qf = q.reshape(B, Hkv, G, D).reshape(B * Hkv, G, D)
    kf = jnp.moveaxis(k_cache, 2, 1).reshape(B * Hkv, T, D)
    vf = jnp.moveaxis(v_cache, 2, 1).reshape(B * Hkv, T, D)
    mf = jnp.repeat(kv_mask, Hkv, axis=0)
    out = mqa_decode(
        qf, kf, vf, mf, cache_len, window_start,
        scale=scale, block_k=block_k, interpret=interpret,
    )
    return out.reshape(B, Hkv, G, D).reshape(B, H, D)
