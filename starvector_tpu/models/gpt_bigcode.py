"""GPTBigCode (StarCoder v1) decoder — TPU-native JAX implementation.

Architecture parity with the reference's vendored decoder (reference:
starvector/model/gpt_bigcode/modeling_gpt_bigcode.py):
  * learned absolute position embeddings `wpe` (:899)
  * Multi-Query Attention: fused c_attn -> [Q(E) | K(D) | V(D)], 1 KV head
    (:106-138, configuration_gpt_bigcode.py:119)
  * pre-LN blocks: ln_1 -> attn -> +res; ln_2 -> mlp(gelu_tanh) -> +res
    (:670-755)
  * fp32 softmax with 1/sqrt(head_dim) scaling (:61-84, :151-226)
  * position ids from attention-mask cumsum, masked positions pinned to 1
    (:980-988)
  * final ln_f; lm_head tied to wte (:1144-1153)

TPU-first design choices (NOT in the reference):
  * layers are stacked on a leading axis and executed with `lax.scan`
    (one compiled block, O(1) compile time in depth; remat-able per layer)
  * KV cache is a preallocated (L, B, T_max, Hkv, D) array updated with
    dynamic_update_slice — no per-step concat, no dynamic shapes
  * weights are (in, out) so the hot matmuls hit the MXU without transposes
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from starvector_tpu.ops.layers import (
    DTypePolicy,
    dense,
    gelu_tanh,
    layer_norm,
    make_dense_params,
    make_layer_norm_params,
    normal_init,
)
from starvector_tpu.ops.attention import make_attention_bias, multihead_attention
from starvector_tpu.parallel.mesh import BATCH_AXES, batch_spec, maybe_constrain, seq_spec
from jax.sharding import PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class GPTBigCodeConfig:
    vocab_size: int = 49152
    n_positions: int = 8192
    hidden_size: int = 2048
    n_layer: int = 24
    n_head: int = 16
    n_inner: int | None = None  # default 4 * hidden
    multi_query: bool = True
    layer_norm_epsilon: float = 1e-5
    initializer_range: float = 0.02
    resid_pdrop: float = 0.1
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    # "xla" (reference path) | "flash" (Pallas prefill + Pallas decode) |
    # "mixed" (Pallas flash prefill, XLA decode — fastest measured combo on
    # v5e: flash prefill is ~6x XLA, but XLA's fused einsum wins the
    # single-token decode step)
    attn_impl: str = "xla"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.n_head

    @property
    def kv_heads(self) -> int:
        return 1 if self.multi_query else self.n_head

    @property
    def inner_dim(self) -> int:
        return self.n_inner or 4 * self.hidden_size


def tiny_config(**kw) -> GPTBigCodeConfig:
    """Small config for tests/goldens."""
    base = dict(
        vocab_size=512, n_positions=128, hidden_size=64, n_layer=2, n_head=4
    )
    base.update(kw)
    return GPTBigCodeConfig(**base)


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init_params(cfg: GPTBigCodeConfig, rng: jax.Array, dtype=jnp.float32) -> dict:
    E, L = cfg.hidden_size, cfg.n_layer
    kv_dim = cfg.kv_heads * cfg.head_dim
    keys = jax.random.split(rng, 8)
    std = cfg.initializer_range
    # GPT-2 depth-scaled init for residual-path projections (reference
    # modeling_gpt_bigcode.py _init_weights)
    resid_std = std / (2 * L) ** 0.5

    def stack(fn):
        # vmap over layer keys: one traced layer body instead of L unrolled
        # copies — an order of magnitude smaller init HLO (compile time is
        # the cold-start floor once dispatch is a single jit call)
        return jax.vmap(fn)(jax.random.split(keys[7], L))

    def layer_params(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "ln_1": make_layer_norm_params(E, dtype),
            "attn": {
                "c_attn": make_dense_params(k1, E, E + 2 * kv_dim, std=std, dtype=dtype),
                "c_proj": make_dense_params(k2, E, E, std=resid_std, dtype=dtype),
            },
            "ln_2": make_layer_norm_params(E, dtype),
            "mlp": {
                "c_fc": make_dense_params(k3, E, cfg.inner_dim, std=std, dtype=dtype),
                "c_proj": make_dense_params(k4, cfg.inner_dim, E, std=resid_std, dtype=dtype),
            },
        }

    return {
        "wte": normal_init(keys[0], (cfg.vocab_size, E), std, dtype),
        "wpe": normal_init(keys[1], (cfg.n_positions, E), std, dtype),
        "layers": stack(layer_params),
        "ln_f": make_layer_norm_params(E, dtype),
    }


def partition_rules() -> list[tuple[str, P]]:
    """Path-regex → PartitionSpec (leading layer axis on stacked params is
    never sharded). TP convention: c_attn/c_fc column-parallel (out dim on
    "tensor"), c_proj row-parallel (in dim on "tensor")."""
    return [
        # Embedding tables shard over ONE axis only: a (fsdp, tensor)
        # double-sharded table is a trigger for an XLA SPMD partitioner
        # miscompilation when gathered/contracted against fsdp-sharded batch
        # (reproduced on the CPU backend, mesh (2,2,2)).
        (r"wte$|wpe$", P("fsdp", None)),
        (r"layers/.*c_attn/kernel", P("stage", "fsdp", "tensor")),
        (r"layers/.*c_attn/bias", P("stage", "tensor")),
        (r"layers/.*attn/c_proj/kernel", P("stage", "tensor", "fsdp")),
        (r"layers/.*attn/c_proj/bias", P("stage", None)),
        (r"layers/.*c_fc/kernel", P("stage", "fsdp", "tensor")),
        (r"layers/.*c_fc/bias", P("stage", "tensor")),
        (r"layers/.*mlp/c_proj/kernel", P("stage", "tensor", "fsdp")),
        (r"layers/.*mlp/c_proj/bias", P("stage", None)),
        (r"layers/.*ln_[12]/", P("stage", None)),
        (r"ln_f/", P(None)),
    ]


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

def init_cache(
    cfg: GPTBigCodeConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> dict:
    from starvector_tpu.models import decode_common as dc

    return dc.init_cache(
        cfg.n_layer, cfg.kv_heads, cfg.head_dim, batch, max_len, dtype
    )


def cache_partition_rules() -> list[tuple[str, P]]:
    from starvector_tpu.parallel.mesh import BATCH_AXES

    return [(r"k$|v$", P(None, BATCH_AXES, None, None, None)),
            (r"k_scale$|v_scale$", P(None, BATCH_AXES, None, None)),
            (r"kv_mask$", P(BATCH_AXES, None)),
            (r"index$", P())]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _attention_block(
    p: dict,
    cfg: GPTBigCodeConfig,
    x: jax.Array,                   # (B, S, E) post-ln_1
    ctx: dict,                      # {"bias"?, "kv_mask", "q_offset"}
    layer_cache: dict | None,       # {'k': (B,T,Hkv,D), 'v': ...} or None
    cache_index,                    # scalar int32
    policy: DTypePolicy,
):
    B, S, E = x.shape
    H, D, Hkv = cfg.n_head, cfg.head_dim, cfg.kv_heads
    qkv = dense(p["c_attn"], x, policy,
                tag="dense_qkv_out")               # (B, S, E + 2*Hkv*D)
    q = qkv[..., :E].reshape(B, S, H, D)
    k = qkv[..., E : E + Hkv * D].reshape(B, S, Hkv, D)
    v = qkv[..., E + Hkv * D :].reshape(B, S, Hkv, D)

    new_cache = None
    if layer_cache is not None:
        from starvector_tpu.models import decode_common as dc

        k, v, new_cache = dc.write_prefill_kv(
            layer_cache, k, v, cache_index, x.dtype
        )

    is_decode = S == 1 and layer_cache is not None
    impl = cfg.attn_impl
    if impl == "mixed":
        impl = "xla" if is_decode else "flash"
    if impl == "flash":
        from starvector_tpu.ops.flash_attention import (
            flash_prefill,
            gqa_decode_batched as gqa_decode,
        )

        if is_decode:
            out = gqa_decode(
                q[:, 0], k, v, ctx["kv_mask"], ctx["q_offset"] + 1
            )[:, None]
        elif layer_cache is None:
            # training path: differentiable wrapper; sequence-parallel when
            # the ambient mesh has a `sequence` axis (no-op otherwise)
            from starvector_tpu.parallel.sequence import sp_flash_attention

            out = sp_flash_attention(q, k, v, ctx["kv_mask"])
        else:
            out = flash_prefill(
                q, k, v, ctx["kv_mask"], q_offset=ctx["q_offset"]
            )
    else:
        out = multihead_attention(q, k, v, ctx["bias"])
    out = out.reshape(B, S, E)
    return dense(p["c_proj"], out, policy,
                 tag="dense_attn_proj_out"), new_cache


def _block(p, cfg, x, ctx, layer_cache, cache_index, policy):
    attn_out, new_cache = _attention_block(
        p["attn"], cfg, layer_norm(p["ln_1"], x, cfg.layer_norm_epsilon),
        ctx, layer_cache, cache_index, policy,
    )
    x = x + attn_out
    h = layer_norm(p["ln_2"], x, cfg.layer_norm_epsilon)
    h = dense(p["mlp"]["c_fc"], h, policy)
    h = gelu_tanh(h)
    h = dense(p["mlp"]["c_proj"], h, policy)
    return x + h, new_cache


def compute_position_ids(attention_mask: jax.Array) -> jax.Array:
    """cumsum(mask)-1, masked positions pinned to 1 (reference :980-988)."""
    pos = jnp.cumsum(attention_mask, axis=-1) - 1
    return jnp.where(attention_mask == 0, 1, pos).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "policy", "remat", "return_hidden",
                     "last_logits_only", "fast_path"),
)
def forward(
    params: dict,
    cfg: GPTBigCodeConfig,
    inputs_embeds: jax.Array,              # (B, S, E)
    attention_mask: jax.Array | None = None,  # (B, S) over the new tokens
    position_ids: jax.Array | None = None,    # (B, S) absolute positions
    cache: dict | None = None,
    *,
    policy: DTypePolicy = DTypePolicy(),
    remat: bool = False,
    return_hidden: bool = False,
    last_logits_only: bool = False,
    fast_path: bool = True,   # False = naive scan-ys decode (bench baseline)
) -> tuple[jax.Array, dict | None]:
    """Run the decoder. Without `cache`: full-sequence (training) forward.
    With `cache`: writes the S new tokens at cache.index and attends over the
    whole preallocated window (prefill and decode share this path).

    Returns (logits (B, S, V) fp32 — or final hidden if return_hidden — ,
    updated cache or None).
    """
    B, S, E = inputs_embeds.shape
    x = policy.cast(inputs_embeds)

    # bias is only needed where the XLA attention path will run
    is_decode_call = cache is not None and inputs_embeds.shape[1] == 1
    use_flash = cfg.attn_impl == "flash" or (
        cfg.attn_impl == "mixed" and not is_decode_call
    )
    if cache is None:
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.int32)
        if position_ids is None:
            position_ids = compute_position_ids(attention_mask)
        # key mask replicated over `sequence` ONCE here — every layer's SP
        # attention region declares it replicated, so no per-layer gather
        kv_mask_full = maybe_constrain(
            attention_mask.astype(jnp.int32), P(BATCH_AXES, None)
        )
        ctx = {"kv_mask": kv_mask_full, "q_offset": 0}
        if not use_flash:
            ctx["bias"] = make_attention_bias(attention_mask, S, S, causal=True)
        new_index = None
        kv_mask = None
    else:
        idx = cache["index"]
        T = cache["k"].shape[2]
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.int32)
        # absolute positions continue from the number of *real* tokens each
        # sequence has seen (left-padded prefixes ⇒ per-sequence offsets)
        if position_ids is None:
            prev = jnp.sum(cache["kv_mask"], axis=-1, dtype=jnp.int32)  # (B,)
            position_ids = prev[:, None] + compute_position_ids(attention_mask)
            position_ids = jnp.where(attention_mask == 0, 1, position_ids)
        kv_mask = jax.lax.dynamic_update_slice(
            cache["kv_mask"], attention_mask.astype(jnp.int32), (0, idx)
        )
        ctx = {"kv_mask": kv_mask, "q_offset": idx}
        if not use_flash:
            # causal within the window: key slot t attends iff t < idx + s + 1
            slot = jnp.arange(T)[None, None, :]                # (1, 1, T)
            qslot = idx + jnp.arange(S)[None, :, None]         # (1, S, 1)
            causal_ok = slot <= qslot
            from starvector_tpu.ops.attention import NEG_INF

            allowed = causal_ok & (kv_mask[:, None, :] > 0)
            ctx["bias"] = jnp.where(allowed, 0.0, NEG_INF)[:, None].astype(
                jnp.float32
            )
        new_index = idx + S

    position_ids = jnp.clip(position_ids, 0, cfg.n_positions - 1)
    # All-gather the (small) position table before indexing: a gather from an
    # fsdp-sharded table feeding the layer scan miscompiles in the SPMD
    # partitioner (observed on CPU at mesh (2,2,2)); replicate-then-gather is
    # the collective XLA would insert anyway, minus the bug.
    wpe_full = maybe_constrain(params["wpe"], P(None, None))
    pe = wpe_full[position_ids]
    x = x + policy.cast(pe)
    # training activations also shard S over the `sequence` axis (context
    # parallelism); cached/decode calls keep the batch-only layout so the
    # Pallas prefill/decode kernels see sequence-local shapes
    x = maybe_constrain(
        x, seq_spec(1) if cache is None else batch_spec(extra_dims=2)
    )

    if cache is None:
        from starvector_tpu.parallel.pipeline import pp_layer_scan

        def pp_body(h, layer_p, arrays):
            h, _ = _block(
                layer_p, cfg, h, {**arrays, "q_offset": 0}, None, 0, policy
            )
            return h

        # batch-aligned ctx arrays travel with their microbatch; pipelined
        # over the `stage` mesh axis when present (plain scan otherwise);
        # partition rules keep layer weights fsdp-sharded through the region
        arrays = {k: v for k, v in ctx.items() if k != "q_offset"}
        x = pp_layer_scan(params["layers"], x, arrays, pp_body, remat=remat,
                          rules=partition_rules())
        new_cache = None
    elif S == 1 and fast_path:
        # decode fast path (ALL attn impls — the analytic softmax merge
        # beats both the Pallas decode kernel and the scan-ys rewrite for a
        # single token): layers emit only their NEW k/v token; the big cache
        # is written once after the scan. The naive scan-ys variant
        # re-materializes the full (L,B,T,…) cache every step (~2x cache
        # traffic).
        x, new_cache = _decode_step(params, cfg, x, cache, kv_mask, policy)
        new_cache["index"] = new_index
    elif fast_path and S <= 64:
        # small-chunk fast path (chunked prefill riding inside decode
        # steps, generation/engine.py::generate_pipelined): same
        # write-once discipline as S==1 — the generic branch below would
        # re-materialize the whole (L, B, T, ...) cache per chunk, which
        # measured SLOWER than serial prefill (4.7K vs 7.0K tok/s e2e)
        x, new_cache = _chunk_step(
            params, cfg, x, cache, kv_mask, attention_mask, policy
        )
        new_cache["index"] = new_index
    else:
        cache_keys = tuple(
            k for k in ("k", "v", "k_scale", "v_scale") if k in cache
        )

        def body(h, xs):
            layer_p = xs[0]
            layer_cache = dict(zip(cache_keys, xs[1:]))
            h, upd = _block(
                layer_p, cfg, h, ctx, layer_cache, cache["index"], policy
            )
            return h, tuple(upd[k] for k in cache_keys)

        x, upds = jax.lax.scan(
            body, x, (params["layers"], *(cache[k] for k in cache_keys))
        )
        new_cache = dict(zip(cache_keys, upds))
        new_cache.update(index=new_index, kv_mask=kv_mask)

    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    if return_hidden:
        return x, new_cache
    if last_logits_only:
        # generation prefill only needs the last position: skips a
        # (B, S, vocab) fp32 materialization (12.9 GB at B=64, S=1024)
        x = x[:, -1:]
    logits = jnp.einsum(
        "bse,ve->bsv", policy.cast(x), policy.cast(params["wte"]),
        preferred_element_type=jnp.float32,
    )
    logits = maybe_constrain(logits, batch_spec(extra_dims=2))
    return logits, new_cache


def _decode_layer_fn(cfg: GPTBigCodeConfig, old_mask, policy):
    """Per-layer single-token decode callback for decode_common.decode_scan:
    ln_1 → fused c_attn split → merged-softmax attention → residual MLP."""
    from starvector_tpu.models import decode_common as dc

    E, H, D, Hkv = cfg.hidden_size, cfg.n_head, cfg.head_dim, cfg.kv_heads
    G = H // Hkv
    scale = D**-0.5

    def fn(layer_p, h, lk, lv, lks=None, lvs=None):
        B = h.shape[0]
        hh = layer_norm(layer_p["ln_1"], h, cfg.layer_norm_epsilon)
        qkv = dense(layer_p["attn"]["c_attn"], hh, policy)
        q = qkv[..., :E].reshape(B, Hkv, G, D)
        k_new = qkv[..., E : E + Hkv * D].reshape(B, Hkv, D)
        v_new = qkv[..., E + Hkv * D :].reshape(B, Hkv, D)
        out = dc.merged_decode_attention(
            q, k_new, v_new, lk, lv, old_mask, scale,
            k_scale=lks, v_scale=lvs,
        )
        h = h + dense(layer_p["attn"]["c_proj"], out, policy)
        hh = layer_norm(layer_p["ln_2"], h, cfg.layer_norm_epsilon)
        hh = dense(layer_p["mlp"]["c_fc"], hh, policy)
        hh = gelu_tanh(hh)
        h = h + dense(layer_p["mlp"]["c_proj"], hh, policy)
        return h, k_new, v_new

    return fn


def _decode_step(params, cfg, x, cache, kv_mask, policy):
    """Single-token cached decode with small scan outputs (see forward).
    `kv_mask` already includes the new token's slot; the cached arrays do
    NOT yet contain the new k/v, whose contribution is merged analytically
    into the softmax."""
    from starvector_tpu.models import decode_common as dc

    idx = cache["index"]
    T = cache["k"].shape[2]
    # mask over cached slots only (exclude the new token's slot)
    old_mask = kv_mask & (jnp.arange(T)[None, :] < idx)
    x, news = dc.decode_scan(
        params["layers"], cache, x, _decode_layer_fn(cfg, old_mask, policy)
    )
    new_cache = dc.write_new_kv_linear(cache, news, idx)
    new_cache["kv_mask"] = kv_mask
    return x, new_cache


def _chunk_step(params, cfg, x, cache, kv_mask, chunk_mask, policy):
    """Multi-token cached step: the S-token chunk attends to
    [cache window ‖ chunk≤self] and only the chunk's k/v are written
    (decode_common.write_new_kv_linear) — no full-cache rewrite. Padded
    chunk positions (left-padded prompts) are hidden from real queries and
    land in cache slots that kv_mask already marks invalid."""
    from starvector_tpu.models import decode_common as dc

    idx = cache["index"]
    T = cache["k"].shape[2]
    old_mask = kv_mask & (jnp.arange(T)[None, :] < idx)
    x, news = dc.decode_scan(
        params["layers"], cache, x,
        _verify_layer_fn(cfg, old_mask, policy, new_mask=chunk_mask),
    )
    new_cache = dc.write_new_kv_linear_multi(cache, news, idx)
    new_cache["kv_mask"] = kv_mask
    return x, new_cache


def forward_decode_with_chunk(
    params: dict,
    cfg: GPTBigCodeConfig,
    dec_embeds: jax.Array,     # (B, 1, E) next-token embeds (wpe added here)
    cache: dict,               # current batch's cache (compute-dtype kv)
    chunk_embeds: jax.Array,   # (B, C, E) next batch's prompt chunk
    chunk_mask: jax.Array,     # (B, C)
    cache_next: dict,          # next batch's cache being prefilled
    *,
    policy: DTypePolicy = DTypePolicy(),
):
    """ONE layer scan that decodes the current batch AND prefills a chunk of
    the NEXT batch's prompt — each layer's weights stream from HBM once for
    both (generation/engine.py::generate_pipelined). Running them as two
    forwards reads every weight twice per step, which measured SLOWER than
    serial prefill+decode (6.4K vs 7.0K tok/s e2e at B=64/1k ctx); fused,
    the chunk's MXU work hides the decode's weight streaming.

    int8 caches (both caches carry k_scale/v_scale): the decode and chunk
    attentions fold the per-(position, head) scales into their score
    tensors exactly like the serving engine's ticks, and emitted K/V
    quantize on write — the chunk's growing-cache reads (the pipelined
    roofline's irreducible term, ~2.4 ms/step at C=4 bf16) stream half
    the bytes. Returns (dec_logits (B, V), new_cache,
    chunk_logits (B, C, V) fp32, new_cache_next)."""
    from starvector_tpu.models import decode_common as dc

    quant = "k_scale" in cache
    if quant != ("k_scale" in cache_next):
        raise ValueError("fused decode+chunk: cache dtypes must match")

    B, C, E = chunk_embeds.shape
    H, D, Hkv = cfg.n_head, cfg.head_dim, cfg.kv_heads
    G = H // Hkv
    scale = D**-0.5

    # positions + masks, same derivations as forward()'s cached branch
    idx_d = cache["index"]
    T_d = cache["k"].shape[2]
    pos_d = jnp.sum(cache["kv_mask"], axis=-1, dtype=jnp.int32)[:, None]
    kv_mask_d = jax.lax.dynamic_update_slice(
        cache["kv_mask"], jnp.ones((B, 1), jnp.int32), (0, idx_d)
    )
    old_mask_d = kv_mask_d & (jnp.arange(T_d)[None, :] < idx_d)

    idx_c = cache_next["index"]
    T_c = cache_next["k"].shape[2]
    prev_c = jnp.sum(cache_next["kv_mask"], axis=-1, dtype=jnp.int32)
    pos_c = prev_c[:, None] + compute_position_ids(chunk_mask)
    pos_c = jnp.where(chunk_mask == 0, 1, pos_c)
    kv_mask_c = jax.lax.dynamic_update_slice(
        cache_next["kv_mask"], chunk_mask.astype(jnp.int32), (0, idx_c)
    )
    old_mask_c = kv_mask_c & (jnp.arange(T_c)[None, :] < idx_c)

    wpe_full = maybe_constrain(params["wpe"], P(None, None))
    x_d = policy.cast(dec_embeds) + policy.cast(
        wpe_full[jnp.clip(pos_d, 0, cfg.n_positions - 1)])
    x_c = policy.cast(chunk_embeds) + policy.cast(
        wpe_full[jnp.clip(pos_c, 0, cfg.n_positions - 1)])

    eps = cfg.layer_norm_epsilon

    def body(carry, xs):
        h_d, h_c = carry
        if quant:
            layer_p, ldk, ldv, lnk, lnv, ldks, ldvs, lnks, lnvs = xs
        else:
            layer_p, ldk, ldv, lnk, lnv = xs
            ldks = ldvs = lnks = lnvs = None
        # shared projections: ONE weight read serves decode + chunk rows
        h_cat = jnp.concatenate([h_d, h_c], axis=1)          # (B, 1+C, E)
        hh = layer_norm(layer_p["ln_1"], h_cat, eps)
        qkv = dense(layer_p["attn"]["c_attn"], hh, policy)
        q_all = qkv[..., :E]
        k_all = qkv[..., E:E + Hkv * D]
        v_all = qkv[..., E + Hkv * D:]

        q_d = q_all[:, 0].reshape(B, Hkv, G, D)
        out_d = dc.merged_decode_attention(
            q_d, k_all[:, 0].reshape(B, Hkv, D),
            v_all[:, 0].reshape(B, Hkv, D), ldk, ldv, old_mask_d, scale,
            k_scale=ldks, v_scale=ldvs,
        )
        q_c = jnp.moveaxis(q_all[:, 1:].reshape(B, C, Hkv, G, D), 1, 3)
        k_c = k_all[:, 1:].reshape(B, C, Hkv, D)
        v_c = v_all[:, 1:].reshape(B, C, Hkv, D)
        out_c = dc.merged_verify_attention(
            q_c, k_c, v_c, lnk, lnv, old_mask_c, scale,
            k_scale=lnks, v_scale=lnvs, new_mask=chunk_mask,
        )

        out_cat = jnp.concatenate([out_d, out_c], axis=1)
        h_cat = h_cat + dense(layer_p["attn"]["c_proj"], out_cat, policy)
        hh = layer_norm(layer_p["ln_2"], h_cat, eps)
        hh = dense(layer_p["mlp"]["c_fc"], hh, policy)
        hh = gelu_tanh(hh)
        h_cat = h_cat + dense(layer_p["mlp"]["c_proj"], hh, policy)
        dk = k_all[:, 0].reshape(B, Hkv, D)
        dv = v_all[:, 0].reshape(B, Hkv, D)
        if quant:
            dkq, dks = dc.quantize_kv(dk)
            dvq, dvs = dc.quantize_kv(dv)
            ckq, cks = dc.quantize_kv(k_c)
            cvq, cvs = dc.quantize_kv(v_c)
            news = {"dk": dkq, "dv": dvq, "ck": ckq, "cv": cvq,
                    "dk_scale": dks, "dv_scale": dvs,
                    "ck_scale": cks, "cv_scale": cvs}
        else:
            news = {
                "dk": dk.astype(cache["k"].dtype),
                "dv": dv.astype(cache["v"].dtype),
                "ck": k_c.astype(cache_next["k"].dtype),
                "cv": v_c.astype(cache_next["v"].dtype),
            }
        return (h_cat[:, :1], h_cat[:, 1:]), news

    xs = (params["layers"], cache["k"], cache["v"],
          cache_next["k"], cache_next["v"])
    if quant:
        xs = xs + (cache["k_scale"], cache["v_scale"],
                   cache_next["k_scale"], cache_next["v_scale"])
    (h_d, h_c), news = jax.lax.scan(body, (x_d, x_c), xs)

    dec_news = {"k": news["dk"], "v": news["dv"]}
    chunk_news = {"k": news["ck"], "v": news["cv"]}
    if quant:
        dec_news.update(k_scale=news["dk_scale"], v_scale=news["dv_scale"])
        chunk_news.update(k_scale=news["ck_scale"], v_scale=news["cv_scale"])
    new_cache = dc.write_new_kv_linear(cache, dec_news, idx_d)
    new_cache["kv_mask"] = kv_mask_d
    new_cache["index"] = idx_d + 1
    new_cache_next = dc.write_new_kv_linear_multi(
        cache_next, chunk_news, idx_c)
    new_cache_next["kv_mask"] = kv_mask_c
    new_cache_next["index"] = idx_c + C

    table = policy.cast(params["wte"])
    h_d = layer_norm(params["ln_f"], h_d, eps)
    dec_logits = jnp.einsum(
        "bse,ve->bsv", policy.cast(h_d), table,
        preferred_element_type=jnp.float32,
    )[:, 0]
    h_c = layer_norm(params["ln_f"], h_c, eps)
    chunk_logits = jnp.einsum(
        "bse,ve->bsv", policy.cast(h_c), table,
        preferred_element_type=jnp.float32,
    )
    return dec_logits, new_cache, chunk_logits, new_cache_next


def init_ragged_cache(
    cfg: GPTBigCodeConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> dict:
    """Cache with PER-SLOT lengths for continuous batching (serving): each
    batch row advances independently."""
    from starvector_tpu.models import decode_common as dc

    return dc.init_ragged_cache(
        cfg.n_layer, cfg.kv_heads, cfg.head_dim, batch, max_len, dtype
    )


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def forward_ragged_decode(
    params: dict,
    cfg: GPTBigCodeConfig,
    token_ids: jax.Array,     # (B,) next token per slot
    cache: dict,              # ragged cache (init_ragged_cache)
    active: jax.Array,        # (B,) 1 = slot holds a live sequence
    *,
    policy: DTypePolicy = DTypePolicy(),
):
    """One decode step where every slot sits at its own cache position
    (the continuous-batching hot path). Inactive slots still compute but
    don't advance their cache. Returns (logits (B, V), new_cache)."""
    from starvector_tpu.models import decode_common as dc

    x = policy.cast(embed_tokens(params, token_ids[:, None]))  # (B, 1, E)
    positions = cache["lengths"][:, None]                      # (B, 1)
    pe = maybe_constrain(params["wpe"], P(None, None))[
        jnp.clip(positions, 0, cfg.n_positions - 1)
    ]
    x = x + policy.cast(pe)

    write_pos, kv_mask, old_mask = dc.ragged_step_masks(cache, active, None)
    x, news = dc.decode_scan(
        params["layers"], cache, x, _decode_layer_fn(cfg, old_mask, policy)
    )
    new_cache = dc.write_new_kv_ragged(cache, news, write_pos)
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    logits = jnp.einsum(
        "bse,ve->bsv", policy.cast(x), policy.cast(params["wte"]),
        preferred_element_type=jnp.float32,
    )[:, 0]
    new_cache["lengths"] = cache["lengths"] + active.astype(jnp.int32)
    new_cache["kv_mask"] = kv_mask
    return logits, new_cache


def _verify_layer_fn(cfg: GPTBigCodeConfig, old_mask, policy,
                     new_mask=None):
    """Per-layer W-token verify callback (speculative decoding / chunked
    cached prefill): like _decode_layer_fn but the chunk's queries attend
    to [cache ‖ chunk≤self] via decode_common.merged_verify_attention.
    `new_mask` hides padded chunk keys (left-padded chunked prefill)."""
    from starvector_tpu.models import decode_common as dc

    E, H, D, Hkv = cfg.hidden_size, cfg.n_head, cfg.head_dim, cfg.kv_heads
    G = H // Hkv
    scale = D**-0.5

    def fn(layer_p, h, lk, lv, lks=None, lvs=None):
        B, W, _ = h.shape
        hh = layer_norm(layer_p["ln_1"], h, cfg.layer_norm_epsilon)
        qkv = dense(layer_p["attn"]["c_attn"], hh, policy)
        q = jnp.moveaxis(
            qkv[..., :E].reshape(B, W, Hkv, G, D), 1, 3
        )                                              # (B, Hkv, G, W, D)
        k_new = qkv[..., E : E + Hkv * D].reshape(B, W, Hkv, D)
        v_new = qkv[..., E + Hkv * D :].reshape(B, W, Hkv, D)
        out = dc.merged_verify_attention(
            q, k_new, v_new, lk, lv, old_mask, scale,
            k_scale=lks, v_scale=lvs, new_mask=new_mask,
        )
        h = h + dense(layer_p["attn"]["c_proj"], out, policy)
        hh = layer_norm(layer_p["ln_2"], h, cfg.layer_norm_epsilon)
        hh = dense(layer_p["mlp"]["c_fc"], hh, policy)
        hh = gelu_tanh(hh)
        h = h + dense(layer_p["mlp"]["c_proj"], hh, policy)
        return h, k_new, v_new

    return fn


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def forward_ragged_verify(
    params: dict,
    cfg: GPTBigCodeConfig,
    token_ids: jax.Array,     # (B, W): [last accepted token ‖ drafts]
    cache: dict,              # ragged cache (init_ragged_cache)
    active: jax.Array,        # (B,)
    *,
    policy: DTypePolicy = DTypePolicy(),
):
    """Speculative-verification forward: every slot processes a W-token
    chunk starting at its own cache position, producing logits for all W
    positions in ONE pass over the cache. The chunk's K/V are written at
    lengths[b]+[0..W) but `lengths`/`kv_mask` are NOT advanced — the caller
    commits only the accepted tokens via decode_common.commit_verify, which
    leaves rejected positions masked (stale data there is invisible and is
    overwritten by the next write at the same slot). `active` is accepted
    for signature parity with forward_ragged_decode; inactive rows compute
    garbage and commit nothing (the caller's n_commit is 0 for them).
    Returns (logits (B, W, V) fp32, new_cache)."""
    from starvector_tpu.models import decode_common as dc

    del active  # rows are gated at commit time (n_commit = 0)
    B, W = token_ids.shape
    x = policy.cast(embed_tokens(params, token_ids))   # (B, W, E)
    positions = cache["lengths"][:, None] + jnp.arange(W)[None, :]
    pe = maybe_constrain(params["wpe"], P(None, None))[
        jnp.clip(positions, 0, cfg.n_positions - 1)
    ]
    x = x + policy.cast(pe)

    T = cache["k"].shape[2]
    write_pos = jnp.clip(positions, 0, T - 1)          # (B, W)
    old_mask = cache["kv_mask"]
    x, news = dc.decode_scan(
        params["layers"], cache, x, _verify_layer_fn(cfg, old_mask, policy)
    )
    new_cache = dc.write_new_kv_ragged_multi(cache, news, write_pos)
    x = layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)
    logits = jnp.einsum(
        "bse,ve->bsv", policy.cast(x), policy.cast(params["wte"]),
        preferred_element_type=jnp.float32,
    )
    new_cache["lengths"] = cache["lengths"]
    new_cache["kv_mask"] = cache["kv_mask"]
    return logits, new_cache


def forward_ragged_verify_with_chunk(
    params: dict,
    cfg: GPTBigCodeConfig,
    token_ids: jax.Array,      # (B, W): [last accepted token ‖ drafts]
    cache: dict,               # current batch's RAGGED cache
    chunk_embeds: jax.Array,   # (B, C, E) next batch's prompt chunk
    chunk_mask: jax.Array,     # (B, C) — right-padded rows: 1 = real token
    cache_next: dict,          # next batch's LINEAR cache being prefilled
    *,
    policy: DTypePolicy = DTypePolicy(),
):
    """ONE layer scan that speculatively VERIFIES the current batch's W-token
    proposals (forward_ragged_verify semantics: per-slot positions, K/V
    written at lengths+[0..W) but not committed) AND prefills a C-position
    chunk of the NEXT batch's prompt — the composition of the repo's two
    strongest measured levers (generation/engine.py::generate_pipelined_spec).
    Each layer's weights stream from HBM once for the W+C concatenated rows;
    the verify side's multi-token GEMMs already amortize the weight read, and
    the chunk rides the same read for free.

    int8 caches: both caches carry k_scale/v_scale; scales fold into the
    score/value einsums exactly like the serving ticks, and new K/V quantize
    on write.

    Returns (verify_logits (B, W, V) fp32, new_cache (ragged; caller commits
    accepted counts via decode_common.commit_verify), chunk_hidden (B, C, E)
    post-ln_f — the caller projects only the positions it needs —, and
    new_cache_next with index advanced by C)."""
    from starvector_tpu.models import decode_common as dc

    quant = "k_scale" in cache
    if quant != ("k_scale" in cache_next):
        raise ValueError("fused verify+chunk: cache dtypes must match")

    B, W = token_ids.shape
    C, E = chunk_embeds.shape[1], chunk_embeds.shape[2]
    H, D, Hkv = cfg.n_head, cfg.head_dim, cfg.kv_heads
    G = H // Hkv
    scale = D**-0.5
    eps = cfg.layer_norm_epsilon

    # verify side: per-slot positions from the ragged lengths
    positions_v = cache["lengths"][:, None] + jnp.arange(W)[None, :]
    T_v = cache["k"].shape[2]
    write_pos_v = jnp.clip(positions_v, 0, T_v - 1)     # (B, W)
    old_mask_v = cache["kv_mask"]

    # chunk side: shared-index linear prefill (same derivations as
    # forward_decode_with_chunk's chunk segment)
    idx_c = cache_next["index"]
    T_c = cache_next["k"].shape[2]
    prev_c = jnp.sum(cache_next["kv_mask"], axis=-1, dtype=jnp.int32)
    pos_c = prev_c[:, None] + compute_position_ids(chunk_mask)
    pos_c = jnp.where(chunk_mask == 0, 1, pos_c)
    kv_mask_c = jax.lax.dynamic_update_slice(
        cache_next["kv_mask"], chunk_mask.astype(jnp.int32), (0, idx_c)
    )
    old_mask_c = kv_mask_c & (jnp.arange(T_c)[None, :] < idx_c)

    wpe_full = maybe_constrain(params["wpe"], P(None, None))
    x_v = policy.cast(embed_tokens(params, token_ids)) + policy.cast(
        wpe_full[jnp.clip(positions_v, 0, cfg.n_positions - 1)])
    x_c = policy.cast(chunk_embeds) + policy.cast(
        wpe_full[jnp.clip(pos_c, 0, cfg.n_positions - 1)])

    def body(carry, xs):
        h_v, h_c = carry
        if quant:
            layer_p, lvk, lvv, lnk, lnv, lvks, lvvs, lnks, lnvs = xs
        else:
            layer_p, lvk, lvv, lnk, lnv = xs
            lvks = lvvs = lnks = lnvs = None
        # shared projections: ONE weight read serves verify + chunk rows
        h_cat = jnp.concatenate([h_v, h_c], axis=1)          # (B, W+C, E)
        hh = layer_norm(layer_p["ln_1"], h_cat, eps)
        qkv = dense(layer_p["attn"]["c_attn"], hh, policy)
        q_all = qkv[..., :E]
        k_all = qkv[..., E:E + Hkv * D]
        v_all = qkv[..., E + Hkv * D:]

        q_v = jnp.moveaxis(q_all[:, :W].reshape(B, W, Hkv, G, D), 1, 3)
        k_v = k_all[:, :W].reshape(B, W, Hkv, D)
        v_v = v_all[:, :W].reshape(B, W, Hkv, D)
        out_v = dc.merged_verify_attention(
            q_v, k_v, v_v, lvk, lvv, old_mask_v, scale,
            k_scale=lvks, v_scale=lvvs,
        )
        q_c = jnp.moveaxis(q_all[:, W:].reshape(B, C, Hkv, G, D), 1, 3)
        k_c = k_all[:, W:].reshape(B, C, Hkv, D)
        v_c = v_all[:, W:].reshape(B, C, Hkv, D)
        out_c = dc.merged_verify_attention(
            q_c, k_c, v_c, lnk, lnv, old_mask_c, scale,
            k_scale=lnks, v_scale=lnvs, new_mask=chunk_mask,
        )

        out_cat = jnp.concatenate([out_v, out_c], axis=1)
        h_cat = h_cat + dense(layer_p["attn"]["c_proj"], out_cat, policy)
        hh = layer_norm(layer_p["ln_2"], h_cat, eps)
        hh = dense(layer_p["mlp"]["c_fc"], hh, policy)
        hh = gelu_tanh(hh)
        h_cat = h_cat + dense(layer_p["mlp"]["c_proj"], hh, policy)
        if quant:
            vkq, vks = dc.quantize_kv(k_v)
            vvq, vvs = dc.quantize_kv(v_v)
            ckq, cks = dc.quantize_kv(k_c)
            cvq, cvs = dc.quantize_kv(v_c)
            news = {"vk": vkq, "vv": vvq, "ck": ckq, "cv": cvq,
                    "vk_scale": vks, "vv_scale": vvs,
                    "ck_scale": cks, "cv_scale": cvs}
        else:
            news = {
                "vk": k_v.astype(cache["k"].dtype),
                "vv": v_v.astype(cache["v"].dtype),
                "ck": k_c.astype(cache_next["k"].dtype),
                "cv": v_c.astype(cache_next["v"].dtype),
            }
        return (h_cat[:, :W], h_cat[:, W:]), news

    xs = (params["layers"], cache["k"], cache["v"],
          cache_next["k"], cache_next["v"])
    if quant:
        xs = xs + (cache["k_scale"], cache["v_scale"],
                   cache_next["k_scale"], cache_next["v_scale"])
    (h_v, h_c), news = jax.lax.scan(body, (x_v, x_c), xs)

    verify_news = {"k": news["vk"], "v": news["vv"]}
    chunk_news = {"k": news["ck"], "v": news["cv"]}
    if quant:
        verify_news.update(k_scale=news["vk_scale"],
                           v_scale=news["vv_scale"])
        chunk_news.update(k_scale=news["ck_scale"], v_scale=news["cv_scale"])
    new_cache = dc.write_new_kv_ragged_multi(cache, verify_news, write_pos_v)
    new_cache["lengths"] = cache["lengths"]
    new_cache["kv_mask"] = cache["kv_mask"]
    new_cache_next = dc.write_new_kv_linear_multi(
        cache_next, chunk_news, idx_c)
    new_cache_next["kv_mask"] = kv_mask_c
    new_cache_next["index"] = idx_c + C

    table = policy.cast(params["wte"])
    h_v = layer_norm(params["ln_f"], h_v, eps)
    verify_logits = jnp.einsum(
        "bse,ve->bsv", policy.cast(h_v), table,
        preferred_element_type=jnp.float32,
    )
    chunk_hidden = layer_norm(params["ln_f"], h_c, eps)
    return verify_logits, new_cache, chunk_hidden, new_cache_next


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def insert_prefill_rows(
    cfg: GPTBigCodeConfig,
    ragged_cache: dict,
    small_cache: dict,   # a B=k cache from a batched admission prefill
    slots: jax.Array,    # (k,) slot indices
    lengths: jax.Array,  # (k,) valid token counts
):
    """Admit k same-bucket prefilled requests in one scatter."""
    from starvector_tpu.models import decode_common as dc

    return dc.insert_prefill_rows(ragged_cache, small_cache, slots, lengths)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def insert_prefill(
    cfg: GPTBigCodeConfig,
    ragged_cache: dict,
    small_cache: dict,   # a B=1 cache from a normal cached prefill
    slot: jax.Array,     # scalar slot index
    length: jax.Array,   # number of valid tokens in the small cache
):
    """Admit a prefilled request into slot `slot` of the serving cache."""
    from starvector_tpu.models import decode_common as dc

    return dc.insert_prefill(ragged_cache, small_cache, slot, length)


def embed_tokens(params: dict, input_ids: jax.Array) -> jax.Array:
    """Token embedding lookup (the task model concatenates visual prefixes
    before calling forward with inputs_embeds, reference
    starvector_base.py:150-172)."""
    wte_full = maybe_constrain(params["wte"], P(None, None))
    return maybe_constrain(wte_full[input_ids], batch_spec(extra_dims=2))


def lm_head_table(params: dict, cfg: GPTBigCodeConfig) -> jax.Array:
    return params["wte"]  # tied (reference modeling_gpt_bigcode.py:1144-1153)


def causal_lm_loss_fused(
    head_table: jax.Array,  # (V, E) tied lm head
    hidden: jax.Array,      # (B, S, E) final hidden states
    labels: jax.Array,      # (B, S) int32, -100 = ignored
    *,
    policy: DTypePolicy = DTypePolicy(),
    chunk: int = 128,
) -> jax.Array:
    """Shift-by-one CE with the LM head fused into a chunked scan: the full
    (B, S, vocab) logits (and their cotangent) never materialize — at
    B=8, S=1.5k, V=49k that's ~2.4 GB fp32 apiece. The scan body is
    checkpointed so backward recomputes each chunk's logits."""
    h = hidden[:, :-1]
    y = labels[:, 1:]
    B, S, E = h.shape
    pad = (-S) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=-100)
    n_chunks = (S + pad) // chunk
    hc = policy.cast(h).reshape(B, n_chunks, chunk, E).transpose(1, 0, 2, 3)
    yc = y.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    table = policy.cast(head_table)

    @jax.checkpoint
    def body(carry, xs):
        hcc, ycc = xs
        logits = jnp.einsum(
            "bce,ve->bcv", hcc, table, preferred_element_type=jnp.float32
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        valid = ycc != -100
        safe = jnp.where(valid, ycc, 0)
        ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        total, count = carry
        return (
            total + jnp.sum(jnp.where(valid, -ll, 0.0)),
            count + jnp.sum(valid),
        ), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)), (hc, yc)
    )
    return total / jnp.maximum(count, 1)


def token_logprobs_fused(
    head_table: jax.Array,  # (V, E) tied lm head
    hidden: jax.Array,      # (B, S, E) hidden states at predicting positions
    ids: jax.Array,         # (B, S) realized token ids
    *,
    policy: DTypePolicy = DTypePolicy(),
    chunk: int = 128,
) -> jax.Array:
    """Per-token log-probs of the realized ids with the LM head fused into
    a chunked scan (same shape discipline as causal_lm_loss_fused: the
    (B, S, V) logits never materialize — the GRPO path at B*G=8, S=8k,
    V=49k would otherwise hold ~13 GB of fp32 logits plus a log_softmax
    copy). Returns (B, S) fp32."""
    B, S, E = hidden.shape
    pad = (-S) % chunk
    h = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0))) if pad else hidden
    y = jnp.pad(ids, ((0, 0), (0, pad))) if pad else ids
    n_chunks = (S + pad) // chunk
    hc = policy.cast(h).reshape(B, n_chunks, chunk, E).transpose(1, 0, 2, 3)
    yc = y.astype(jnp.int32).reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    table = policy.cast(head_table)

    @jax.checkpoint
    def body(carry, xs):
        hcc, ycc = xs
        logits = jnp.einsum(
            "bce,ve->bcv", hcc, table, preferred_element_type=jnp.float32
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, ycc[..., None], axis=-1)[..., 0]
        return carry, ll

    _, lls = jax.lax.scan(body, (), (hc, yc))          # (n, B, chunk)
    out = lls.transpose(1, 0, 2).reshape(B, S + pad)
    return out[:, :S]


def causal_lm_loss(
    logits: jax.Array,   # (B, S, V) fp32
    labels: jax.Array,   # (B, S) int32, -100 = ignored
) -> jax.Array:
    """Shift-by-one CE matching the reference loss (reference
    modeling_gpt_bigcode.py:1260-1267)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, -token_ll, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count
