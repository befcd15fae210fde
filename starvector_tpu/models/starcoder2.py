"""StarCoder2 (v2/8B) decoder — TPU-native JAX implementation.

The reference's 8B model wraps HF `Starcoder2ForCausalLM`
(reference: starvector/model/llm/starcoder2.py:13-53, and the HF
transformers Starcoder2 implementation it delegates to). Architecture:
  * separate q/k/v/o projections with bias (use_bias=True)
  * Grouped-Query Attention (7B: 36 q heads / 4 kv heads)
  * rotary position embeddings (GPT-NeoX rotate-half, theta 1e6 for 7B)
  * LayerNorm (with bias), not RMSNorm; pre-LN residual blocks
  * MLP c_fc -> gelu_pytorch_tanh -> c_proj
  * optional sliding-window attention (7B: 4096)
  * tied lm_head

Same TPU-first design as gpt_bigcode.py: stacked layers + lax.scan,
preallocated KV cache, fp32 softmax, (in, out) weight layout.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from starvector_tpu.ops.attention import NEG_INF, make_attention_bias, multihead_attention
from starvector_tpu.ops.layers import (
    DTypePolicy,
    dense,
    gelu_tanh,
    layer_norm,
    make_dense_params,
    make_layer_norm_params,
    normal_init,
)
from starvector_tpu.ops.rotary import apply_rope, rope_frequencies
from starvector_tpu.parallel.mesh import BATCH_AXES, batch_spec, maybe_constrain, seq_spec


@dataclasses.dataclass(frozen=True)
class StarCoder2Config:
    vocab_size: int = 49152
    hidden_size: int = 4608
    intermediate_size: int = 18432
    num_hidden_layers: int = 32
    num_attention_heads: int = 36
    num_key_value_heads: int = 4
    max_position_embeddings: int = 16384
    norm_epsilon: float = 1e-5
    rope_theta: float = 1e6
    sliding_window: int | None = 4096
    use_bias: bool = True
    attn_impl: str = "xla"  # "xla" | "flash" | "mixed" (flash prefill, xla decode)
    tie_word_embeddings: bool = True
    initializer_range: float = 0.018042

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads


def starcoder2_7b_config(**kw) -> StarCoder2Config:
    """bigcode/starcoder2-7b geometry (the reference 8B decoder)."""
    return StarCoder2Config(**kw)


def tiny_config(**kw) -> StarCoder2Config:
    base = dict(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        sliding_window=None,
    )
    base.update(kw)
    return StarCoder2Config(**base)


def init_params(cfg: StarCoder2Config, rng: jax.Array, dtype=jnp.float32) -> dict:
    E = cfg.hidden_size
    D, H, Hkv = cfg.head_dim, cfg.num_attention_heads, cfg.kv_heads
    std = cfg.initializer_range
    keys = jax.random.split(rng, 3)

    def layer_params(k):
        ks = jax.random.split(k, 6)
        b = cfg.use_bias
        return {
            "input_layernorm": make_layer_norm_params(E, dtype),
            "attn": {
                "q_proj": make_dense_params(ks[0], E, H * D, std=std, dtype=dtype, bias=b),
                "k_proj": make_dense_params(ks[1], E, Hkv * D, std=std, dtype=dtype, bias=b),
                "v_proj": make_dense_params(ks[2], E, Hkv * D, std=std, dtype=dtype, bias=b),
                "o_proj": make_dense_params(ks[3], H * D, E, std=std, dtype=dtype, bias=b),
            },
            "post_attention_layernorm": make_layer_norm_params(E, dtype),
            "mlp": {
                "c_fc": make_dense_params(ks[4], E, cfg.intermediate_size, std=std, dtype=dtype, bias=b),
                "c_proj": make_dense_params(ks[5], cfg.intermediate_size, E, std=std, dtype=dtype, bias=b),
            },
        }

    # vmap over layer keys: one traced layer body, not num_hidden_layers
    # unrolled copies (compile time dominates jitted-init cold start)
    layers = jax.vmap(layer_params)(
        jax.random.split(keys[1], cfg.num_hidden_layers)
    )
    params = {
        "embed_tokens": normal_init(keys[0], (cfg.vocab_size, E), std, dtype),
        "layers": layers,
        "norm": make_layer_norm_params(E, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = normal_init(keys[2], (cfg.vocab_size, E), std, dtype)
    return params


def partition_rules() -> list[tuple[str, P]]:
    return [
        # single-axis sharding for tables (see gpt_bigcode.partition_rules)
        (r"embed_tokens$|lm_head$", P("fsdp", None)),
        (r"layers/.*(q_proj|k_proj|v_proj)/kernel", P("stage", "fsdp", "tensor")),
        (r"layers/.*(q_proj|k_proj|v_proj)/bias", P("stage", "tensor")),
        (r"layers/.*o_proj/kernel", P("stage", "tensor", "fsdp")),
        (r"layers/.*o_proj/bias", P("stage", None)),
        (r"layers/.*c_fc/kernel", P("stage", "fsdp", "tensor")),
        (r"layers/.*c_fc/bias", P("stage", "tensor")),
        (r"layers/.*mlp/c_proj/kernel", P("stage", "tensor", "fsdp")),
        (r"layers/.*mlp/c_proj/bias", P("stage", None)),
        (r"layers/.*layernorm/", P("stage", None)),
        (r"norm/", P(None)),
    ]


def init_cache(cfg: StarCoder2Config, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
    from starvector_tpu.models import decode_common as dc

    return dc.init_cache(
        cfg.num_hidden_layers, cfg.kv_heads, cfg.head_dim, batch, max_len, dtype
    )


def compute_position_ids(attention_mask: jax.Array) -> jax.Array:
    pos = jnp.cumsum(attention_mask, axis=-1) - 1
    return jnp.where(attention_mask == 0, 1, pos).astype(jnp.int32)


def _attention(p, cfg: StarCoder2Config, x, ctx, positions, layer_cache, cache_index, policy):
    B, S, E = x.shape
    H, D, Hkv = cfg.num_attention_heads, cfg.head_dim, cfg.kv_heads
    inv_freq = rope_frequencies(D, cfg.rope_theta)
    q = dense(p["q_proj"], x, policy, tag="dense_qkv_out").reshape(B, S, H, D)
    k = dense(p["k_proj"], x, policy, tag="dense_qkv_out").reshape(B, S, Hkv, D)
    v = dense(p["v_proj"], x, policy, tag="dense_qkv_out").reshape(B, S, Hkv, D)
    q = apply_rope(q, positions, inv_freq)
    k = apply_rope(k, positions, inv_freq)

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
            cache_len = ctx["q_offset"] + 1
            win_start = (
                jnp.maximum(cache_len - cfg.sliding_window, 0)
                if cfg.sliding_window is not None
                else 0
            )
            out = gqa_decode(
                q[:, 0], k, v, ctx["kv_mask"], cache_len, win_start
            )[:, None]
        elif layer_cache is None:
            from starvector_tpu.parallel.sequence import sp_flash_attention

            out = sp_flash_attention(
                q, k, v, ctx["kv_mask"], causal=True,
                window=cfg.sliding_window,
            )
        else:
            out = flash_prefill(
                q, k, v, ctx["kv_mask"], q_offset=ctx["q_offset"],
                window=cfg.sliding_window,
            )
    else:
        out = multihead_attention(q, k, v, ctx["bias"])
    out = out.reshape(B, S, H * D)
    return dense(p["o_proj"], out, policy,
                 tag="dense_attn_proj_out"), new_cache


def _block(p, cfg, x, ctx, positions, layer_cache, cache_index, policy):
    attn_out, new_cache = _attention(
        p["attn"], cfg, layer_norm(p["input_layernorm"], x, cfg.norm_epsilon),
        ctx, positions, layer_cache, cache_index, policy,
    )
    x = x + attn_out
    h = layer_norm(p["post_attention_layernorm"], x, cfg.norm_epsilon)
    h = dense(p["mlp"]["c_fc"], h, policy)
    h = gelu_tanh(h)
    h = dense(p["mlp"]["c_proj"], h, policy)
    return x + h, new_cache


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "policy", "remat", "return_hidden",
                     "last_logits_only", "fast_path"),
)
def forward(
    params: dict,
    cfg: StarCoder2Config,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array | None = None,
    position_ids: jax.Array | None = None,
    cache: dict | None = None,
    *,
    policy: DTypePolicy = DTypePolicy(),
    remat: bool = False,
    return_hidden: bool = False,
    last_logits_only: bool = False,
    fast_path: bool = True,   # False = naive scan-ys decode (bench baseline)
):
    """Same contract as gpt_bigcode.forward. Sliding-window mask applied when
    cfg.sliding_window is set (HF semantics: key within [q-window+1, q])."""
    B, S, E = inputs_embeds.shape
    x = policy.cast(inputs_embeds)
    # training activations shard S over the `sequence` axis too (context
    # parallelism); cached calls keep the batch-only layout
    x = maybe_constrain(
        x, seq_spec(1) if cache is None else batch_spec(extra_dims=2)
    )

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
        # key mask replicated over `sequence` ONCE (see gpt_bigcode.forward)
        kv_mask_full = maybe_constrain(
            attention_mask.astype(jnp.int32), P(BATCH_AXES, None)
        )
        ctx = {"kv_mask": kv_mask_full, "q_offset": 0}
        if not use_flash:
            ctx["bias"] = make_attention_bias(
                attention_mask, S, S, causal=True, window=cfg.sliding_window
            )
        new_index = None
        kv_mask = None
    else:
        idx = cache["index"]
        T = cache["k"].shape[2]
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.int32)
        if position_ids is None:
            prev = jnp.sum(cache["kv_mask"], axis=-1, dtype=jnp.int32)
            position_ids = prev[:, None] + compute_position_ids(attention_mask)
            position_ids = jnp.where(attention_mask == 0, 1, position_ids)
        kv_mask = jax.lax.dynamic_update_slice(
            cache["kv_mask"], attention_mask.astype(jnp.int32), (0, idx)
        )
        ctx = {"kv_mask": kv_mask, "q_offset": idx}
        if not use_flash:
            slot = jnp.arange(T)[None, None, :]
            qslot = idx + jnp.arange(S)[None, :, None]
            allowed = (slot <= qslot) & (kv_mask[:, None, :] > 0)
            if cfg.sliding_window is not None:
                allowed &= slot > qslot - cfg.sliding_window
            ctx["bias"] = jnp.where(allowed, 0.0, NEG_INF)[:, None].astype(
                jnp.float32
            )
        new_index = idx + S

    positions = jnp.clip(position_ids, 0, cfg.max_position_embeddings - 1)

    if cache is None:
        from starvector_tpu.parallel.pipeline import pp_layer_scan

        def pp_body(h, layer_p, arrays):
            arrs = dict(arrays)
            pos = arrs.pop("positions")
            h, _ = _block(
                layer_p, cfg, h, {**arrs, "q_offset": 0}, pos, None, 0, policy
            )
            return h

        arrays = {k: v for k, v in ctx.items() if k != "q_offset"}
        arrays["positions"] = positions
        x = pp_layer_scan(params["layers"], x, arrays, pp_body, remat=remat,
                          rules=partition_rules())
        new_cache = None
    elif S == 1 and fast_path:
        # decode fast path for ALL attn impls (see gpt_bigcode.forward)
        x, new_cache = _decode_step(params, cfg, x, cache, kv_mask, positions, policy)
        new_cache["index"] = new_index
    elif fast_path and S <= 64 and (
        cfg.sliding_window is None or S <= cfg.sliding_window
    ):
        # small-chunk write-once path (see gpt_bigcode._chunk_step); the
        # S <= window bound keeps within-chunk attention window-exact
        x, new_cache = _chunk_step(
            params, cfg, x, cache, kv_mask, attention_mask, positions, policy
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
                layer_p, cfg, h, ctx, positions,
                layer_cache, cache["index"], policy,
            )
            return h, tuple(upd[k] for k in cache_keys)

        x, upds = jax.lax.scan(
            body, x, (params["layers"], *(cache[k] for k in cache_keys))
        )
        new_cache = dict(zip(cache_keys, upds))
        new_cache.update(index=new_index, kv_mask=kv_mask)

    x = layer_norm(params["norm"], x, cfg.norm_epsilon)
    if return_hidden:
        return x, new_cache
    if last_logits_only:
        x = x[:, -1:]
    head = params["embed_tokens"] if cfg.tie_word_embeddings else params["lm_head"]
    logits = jnp.einsum(
        "bse,ve->bsv", policy.cast(x), policy.cast(head),
        preferred_element_type=jnp.float32,
    )
    logits = maybe_constrain(logits, batch_spec(extra_dims=2))
    return logits, new_cache


def lm_head_table(params: dict, cfg: StarCoder2Config) -> jax.Array:
    return params["embed_tokens"] if cfg.tie_word_embeddings else params["lm_head"]


def embed_tokens(params: dict, input_ids: jax.Array) -> jax.Array:
    table = maybe_constrain(params["embed_tokens"], P(None, None))
    return maybe_constrain(table[input_ids], batch_spec(extra_dims=2))


def _decode_step(params, cfg, x, cache, kv_mask, positions, policy):
    """Single-token cached decode with small scan outputs + analytic
    self-token softmax merge (see gpt_bigcode._decode_step)."""
    from starvector_tpu.models import decode_common as dc

    idx = cache["index"]
    T = cache["k"].shape[2]
    slot_ids = jnp.arange(T)[None, :]
    old_mask = kv_mask & (slot_ids < idx)
    if cfg.sliding_window is not None:
        old_mask = old_mask & (slot_ids > idx - cfg.sliding_window)
    x, news = dc.decode_scan(
        params["layers"], cache, x,
        _decode_layer_fn(cfg, old_mask, positions, policy),
    )
    new_cache = dc.write_new_kv_linear(cache, news, idx)
    new_cache["kv_mask"] = kv_mask
    return x, new_cache


def _chunk_step(params, cfg, x, cache, kv_mask, chunk_mask, positions,
                policy):
    """Multi-token cached step (see gpt_bigcode._chunk_step), with the
    per-query sliding-window mask over cached slots: chunk query w sits at
    slot idx+w, so it sees cache slot t iff t > idx + w - window."""
    from starvector_tpu.models import decode_common as dc

    idx = cache["index"]
    T = cache["k"].shape[2]
    W = x.shape[1]
    slot_ids = jnp.arange(T)[None, :]
    old_mask = kv_mask & (slot_ids < idx)                     # (B, T)
    if cfg.sliding_window is not None:
        per_q = (jnp.arange(T)[None, :]
                 > idx + jnp.arange(W)[:, None] - cfg.sliding_window)
        old_mask = old_mask[:, None, :] & per_q[None]          # (B, W, T)
    x, news = dc.decode_scan(
        params["layers"], cache, x,
        _verify_layer_fn(cfg, old_mask, positions, policy,
                         new_mask=chunk_mask),
    )
    new_cache = dc.write_new_kv_linear_multi(cache, news, idx)
    new_cache["kv_mask"] = kv_mask
    return x, new_cache


def _decode_layer_fn(cfg: StarCoder2Config, old_mask, positions, policy):
    """Per-layer single-token decode callback: pre-LN → separate q/k/v with
    RoPE → merged-softmax attention → residual MLP."""
    from starvector_tpu.models import decode_common as dc

    H, D, Hkv = cfg.num_attention_heads, cfg.head_dim, cfg.kv_heads
    G = H // Hkv
    scale = D**-0.5
    inv_freq = rope_frequencies(D, cfg.rope_theta)

    def fn(layer_p, h, lk, lv, lks=None, lvs=None):
        B = h.shape[0]
        hh = layer_norm(layer_p["input_layernorm"], h, cfg.norm_epsilon)
        q = dense(layer_p["attn"]["q_proj"], hh, policy).reshape(B, 1, H, D)
        k_new = dense(layer_p["attn"]["k_proj"], hh, policy).reshape(B, 1, Hkv, D)
        v_new = dense(layer_p["attn"]["v_proj"], hh, policy).reshape(B, 1, Hkv, D)
        q = apply_rope(q, positions, inv_freq)
        k_new = apply_rope(k_new, positions, inv_freq)
        out = dc.merged_decode_attention(
            q.reshape(B, Hkv, G, D), k_new[:, 0], v_new[:, 0],
            lk, lv, old_mask, scale, k_scale=lks, v_scale=lvs,
        )
        h = h + dense(layer_p["attn"]["o_proj"], out, policy)
        hh = layer_norm(layer_p["post_attention_layernorm"], h, cfg.norm_epsilon)
        hh = dense(layer_p["mlp"]["c_fc"], hh, policy)
        hh = gelu_tanh(hh)
        h = h + dense(layer_p["mlp"]["c_proj"], hh, policy)
        return h, k_new[:, 0], v_new[:, 0]

    return fn


def _verify_layer_fn(cfg: StarCoder2Config, old_mask, positions, policy,
                     new_mask=None):
    """Per-layer W-token verify callback (speculative decoding / chunked
    cached prefill): like _decode_layer_fn with per-chunk RoPE and a
    per-query sliding-window mask over the cached slots. `new_mask` hides
    padded chunk keys ((B, W)) or applies a per-query chunk mask
    ((B, Wq, Wk))."""
    from starvector_tpu.models import decode_common as dc

    H, D, Hkv = cfg.num_attention_heads, cfg.head_dim, cfg.kv_heads
    G = H // Hkv
    scale = D**-0.5
    inv_freq = rope_frequencies(D, cfg.rope_theta)

    def fn(layer_p, h, lk, lv, lks=None, lvs=None):
        B, W, _ = h.shape
        hh = layer_norm(layer_p["input_layernorm"], h, cfg.norm_epsilon)
        q = dense(layer_p["attn"]["q_proj"], hh, policy).reshape(B, W, H, D)
        k_new = dense(layer_p["attn"]["k_proj"], hh, policy).reshape(
            B, W, Hkv, D
        )
        v_new = dense(layer_p["attn"]["v_proj"], hh, policy).reshape(
            B, W, Hkv, D
        )
        q = apply_rope(q, positions, inv_freq)
        k_new = apply_rope(k_new, positions, inv_freq)
        qg = jnp.moveaxis(q.reshape(B, W, Hkv, G, D), 1, 3)
        out = dc.merged_verify_attention(
            qg, k_new, v_new, lk, lv, old_mask, scale,
            k_scale=lks, v_scale=lvs, new_mask=new_mask,
        )
        h = h + dense(layer_p["attn"]["o_proj"], out, policy)
        hh = layer_norm(layer_p["post_attention_layernorm"], h,
                        cfg.norm_epsilon)
        hh = dense(layer_p["mlp"]["c_fc"], hh, policy)
        hh = gelu_tanh(hh)
        h = h + dense(layer_p["mlp"]["c_proj"], hh, policy)
        return h, k_new, v_new

    return fn


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def forward_ragged_verify(
    params: dict,
    cfg: StarCoder2Config,
    token_ids: jax.Array,     # (B, W): [last accepted token ‖ drafts]
    cache: dict,
    active: jax.Array,        # (B,)
    *,
    policy: DTypePolicy = DTypePolicy(),
):
    """Speculative-verification forward (see gpt_bigcode.forward_ragged_
    verify): W-token chunk per slot at its own position, per-slot RoPE,
    per-query sliding-window visibility; lengths/kv_mask left for
    decode_common.commit_verify."""
    from starvector_tpu.models import decode_common as dc

    del active
    B, W = token_ids.shape
    if cfg.sliding_window is not None and W > cfg.sliding_window:
        raise ValueError(
            f"verify chunk ({W}) exceeds sliding window "
            f"({cfg.sliding_window}): within-chunk visibility assumes the "
            f"whole chunk fits the window"
        )
    x = policy.cast(embed_tokens(params, token_ids))   # (B, W, E)
    positions = cache["lengths"][:, None] + jnp.arange(W)[None, :]

    T = cache["k"].shape[2]
    write_pos = jnp.clip(positions, 0, T - 1)
    old_mask = cache["kv_mask"][:, None, :]            # (B, 1, T)
    if cfg.sliding_window is not None:
        slot_ids = jnp.arange(T)[None, None, :]
        old_mask = old_mask & (
            slot_ids > (positions - cfg.sliding_window)[:, :, None]
        )
    old_mask = jnp.broadcast_to(old_mask, (B, W, T))
    x, news = dc.decode_scan(
        params["layers"], cache, x,
        _verify_layer_fn(cfg, old_mask, positions, policy),
    )
    new_cache = dc.write_new_kv_ragged_multi(cache, news, write_pos)
    x = layer_norm(params["norm"], x, cfg.norm_epsilon)
    head = params["embed_tokens"] if cfg.tie_word_embeddings else params["lm_head"]
    logits = jnp.einsum(
        "bse,ve->bsv", policy.cast(x), policy.cast(head),
        preferred_element_type=jnp.float32,
    )
    new_cache["lengths"] = cache["lengths"]
    new_cache["kv_mask"] = cache["kv_mask"]
    return logits, new_cache


def init_ragged_cache(
    cfg: StarCoder2Config, batch: int, max_len: int, dtype=jnp.bfloat16
) -> dict:
    """Per-slot-length cache for continuous batching (see gpt_bigcode)."""
    from starvector_tpu.models import decode_common as dc

    return dc.init_ragged_cache(
        cfg.num_hidden_layers, cfg.kv_heads, cfg.head_dim, batch, max_len, dtype
    )


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def forward_ragged_decode(
    params: dict,
    cfg: StarCoder2Config,
    token_ids: jax.Array,     # (B,)
    cache: dict,
    active: jax.Array,        # (B,)
    *,
    policy: DTypePolicy = DTypePolicy(),
):
    """Continuous-batching decode step (per-slot positions + RoPE)."""
    from starvector_tpu.models import decode_common as dc

    x = policy.cast(embed_tokens(params, token_ids[:, None]))  # (B, 1, E)
    positions = cache["lengths"][:, None]

    write_pos, kv_mask, old_mask = dc.ragged_step_masks(
        cache, active, cfg.sliding_window
    )
    x, news = dc.decode_scan(
        params["layers"], cache, x,
        _decode_layer_fn(cfg, old_mask, positions, policy),
    )
    new_cache = dc.write_new_kv_ragged(cache, news, write_pos)
    x = layer_norm(params["norm"], x, cfg.norm_epsilon)
    head = params["embed_tokens"] if cfg.tie_word_embeddings else params["lm_head"]
    logits = jnp.einsum(
        "bse,ve->bsv", policy.cast(x), policy.cast(head),
        preferred_element_type=jnp.float32,
    )[:, 0]
    new_cache["lengths"] = cache["lengths"] + active.astype(jnp.int32)
    new_cache["kv_mask"] = kv_mask
    return logits, new_cache


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def insert_prefill_rows(
    cfg: StarCoder2Config,
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
    cfg: StarCoder2Config,
    ragged_cache: dict,
    small_cache: dict,
    slot: jax.Array,
    length: jax.Array,
):
    """Admit a prefilled B=1 cache into slot `slot` (see gpt_bigcode)."""
    from starvector_tpu.models import decode_common as dc

    return dc.insert_prefill(ragged_cache, small_cache, slot, length)
