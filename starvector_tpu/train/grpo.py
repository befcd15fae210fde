"""GRPO post-training for StarVector — the trainer the reference implies.

The reference ships the RL *surface* but no RL *loop*: its
`StarVectorForCausalLM.forward(vision_embeds, input_ids, num_generations, …)`
returns per-token log-probs for policy gradients (reference
starvector_arch.py:161-184) and `generate_im2svg_grpo` produces grouped
rollouts (reference starvector_base.py:261-286) — both exist solely to feed
a GRPO trainer that lives outside the repo. This module completes that loop
TPU-first:

  rollout   one jitted sampling program (prefill-once, cache tiled n×,
            DESIGN.md "Prefill-once for num_return_sequences")
  reward    host-side, through the SAME validity-gated rasterize chain the
            eval harness uses (`process_and_rasterize_svg`): pixel fidelity
            of the rendered rollout vs the target raster (SSIM ⊕ 1−MSE),
            invalid SVG ⇒ reward 0 — the render-fidelity objective the
            StarVector task defines
  advantage group-relative z-scores over each prompt's G rollouts (GRPO —
            no value network, no critic params to shard)
  update    ONE jitted step: fused per-token log-probs (the (B·G, S, V)
            logits tensor never materializes, gpt_bigcode.py:587), PPO-clip
            surrogate, optional k3-estimator KL to a frozen reference
            policy, existing optax chain (freeze masks keep the vision
            tower/adapter untouched like the reference's stage-2 recipe,
            configs/models/starvector-1b/text2svg-stack.yaml).

Everything tensor-shaped stays on device; everything cairo-shaped stays on
host (DESIGN.md host/device boundary). Ratios use the model's raw log-probs
on both sides (the reference forward exposes no temperature), so the
first update after each rollout starts at ratio ≡ 1.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from starvector_tpu.models import starvector as sv
from starvector_tpu.ops.layers import DTypePolicy


@dataclasses.dataclass(frozen=True)
class GRPOConfig:
    """Rollout + objective knobs (PPO-clip defaults; KL off unless asked)."""

    num_generations: int = 8          # G rollouts per prompt
    max_new_tokens: int = 256
    temperature: float = 1.0
    top_p: float = 0.9
    clip_eps: float = 0.2             # PPO ratio clip
    kl_beta: float = 0.0              # weight of k3 KL to the frozen ref
    updates_per_rollout: int = 1      # GRPO μ: >1 reuses each rollout batch
                                      # (clip engages from the 2nd update)
    reward_resolution: int = 224      # raster size for the pixel reward
    ssim_weight: float = 0.5          # reward = w·SSIM + (1−w)·(1−MSE)
    advantage_eps: float = 1e-4       # z-score denominator floor


# ---------------------------------------------------------------------------
# reward (host side: cairo + numpy only)
# ---------------------------------------------------------------------------

def svg_pixel_reward(
    svg_text: str,
    target: np.ndarray,
    *,
    resolution: int = 224,
    ssim_weight: float = 0.5,
) -> float:
    """Render-fidelity reward in [0, 1] for one rollout.

    The SVG goes through the exact eval post-process chain
    (`process_and_rasterize_svg`: strict-validate → clean → placeholder,
    reference data/util.py:123-136); a rollout that falls to the placeholder
    scores 0 — same signal the eval harness tracks as the no-compile ratio.
    `target` is the ground-truth raster (H, W, 3) uint8."""
    from starvector_tpu.data.rasterize import (
        process_and_rasterize_svg, use_placeholder,
    )
    from starvector_tpu.metrics.ssim import ssim_single

    out_svg, img = process_and_rasterize_svg(svg_text, resolution)
    if out_svg == use_placeholder():
        return 0.0
    arr = np.asarray(img, np.float64)
    tgt = np.asarray(target, np.float64)
    if arr.shape != tgt.shape:
        from PIL import Image

        tgt = np.asarray(
            Image.fromarray(np.asarray(target, np.uint8)).resize(
                (arr.shape[1], arr.shape[0]), Image.BICUBIC
            ),
            np.float64,
        )
    mse = float(np.mean((arr - tgt) ** 2)) / 255.0**2
    ssim = np.mean(
        [ssim_single(arr[..., c], tgt[..., c]) for c in range(arr.shape[-1])]
    )
    ssim01 = float(np.clip(ssim, 0.0, 1.0))
    return ssim_weight * ssim01 + (1.0 - ssim_weight) * (1.0 - min(mse, 1.0))


def batch_rewards(
    raw_svgs: Sequence[str],
    targets: Sequence[np.ndarray],
    *,
    num_generations: int,
    resolution: int = 224,
    ssim_weight: float = 0.5,
) -> np.ndarray:
    """(B·G,) rewards; `raw_svgs` is grouped [p0·G, p1·G, …] (HF expand
    order, pinned by the prefill-once tests) against B targets."""
    G = num_generations
    assert len(raw_svgs) == G * len(targets), (len(raw_svgs), len(targets))
    out = np.zeros(len(raw_svgs), np.float32)
    for i, svg in enumerate(raw_svgs):
        out[i] = svg_pixel_reward(
            svg, targets[i // G], resolution=resolution,
            ssim_weight=ssim_weight,
        )
    return out


# ---------------------------------------------------------------------------
# advantages + objective (device side)
# ---------------------------------------------------------------------------

def group_advantages(
    rewards: jax.Array, num_generations: int, *, eps: float = 1e-4
) -> jax.Array:
    """GRPO advantage: per-prompt z-score over the G rollouts.
    A uniformly-scored group (e.g. all placeholders) gets A ≡ 0, not noise."""
    r = rewards.reshape(-1, num_generations).astype(jnp.float32)
    mean = r.mean(axis=1, keepdims=True)
    std = r.std(axis=1, keepdims=True)
    return ((r - mean) / (std + eps)).reshape(-1)


def grpo_loss(
    params: dict,
    cfg: sv.StarVectorConfig,
    vision_embeds: jax.Array,    # (B, Q, E) projected visual prefix
    ids: jax.Array,              # (B·G, L) prompt ‖ generated, right-padded
    attn_mask: jax.Array,        # (B·G, L) valid positions (prompt + gen)
    loss_mask: jax.Array,        # (B·G, L) generated positions only
    old_lp: jax.Array | None,    # (B·G, L) behavior log-probs, or None:
                                 #   one-update-per-rollout ⇒ old ≡ new, so
                                 #   stop_gradient(new_lp) stands in and the
                                 #   extra behavior-forward is skipped
    advantages: jax.Array,       # (B·G,)
    ref_lp: jax.Array | None,    # (B·G, L) frozen-policy log-probs (KL) or None
    *,
    num_generations: int,
    clip_eps: float,
    kl_beta: float,
    policy: DTypePolicy,
    remat: bool | str = False,
):
    """Clipped-surrogate GRPO objective. Per-sequence token mean, then batch
    mean (the GRPO paper's 1/|o_i| Σ normalization), so long rollouts don't
    dominate short ones."""
    new_lp = sv.grpo_forward(
        params, cfg, vision_embeds, ids, attn_mask,
        num_generations=num_generations, policy=policy, remat=remat,
    )
    if old_lp is None:
        old_lp = jax.lax.stop_gradient(new_lp)
    ratio = jnp.exp(new_lp - old_lp)
    adv = advantages.astype(jnp.float32)[:, None]
    surr = jnp.minimum(
        ratio * adv, jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
    )
    per_tok = -surr
    kl_mean = jnp.float32(0.0)
    m = loss_mask.astype(jnp.float32)
    denom_tok = jnp.maximum(m.sum(axis=1), 1.0)
    if ref_lp is not None and kl_beta > 0.0:
        d = ref_lp - new_lp
        k3 = jnp.exp(d) - d - 1.0          # unbiased, positive KL estimator
        per_tok = per_tok + kl_beta * k3
        kl_mean = ((k3 * m).sum(axis=1) / denom_tok).mean()
    seq_loss = (per_tok * m).sum(axis=1) / denom_tok
    loss = seq_loss.mean()
    clip_frac = (
        (jnp.abs(ratio - 1.0) > clip_eps).astype(jnp.float32) * m
    ).sum() / jnp.maximum(m.sum(), 1.0)
    metrics = {
        "kl": kl_mean,
        "clip_frac": clip_frac,
        "mean_ratio": (ratio * m).sum() / jnp.maximum(m.sum(), 1.0),
    }
    return loss, metrics


def make_grpo_step(
    cfg: sv.StarVectorConfig,
    tx,
    *,
    num_generations: int,
    clip_eps: float = 0.2,
    kl_beta: float = 0.0,
    policy: DTypePolicy = DTypePolicy(),
    remat: bool | str = False,
):
    """Returns grpo_step(params, opt_state, rollout, advantages) →
    (params, opt_state, metrics). `rollout` is the dict the trainer builds:
    vision_embeds / ids / attn_mask / loss_mask [/ old_lp] [/ ref_lp]
    (omit old_lp with one update per rollout — ratio ≡ 1, see grpo_loss).
    Params/opt_state are donated (in-place update, like the SFT step)."""

    use_kl = kl_beta > 0.0

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def grpo_step(params, opt_state, rollout, advantages):
        import optax

        def wrapped(p):
            return grpo_loss(
                p, cfg, rollout["vision_embeds"], rollout["ids"],
                rollout["attn_mask"], rollout["loss_mask"],
                rollout.get("old_lp"),
                advantages, rollout.get("ref_lp") if use_kl else None,
                num_generations=num_generations, clip_eps=clip_eps,
                kl_beta=kl_beta, policy=policy, remat=remat,
            )

        (loss, aux), grads = jax.value_and_grad(wrapped, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        aux = dict(aux)
        aux["loss"] = loss
        aux["grad_norm"] = optax.global_norm(grads)
        return new_params, new_opt_state, aux

    return grpo_step


# ---------------------------------------------------------------------------
# the loop
# ---------------------------------------------------------------------------

class GRPOTrainer:
    """Rollout → reward → advantage → update, bound to a model API object.

    By default only the decoder trains (reference stage-2 freezes the vision
    tower, text2svg-stack.yaml `train_image_encoder: false`; the adapter is
    frozen too because `grpo_forward` conditions on precomputed
    vision_embeds — exactly the reference forward's contract)."""

    def __init__(
        self,
        model,                              # api.StarVectorForCausalLM
        grpo: GRPOConfig = GRPOConfig(),
        *,
        lr: float = 1e-6,
        total_steps: int = 1000,
        warmup_steps: int = 0,
        grad_clip: float = 1.0,
        weight_decay: float = 0.0,
        remat: bool | str = "dots",
    ):
        from starvector_tpu.train.optim import build_optimizer

        self.model = model
        self.grpo = grpo
        self.tx = build_optimizer(
            model.params, lr=lr, weight_decay=weight_decay,
            warmup_steps=warmup_steps, total_steps=total_steps,
            grad_clip=grad_clip, train_image_encoder=False,
            train_connector=False, train_LLM=True,
        )
        # moments must inherit each param's sharding explicitly — XLA
        # propagation replicates zeros_like outputs (see
        # train/step.py::opt_state_shardings); on a single device the two
        # paths are identical
        leaves = jax.tree_util.tree_leaves(model.params)
        sh0 = getattr(leaves[0], "sharding", None)
        if sh0 is not None and getattr(sh0, "mesh", None) is not None \
                and sh0.mesh.size > 1:
            from starvector_tpu.train.step import opt_state_shardings

            p_sh = jax.tree_util.tree_map(
                lambda x: x.sharding, model.params
            )
            o_sh = opt_state_shardings(
                self.tx, model.params, p_sh, sh0.mesh
            )
            self.opt_state = jax.jit(
                self.tx.init, out_shardings=o_sh
            )(model.params)
        else:
            self.opt_state = jax.jit(self.tx.init)(model.params)
        # KL reference = the pre-RL decoder. Copy the leaves: the step
        # donates `params`, which would otherwise invalidate these buffers
        # after the first update.
        self.ref_decoder = (
            jax.tree_util.tree_map(
                lambda x: jnp.array(x), model.params["svg_transformer"]
            )
            if grpo.kl_beta > 0.0
            else None
        )
        self._step_fn = make_grpo_step(
            model.cfg, self.tx, num_generations=grpo.num_generations,
            clip_eps=grpo.clip_eps, kl_beta=grpo.kl_beta,
            policy=model.policy, remat=remat,
        )
        self.step_count = 0

    def step(
        self,
        images: jax.Array,                   # (B, H, W, 3) processed images
        target_rasters: Sequence[np.ndarray],  # B × (h, w, 3) uint8 GT rasters
        **gen_kwargs: Any,
    ) -> dict:
        g = self.grpo
        roll = self.model.generate_im2svg_grpo(
            {"image": images},
            num_return_sequences=g.num_generations,
            temperature=gen_kwargs.pop("temperature", g.temperature),
            top_p=gen_kwargs.pop("top_p", g.top_p),
            max_new_tokens=gen_kwargs.pop("max_new_tokens", g.max_new_tokens),
            **gen_kwargs,
        )
        ids = roll["outputs"]                       # (B·G, P+T)
        lengths = jnp.asarray(roll["lengths"])      # (B·G,) generated lengths
        P = int(roll["prompt_len"])
        Q = self.model.cfg.query_length
        vision_embeds = roll["inputs_embeds"][:, :Q]
        L = ids.shape[1]
        pos = jnp.arange(L)[None, :]
        attn_mask = (pos < P + lengths[:, None]).astype(jnp.int32)
        loss_mask = attn_mask * (pos >= P).astype(jnp.int32)

        rollout = {
            "vision_embeds": vision_embeds, "ids": ids,
            "attn_mask": attn_mask, "loss_mask": loss_mask,
        }
        mu = max(int(g.updates_per_rollout), 1)
        if mu > 1:
            # GRPO μ>1: later updates need the TRUE behavior log-probs for
            # the importance ratio / clip. With μ=1 this forward is skipped —
            # old_lp ≡ new_lp, grpo_loss substitutes stop_gradient(new_lp).
            rollout["old_lp"] = jax.lax.stop_gradient(
                sv.grpo_forward(
                    self.model.params, self.model.cfg, vision_embeds, ids,
                    attn_mask, num_generations=g.num_generations,
                    policy=self.model.policy,
                )
            )
        if self.ref_decoder is not None:
            rollout["ref_lp"] = sv.grpo_forward(
                {"svg_transformer": self.ref_decoder}, self.model.cfg,
                vision_embeds, ids, attn_mask,
                num_generations=g.num_generations, policy=self.model.policy,
            )

        rewards_np = batch_rewards(
            roll["raw_svg"], target_rasters,
            num_generations=g.num_generations,
            resolution=g.reward_resolution, ssim_weight=g.ssim_weight,
        )
        advantages = group_advantages(
            jnp.asarray(rewards_np), g.num_generations, eps=g.advantage_eps
        )

        params = self.model.params
        for _ in range(mu):
            params, self.opt_state, metrics = self._step_fn(
                params, self.opt_state, rollout, advantages
            )
        self.model.params = params
        self.step_count += 1
        out = {k: float(v) for k, v in metrics.items()}
        out["reward_mean"] = float(rewards_np.mean())
        out["reward_std"] = float(rewards_np.std())
        out["reward_max"] = float(rewards_np.max())
        out["valid_frac"] = float((rewards_np > 0.0).mean())
        out["step"] = self.step_count
        return out
