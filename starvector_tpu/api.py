"""High-level drop-in API mirroring the reference quickstart surface.

Reference usage (reference: scripts/quickstart.py:9-20):
    model = StarVectorForCausalLM.from_pretrained(path)
    batch = {"image": model.process_images([pil_image])}
    raw_svg = model.generate_im2svg(batch, max_length=4000)[0]

This wrapper binds the functional core (params pytree + configs) into one
object with the reference method names: process_images, generate_im2svg,
generate_text2svg, forward-as-loss. Decoded text includes the prompt prefix
('<svg' ...) exactly like the reference's
`torch.cat([prompt_tokens.input_ids, outputs])` (starvector_base.py:256-258).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from starvector_tpu.data.processor import processor_for_encoder
from starvector_tpu.generation.engine import (
    GenerationConfig, generate_im2svg, generate_text2svg,
)
from starvector_tpu.models import starvector as sv
from starvector_tpu.models.tokenizer import SVGTokenizer, build_test_tokenizer
from starvector_tpu.ops.layers import DTypePolicy


class StarVectorForCausalLM:
    def __init__(
        self,
        params: dict,
        cfg: sv.StarVectorConfig,
        tokenizer: SVGTokenizer,
        *,
        policy: DTypePolicy | None = None,
        rng: jax.Array | None = None,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.policy = policy or DTypePolicy()
        self.processor = processor_for_encoder(cfg.image_encoder_type, cfg.image_size)
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_pretrained(
        cls, path: str, dtype=jnp.bfloat16, *, quantize: bool = False
    ) -> "StarVectorForCausalLM":
        """`quantize=True` converts the decoder's big matmul weights to
        per-channel int8 (halves decode HBM traffic; vision tower and
        embeddings stay bf16)."""
        from starvector_tpu.models.builder import load_hf_starvector_checkpoint

        params, cfg, tokenizer = load_hf_starvector_checkpoint(path, dtype)
        if quantize:
            from starvector_tpu.ops.quantization import quantize_tree

            params = dict(params)
            params["svg_transformer"] = quantize_tree(params["svg_transformer"])
        return cls(params, cfg, tokenizer,
                   policy=DTypePolicy(param_dtype=dtype, compute_dtype=jnp.bfloat16))

    @classmethod
    def from_config(
        cls, cfg: sv.StarVectorConfig, rng: jax.Array | None = None,
        tokenizer: SVGTokenizer | None = None, dtype=jnp.float32,
    ) -> "StarVectorForCausalLM":
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params = sv.init_params_jit(cfg, rng, dtype=dtype)
        tok = tokenizer or build_test_tokenizer(
            "v2" if cfg.decoder == "starcoder2" else "v1"
        )
        compute = jnp.float32 if dtype == jnp.float32 else jnp.bfloat16
        return cls(params, cfg, tok,
                   policy=DTypePolicy(param_dtype=dtype, compute_dtype=compute))

    def _next_rng(self) -> jax.Array:
        self._rng, out = jax.random.split(self._rng)
        return out

    # -- reference surface ----------------------------------------------------
    def process_images(self, images: Sequence[Any]) -> jax.Array:
        """PIL images → (B, H, W, 3) normalized channels-last (reference
        starvector_arch.py:192-193 → image_encoder.py:112-119)."""
        return jnp.asarray(np.stack([self.processor(im) for im in images]))

    def forward(self, batch: dict) -> jax.Array:
        return sv.loss_fn(
            self.params, self.cfg, batch, self.tokenizer.pad_token_id,
            policy=self.policy,
        )

    def _gen_config(self, kwargs: dict, *, text2svg: bool = False) -> GenerationConfig:
        """Map reference generation kwargs (starvector_base.py:223-241) onto
        the engine config."""
        max_length = kwargs.get("max_length", 30)
        stop = (self.tokenizer.stop_sequence_ids("</svg>"),)
        return GenerationConfig(
            max_new_tokens=int(kwargs.get("max_new_tokens", max_length)),
            min_new_tokens=int(kwargs.get("min_length", 1)),
            do_sample=bool(kwargs.get("use_nucleus_sampling", True)),
            temperature=float(kwargs.get("temperature", 1.0)),
            top_p=float(kwargs.get("top_p", 0.9)),
            top_k=int(kwargs.get("top_k", 0)),
            min_p=float(kwargs.get("min_p", 0.0)),
            repetition_penalty=float(kwargs.get("repetition_penalty", 1.0)),
            frequency_penalty=float(kwargs.get("frequency_penalty", 0.0)),
            presence_penalty=float(kwargs.get("presence_penalty", 0.0)),
            logit_bias=tuple(
                (int(t), float(b))
                for t, b in dict(kwargs.get("logit_bias") or {}).items()
            ),
            num_return_sequences=int(kwargs.get("num_return_sequences", 1)),
            stop_sequences=stop,
            eos_token_id=self.tokenizer.eos_token_id if text2svg else None,
            pad_token_id=self.tokenizer.pad_token_id,
        )

    def generate_im2svg(self, batch: dict, **kwargs) -> list[str]:
        """reference generate_im2svg (starvector_base.py:243-259).

        `use_speculative=True` (greedy) switches to prompt-lookup
        speculative decoding — typically several-x fewer decoder forwards on
        repetitive SVG output, identical tokens. B=1 uses the linear-cache
        p50 path; B>1 the ragged batched path (rows accept independently),
        which accelerates the greedy validation workload."""
        images = jnp.asarray(batch["image"])
        prompt = kwargs.get("prompt") or self.tokenizer.prompt
        B = images.shape[0]
        enc = self.tokenizer([prompt] * B, add_special_tokens=False)
        prompt_ids = jnp.asarray(enc["input_ids"])
        gen = self._gen_config(kwargs)
        num_beams = int(kwargs.get("num_beams", 1))
        if num_beams > 1:
            # reference _get_generation_kwargs defaults to num_beams=2
            # (starvector_base.py:228-241); route to the beam engine
            from starvector_tpu.generation.beam import beam_search
            from starvector_tpu.models import starvector as sv_mod

            cond = sv_mod.encode_image(
                self.params, self.cfg, images, policy=self.policy
            )
            pe = self.cfg.decoder_module.embed_tokens(
                self.params["svg_transformer"], prompt_ids
            )
            prefix = jnp.concatenate([cond, self.policy.cast(pe)], axis=1)
            tokens, lengths = beam_search(
                self.params["svg_transformer"], prefix,
                jnp.ones((B, prefix.shape[1]), jnp.int32),
                dec_name=self.cfg.decoder, llm_cfg=self.cfg.llm,
                num_beams=num_beams,
                max_new_tokens=gen.max_new_tokens,
                stop_sequences=gen.stop_sequences,
                eos_token_id=gen.eos_token_id,
                pad_token_id=gen.pad_token_id,
                length_penalty=float(kwargs.get("length_penalty", 1.0)),
                policy=self.policy,
            )
            outs = jnp.concatenate([prompt_ids, tokens], axis=1)
            return [
                self.tokenizer.decode(row[: prompt_ids.shape[1] + int(L)])
                for row, L in zip(np.asarray(outs), np.asarray(lengths))
            ]
        # speculation does raw argmax — route to it only when the plain
        # greedy path's logits-processor chain is a no-op (penalties
        # neutral, no bias), or the 'identical tokens' contract would break
        spec_ok = (
            not gen.do_sample
            and gen.num_return_sequences == 1
            and gen.repetition_penalty == 1.0
            and gen.frequency_penalty == 0.0
            and gen.presence_penalty == 0.0
            and not gen.logit_bias
            # min_new_tokens only acts through eos suppression, which the
            # speculative paths don't implement
            and (gen.eos_token_id is None or gen.min_new_tokens <= 1)
        )
        if kwargs.get("use_speculative") and spec_ok:
            from starvector_tpu.generation import speculative as spec
            from starvector_tpu.models import starvector as sv_mod

            cond = sv_mod.encode_image(
                self.params, self.cfg, images, policy=self.policy
            )
            pe = self.cfg.decoder_module.embed_tokens(
                self.params["svg_transformer"], prompt_ids
            )
            prefix = jnp.concatenate([cond, self.policy.cast(pe)], axis=1)
            Q = cond.shape[1]
            ids_aligned = jnp.concatenate(
                [jnp.full((B, Q), -1, jnp.int32), prompt_ids.astype(jnp.int32)],
                axis=1,
            )
            common = dict(
                dec_name=self.cfg.decoder, llm_cfg=self.cfg.llm,
                max_new_tokens=gen.max_new_tokens,
                draft_len=int(kwargs.get("draft_len", 8)),
                stop_sequences=gen.stop_sequences,
                eos_token_id=gen.eos_token_id,
                pad_token_id=gen.pad_token_id,
                policy=self.policy,
            )
            mask = jnp.ones((B, prefix.shape[1]), jnp.int32)
            if B == 1:
                # B=1 keeps the linear-cache p50 path (benched)
                toks, lengths, _ = spec.generate_greedy_speculative(
                    self.params["svg_transformer"], prefix, mask,
                    ids_aligned, **common,
                )
            else:
                # batched greedy (the validation workload): ragged rows
                # accept drafts independently — exact tokens, several-x
                # fewer decoder forwards on repetitive SVG
                toks, lengths, _ = spec.generate_greedy_speculative_batched(
                    self.params["svg_transformer"], prefix, mask,
                    ids_aligned, **common,
                )
            texts = []
            pnp = np.asarray(prompt_ids)
            for b in range(B):
                row = np.asarray(toks[b][: int(lengths[b])])
                texts.append(self.tokenizer.decode(pnp[b]) +
                             self.tokenizer.decode(row))
            return texts
        tokens, lengths = generate_im2svg(
            self.params, self.cfg, images, prompt_ids, gen,
            self._next_rng(), policy=self.policy,
        )
        n = gen.num_return_sequences
        full_prompt = jnp.repeat(prompt_ids, n, axis=0) if n > 1 else prompt_ids
        outs = jnp.concatenate([full_prompt, tokens], axis=1)
        texts = []
        for row, L in zip(np.asarray(outs), np.asarray(lengths)):
            texts.append(
                self.tokenizer.decode(row[: full_prompt.shape[1] + int(L)])
            )
        return texts

    def generate_im2svg_grpo(self, batch: dict, **kwargs) -> dict:
        """reference generate_im2svg_grpo (starvector_base.py:261-286):
        returns raw_svg + full output ids (prompt-prefixed, repeated per
        return sequence) + the conditioning inputs_embeds for RL scoring."""
        from starvector_tpu.models import starvector as sv_mod

        images = jnp.asarray(batch["image"])
        prompt = kwargs.get("prompt") or self.tokenizer.prompt
        B = images.shape[0]
        enc = self.tokenizer([prompt] * B, add_special_tokens=False)
        prompt_ids = jnp.asarray(enc["input_ids"])
        gen = self._gen_config(kwargs)
        # encode ONCE: the same conditioning serves both generation and the
        # returned inputs_embeds (previously the vision tower ran twice per
        # rollout batch)
        from starvector_tpu.generation.engine import generate as _generate

        cond = sv_mod.encode_image(self.params, self.cfg, images,
                                   policy=self.policy)
        pe = self.cfg.decoder_module.embed_tokens(
            self.params["svg_transformer"], prompt_ids
        )
        inputs_embeds = jnp.concatenate([cond, self.policy.cast(pe)], axis=1)
        attention_mask = jnp.ones(inputs_embeds.shape[:2], jnp.int32)
        # reference: >1 return sequences forces sampling, beams off
        tokens, lengths = _generate(
            self.params["svg_transformer"], self.cfg.llm, self.cfg.decoder,
            inputs_embeds, attention_mask, gen, self._next_rng(),
            prompt_ids=prompt_ids, policy=self.policy,
        )
        n = gen.num_return_sequences
        full_prompt = jnp.repeat(prompt_ids, n, axis=0) if n > 1 else prompt_ids
        outputs = jnp.concatenate([full_prompt, tokens], axis=1)
        raw_svg = [
            self.tokenizer.decode(row[: full_prompt.shape[1] + int(L)])
            for row, L in zip(np.asarray(outputs), np.asarray(lengths))
        ]
        return {
            "raw_svg": raw_svg,
            "outputs": outputs,
            "lengths": lengths,
            "inputs_embeds": inputs_embeds,
            "prompt_len": prompt_ids.shape[1],
        }

    def generate_text2svg(self, batch: dict, **kwargs) -> list[str]:
        """reference generate_text2svg (starvector_base.py:297-330):
        caption + <svg-start> trigger, eos stopping."""
        captions = batch["caption"]
        enc = self.tokenizer(
            [c + self.tokenizer.svg_start_token for c in captions],
            max_length=kwargs.get("max_length", 30),
            add_special_tokens=False,
        )
        idn = np.asarray(enc["input_ids"])
        idm = np.asarray(enc["attention_mask"])
        if (idm[:, -1] == 0).any():
            # normalize ragged rows to LEFT padding: the engine reads the
            # prompt's last logits as logits[:, -1], so a right-padded row
            # (v1 tokenizer) would condition its first generated token on
            # trailing [PAD]s
            Bp, Pp = idn.shape
            left_ids = np.full_like(idn, self.tokenizer.pad_token_id)
            left_mask = np.zeros_like(idm)
            for b in range(Bp):
                row = idn[b][idm[b] > 0]
                left_ids[b, Pp - len(row):] = row
                left_mask[b, Pp - len(row):] = 1
            idn, idm = left_ids, left_mask
        ids = jnp.asarray(idn)
        mask = jnp.asarray(idm)
        gen = self._gen_config(kwargs, text2svg=True)
        spec_ok = (
            not gen.do_sample
            and gen.num_return_sequences == 1
            and gen.repetition_penalty == 1.0
            and gen.frequency_penalty == 0.0
            and gen.presence_penalty == 0.0
            and not gen.logit_bias
            and (gen.eos_token_id is None or gen.min_new_tokens <= 1)
        )
        if kwargs.get("use_speculative") and spec_ok:
            from starvector_tpu.generation import speculative as spec

            # the ragged speculative path wants RIGHT-padded rows (each
            # row's cache occupies [0, len) like a serving slot); the
            # tokenizer pads left for v2
            idm = np.asarray(mask)
            idn = np.asarray(ids)
            B, P = idn.shape
            idsr = np.zeros((B, P), np.int32)
            pidr = np.full((B, P), -1, np.int32)
            maskr = np.zeros((B, P), np.int32)
            for b in range(B):
                row = idn[b][idm[b] > 0]
                idsr[b, : len(row)] = row
                pidr[b, : len(row)] = row
                maskr[b, : len(row)] = 1
            dec = self.cfg.decoder_module
            embeds = self.policy.cast(dec.embed_tokens(
                self.params["svg_transformer"], jnp.asarray(idsr)
            ))
            toks, lengths, _ = spec.generate_greedy_speculative_batched(
                self.params["svg_transformer"], embeds,
                jnp.asarray(maskr), jnp.asarray(pidr),
                dec_name=self.cfg.decoder, llm_cfg=self.cfg.llm,
                max_new_tokens=gen.max_new_tokens,
                draft_len=int(kwargs.get("draft_len", 8)),
                stop_sequences=gen.stop_sequences,
                eos_token_id=gen.eos_token_id,
                pad_token_id=gen.pad_token_id,
                policy=self.policy,
            )
            return [
                self.tokenizer.decode(row[: int(L)])
                for row, L in zip(np.asarray(toks), np.asarray(lengths))
            ]
        tokens, lengths = generate_text2svg(
            self.params, self.cfg, ids, mask, gen, self._next_rng(),
            policy=self.policy,
        )
        return [
            self.tokenizer.decode(row[: int(L)])
            for row, L in zip(np.asarray(tokens), np.asarray(lengths))
        ]


@dataclasses.dataclass
class StarVectorPipeline:
    """image → svg → raster convenience (quickstart tail: reference
    scripts/quickstart.py:18-20 process_and_rasterize_svg)."""

    model: StarVectorForCausalLM

    def __call__(self, pil_image, **kwargs):
        from starvector_tpu.data.rasterize import process_and_rasterize_svg

        images = self.model.process_images([pil_image])
        raw = self.model.generate_im2svg({"image": images}, **kwargs)[0]
        svg, raster = process_and_rasterize_svg(raw)
        return {"raw_svg": raw, "svg": svg, "raster": raster}
