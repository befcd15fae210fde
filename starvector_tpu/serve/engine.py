"""Continuous-batching generation engine (vLLM-parity semantics for the
serve path — BASELINE config 4; reference relies on an external vLLM fork,
README.md:297-319).

Iteration-level scheduling over a slot-based ragged KV cache:
  * requests queue up; free slots admit them by prefilling a B=1 cache and
    scattering it into the slot (models/*.insert_prefill)
  * every engine tick decodes ONE token for all active slots together
    (models/*.forward_ragged_decode) — new requests join between ticks
    without stalling running ones
  * per-request sampling params, stop sequences, eos, max tokens
  * emitted tokens stream into per-request queues (worker SSE layer)

The engine runs its own Python scheduler thread; all device work is jitted.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
import uuid
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from starvector_tpu.ops.layers import DTypePolicy
from starvector_tpu.ops.sampling import sample_token


@dataclasses.dataclass
class Request:
    prefix_embeds: Any                 # (1, P, E) prompt embedding
    max_new_tokens: int = 256
    temperature: float = 0.8
    top_p: float = 0.9
    do_sample: bool = True
    stop_sequences: tuple[tuple[int, ...], ...] = ()
    eos_token_id: int | None = None
    request_id: str = dataclasses.field(default_factory=lambda: uuid.uuid4().hex)
    # filled by the engine
    out_queue: "queue.Queue" = dataclasses.field(default_factory=queue.Queue)


@dataclasses.dataclass
class _Slot:
    req: Request | None = None
    generated: list[int] = dataclasses.field(default_factory=list)
    last_token: int = 0


class ServeEngine:
    def __init__(
        self,
        params: dict,
        llm_cfg,
        dec_name: str,
        *,
        max_batch: int = 8,
        max_len: int = 8192,
        policy: DTypePolicy = DTypePolicy(
            param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16
        ),
        seed: int = 0,
    ):
        from starvector_tpu.models import gpt_bigcode, starcoder2

        self.dec = gpt_bigcode if dec_name == "gpt_bigcode" else starcoder2
        self.params = params
        if llm_cfg.attn_impl == "xla":
            # serving default: flash prefill + xla decode (fastest measured)
            import dataclasses as _dc

            llm_cfg = _dc.replace(llm_cfg, attn_impl="mixed")
        self.llm_cfg = llm_cfg
        self.policy = policy
        self.max_batch = max_batch
        self.max_len = max_len
        self.cache = self.dec.init_ragged_cache(
            llm_cfg, max_batch, max_len, dtype=policy.compute_dtype
        )
        self.slots = [_Slot() for _ in range(max_batch)]
        self.pending: "queue.Queue[Request]" = queue.Queue()
        self.rng = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._idle_wait = 0.005

    # -- public API ----------------------------------------------------------
    def submit(self, req: Request) -> Request:
        self.pending.put(req)
        return req

    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
            self._thread = None

    @property
    def num_active(self) -> int:
        return sum(1 for s in self.slots if s.req is not None)

    @property
    def queue_length(self) -> int:
        return self.pending.qsize() + self.num_active

    # -- internals -----------------------------------------------------------
    def _admit(self):
        for slot_idx, slot in enumerate(self.slots):
            if slot.req is not None:
                continue
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return
            embeds = jnp.asarray(req.prefix_embeds, self.policy.compute_dtype)
            P = embeds.shape[1]
            small = self.dec.init_cache(
                self.llm_cfg, 1, min(P + 1, self.max_len),
                dtype=self.policy.compute_dtype,
            )
            logits, small = self.dec.forward(
                self.params, self.llm_cfg, embeds,
                attention_mask=jnp.ones((1, P), jnp.int32),
                cache=small, policy=self.policy, last_logits_only=True,
            )
            self.cache = self.dec.insert_prefill(
                self.llm_cfg, self.cache, small, jnp.asarray(slot_idx),
                jnp.asarray(P),
            )
            self.rng, r = jax.random.split(self.rng)
            first = int(
                sample_token(
                    r, logits[:, -1],
                    do_sample=req.do_sample,
                    temperature=jnp.asarray(req.temperature, jnp.float32),
                    top_p=jnp.asarray(req.top_p, jnp.float32),
                    top_k=jnp.asarray(0, jnp.int32),
                )[0]
            )
            slot.req = req
            slot.generated = [first]
            slot.last_token = first
            self._emit(slot_idx)

    def _emit(self, slot_idx: int):
        """Push the latest token; finish the request if stopped."""
        slot = self.slots[slot_idx]
        req = slot.req
        tok = slot.generated[-1]
        done = False
        if req.eos_token_id is not None and tok == req.eos_token_id:
            done = True
        for stop in req.stop_sequences:
            L = len(stop)
            if L and len(slot.generated) >= L and tuple(slot.generated[-L:]) == stop:
                done = True
        if len(slot.generated) >= req.max_new_tokens:
            done = True
        req.out_queue.put(("token", tok))
        if done:
            req.out_queue.put(("done", list(slot.generated)))
            self.slots[slot_idx] = _Slot()

    def _tick(self):
        active = np.array(
            [1 if s.req is not None else 0 for s in self.slots], np.int32
        )
        if active.sum() == 0:
            return False
        tokens = np.array([s.last_token for s in self.slots], np.int32)
        logits, self.cache = self.dec.forward_ragged_decode(
            self.params, self.llm_cfg, jnp.asarray(tokens), self.cache,
            jnp.asarray(active), policy=self.policy,
        )
        logits = np.asarray(logits, np.float32)
        for i, slot in enumerate(self.slots):
            if slot.req is None:
                continue
            self.rng, r = jax.random.split(self.rng)
            tok = int(
                sample_token(
                    r, jnp.asarray(logits[i : i + 1]),
                    do_sample=slot.req.do_sample,
                    temperature=jnp.asarray(slot.req.temperature, jnp.float32),
                    top_p=jnp.asarray(slot.req.top_p, jnp.float32),
                    top_k=jnp.asarray(0, jnp.int32),
                )[0]
            )
            slot.generated.append(tok)
            slot.last_token = tok
            self._emit(i)
        return True

    def _loop(self):
        while not self._stop.is_set():
            with self._lock:
                self._admit()
                worked = self._tick()
            if not worked:
                time.sleep(self._idle_wait)

    # -- synchronous convenience ----------------------------------------------
    def generate_sync(self, req: Request, timeout: float = 600) -> list[int]:
        self.submit(req)
        self.start()
        tokens: list[int] = []
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                kind, payload = req.out_queue.get(timeout=1.0)
            except queue.Empty:
                continue
            if kind == "token":
                tokens.append(payload)
            elif kind == "done":
                return payload
        raise TimeoutError(f"request {req.request_id} timed out")
