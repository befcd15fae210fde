"""Model worker: loads the model, serves streaming generation, heartbeats.

Rebuilds the reference worker (reference: starvector/serve/model_worker.py)
on aiohttp + the continuous-batching ServeEngine (instead of the reference's
one-request-per-thread HF streamer):
  REST: /worker_generate_stream (b'{json}\\0' chunk framing, :174-181),
        /worker_get_status
  Registers with the controller and heartbeats every
  WORKER_HEART_BEAT_INTERVAL s (:31-34,85-104); re-registers if forgotten.
  im2svg: base64 image → processor → visual prefix + '<svg' prompt
  (:120-181); text2svg: caption + <svg-start>.

Run: python -m starvector_tpu.serve.worker --model-path /ckpt --port 21002 \
        --controller http://localhost:21001
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import io
import json
import os
import threading
import time

import jax.numpy as jnp
import numpy as np
from aiohttp import web

from starvector_tpu.serve.constants import WORKER_HEART_BEAT_INTERVAL
from starvector_tpu.serve.engine import Request, ServeEngine

_CHAT_TEMPLATE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "..", "configs", "chat-template.jinja",
)


def render_chat_template(messages, template_path: str | None = None) -> str:
    """Render text-only chat messages through the configured chat template
    (reference configs/chat-template.jinja: plain content concatenation —
    the text2svg prompting mode named in BASELINE config 3). Multimodal
    image parts are handled by the endpoint, not the template. Falls back
    to concatenation when jinja2 or the template file is unavailable."""
    path = template_path or os.environ.get(
        "STARVECTOR_CHAT_TEMPLATE", _CHAT_TEMPLATE_PATH
    )
    texts = [m["content"] for m in messages if isinstance(m.get("content"), str)]
    try:
        import jinja2

        with open(path) as f:
            template = jinja2.Template(f.read())
        return template.render(messages=[{"content": t} for t in texts])
    except Exception:  # noqa: BLE001 — malformed template (jinja2 syntax/
        # render errors) must degrade to concatenation like a missing one,
        # not 500 every chat request
        return "".join(texts)


def serve_kwargs_from_leaf(leaf) -> dict:
    """Map a serve config leaf's `serve:` block (e.g. configs/generation/
    serve/starvector-8b/im2svg-tp4dp2.yaml — the geometries audited in
    HBM_PROOF.json) onto engine/worker kwargs:
      mesh axes → MeshConfig kwargs (the launcher shards params over it),
      max_batch / max_len → engine slot geometry,
      kv_cache_dtype: "int8" → jnp.int8, "bfloat16"/absent → None (engine
      uses the compute dtype).
    """
    s = leaf.get("serve") or {}
    get = s.get_path if hasattr(s, "get_path") else lambda k, d=None: s.get(k, d)
    kv_raw = str(get("kv_cache_dtype", "bfloat16") or "bfloat16")
    if kv_raw not in ("bfloat16", "int8"):
        raise ValueError(
            f"serve.kv_cache_dtype={kv_raw!r}: expected bfloat16 | int8")
    mesh_axes = s.get("mesh") or {}
    return {
        "mesh_axes": {k: int(v) for k, v in dict(mesh_axes).items()},
        "max_batch": int(get("max_batch", 8)),
        "max_len": int(get("max_len", 8192)),
        "kv_cache_dtype": jnp.int8 if kv_raw == "int8" else None,
        "hbm_proof_case": get("hbm_proof_case"),
    }


class ModelWorker:
    def __init__(
        self,
        model,                      # api.StarVectorForCausalLM
        *,
        worker_addr: str,
        controller_addr: str | None = None,
        model_names: list[str] | None = None,
        limit_model_concurrency: int = 5,
        max_batch: int = 8,
        max_len: int = 8192,
        kv_cache_dtype=None,
        spec_drafts: int = 0,       # engine prompt-lookup speculation
    ):
        self.model = model
        self.worker_addr = worker_addr
        self.controller_addr = controller_addr
        self.model_names = model_names or ["starvector"]
        self.limit = limit_model_concurrency
        self.engine = ServeEngine(
            model.params["svg_transformer"], model.cfg.llm, model.cfg.decoder,
            max_batch=max_batch, max_len=max_len, policy=model.policy,
            kv_cache_dtype=kv_cache_dtype, spec_drafts=spec_drafts,
        )
        self.engine.start()
        self._hb_thread: threading.Thread | None = None
        self._stop = threading.Event()

    # -- request prep ---------------------------------------------------------
    def _prefix_for(self, payload: dict):
        """Returns (prefix_embeds, prompt_text, ids_aligned) where
        ids_aligned is an id-per-position view of the prefix (-1 for visual
        tokens). Returned, not stored: requests run on concurrent executor
        threads and shared instance state would race."""
        tok = self.model.tokenizer
        if payload.get("task", "im2svg") == "im2svg":
            img_b64 = payload["image"]
            from PIL import Image

            pil = Image.open(io.BytesIO(base64.b64decode(img_b64)))
            images = self.model.process_images([pil])
            from starvector_tpu.models import starvector as sv

            cond = sv.encode_image(
                self.model.params, self.model.cfg, jnp.asarray(images),
                policy=self.model.policy,
            )
            prompt = payload.get("prompt") or tok.prompt
            ids = jnp.asarray(tok([prompt], add_special_tokens=False)["input_ids"])
            dec = self.model.cfg.decoder_module
            pe = dec.embed_tokens(self.model.params["svg_transformer"], ids)
            prefix = jnp.concatenate(
                [cond, self.model.policy.cast(pe)], axis=1
            )
            # id-aligned view for prompt-lookup drafting: visual prefix = -1
            Q = cond.shape[1]
            ids_aligned = jnp.concatenate(
                [jnp.full((1, Q), -1, jnp.int32), ids.astype(jnp.int32)], axis=1
            )
            return prefix, prompt, ids_aligned
        caption = payload.get("prompt", "")
        text = caption + tok.svg_start_token
        ids = jnp.asarray(tok([text], add_special_tokens=False)["input_ids"])
        dec = self.model.cfg.decoder_module
        prefix = self.model.policy.cast(
            dec.embed_tokens(self.model.params["svg_transformer"], ids)
        )
        return prefix, "", ids.astype(jnp.int32)

    def make_request(self, payload: dict) -> tuple[Request, str]:
        prefix, prompt_text, ids_aligned = self._prefix_for(payload)
        tok = self.model.tokenizer
        # real prompt token ids (drop the -1 visual positions): seeds the
        # engine's repetition-penalty presence, matching HF/vLLM
        # prompt-union-output semantics
        ids_np = np.asarray(ids_aligned).reshape(-1)
        prompt_ids = ids_np[ids_np >= 0]
        # OpenAI/vLLM sampling surface (reference vLLM validators:
        # starvector_vllm_svg_validator.py:35-44, ..._api_...py:50-60)
        logit_bias = payload.get("logit_bias") or None
        if logit_bias:
            logit_bias = {int(k): float(v) for k, v in logit_bias.items()}
        req = Request(
            prefix_embeds=prefix,
            max_new_tokens=int(payload.get("max_new_tokens", 512)),
            temperature=float(payload.get("temperature", 0.8)),
            top_p=float(payload.get("top_p", 0.9)),
            top_k=int(payload.get("top_k", 0)),
            min_p=float(payload.get("min_p", 0.0)),
            repetition_penalty=float(payload.get("repetition_penalty", 1.0)),
            frequency_penalty=float(payload.get("frequency_penalty", 0.0)),
            presence_penalty=float(payload.get("presence_penalty", 0.0)),
            logit_bias=logit_bias,
            prompt_token_ids=prompt_ids if prompt_ids.size else None,
            do_sample=float(payload.get("temperature", 0.8)) > 0,
            stop_sequences=(tok.stop_sequence_ids("</svg>"),),
            eos_token_id=tok.eos_token_id,
            num_beams=int(payload.get("num_beams", 1)),
            length_penalty=float(payload.get("length_penalty", 1.0)),
        )
        return req, prompt_text

    def generate_speculative(self, payload: dict) -> str:
        """Prompt-lookup speculative decoding (greedy, single stream) —
        exact same tokens as greedy in several-x fewer decoder forwards on
        repetitive SVG output. Routed by `use_speculative` in the payload."""
        from starvector_tpu.generation.speculative import (
            generate_greedy_speculative,
        )

        prefix, prompt_text, ids_aligned = self._prefix_for(payload)
        tok = self.model.tokenizer
        tokens, lengths, _ = generate_greedy_speculative(
            self.model.params["svg_transformer"], prefix,
            jnp.ones((1, prefix.shape[1]), jnp.int32), ids_aligned,
            dec_name=self.model.cfg.decoder, llm_cfg=self.model.cfg.llm,
            max_new_tokens=int(payload.get("max_new_tokens", 512)),
            draft_len=int(payload.get("draft_len", 8)),
            stop_sequences=(tok.stop_sequence_ids("</svg>"),),
            eos_token_id=tok.eos_token_id,
            pad_token_id=tok.pad_token_id,
            policy=self.model.policy,
        )
        row = np.asarray(tokens[0][: int(lengths[0])])
        return prompt_text + tok.decode(row)

    # -- heartbeat ------------------------------------------------------------
    def get_status(self) -> dict:
        return {
            "model_names": self.model_names,
            "speed": 1.0,
            "queue_length": self.engine.queue_length,
            "engine": self.engine.stats(),
        }

    def start_heartbeat(self):
        if not self.controller_addr or self._hb_thread:
            return

        def loop():
            import requests

            while not self._stop.is_set():
                try:
                    r = requests.post(
                        self.controller_addr + "/receive_heart_beat",
                        json={
                            "worker_name": self.worker_addr,
                            "queue_length": self.engine.queue_length,
                        },
                        timeout=5,
                    )
                    if not r.json().get("exist", False):
                        self.register()
                except Exception as e:  # noqa: BLE001
                    print(f"heartbeat error: {e}")
                time.sleep(WORKER_HEART_BEAT_INTERVAL)

        self._hb_thread = threading.Thread(target=loop, daemon=True)
        self._hb_thread.start()

    def register(self):
        if not self.controller_addr:
            return
        import requests

        requests.post(
            self.controller_addr + "/register_worker",
            json={
                "worker_name": self.worker_addr,
                "check_heart_beat": True,
                "worker_status": self.get_status(),
            },
            timeout=10,
        )

    def shutdown(self):
        self._stop.set()
        self.engine.stop()


def build_app(worker: ModelWorker) -> web.Application:
    routes = web.RouteTableDef()
    semaphore = asyncio.Semaphore(worker.limit)

    @routes.post("/worker_get_status")
    async def worker_get_status(request: web.Request):
        return web.json_response(worker.get_status())

    @routes.post("/worker_generate_stream")
    async def worker_generate_stream(request: web.Request):
        payload = await request.json()
        async with semaphore:
            resp = web.StreamResponse()
            await resp.prepare(request)
            loop = asyncio.get_running_loop()
            # beams stream through the continuous-batching engine (beam
            # groups occupy num_beams slots; concurrent sampling requests
            # keep streaming) — only speculative decode stays offline
            special = None
            if payload.get("use_speculative"):
                special = worker.generate_speculative
            if special is not None:
                try:
                    text = await loop.run_in_executor(None, special, payload)
                    chunk = json.dumps({"text": text, "error_code": 0})
                except Exception as e:  # noqa: BLE001
                    chunk = json.dumps({"text": str(e), "error_code": 1})
                await resp.write(chunk.encode() + b"\0")
                await resp.write_eof()
                return resp
            req, prompt_text = await loop.run_in_executor(
                None, worker.make_request, payload
            )
            worker.engine.submit(req)
            tok = worker.model.tokenizer
            generated: list[int] = []
            while True:
                kind, data = await loop.run_in_executor(None, req.out_queue.get)
                if kind == "token":
                    generated.append(data)
                    text = prompt_text + tok.decode(np.asarray(generated))
                    chunk = json.dumps({"text": text, "error_code": 0})
                    await resp.write(chunk.encode() + b"\0")
                elif kind == "error":
                    chunk = json.dumps({"text": str(data), "error_code": 1})
                    await resp.write(chunk.encode() + b"\0")
                    break
                else:
                    break
            await resp.write_eof()
            return resp

    @routes.post("/v1/chat/completions")
    async def chat_completions(request: web.Request):
        """OpenAI-compatible endpoint (the reference's vLLM-API surface:
        starvector/validation/starvector_vllm_api_svg_validator.py:28-69 and
        serve/vllm_api_gradio/model_worker.py). Accepts messages whose
        content includes {'type':'image_url','image_url':{'url':'data:...'}}
        parts; streams SSE `data:` chunks when stream=true."""
        body = await request.json()
        messages = body.get("messages", [])
        image_b64 = None
        text_parts: list[dict] = []
        for msg in messages:
            content = msg.get("content")
            if isinstance(content, str):
                text_parts.append({"content": content})
            elif isinstance(content, list):
                for part in content:
                    if part.get("type") == "image_url":
                        url = part["image_url"]["url"]
                        image_b64 = url.split(",", 1)[-1]
                    elif part.get("type") == "text":
                        text_parts.append({"content": part.get("text", "")})
        text_prompt = render_chat_template(text_parts)
        payload = {
            "task": "im2svg" if image_b64 else "text2svg",
            "image": image_b64,
            "prompt": text_prompt if not image_b64 else None,
            "max_new_tokens": int(body.get("max_tokens", 512)),
            "temperature": float(body.get("temperature", 0.8)),
            "top_p": float(body.get("top_p", 0.9)),
        }
        loop = asyncio.get_running_loop()
        async with semaphore:
            req, prompt_text = await loop.run_in_executor(
                None, worker.make_request, payload
            )
            worker.engine.submit(req)
            tok = worker.model.tokenizer
            rid = "chatcmpl-" + req.request_id[:12]
            model_name = body.get("model", worker.model_names[0])

            if body.get("stream"):
                resp = web.StreamResponse(
                    headers={"Content-Type": "text/event-stream"}
                )
                await resp.prepare(request)
                generated: list[int] = []
                prev = ""  # first delta carries the '<svg' prompt prefix
                while True:
                    kind, data = await loop.run_in_executor(
                        None, req.out_queue.get
                    )
                    if kind == "token":
                        generated.append(data)
                        text = prompt_text + tok.decode(np.asarray(generated))
                        delta, prev = text[len(prev):], text
                        chunk = {
                            "id": rid, "object": "chat.completion.chunk",
                            "model": model_name,
                            "choices": [{"index": 0,
                                         "delta": {"content": delta},
                                         "finish_reason": None}],
                        }
                        await resp.write(
                            b"data: " + json.dumps(chunk).encode() + b"\n\n"
                        )
                    elif kind == "error":
                        # surface engine failures as an SSE error event —
                        # not a silent, apparently-successful [DONE]
                        err = {
                            "id": rid, "object": "chat.completion.chunk",
                            "model": model_name,
                            "error": {"message": str(data),
                                      "type": "engine_error"},
                            "choices": [{"index": 0, "delta": {},
                                         "finish_reason": "error"}],
                        }
                        await resp.write(
                            b"data: " + json.dumps(err).encode() + b"\n\n"
                        )
                        break
                    else:  # "done"
                        break
                await resp.write(b"data: [DONE]\n\n")
                await resp.write_eof()
                return resp

            generated = []
            while True:
                kind, data = await loop.run_in_executor(None, req.out_queue.get)
                if kind == "done":
                    generated = data
                    break
                if kind == "error":
                    return web.json_response(
                        {"error": {"message": str(data), "type": "engine_error"}},
                        status=500,
                    )
            text = prompt_text + tok.decode(np.asarray(generated))
            return web.json_response({
                "id": rid, "object": "chat.completion", "model": model_name,
                "choices": [{
                    "index": 0,
                    "message": {"role": "assistant", "content": text},
                    "finish_reason": "stop",
                }],
                "usage": {"completion_tokens": len(generated)},
            })

    app = web.Application(client_max_size=32 * 1024 * 1024)
    app.add_routes(routes)
    return app


def main():
    from starvector_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()  # warmup amortizes across restarts
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=21002)
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--controller", default=None)
    parser.add_argument("--worker-address", default=None)
    parser.add_argument("--limit-model-concurrency", type=int, default=5)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--quantize", action="store_true",
                        help="int8 weight-only decoder (halves HBM traffic)")
    parser.add_argument("--kv-int8", action="store_true",
                        help="int8 KV cache (halves decode cache traffic)")
    parser.add_argument("--spec-drafts", type=int, default=0,
                        help="engine prompt-lookup speculation: each tick "
                             "becomes steps_per_tick verify rounds, each "
                             "drafting this many tokens on device (exact "
                             "for greedy AND sampling; emits 1..N+1 tokens "
                             "per slot per round — big win on "
                             "self-repetitive SVG output)")
    parser.add_argument("--warmup", action="store_true",
                        help="pre-compile prefill/tick chains before serving "
                             "(visual-prefix and 512/1024/2048 buckets)")
    parser.add_argument("--serve-config", default=None,
                        help="serve leaf yaml carrying the audited geometry "
                             "(mesh axes, max_batch, max_len, kv dtype) — "
                             "e.g. configs/generation/serve/starvector-8b/"
                             "im2svg-tp4dp2.yaml")
    args = parser.parse_args()

    from starvector_tpu.api import StarVectorForCausalLM

    model = StarVectorForCausalLM.from_pretrained(
        args.model_path, quantize=args.quantize
    )
    max_batch, max_len = args.max_batch, 8192
    kv_dtype = jnp.int8 if args.kv_int8 else None
    if args.serve_config:
        from starvector_tpu.config import load_yaml

        kw = serve_kwargs_from_leaf(load_yaml(args.serve_config))
        max_batch, max_len = kw["max_batch"], kw["max_len"]
        kv_dtype = kw["kv_cache_dtype"]
        axes = kw["mesh_axes"]
        if any(v > 1 for v in axes.values()):
            import jax

            from starvector_tpu.models import starvector as sv
            from starvector_tpu.parallel import (
                MeshConfig, create_mesh, make_param_shardings,
            )

            mesh = create_mesh(MeshConfig(**axes))
            # sharded params are all the engine needs — jit infers the
            # collectives from the NamedShardings (see
            # tests/test_parallel.py::test_tp_sharded_serve_engine)
            model.params = jax.device_put(
                model.params,
                make_param_shardings(model.params, sv.partition_rules(), mesh),
            )
            print(f"serve-config {kw.get('hbm_proof_case') or ''}: "
                  f"mesh {axes}, B={max_batch}, max_len={max_len}, "
                  f"kv={'int8' if kv_dtype is not None else 'bf16'}")
    worker = ModelWorker(
        model,
        worker_addr=args.worker_address or f"http://localhost:{args.port}",
        controller_addr=args.controller,
        limit_model_concurrency=args.limit_model_concurrency,
        max_batch=max_batch,
        max_len=max_len,
        kv_cache_dtype=kv_dtype,
        spec_drafts=args.spec_drafts,
    )
    if args.warmup:
        q = model.cfg.query_length
        worker.engine.warmup([q + 8, 512, 1024, 2048])
    worker.register()
    worker.start_heartbeat()
    web.run_app(build_app(worker), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
