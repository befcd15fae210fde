"""Serving REST stack end-to-end: controller registry/dispatch + worker
streaming over real sockets (asyncio driven manually — no pytest-asyncio in
the image)."""

import asyncio
import base64
import io
import json

import numpy as np
import pytest

from starvector_tpu.api import StarVectorForCausalLM
from starvector_tpu.models import starvector as sv
from starvector_tpu.serve.controller import Controller, build_app as build_controller
from starvector_tpu.serve.worker import ModelWorker, build_app as build_worker


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture(scope="module")
def model():
    return StarVectorForCausalLM.from_config(sv.tiny_config())


def test_controller_dispatch_logic():
    c = Controller("shortest_queue")
    assert c.get_worker_address("m") == ""
    c.register_worker("http://w1", True, {"model_names": ["m"], "speed": 1.0,
                                          "queue_length": 5})
    c.register_worker("http://w2", True, {"model_names": ["m"], "speed": 1.0,
                                          "queue_length": 0})
    assert c.get_worker_address("m") == "http://w2"
    # w2's queue was bumped by dispatch; equal queues → first-lowest wins
    assert c.list_models() == ["m"]
    # stale expiry
    c.worker_info["http://w1"].last_heart_beat = 0
    c.remove_stale_workers()
    assert "http://w1" not in c.worker_info


def test_controller_lottery_respects_models():
    c = Controller("lottery")
    c.register_worker("http://a", True, {"model_names": ["x"], "speed": 1.0,
                                         "queue_length": 0})
    for _ in range(10):
        assert c.get_worker_address("x") == "http://a"
    assert c.get_worker_address("y") == ""


def test_worker_stream_end_to_end(model):
    """POST /worker_generate_stream on a real socket; chunks are
    \\0-delimited JSON with growing text (reference framing)."""
    from aiohttp import ClientSession
    from aiohttp.test_utils import TestServer

    from PIL import Image

    worker = ModelWorker(
        model, worker_addr="http://t", max_batch=2, max_len=64
    )

    async def scenario():
        server = TestServer(build_worker(worker))
        await server.start_server()
        try:
            buf = io.BytesIO()
            Image.new("RGB", (28, 28), (250, 30, 30)).save(buf, format="PNG")
            payload = {
                "task": "im2svg",
                "image": base64.b64encode(buf.getvalue()).decode(),
                "max_new_tokens": 5,
                "temperature": 0.0,
            }
            async with ClientSession() as session:
                url = server.make_url("/worker_generate_stream")
                async with session.post(url, json=payload) as resp:
                    raw = await resp.read()
            chunks = [json.loads(c) for c in raw.split(b"\0") if c]
            return chunks
        finally:
            await server.close()

    chunks = run(scenario())
    worker.shutdown()
    assert len(chunks) == 5
    assert all(c["error_code"] == 0 for c in chunks)
    # text grows monotonically and starts with the '<svg' prompt
    lens = [len(c["text"]) for c in chunks]
    assert lens == sorted(lens)
    assert chunks[0]["text"].startswith("<svg")


def test_controller_worker_integration(model):
    """Register a live worker with a live controller and stream through the
    controller's passthrough endpoint."""
    from aiohttp import ClientSession
    from aiohttp.test_utils import TestServer
    from PIL import Image

    controller = Controller("shortest_queue")
    worker = ModelWorker(model, worker_addr="placeholder", max_batch=2, max_len=64)

    async def scenario():
        csrv = TestServer(build_controller(controller))
        wsrv = TestServer(build_worker(worker))
        await csrv.start_server()
        await wsrv.start_server()
        try:
            worker_url = str(wsrv.make_url("")).rstrip("/")
            async with ClientSession() as session:
                # register
                async with session.post(
                    csrv.make_url("/register_worker"),
                    json={
                        "worker_name": worker_url,
                        "check_heart_beat": True,
                        "worker_status": worker.get_status(),
                    },
                ) as r:
                    assert (await r.json())["exist"]
                async with session.post(
                    csrv.make_url("/list_models"), json={}
                ) as r:
                    assert (await r.json())["models"] == ["starvector"]
                # stream through controller
                buf = io.BytesIO()
                Image.new("RGB", (28, 28), (10, 200, 10)).save(buf, format="PNG")
                payload = {
                    "model": "starvector",
                    "task": "im2svg",
                    "image": base64.b64encode(buf.getvalue()).decode(),
                    "max_new_tokens": 3,
                    "temperature": 0.0,
                }
                async with session.post(
                    csrv.make_url("/worker_generate_stream"), json=payload
                ) as resp:
                    raw = await resp.read()
            return [json.loads(c) for c in raw.split(b"\0") if c]
        finally:
            await csrv.close()
            await wsrv.close()

    chunks = run(scenario())
    worker.shutdown()
    assert len(chunks) == 3 and chunks[-1]["text"].startswith("<svg")


def test_openai_chat_completions_endpoint(model):
    """/v1/chat/completions: non-streaming and SSE streaming modes."""
    from aiohttp import ClientSession
    from aiohttp.test_utils import TestServer
    from PIL import Image

    worker = ModelWorker(model, worker_addr="oai", max_batch=2, max_len=64)

    async def scenario():
        srv = TestServer(build_worker(worker))
        await srv.start_server()
        try:
            buf = io.BytesIO()
            Image.new("RGB", (28, 28), (123, 40, 200)).save(buf, format="PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            body = {
                "model": "starvector",
                "messages": [{
                    "role": "user",
                    "content": [
                        {"type": "text", "text": "<image-start>"},
                        {"type": "image_url",
                         "image_url": {"url": f"data:image/png;base64,{b64}"}},
                    ],
                }],
                "max_tokens": 4,
                "temperature": 0.0,
            }
            async with ClientSession() as session:
                async with session.post(
                    srv.make_url("/v1/chat/completions"), json=body
                ) as r:
                    full = await r.json()
                body["stream"] = True
                async with session.post(
                    srv.make_url("/v1/chat/completions"), json=body
                ) as r:
                    raw = await r.read()
            return full, raw
        finally:
            await srv.close()

    full, raw = run(scenario())
    worker.shutdown()
    assert full["object"] == "chat.completion"
    content = full["choices"][0]["message"]["content"]
    assert content.startswith("<svg")
    assert full["usage"]["completion_tokens"] == 4
    lines = [l for l in raw.split(b"\n\n") if l.startswith(b"data: ")]
    assert lines[-1] == b"data: [DONE]"
    chunks = [json.loads(l[6:]) for l in lines[:-1]]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    streamed = "".join(c["choices"][0]["delta"]["content"] for c in chunks)
    assert streamed.startswith("<svg")


def test_worker_speculative_route(model):
    """worker.generate_speculative (use_speculative payload route) returns
    greedy-identical text — regression for an undefined-variable bug that
    only fired on this route."""
    worker = ModelWorker(model, worker_addr="spec", max_batch=2, max_len=64)
    buf = io.BytesIO()
    from PIL import Image

    Image.new("RGB", (28, 28), (20, 200, 20)).save(buf, format="PNG")
    payload = {
        "task": "im2svg",
        "image": base64.b64encode(buf.getvalue()).decode(),
        "max_new_tokens": 6,
        "temperature": 0.0,
    }
    spec_text = worker.generate_speculative(payload)
    # reference output: the engine's greedy stream for the same payload
    req, prompt_text = worker.make_request({**payload})
    out = worker.engine.generate_sync(req, timeout=120)
    worker.shutdown()
    greedy_text = prompt_text + model.tokenizer.decode(np.asarray(out))
    assert spec_text == greedy_text


def test_render_chat_template(tmp_path):
    """Chat prompts route through configs/chat-template.jinja (reference
    configs/chat-template.jinja: content concatenation), with an env
    override and a concatenation fallback for a missing file."""
    from starvector_tpu.serve.worker import render_chat_template

    msgs = [{"content": "a circle"}, {"content": " in red"}]
    assert render_chat_template(msgs) == "a circle in red"

    custom = tmp_path / "t.jinja"
    custom.write_text(
        "{% for message in messages %}[{{ message.content }}]{% endfor %}"
    )
    assert render_chat_template(msgs, template_path=str(custom)) == \
        "[a circle][ in red]"

    # missing file → plain concatenation, never an exception
    assert render_chat_template(
        msgs, template_path=str(tmp_path / "absent.jinja")
    ) == "a circle in red"

    # malformed template (jinja syntax error) → same fallback, never a 500
    broken = tmp_path / "broken.jinja"
    broken.write_text("{% for m in %}")
    assert render_chat_template(
        msgs, template_path=str(broken)
    ) == "a circle in red"


@pytest.mark.slow
def test_beam_and_sampling_stream_concurrently_rest(model):
    """Concurrent beam + sampling requests over real sockets: the beam
    request rides the engine's beam-group slots while the sampling request
    streams tokens — neither blocks the other (VERDICT r2 #5 done bar)."""
    from aiohttp import ClientSession
    from aiohttp.test_utils import TestServer

    worker = ModelWorker(
        model, worker_addr="http://t", max_batch=4, max_len=64
    )

    async def scenario():
        server = TestServer(build_worker(worker))
        await server.start_server()
        try:
            base = {"task": "text2svg", "prompt": "a dot",
                    "max_new_tokens": 6, "temperature": 0.0}
            url = server.make_url("/worker_generate_stream")

            async def post(payload):
                async with ClientSession() as session:
                    async with session.post(url, json=payload) as resp:
                        return await resp.read()

            raw_beam, raw_samp = await asyncio.gather(
                post({**base, "num_beams": 2}),
                post(dict(base)),
            )
            return (
                [json.loads(c) for c in raw_beam.split(b"\0") if c],
                [json.loads(c) for c in raw_samp.split(b"\0") if c],
            )
        finally:
            await server.close()

    beam_chunks, samp_chunks = run(scenario())
    worker.shutdown()
    assert beam_chunks and all(c["error_code"] == 0 for c in beam_chunks)
    assert samp_chunks and all(c["error_code"] == 0 for c in samp_chunks)
    # sampling streams incrementally (one chunk per token)
    assert len(samp_chunks) == 6
    # the best hypothesis streams as one chunk per token (content is
    # random tiny-model ids, checked at the engine level against offline
    # beam_search in test_serve_engine.py)
    assert 1 <= len(beam_chunks) <= 6
