"""Web UI gateway: page serves, /api/generate streams through the worker,
votes log; conversation helpers."""

import asyncio
import base64
import io
import json

import pytest

from starvector_tpu.api import StarVectorForCausalLM
from starvector_tpu.models import starvector as sv
from starvector_tpu.serve.conversation import Conversation, close_svg
from starvector_tpu.serve.webui import build_app as build_webui
from starvector_tpu.serve.worker import ModelWorker, build_app as build_worker


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.mark.slow
def test_webui_serves_and_streams(tmp_path):
    from aiohttp import ClientSession
    from aiohttp.test_utils import TestServer
    from PIL import Image

    model = StarVectorForCausalLM.from_config(sv.tiny_config())
    worker = ModelWorker(model, worker_addr="x", max_batch=2, max_len=64)

    async def scenario():
        wsrv = TestServer(build_worker(worker))
        await wsrv.start_server()
        ui = TestServer(
            build_webui(str(wsrv.make_url("")).rstrip("/"), str(tmp_path))
        )
        await ui.start_server()
        try:
            async with ClientSession() as session:
                async with session.get(ui.make_url("/")) as r:
                    page = await r.text()
                assert "StarVector" in page and "api/generate" in page
                buf = io.BytesIO()
                Image.new("RGB", (28, 28), (9, 9, 200)).save(buf, format="PNG")
                payload = {
                    "task": "im2svg",
                    "image": base64.b64encode(buf.getvalue()).decode(),
                    "max_new_tokens": 3,
                    "temperature": 0.0,
                }
                async with session.post(
                    ui.make_url("/api/generate"), json=payload
                ) as r:
                    raw = await r.read()
                chunks = [json.loads(c) for c in raw.split(b"\0") if c]
                async with session.post(
                    ui.make_url("/api/vote"), json={"vote": 1, "svg": "<svg/>"}
                ) as r:
                    assert r.status == 200
            return chunks
        finally:
            await ui.close()
            await wsrv.close()

    chunks = run(scenario())
    worker.shutdown()
    assert len(chunks) == 3
    assert (tmp_path / "votes.jsonl").exists()


def test_conversation_state():
    conv = Conversation()
    conv.append_message("user", "make an svg", image="IMG")
    conv.append_message("assistant", "<svg/>")
    assert conv.get_prompt() == "<svg"
    assert conv.get_images() == ["IMG"]
    c2 = conv.copy()
    c2.messages.clear()
    assert len(conv.messages) == 2
    d = conv.dict()
    assert d["messages"][0]["role"] == "user" and "image" not in d["messages"][0]


def test_conversation_image_modes():
    from PIL import Image

    conv = Conversation(image_process_mode="Pad")
    img = conv.process_image(Image.new("RGB", (40, 20), (0, 0, 0)))
    assert img.size == (40, 40)
    conv2 = Conversation(image_process_mode="Resize")
    img2 = conv2.process_image(Image.new("RGBA", (40, 20), (0, 0, 0, 0)))
    assert img2.size == (336, 336)


def test_close_svg():
    assert close_svg("<svg><g><path d='M0 0'/>") == "<svg><g><path d='M0 0'/></g></svg>"
    assert close_svg("<svg></svg>") == "<svg></svg>"
