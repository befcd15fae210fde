"""Controller: worker registry + dispatch + heartbeat expiry.

Rebuilds the reference controller (reference: starvector/serve/
controller.py) on aiohttp (FastAPI is not in this image):
  REST: /register_worker /refresh_all_workers /list_models
        /get_worker_address /receive_heart_beat /worker_generate_stream
        (passthrough) /worker_get_status
  Dispatch: "lottery" (speed-weighted random, :118-140) or
  "shortest_queue" (:142-169). Dead workers expire after
  CONTROLLER_HEART_BEAT_EXPIRATION seconds (:49-52,181-189).

Run: python -m starvector_tpu.serve.controller --port 21001
"""

from __future__ import annotations

import argparse
import asyncio
import dataclasses
import json
import time

import numpy as np
from aiohttp import ClientSession, ClientTimeout, web

from starvector_tpu.serve.constants import (
    CONTROLLER_HEART_BEAT_EXPIRATION,
    WORKER_API_TIMEOUT,
)


@dataclasses.dataclass
class WorkerInfo:
    model_names: list[str]
    speed: float
    queue_length: int
    check_heart_beat: bool
    last_heart_beat: float


class Controller:
    def __init__(self, dispatch_method: str = "shortest_queue"):
        assert dispatch_method in ("lottery", "shortest_queue")
        self.dispatch_method = dispatch_method
        self.worker_info: dict[str, WorkerInfo] = {}

    # -- registry -------------------------------------------------------------
    def register_worker(
        self, worker_name: str, check_heart_beat: bool, worker_status: dict | None
    ) -> bool:
        if worker_status is None:
            return False
        self.worker_info[worker_name] = WorkerInfo(
            model_names=worker_status["model_names"],
            speed=worker_status.get("speed", 1.0),
            queue_length=worker_status.get("queue_length", 0),
            check_heart_beat=check_heart_beat,
            last_heart_beat=time.time(),
        )
        print(f"Register worker: {worker_name}")
        return True

    def receive_heart_beat(self, worker_name: str, queue_length: int) -> bool:
        if worker_name not in self.worker_info:
            return False
        info = self.worker_info[worker_name]
        info.queue_length = queue_length
        info.last_heart_beat = time.time()
        return True

    def remove_stale_workers(self):
        expire = time.time() - CONTROLLER_HEART_BEAT_EXPIRATION
        for name in [
            n for n, i in self.worker_info.items()
            if i.check_heart_beat and i.last_heart_beat < expire
        ]:
            print(f"Remove stale worker: {name}")
            del self.worker_info[name]

    def list_models(self) -> list[str]:
        models = set()
        for info in self.worker_info.values():
            models.update(info.model_names)
        return sorted(models)

    # -- dispatch (reference :118-169) ----------------------------------------
    def get_worker_address(self, model_name: str) -> str:
        candidates = [
            (n, i) for n, i in self.worker_info.items()
            if model_name in i.model_names
        ]
        if not candidates:
            return ""
        if self.dispatch_method == "lottery":
            speeds = np.array([i.speed for _, i in candidates], np.float32)
            total = float(speeds.sum())
            if total <= 0:
                return ""
            pt = np.random.uniform(0, total)
            idx = int(np.searchsorted(np.cumsum(speeds), pt))
            return candidates[min(idx, len(candidates) - 1)][0]
        # shortest_queue: normalize by speed
        norm_queues = [i.queue_length / max(i.speed, 1e-6) for _, i in candidates]
        idx = int(np.argmin(norm_queues))
        name, info = candidates[idx]
        info.queue_length += 1
        return name


def build_app(controller: Controller) -> web.Application:
    routes = web.RouteTableDef()

    @routes.post("/register_worker")
    async def register_worker(request: web.Request):
        data = await request.json()
        ok = controller.register_worker(
            data["worker_name"], data["check_heart_beat"],
            data.get("worker_status"),
        )
        return web.json_response({"exist": ok})

    @routes.post("/refresh_all_workers")
    async def refresh_all_workers(request: web.Request):
        controller.remove_stale_workers()
        return web.json_response({})

    @routes.post("/list_models")
    async def list_models(request: web.Request):
        return web.json_response({"models": controller.list_models()})

    @routes.post("/get_worker_address")
    async def get_worker_address(request: web.Request):
        data = await request.json()
        addr = controller.get_worker_address(data["model"])
        return web.json_response({"address": addr})

    @routes.post("/receive_heart_beat")
    async def receive_heart_beat(request: web.Request):
        data = await request.json()
        exist = controller.receive_heart_beat(
            data["worker_name"], data["queue_length"]
        )
        return web.json_response({"exist": exist})

    @routes.post("/worker_generate_stream")
    async def worker_generate_stream(request: web.Request):
        """Pass-through to the chosen worker (reference :237-281)."""
        data = await request.json()
        addr = controller.get_worker_address(data.get("model", ""))
        if not addr:
            return web.json_response({"text": "", "error_code": 2})
        resp = web.StreamResponse()
        await resp.prepare(request)
        timeout = ClientTimeout(total=WORKER_API_TIMEOUT)
        async with ClientSession(timeout=timeout) as session:
            async with session.post(
                addr + "/worker_generate_stream", json=data
            ) as upstream:
                async for chunk in upstream.content.iter_any():
                    await resp.write(chunk)
        await resp.write_eof()
        return resp

    async def expire_loop(app):
        while True:
            await asyncio.sleep(CONTROLLER_HEART_BEAT_EXPIRATION)
            controller.remove_stale_workers()

    async def on_startup(app):
        app["expire_task"] = asyncio.create_task(expire_loop(app))

    async def on_cleanup(app):
        app["expire_task"].cancel()

    app = web.Application()
    app.add_routes(routes)
    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=21001)
    parser.add_argument(
        "--dispatch-method", default="shortest_queue",
        choices=["lottery", "shortest_queue"],
    )
    args = parser.parse_args()
    controller = Controller(args.dispatch_method)
    web.run_app(build_app(controller), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
