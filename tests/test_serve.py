"""Serving layer: controller registry/dispatch/heartbeat expiry + stream
proxying against a stub worker implementing the HTTP contract."""

import json
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from psalm_tpu.serve.controller import Controller, make_handler


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.read()


class StubWorkerHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        params = json.loads(self.rfile.read(n) or b"{}")
        if self.path == "/worker_generate_stream":
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.end_headers()
            for piece in ["hel", "hello wor", "hello world"]:
                self.wfile.write(json.dumps(
                    {"text": piece, "error_code": 0}).encode() + b"\0")


@pytest.fixture()
def servers():
    controller = Controller()
    csrv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(controller))
    wsrv = ThreadingHTTPServer(("127.0.0.1", 0), StubWorkerHandler)
    threads = [threading.Thread(target=s.serve_forever, daemon=True)
               for s in (csrv, wsrv)]
    for t in threads:
        t.start()
    yield (controller, f"http://127.0.0.1:{csrv.server_port}",
           f"http://127.0.0.1:{wsrv.server_port}")
    csrv.shutdown()
    wsrv.shutdown()


def test_register_list_dispatch_stream(servers):
    controller, curl, wurl = servers
    out = json.loads(_post(curl + "/register_worker", {
        "worker_name": wurl, "check_heart_beat": True,
        "worker_status": {"model_names": ["psalm"], "speed": 1,
                          "queue_length": 0}}))
    assert out["exist"]

    models = json.loads(_post(curl + "/list_models", {}))["models"]
    assert models == ["psalm"]

    addr = json.loads(_post(curl + "/get_worker_address",
                            {"model": "psalm"}))["address"]
    assert addr == wurl

    raw = _post(curl + "/worker_generate_stream",
                {"model": "psalm", "prompt": "hi"})
    chunks = [json.loads(c) for c in raw.split(b"\0") if c]
    assert chunks[-1]["text"] == "hello world"

    # heartbeat + stale expiry
    ok = json.loads(_post(curl + "/receive_heart_beat", {
        "worker_name": wurl, "queue_length": 3}))["exist"]
    assert ok
    controller.workers[wurl].last_heart_beat = time.time() - 1000
    models = json.loads(_post(curl + "/list_models", {}))["models"]
    assert models == []


def test_dispatch_no_worker(servers):
    _, curl, _ = servers
    raw = json.loads(_post(curl + "/worker_generate_stream",
                           {"model": "nope", "prompt": "hi"}))
    assert raw["error_code"] == 2
