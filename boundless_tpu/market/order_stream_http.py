"""Order-stream REST surface + JSON request codec.

HTTP layer over market/order_stream.py (reference `crates/order-stream`
axum service, `src/lib.rs:523-539`):

  POST /orders/submit     {request, signature} (JSON codec below)
  GET  /orders?since=N    replay from index N
  POST /heartbeat         {address}
  GET  /health

Signature auth is enforced by the underlying OrderStream (submissions are
rejected unless signed by a registered account key).
"""

from __future__ import annotations

import dataclasses
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .order_stream import OrderStream
from .types import (Offer, Predicate, PredicateType, ProofRequest, RequestId,
                    Requirements)


def request_to_json(req: ProofRequest) -> dict:
    return {
        "id": {"client": req.id.client, "index": req.id.index,
               "scs": req.id.smart_contract_signed},
        "requirements": {
            "image_id": req.requirements.image_id,
            "predicate": {"kind": req.requirements.predicate.kind.value,
                          "data": req.requirements.predicate.data.hex()},
            "callback": req.requirements.callback,
            "selector": req.requirements.selector,
        },
        "image_url": req.image_url,
        "input_data": req.input_data.hex(),
        "offer": dataclasses.asdict(req.offer),
    }


def request_from_json(d: dict) -> ProofRequest:
    return ProofRequest(
        id=RequestId(d["id"]["client"], int(d["id"]["index"]),
                     bool(d["id"].get("scs", False))),
        requirements=Requirements(
            image_id=d["requirements"]["image_id"],
            predicate=Predicate(
                PredicateType(d["requirements"]["predicate"]["kind"]),
                bytes.fromhex(d["requirements"]["predicate"]["data"])),
            callback=d["requirements"].get("callback"),
            selector=d["requirements"].get("selector")),
        image_url=d["image_url"],
        input_data=bytes.fromhex(d["input_data"]),
        offer=Offer(**d["offer"]))


def make_order_stream_server(stream: OrderStream, host="127.0.0.1", port=0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body):
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/orders/submit":
                    req = request_from_json(body["request"])
                    stream.submit(req, bytes.fromhex(body["signature"]))
                    self._send(200, {"ok": True})
                elif self.path == "/heartbeat":
                    stream.heartbeat(body["address"])
                    self._send(200, {"ok": True})
                else:
                    self._send(404, {"error": "not found"})
            except PermissionError as e:
                self._send(403, {"error": str(e)})
            except Exception as e:  # noqa: BLE001
                self._send(400, {"error": str(e)})

        def do_GET(self):
            if self.path.startswith("/orders"):
                since = 0
                if "since=" in self.path:
                    since = int(self.path.split("since=")[1].split("&")[0])
                orders = stream.orders_since(since)
                self._send(200, {"orders": [
                    {"request": request_to_json(r), "signature": s.hex()}
                    for r, s in orders]})
            elif self.path == "/health":
                self._send(200, {"ok": True})
            else:
                self._send(404, {"error": "not found"})

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    return server, thread


class OrderStreamClient:
    """SDK-side client (reference `src/order_stream_client.rs:266+`)."""

    def __init__(self, base_url: str):
        self.base = base_url.rstrip("/")

    def _req(self, method, path, body=None):
        import urllib.request

        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(self.base + path, data=data,
                                     method=method)
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    def submit(self, request: ProofRequest, signature: bytes):
        return self._req("POST", "/orders/submit",
                         {"request": request_to_json(request),
                          "signature": signature.hex()})

    def orders_since(self, index: int):
        out = self._req("GET", f"/orders?since={index}")
        return [(request_from_json(o["request"]),
                 bytes.fromhex(o["signature"])) for o in out["orders"]]

    def heartbeat(self, address: str):
        return self._req("POST", "/heartbeat", {"address": address})
