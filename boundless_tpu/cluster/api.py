"""REST API: Bonsai-compatible surface over the proving cluster.

Re-design of the reference API service (`prover/crates/api/src/lib.rs`,
routes :1162-1194): stdlib http.server (no third-party web framework in the
image), same route shapes:

  PUT  /images/upload/<image_id>          body: pickled MemoryImage
  PUT  /inputs/upload/<input_id>          body: raw input bytes
  POST /sessions/create                   {img, input, execute_only?, po2?}
  GET  /sessions/status/<job_id>          {status, stats...}
  GET  /receipts/stark/<job_id>           pickled SessionReceipt
  GET  /journal/<job_id>                  raw journal bytes
  POST /snark/create                      {session_id, compress}
  GET  /snark/status/<job_id>
  GET  /workers/metrics                   task-state counts (prometheus-ish)

Falls back to the object store for sessions already GC'd from the taskdb
(reference api/src/lib.rs:545-560).
"""

from __future__ import annotations

import json
import pickle
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .agent import ClusterContext
from .taskdb import JobState, Priority
from . import hotstore as hs


class ClusterApi:
    """Route handling against a ClusterContext (transport-independent)."""

    def __init__(self, ctx: ClusterContext):
        self.ctx = ctx

    # -- uploads --------------------------------------------------------
    def upload_image(self, image_id: str, body: bytes):
        """Accepts the safe BTIM wire format (never pickle: untrusted
        input; see utils/serde.py)."""
        from ..utils import serde

        img = serde.load_image(body)
        self.ctx.store.put("elfs", image_id, img)
        return {"ok": True, "image_id": image_id}

    def upload_input(self, input_id: str, body: bytes):
        self.ctx.store.put_bytes("inputs", input_id, body)
        return {"ok": True, "input_id": input_id}

    # -- sessions -------------------------------------------------------
    def create_session(self, req: dict) -> dict:
        job_id = self.ctx.db.create_job(
            "exec",
            dict(kind="exec", image_id=req["img"], input_id=req["input"],
                 execute_only=bool(req.get("execute_only", False)),
                 segment_po2=int(req.get("segment_po2",
                                         self.ctx.segment_po2)),
                 exec_cycle_limit=int(req.get("exec_cycle_limit",
                                              self.ctx.exec_cycle_limit))),
            priority=Priority(int(req.get("priority", Priority.MEDIUM))))
        return {"uuid": job_id}

    def session_status(self, job_id: str) -> dict:
        try:
            st = self.ctx.db.job_state(job_id)
        except KeyError:
            # job GC'd: fall back to object store (reference :545-560)
            if self.ctx.store.exists("receipts/stark", job_id):
                return {"status": "SUCCEEDED", "stats": None}
            return {"status": "UNKNOWN"}
        stats = self.ctx.hot.get(hs.exec_stats_key(job_id))
        status = {JobState.RUNNING: "RUNNING", JobState.DONE: "SUCCEEDED",
                  JobState.FAILED: "FAILED"}[st["state"]]
        out = {"status": status, "error_msg": st.get("error")}
        if stats:
            out["stats"] = {k: v for k, v in stats.items()
                            if k in ("total_cycles", "segments", "exit_code")}
        return out

    def receipt(self, job_id: str):
        return self.ctx.store.get_bytes("receipts/stark", job_id + "")

    def receipt_obj(self, job_id: str):
        return self.ctx.store.get("receipts/stark", job_id)

    def journal(self, job_id: str):
        return self.ctx.store.get_bytes("preflight_journals", job_id)

    # -- snark ----------------------------------------------------------
    def create_snark(self, req: dict) -> dict:
        job_id = self.ctx.db.create_job(
            "snark", dict(kind="snark", source_job=req["session_id"],
                          compress=req.get("compress", "groth16")))
        return {"uuid": job_id}

    # -- metrics --------------------------------------------------------
    def metrics(self) -> dict:
        from . import metrics as M

        counts = self.ctx.db.count_task_states()
        for (stream, state), n in counts.items():
            sv = state if isinstance(state, str) else state.value
            M.REGISTRY.gauge_set(M.TASK_QUEUE_DEPTH, n, stream=stream,
                                 state=sv)
        return {f"{stream}/{state if isinstance(state, str) else state.value}":
                n for (stream, state), n in counts.items()}

    def metrics_text(self) -> str:
        from . import metrics as M

        self.metrics()  # refresh queue-depth gauges
        return M.REGISTRY.render()


def make_http_server(api: ClusterApi, host="127.0.0.1", port=0):
    """Wrap a ClusterApi in a threaded stdlib HTTP server."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            if isinstance(body, dict):
                body = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def do_PUT(self):
            parts = self.path.strip("/").split("/")
            try:
                if parts[:2] == ["images", "upload"]:
                    self._send(200, api.upload_image(parts[2], self._body()))
                elif parts[:2] == ["inputs", "upload"]:
                    self._send(200, api.upload_input(parts[2], self._body()))
                else:
                    self._send(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001
                self._send(500, {"error": str(e)})

        def do_POST(self):
            parts = self.path.strip("/").split("/")
            try:
                req = json.loads(self._body() or b"{}")
                if parts == ["sessions", "create"]:
                    self._send(200, api.create_session(req))
                elif parts == ["snark", "create"]:
                    self._send(200, api.create_snark(req))
                else:
                    self._send(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001
                self._send(500, {"error": str(e)})

        def do_GET(self):
            parts = self.path.strip("/").split("/")
            try:
                if parts[:2] == ["sessions", "status"]:
                    self._send(200, api.session_status(parts[2]))
                elif parts[:2] == ["snark", "status"]:
                    self._send(200, api.session_status(parts[2]))
                elif parts[:2] == ["receipts", "stark"]:
                    data = api.receipt(parts[2])
                    if data is None:
                        self._send(404, {"error": "no receipt"})
                    else:
                        self._send(200, data, "application/octet-stream")
                elif parts[:1] == ["journal"]:
                    data = api.journal(parts[1])
                    if data is None:
                        self._send(404, {"error": "no journal"})
                    else:
                        self._send(200, data, "application/octet-stream")
                elif parts == ["workers", "metrics"]:
                    self._send(200, api.metrics())
                elif parts == ["metrics"]:
                    self._send(200, api.metrics_text().encode(),
                               "text/plain; version=0.0.4")
                else:
                    self._send(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001
                self._send(500, {"error": str(e)})

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    return server, thread


class BentoClient:
    """Minimal client (reference `bento-client` / bonsai-sdk shape)."""

    def __init__(self, base_url: str):
        self.base = base_url.rstrip("/")

    def _req(self, method, path, body=None, headers=None):
        import urllib.request

        req = urllib.request.Request(self.base + path, data=body,
                                     method=method, headers=headers or {})
        with urllib.request.urlopen(req) as resp:
            return resp.read()

    def upload_image(self, image_id: str, image) -> str:
        from ..utils import serde

        self._req("PUT", f"/images/upload/{image_id}",
                  serde.dump_image(image))
        return image_id

    def upload_input(self, input_id: str, data: bytes) -> str:
        self._req("PUT", f"/inputs/upload/{input_id}", data)
        return input_id

    def create_session(self, img: str, input_id: str, **kw) -> str:
        body = json.dumps(dict(img=img, input=input_id, **kw)).encode()
        return json.loads(self._req("POST", "/sessions/create", body))["uuid"]

    def session_status(self, job_id: str) -> dict:
        return json.loads(self._req("GET", f"/sessions/status/{job_id}"))

    def wait(self, job_id: str, timeout=600.0, poll=0.2) -> dict:
        import time

        deadline = time.time() + timeout
        while time.time() < deadline:
            st = self.session_status(job_id)
            if st["status"] in ("SUCCEEDED", "FAILED"):
                return st
            time.sleep(poll)
        raise TimeoutError(f"session {job_id} still running")

    def receipt(self, job_id: str):
        return pickle.loads(self._req("GET", f"/receipts/stark/{job_id}"))

    def journal(self, job_id: str) -> bytes:
        return self._req("GET", f"/journal/{job_id}")

    def create_snark(self, session_id: str, compress="groth16") -> str:
        body = json.dumps(dict(session_id=session_id,
                               compress=compress)).encode()
        return json.loads(self._req("POST", "/snark/create", body))["uuid"]
