"""Storage provider tests.

The cloud providers (S3 SigV4 / GCS JSON API / Pinata multipart) are
real stdlib-HTTP implementations; they're exercised end-to-end against a
local fake server that verifies auth (the S3 fake recomputes the SigV4
signature server-side). Reference:
crates/boundless-market/src/storage/providers/{s3,pinata}.rs.
"""

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from boundless_tpu.market.storage_providers import (FileStorageProvider,
                                                    GcsStorageProvider,
                                                    MockStorageProvider,
                                                    PinataStorageProvider,
                                                    S3StorageProvider,
                                                    _sigv4_headers,
                                                    provider_for)

ACCESS, SECRET, REGION = "AKIDEXAMPLE", "wJalrXUtnFEMI", "us-east-1"


class _FakeCloud(BaseHTTPRequestHandler):
    """One fake for all three providers, keyed by path shape."""

    store = {}

    def log_message(self, *a):
        pass

    def _body(self):
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n)

    def _send(self, code, body=b"", ctype="application/octet-stream"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _check_sigv4(self, body):
        """Recompute the signature with the known secret; reject forgery."""
        auth = self.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256"):
            return False
        import datetime
        amz = self.headers["x-amz-date"]
        now = datetime.datetime.strptime(amz, "%Y%m%dT%H%M%SZ").replace(
            tzinfo=datetime.timezone.utc)
        url = f"http://{self.headers['Host']}{self.path}"
        expect = _sigv4_headers(self.command, url, REGION, ACCESS, SECRET,
                                body, now=now)
        ok = expect["Authorization"] == auth
        ok &= (self.headers["x-amz-content-sha256"]
               == hashlib.sha256(body).hexdigest())
        return ok

    def do_PUT(self):
        body = self._body()
        if not self._check_sigv4(body):
            return self._send(403, b"SignatureDoesNotMatch")
        self.store[self.path] = body
        self._send(200)

    def do_POST(self):
        body = self._body()
        if self.path.startswith("/upload/storage/v1/b/"):  # GCS
            if self.headers.get("Authorization") != "Bearer gcs-token":
                return self._send(401)
            name = self.path.split("name=")[1]
            self.store["/gcs/" + name] = body
            return self._send(200, b"{}", "application/json")
        if self.path == "/pinning/pinFileToIPFS":  # Pinata
            if self.headers.get("Authorization") != "Bearer pinata-jwt":
                return self._send(401)
            cid = "Qm" + hashlib.sha256(body).hexdigest()[:16]
            self.store["/ipfs/" + cid] = body  # body includes multipart
            return self._send(200, json.dumps({"IpfsHash": cid}).encode(),
                              "application/json")
        self._send(404)

    def do_GET(self):
        if self.path.startswith("/ipfs/"):
            body = self.store.get(self.path)
            if body is None:
                return self._send(404)
            # strip the multipart framing the fake stored verbatim
            payload = body.split(b"\r\n\r\n", 1)[1].rsplit(b"\r\n--", 1)[0]
            return self._send(200, payload)
        if self.path.startswith("/storage/v1/b/"):  # GCS media download
            if self.headers.get("Authorization") != "Bearer gcs-token":
                return self._send(401)
            name = self.path.split("/o/")[1].split("?")[0]
            body = self.store.get("/gcs/" + name)
            return self._send(200 if body is not None else 404, body or b"")
        body = self._body()
        if not self._check_sigv4(body):
            return self._send(403, b"SignatureDoesNotMatch")
        stored = self.store.get(self.path)
        if stored is None:
            return self._send(404)
        self._send(200, stored)


@pytest.fixture()
def cloud():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _FakeCloud)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    _FakeCloud.store = {}
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_mock_and_file_roundtrip(tmp_path):
    for p in (MockStorageProvider(), FileStorageProvider(str(tmp_path))):
        url = p.upload("elfs/abc", b"\x01\x02\x03")
        assert p.download(url) == b"\x01\x02\x03"


def test_s3_sigv4_roundtrip(cloud):
    p = S3StorageProvider("bkt", endpoint=cloud, region=REGION,
                          access_key=ACCESS, secret_key=SECRET)
    url = p.upload("images/guest.btim", b"ELF" * 100)
    assert url == "s3://bkt/images/guest.btim"
    assert p.download(url) == b"ELF" * 100


def test_s3_bad_creds_rejected(cloud):
    import urllib.error
    p = S3StorageProvider("bkt", endpoint=cloud, region=REGION,
                          access_key=ACCESS, secret_key="wrong")
    with pytest.raises(urllib.error.HTTPError) as ei:
        p.upload("k", b"x")
    assert ei.value.code == 403


def test_gcs_roundtrip(cloud):
    p = GcsStorageProvider("bkt", token="gcs-token", endpoint=cloud)
    url = p.upload("inputs/in0", b"\x07" * 32)
    assert url == "gs://bkt/inputs/in0"
    assert p.download(url) == b"\x07" * 32


def test_pinata_roundtrip(cloud):
    p = PinataStorageProvider(jwt="pinata-jwt", endpoint=cloud,
                              gateway=cloud)
    url = p.upload("guest.btim", b"input-payload")
    assert url.startswith("ipfs://Qm")
    assert p.download(url) == b"input-payload"


def test_scheme_dispatch(tmp_path):
    assert isinstance(provider_for("mock"), MockStorageProvider)
    p = provider_for("file", root=str(tmp_path))
    url = p.upload("x", b"y")
    assert provider_for(url, root=str(tmp_path)).download(url) == b"y"
    assert isinstance(provider_for("gs://b/k", bucket="b"),
                      GcsStorageProvider)
