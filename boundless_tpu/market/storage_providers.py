"""Storage providers for guest images / inputs.

Re-design of `crates/boundless-market/src/storage/providers/` (S3, GCS,
Pinata/IPFS, HTTP, file, mock). Providers share the duck-type:
`upload(key, bytes) -> url` and `download(url) -> bytes`. Cloud backends
are gated on their SDKs being present (absent in this image — they raise
with instructions rather than failing obscurely).
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict


class MockStorageProvider:
    """In-memory provider (reference providers/mock.rs)."""

    def __init__(self):
        self._data: Dict[str, bytes] = {}

    def upload(self, key: str, data: bytes) -> str:
        url = f"mock://{key}"
        self._data[url] = data
        return url

    def download(self, url: str) -> bytes:
        return self._data[url]


class FileStorageProvider:
    """File-backed provider (reference providers/file.rs)."""

    def __init__(self, root: str = None):
        self.root = root or tempfile.mkdtemp(prefix="bt_storage_")

    def upload(self, key: str, data: bytes) -> str:
        assert ".." not in key
        path = os.path.join(self.root, key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
        return f"file://{path}"

    def download(self, url: str) -> bytes:
        assert url.startswith("file://")
        with open(url[len("file://"):], "rb") as f:
            return f.read()


class HttpStorageProvider:
    """Fetch-only provider for http(s) URLs (reference fetch_url)."""

    def upload(self, key: str, data: bytes) -> str:
        raise NotImplementedError("HTTP provider is download-only")

    def download(self, url: str) -> bytes:
        import urllib.request

        assert url.startswith(("http://", "https://"))
        with urllib.request.urlopen(url) as resp:
            return resp.read()


class S3StorageProvider:
    """S3/MinIO provider (reference providers/s3.rs); requires boto3."""

    def __init__(self, bucket: str, **client_kwargs):
        try:
            import boto3  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "S3StorageProvider requires boto3 (not in this image); "
                "use FileStorageProvider or MockStorageProvider") from e
        import boto3

        self.bucket = bucket
        self._s3 = boto3.client("s3", **client_kwargs)

    def upload(self, key: str, data: bytes) -> str:
        self._s3.put_object(Bucket=self.bucket, Key=key, Body=data)
        return f"s3://{self.bucket}/{key}"

    def download(self, url: str) -> bytes:
        assert url.startswith("s3://")
        bucket, _, key = url[len("s3://"):].partition("/")
        return self._s3.get_object(Bucket=bucket, Key=key)["Body"].read()


class PinataStorageProvider:
    """IPFS-via-Pinata provider (reference providers/pinata.rs); needs
    network egress + an API key — gated in this environment."""

    def __init__(self, api_key: str = None):
        if not api_key:
            raise RuntimeError("PinataStorageProvider requires an API key "
                               "and network egress (unavailable here)")
        self.api_key = api_key

    def upload(self, key: str, data: bytes) -> str:
        raise NotImplementedError("network egress unavailable in this image")

    def download(self, url: str) -> bytes:
        raise NotImplementedError("network egress unavailable in this image")


def provider_for(url_or_scheme: str, **kwargs):
    """Scheme-dispatch factory (reference storage provider registry)."""
    s = url_or_scheme.split("://")[0]
    return {
        "mock": MockStorageProvider,
        "file": FileStorageProvider,
        "http": HttpStorageProvider,
        "https": HttpStorageProvider,
        "s3": S3StorageProvider,
        "ipfs": PinataStorageProvider,
    }[s](**kwargs)
