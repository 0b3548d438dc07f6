"""Storage provider tests (mock/file; gated cloud backends)."""

import pytest

from boundless_tpu.market.storage_providers import (FileStorageProvider,
                                                    MockStorageProvider,
                                                    PinataStorageProvider,
                                                    S3StorageProvider,
                                                    provider_for)


def test_mock_and_file_roundtrip(tmp_path):
    for p in (MockStorageProvider(), FileStorageProvider(str(tmp_path))):
        url = p.upload("elfs/abc", b"\x01\x02\x03")
        assert p.download(url) == b"\x01\x02\x03"


def test_gated_cloud_providers():
    with pytest.raises(RuntimeError):
        S3StorageProvider("bucket")  # boto3 absent in this image
    with pytest.raises(RuntimeError):
        PinataStorageProvider()


def test_scheme_dispatch(tmp_path):
    assert isinstance(provider_for("mock"), MockStorageProvider)
    p = provider_for("file", root=str(tmp_path))
    url = p.upload("x", b"y")
    assert provider_for(url, root=str(tmp_path)).download(url) == b"y"
