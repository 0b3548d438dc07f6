"""Wire-format (serde) tests: images + receipt pytrees, malformed input."""

import numpy as np
import pytest

from boundless_tpu.utils import serde
from boundless_tpu.zkvm import guests


def test_image_roundtrip():
    img = guests.echo()
    data = serde.dump_image(img)
    back = serde.load_image(data)
    assert back.words == img.words
    assert back.entry == img.entry
    assert back.image_id() == img.image_id()


def test_image_rejects_malformed():
    with pytest.raises(serde.SerdeError):
        serde.load_image(b"NOPE" + b"\0" * 32)
    good = serde.dump_image(guests.echo())
    with pytest.raises(serde.SerdeError):
        serde.load_image(good[:-4])  # truncated
    # version bump rejected
    bad = bytearray(good)
    bad[4] = 99
    with pytest.raises(serde.SerdeError):
        serde.load_image(bytes(bad))
    # pickle payloads are never accepted
    import pickle

    with pytest.raises(serde.SerdeError):
        serde.load_image(pickle.dumps(guests.echo()))


def test_pytree_roundtrip():
    obj = {
        "a": np.arange(12, dtype=np.uint32).reshape(3, 4),
        "b": [1, "two", b"\x03\x04", None],
        "c": {"nested": np.float32(2.5) * np.ones(2, np.float32)},
        "d": (7, 8),
    }
    data = serde.dump_pytree(obj)
    back = serde.load_pytree(data)
    np.testing.assert_array_equal(back["a"], obj["a"])
    assert back["b"] == [1, "two", b"\x03\x04", None]
    np.testing.assert_array_equal(back["c"]["nested"], obj["c"]["nested"])
    assert back["d"] == (7, 8)
    with pytest.raises(serde.SerdeError):
        serde.load_pytree(b"XXXX" + data[4:])
