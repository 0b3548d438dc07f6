"""Safe wire formats for images and receipts.

Role of the reference's bincode (de)serialization of Segment/Receipt
(SURVEY §2.4c). Pickle is never used for untrusted input: the REST API
accepts guest images in the versioned binary format below (magic +
version + entry + sorted (addr, word) u32-LE pairs), and receipts
round-trip through a structured numpy-aware container.

Formats:
  image v1:  b"BTIM" u32(version=1) u32(entry) u32(count) count*(u32,u32)
  pytree v1: JSON header {version, treedef-ish spec} + concatenated raw
             little-endian array payloads.
"""

from __future__ import annotations

import json
import struct
from typing import Tuple

import numpy as np

IMAGE_MAGIC = b"BTIM"
IMAGE_VERSION = 1


class SerdeError(Exception):
    pass


def dump_image(image) -> bytes:
    items = sorted(image.words.items())
    out = [IMAGE_MAGIC, struct.pack("<II", IMAGE_VERSION, image.entry),
           struct.pack("<I", len(items))]
    for addr, word in items:
        out.append(struct.pack("<II", addr, word))
    return b"".join(out)


def load_image(data: bytes):
    from ..zkvm.executor import MemoryImage

    if data[:4] != IMAGE_MAGIC:
        raise SerdeError("bad image magic")
    version, entry = struct.unpack_from("<II", data, 4)
    if version != IMAGE_VERSION:
        raise SerdeError(f"unsupported image version {version}")
    (count,) = struct.unpack_from("<I", data, 12)
    if len(data) != 16 + 8 * count:
        raise SerdeError("truncated image payload")
    words = {}
    off = 16
    for _ in range(count):
        addr, word = struct.unpack_from("<II", data, off)
        words[addr] = word
        off += 8
    return MemoryImage(words=words, entry=entry)


# ---------------------------------------------------------------------------
# Array-pytree container (receipts)
# ---------------------------------------------------------------------------


def _encode(obj, arrays):
    """Encode into JSON-able spec; numeric arrays appended to `arrays`."""
    if obj is None:
        return {"t": "none"}
    if isinstance(obj, (bool, int, float, str)):
        return {"t": "scalar", "v": obj}
    if isinstance(obj, bytes):
        return {"t": "bytes", "v": obj.hex()}
    if isinstance(obj, dict):
        return {"t": "dict",
                "v": {k: _encode(v, arrays) for k, v in obj.items()}}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple
        return {"t": "ntuple", "cls": type(obj).__name__,
                "v": {f: _encode(getattr(obj, f), arrays)
                      for f in obj._fields}}
    if isinstance(obj, (list, tuple)):
        return {"t": "list" if isinstance(obj, list) else "tuple",
                "v": [_encode(x, arrays) for x in obj]}
    arr = np.asarray(obj)
    if arr.dtype.kind in "uif":
        idx = len(arrays)
        arrays.append(np.ascontiguousarray(arr))
        return {"t": "array", "i": idx, "dtype": str(arr.dtype),
                "shape": list(arr.shape)}
    raise SerdeError(f"cannot serialize {type(obj)!r}")


def _decode(spec, payload, registry):
    t = spec["t"]
    if t == "none":
        return None
    if t == "scalar":
        return spec["v"]
    if t == "bytes":
        return bytes.fromhex(spec["v"])
    if t == "dict":
        return {k: _decode(v, payload, registry) for k, v in spec["v"].items()}
    if t == "ntuple":
        cls = registry.get(spec["cls"])
        fields = {k: _decode(v, payload, registry)
                  for k, v in spec["v"].items()}
        if cls is None:
            return fields
        return cls(**fields)
    if t in ("list", "tuple"):
        seq = [_decode(x, payload, registry) for x in spec["v"]]
        return seq if t == "list" else tuple(seq)
    if t == "array":
        raw, dtype, shape = payload[spec["i"]]
        return np.frombuffer(raw, dtype=dtype).reshape(shape)
    raise SerdeError(f"bad spec {t!r}")


def dump_pytree(obj) -> bytes:
    arrays = []
    spec = _encode(obj, arrays)
    metas = []
    blobs = []
    for arr in arrays:
        raw = arr.tobytes()
        metas.append({"dtype": str(arr.dtype), "shape": list(arr.shape),
                      "size": len(raw)})
        blobs.append(raw)
    header = json.dumps({"version": 1, "spec": spec,
                         "arrays": metas}).encode()
    return (b"BTPT" + struct.pack("<I", len(header)) + header
            + b"".join(blobs))


def load_pytree(data: bytes, registry=None):
    if data[:4] != b"BTPT":
        raise SerdeError("bad pytree magic")
    (hlen,) = struct.unpack_from("<I", data, 4)
    header = json.loads(data[8 : 8 + hlen].decode())
    if header["version"] != 1:
        raise SerdeError("unsupported pytree version")
    payload = []
    off = 8 + hlen
    for meta in header["arrays"]:
        raw = data[off : off + meta["size"]]
        if len(raw) != meta["size"]:
            raise SerdeError("truncated array payload")
        payload.append((raw, meta["dtype"], tuple(meta["shape"])))
        off += meta["size"]
    return _decode(header["spec"], payload, registry or default_registry())


def default_registry():
    from ..prover.stark import SegmentProof, GroupOpening
    from ..core.fri import FriProof

    return {"SegmentProof": SegmentProof, "GroupOpening": GroupOpening,
            "FriProof": FriProof}


def dump_segment_receipt(receipt) -> bytes:
    import jax

    proof_host = jax.tree_util.tree_map(np.asarray, receipt.proof)
    return dump_pytree({
        "kind": "segment_receipt", "version": 1,
        "proof": proof_host,
        "pub": receipt.pub,
        "image_id": np.asarray(receipt.image_id),
        "po2": receipt.po2,
    })


def load_segment_receipt(data: bytes):
    from ..zkvm.prove import SegmentReceipt

    d = load_pytree(data)
    if d.get("kind") != "segment_receipt":
        raise SerdeError("not a segment receipt")
    return SegmentReceipt(proof=d["proof"], pub=d["pub"],
                          image_id=d["image_id"], po2=int(d["po2"]))