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


# ---------------------------------------------------------------------------
# Versioned object wire format (VERDICT #10: receipts survive process
# boundaries without pickle)
# ---------------------------------------------------------------------------


def _dev_session():
    """Echo guest -> dev-mode succinct session receipt (no STARKs)."""
    from boundless_tpu.recursion import succinct as S
    from boundless_tpu.zkvm import prove
    from boundless_tpu.zkvm.executor import Executor

    img = guests.echo()
    ex = Executor(img, guests.words([2, 11, 22]), segment_po2=8)
    res = ex.run()
    seg = res.segments[0]
    sr = prove.dev_receipt(img, seg, ps=prove.TEST_PS)
    sys = S.DevModeSystem()
    lifted = sys.lift(sr)
    session = S.finalize_session(
        lifted, [int.from_bytes(res.journal[i : i + 4], "little")
                 for i in range(0, len(res.journal), 4)],
        entry_pc=img.entry)
    return seg, lifted, session, sys


def test_segment_wire_roundtrip():
    seg, _, _, _ = _dev_session()
    back = serde.load_segment(serde.dump_segment(seg))
    assert back.index == seg.index and back.po2 == seg.po2
    assert back.pre_pc == seg.pre_pc
    assert (np.asarray(back.pre_regs) == np.asarray(seg.pre_regs)).all()
    assert back.pre_mem == seg.pre_mem
    assert back.image_id == seg.image_id
    assert back.pre_seqs == seg.pre_seqs


def test_rec_receipt_wire_roundtrip():
    _, lifted, _, sys = _dev_session()
    data = serde.dump_obj(lifted, "rec_receipt")
    back = serde.load_obj(data, "rec_receipt")
    assert back.claim == lifted.claim
    assert back.kind == lifted.kind
    assert tuple(back.pub_vals) == tuple(lifted.pub_vals)
    assert sys.verify(back)


def test_session_receipt_wire_roundtrip_and_tamper():
    from boundless_tpu.recursion import succinct as S

    _, _, session, sys = _dev_session()
    data = serde.dump_session_receipt(session)
    back = serde.load_session_receipt(data)
    assert back.journal == session.journal
    assert tuple(back.image_id) == tuple(session.image_id)
    assert S.verify_session(back, sys)

    # tampered journal no longer verifies against the claim chain
    import dataclasses

    forged = dataclasses.replace(back, journal=b"\x99" + back.journal[1:])
    assert not S.verify_session(forged, sys)

    # wire-level tamper: wrong kind tag / truncation / version bump
    with pytest.raises(serde.SerdeError):
        serde.load_obj(data, "segment")
    with pytest.raises(serde.SerdeError):
        serde.load_session_receipt(data[: len(data) // 2])
    bad = bytearray(serde.dump_pytree({"kind": "session_receipt",
                                       "version": 99, "obj": None}))
    with pytest.raises(serde.SerdeError):
        serde.load_session_receipt(bytes(bad))


def test_unknown_dataclass_rejected():
    import dataclasses

    @dataclasses.dataclass
    class Evil:
        x: int

    data = serde.dump_pytree({"kind": "hot", "version": 1, "obj": Evil(1)})
    with pytest.raises(serde.SerdeError):
        serde.load_pytree(data)


def test_int_key_dict_fast_path():
    d = {4096: 7, 0: 2**63, 12: 0}
    blob = serde.dump_pytree(d)
    assert serde.load_pytree(blob) == d
    # mixed / non-int keys still round-trip via the pair-list path
    d2 = {(1, 2): "a", 5: [1, 2]}
    assert serde.load_pytree(serde.dump_pytree(d2)) == d2
