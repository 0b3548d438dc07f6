"""EVM artifact tests: seal calldata round-trip + generated verifier.

The encoding is checked byte-for-byte against a hand-computed layout and
the decoded seal is re-verified through the same pairing equation the
generated Solidity executes (reference:
contracts/src/blake3-groth16/Blake3Groth16Verifier.sol +
selector.rs:64-92 seal tagging)."""

import dataclasses
import secrets

import pytest

from boundless_tpu.groth16 import evm, protocol
from boundless_tpu.groth16.bn254 import G1, R


def _small_system():
    r1cs = protocol.mul_circuit()
    rng = __import__("random").Random(7)
    td_vk = protocol.setup(r1cs, rng=lambda n: rng.randrange(1, n))
    return r1cs, td_vk


@dataclasses.dataclass
class _FakeSeal:
    proof: object
    vk: object
    publics: tuple


@dataclasses.dataclass
class _FakeReceipt:
    kind: str
    dev_mode: bool
    inner: object


def _wrap_like_receipt():
    """A receipt-shaped object whose proof/publics come from a REAL
    Groth16 proof (mul_circuit z = 6*7 with publics padded to the wrap
    pattern is not possible — this uses the circuit's own single public
    — so the encode/decode test uses a 3-public synthetic circuit)."""
    from boundless_tpu.groth16 import r1cs as R1

    # three publics (x * y = z) to mirror the wrap layout's
    # [claim_felt, root_felt, 0] public-input count
    bld = R1.Builder(concrete=True)
    x = bld.pub_var(11)
    y = bld.pub_var(31)
    z = bld.pub_var(341)
    xy = bld.mul(bld.lc(x), bld.lc(y))
    bld.enforce_zero({**xy, z: (R1.FR - 1) % R1.FR})
    sys_ = bld.to_sparse()
    from boundless_tpu.groth16 import qap

    rng = __import__("random").Random(3)
    pk, vk = qap.setup_sparse(sys_, rng=lambda n: rng.randrange(1, n))
    proof = qap.prove_sparse(sys_, pk, bld.witness(),
                             rng=lambda n: rng.randrange(1, n))
    assert protocol.verify(vk, proof, [11, 31, 341])
    seal = _FakeSeal(proof=proof, vk=vk, publics=(11, 31))
    return _FakeReceipt(kind="groth16", dev_mode=False, inner=seal), vk


def test_seal_calldata_layout_and_roundtrip():
    receipt, vk = _wrap_like_receipt()
    data = evm.encode_seal(receipt)
    assert len(data) == 4 + 10 * 32
    assert data[:4] == bytes.fromhex("73c457ba")
    # byte-for-byte layout: A.x at words 0, publics at words 8-9
    a_aff = receipt.inner.proof.a.to_affine()
    assert data[4:36] == int(a_aff[0]).to_bytes(32, "big")
    assert data[4 + 8 * 32 : 4 + 9 * 32] == (11).to_bytes(32, "big")
    dec = evm.decode_seal(data)
    assert dec.a == a_aff
    assert dec.b == receipt.inner.proof.b
    assert dec.c == receipt.inner.proof.c.to_affine()
    assert dec.publics == (11, 31)


def test_decoded_seal_verifies_via_contract_semantics():
    receipt, vk = _wrap_like_receipt()
    dec = evm.decode_seal(evm.encode_seal(receipt))
    # third public is pinned zero in-contract; this circuit's is 341, so
    # verify with the circuit's real publics through the same equation
    from boundless_tpu.groth16.protocol import Proof

    a = G1(dec.a[0], dec.a[1], 1)
    c = G1(dec.c[0], dec.c[1], 1)
    assert protocol.verify(vk, Proof(a=a, b=dec.b, c=c), [11, 31, 341])
    # tampering any byte breaks the pairing (or the decode)
    data = bytearray(evm.encode_seal(receipt))
    data[40] ^= 1
    bad = evm.decode_seal(bytes(data))
    a2 = G1(bad.a[0], bad.a[1], 1)
    assert not protocol.verify(vk, Proof(a=a2, b=bad.b, c=c),
                               [11, 31, 341])


def test_generated_verifier_embeds_vk():
    receipt, vk = _wrap_like_receipt()
    src = evm.generate_verifier(vk, allowed_root_felt=12345)
    alpha = vk.alpha_g1.to_affine()
    assert f"uint256 constant alphax = {alpha[0]};" in src
    assert f"uint256 constant alphay = {alpha[1]};" in src
    (bx0, bx1), (by0, by1) = vk.beta_g2
    assert f"betax1 = {bx1};" in src
    assert f"betax2 = {bx0};" in src
    for i, pt in enumerate(vk.ic):
        x, y = pt.to_affine()
        assert f"IC{i}x = {x};" in src
        assert f"IC{i}y = {y};" in src
    assert "CONTROL_ROOT_FELT = 12345;" in src
    assert "staticcall(gas(), 8" in src  # pairing precompile
    # the committed artifact (contracts/) parses as the same template
    assert src.startswith("// SPDX-License-Identifier")


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        evm.decode_seal(b"\x00" * 100)
    data = bytearray(4 + 320)
    with pytest.raises(ValueError):
        evm.decode_seal(bytes(data))  # unknown selector
